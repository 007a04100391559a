"""Whole-graph profile statistics — degree assortativity and summary.

EXTENSION (no counterpart procedure in the reference, which exposes
per-node degrees only): the standard first-look numbers for a crawled
link graph — size, density, degree extremes, and Pearson degree
assortativity (do high-degree pages link to high-degree pages?).
Everything is one or two hash aggregations over the edge table; the
assortativity correlates the endpoint degrees over the symmetrized
edge set (the undirected convention), and Pearson r is invariant to
the sample-vs-population normalization, so any SQL engine's corr()
reproduces it exactly — which is what the driver oracle does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, undirect


def degree_assortativity(graph: Graph) -> float | None:
    """Pearson correlation of endpoint degrees over the symmetrized
    edge set; None when undefined (no edges, or zero degree variance —
    e.g. a regular graph)."""
    sym = undirect(graph.edges).select("src", "dst")
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    pairs = (
        sym.join(deg.withColumnRenamed("src", "_s").withColumnRenamed("d", "da"),
                 sym["src"] == F.col("_s"))
        .join(deg.withColumnRenamed("src", "_t").withColumnRenamed("d", "db"),
              sym["dst"] == F.col("_t"))
        .select("da", "db")
    )
    # Pearson from population moments with a guarded denominator:
    # ANSI-mode F.corr throws DIVIDE_BY_ZERO on zero degree variance
    # (e.g. a regular graph) where SQL corr() returns NULL — compute
    # the ratio driver-side so both conventions yield None
    row = pairs.agg(
        F.avg("da").alias("ax"), F.avg("db").alias("ay"),
        F.avg(F.col("da") * F.col("db")).alias("axy"),
        F.stddev_pop("da").alias("sx"), F.stddev_pop("db").alias("sy"),
    ).collect()[0]
    if row["ax"] is None:  # no edges
        return None
    denom = (row["sx"] or 0.0) * (row["sy"] or 0.0)
    if denom == 0.0:
        return None
    return float((row["axy"] - row["ax"] * row["ay"]) / denom)


def graph_summary(graph: Graph) -> DataFrame:
    """One-row profile: nodes, edges (directed, deduped), density,
    min/max/avg out-degree over nodes WITH out-edges, dangling count.
    Returned as a DataFrame so it composes with the driver contract."""
    spark = graph.edges.sparkSession
    e = graph.edges.select("src", "dst").distinct()
    n = graph.node_count()
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    stats = deg.agg(
        F.min("d").alias("min_out"), F.max("d").alias("max_out"),
        F.sum("d").alias("m"), F.count("*").alias("with_out"),
    ).collect()[0]
    m = int(stats["m"] or 0)
    with_out = int(stats["with_out"] or 0)
    density = m / (n * (n - 1)) if n > 1 else 0.0
    # raw doubles — callers round with F.round (SQL half-up semantics)
    # so oracle comparisons never hinge on Python's banker's rounding
    return spark.createDataFrame(
        [(
            n, m, density,
            int(stats["min_out"] or 0), int(stats["max_out"] or 0),
            m / with_out if with_out else 0.0,
            n - with_out,
        )],
        "n_nodes long, n_edges long, density double, min_out long, "
        "max_out long, avg_out double, dangling long",
    )
