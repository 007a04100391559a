"""Node similarity — neighborhood Jaccard over the link graph.

EXTENSION (the era's companion library ships `algo.similarity.jaccard`
over id lists; GDS later productized it as nodeSimilarity): score node
pairs by the Jaccard overlap of their out-neighborhoods — the
related-page / co-citation primitive for link graphs.

Spark shape — identical to the exact n-gram dedup plan, with the
adjacency set playing the shingle set (`pipeline/dedup.py::
ngram_jaccard_pairs` is the same algebra over text):

- |A ∩ B| from the shared-neighbor self-join keyed on the neighbor
  (one shuffle), |A ∪ B| = |A| + |B| − |A∩B| from the degree frame;
- the quadratic danger is a high-IN-degree shared neighbor w (every
  pair of w's in-neighbors meets at w): ``max_common_degree`` drops
  such hubs from the candidate join BEFORE it fans out — the
  stop-shingle cap transplanted; sizes and intersections then
  consistently exclude the dropped hubs (the capped measure is the
  Jaccard of the hub-filtered neighborhoods, stated in the result);
- output is (id_a, id_b, similarity) with id_a < id_b, thresholded;
  `top_k` keeps the k best partners per node via a per-node window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..graph import Graph, undirect


#: metric -> similarity expression over (common, sz_a, sz_b). Jaccard
#: is the nodeSimilarity default; overlap (subset affinity) and cosine
#: (set cosine) mirror the companion library's algo.similarity.overlap
#: / .cosine over id lists.
_METRICS = {
    "jaccard": lambda c, a, b: c / (a + b - c),
    "overlap": lambda c, a, b: c / F.least(a, b),
    "cosine": lambda c, a, b: c / F.sqrt(a * b),
}


def node_similarity(
    graph: Graph,
    threshold: float = 0.1,
    direction: str = "out",
    max_common_degree: int | None = None,
    top_k: int | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """Similar node pairs: (id_a, id_b, similarity), a < b,
    similarity ≥ threshold over `direction` neighborhoods.
    ``metric``: jaccard | overlap | cosine (see _METRICS) — all three
    share the intersection/size frames; only the final expression
    differs."""
    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}")
    if direction == "out":
        adj = graph.edges.select("src", "dst")
    elif direction == "in":
        adj = graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        adj = undirect(graph.edges).select("src", "dst")
    adj = adj.distinct()

    if max_common_degree is not None:
        in_deg = adj.groupBy("dst").agg(F.count("*").alias("_in"))
        adj = (
            adj.join(in_deg.filter(F.col("_in") <= max_common_degree), "dst")
            .select("src", "dst")
        )
    adj = adj.persist()
    sizes = adj.groupBy("src").agg(F.count("*").alias("sz"))

    common = (
        adj.alias("a").join(adj.alias("b"), "dst")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("id_a"), F.col("b.src").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common
        .join(sizes.select(F.col("src").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("src").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            _METRICS[metric](
                F.col("common"), F.col("sz_a"), F.col("sz_b")
            ).alias("similarity"),
        )
        .filter(F.col("similarity") >= threshold)
    )
    if top_k is not None:
        # keep each node's k best partners (either column position),
        # deterministic tie-break on the partner id
        sym = out.unionByName(
            out.select(
                F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "similarity"
            )
        )
        w = Window.partitionBy("id_a").orderBy(F.desc("similarity"), F.col("id_b"))
        kept = (
            sym.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= top_k)
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .distinct()
        )
        out = out.join(kept, ["id_a", "id_b"], "left_semi")
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out
