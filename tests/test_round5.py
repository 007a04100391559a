"""Round-5 tests: anti-skew auto defaults, structural frontier pruning,
walker independence, scalar constants, adaptive delta, multilevel
contraction consistency, and checkpoint-resume for the round-4 kernels.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.graph import Graph


def _graph(spark, rows, weighted=False):
    if weighted:
        e = spark.createDataFrame(rows, "src long, dst long, weight double")
        return Graph.from_edges(e, weight="weight")
    e = spark.createDataFrame(rows, "src long, dst long")
    return Graph.from_edges(e)


# ------------------------------------------------------------- scalars


def test_infinity_nan_constants(spark):
    """`algo.Infinity` / `algo.NaN` (IsFiniteFunc.java:39-47): constants
    round-trip through the is_finite / is_infinite predicates."""
    from neo4j_graph_algorithms_spark.functions.scalars import (
        infinity,
        is_finite,
        is_infinite,
        nan,
    )

    row = (
        spark.range(1)
        .select(
            is_infinite(infinity()).alias("inf_is_inf"),
            is_finite(infinity()).alias("inf_is_fin"),
            is_finite(nan()).alias("nan_is_fin"),
            F.isnan(nan()).alias("nan_is_nan"),
            (infinity() > F.lit(1e308)).alias("inf_big"),
        )
        .collect()[0]
    )
    assert row.inf_is_inf and not row.inf_is_fin
    assert not row.nan_is_fin and row.nan_is_nan and row.inf_big


# ------------------------------------------------- walker independence


def test_random_walk_walkers_do_not_coalesce(spark):
    """Two walkers (same rep) that meet at the same node on the same
    step must NOT be forced onto the same next edge: the next-hop hash
    includes the walk's SOURCE (ADVICE r4). 8 sources funnel into one
    hub with 17 out-neighbors — at step 2 the chosen neighbors must
    differ across sources (probability all-equal without the fix: 1)."""
    from neo4j_graph_algorithms_spark.operators.random_walk import random_walks

    hub = 100
    rows = [(s, hub) for s in range(8)] + [(hub, 200 + i) for i in range(17)]
    g = _graph(spark, rows)
    srcs = spark.createDataFrame([(s,) for s in range(8)], "id long")
    out, _ = random_walks(g, walk_length=2, sources=srcs, seed=7)
    step2 = out.filter(F.col("step") == 2).select("node").distinct().count()
    # every walker sits at the hub on step 1; a coalescing hash would
    # send all 8 to ONE neighbor
    assert step2 > 1


def test_random_walk_still_deterministic_and_valid(spark):
    """The source-in-hash change keeps determinism + edge validity."""
    from neo4j_graph_algorithms_spark.operators.random_walk import random_walks

    rows = [(i, (i * 3 + 1) % 20) for i in range(20)] + [
        (i, (i * 7 + 2) % 20) for i in range(20)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    g = _graph(spark, rows)
    a, _ = random_walks(g, walk_length=5, walks_per_node=2, seed=3)
    b, _ = random_walks(g, walk_length=5, walks_per_node=2, seed=3)
    assert sorted(a.collect()) == sorted(b.collect())
    edges = {(r.src, r.dst) for r in g.edges.select("src", "dst").collect()}
    walks = a.orderBy("source", "rep", "step").collect()
    by_walker = {}
    for r in walks:
        by_walker.setdefault((r.source, r.rep), []).append((r.step, r.node))
    for seq in by_walker.values():
        seq.sort()
        for (s0, n0), (s1, n1) in zip(seq, seq[1:]):
            assert s1 == s0 + 1
            assert (n0, n1) in edges
