"""Betweenness centrality — `algo.betweenness` (+ `.sampled` RA-Brandes).

Reference: Brandes' algorithm, unweighted BFS DAG + dependency
accumulation (`impl/betweenness/BetweennessCentrality.java:20-40`,
parallel per-source `ParallelBetweennessCentrality.java`, sampled
`RABrandesBetweennessCentrality.java` with random / degree-biased
source selection `RandomSelectionStrategy.java`,
`RandomDegreeSelectionStrategy.java`). Fixture
`tests/.../impl/BetweennessCentralityTest.java:57-66,159-163`:
directed path a→b→c→d→e → centrality [0, 3, 4, 3, 0].

Spark rebuild — batched Brandes, all sources advance together:

- forward phase: frontier keyed (source, node) carrying σ (shortest-path
  counts); per depth one `edges ⨝ frontier` + `groupBy(source, dst)
  .sum(σ)`, visited tracked per (source, node) with the settled depth.
- backward phase: depths descending; δ(v) += σ(v)/σ(w)·(1+δ(w)) pulled
  from depth-(d+1) successors — one join + agg per depth.
- `sample` < 1.0 runs RA-Brandes: a seeded Bernoulli sample of sources,
  scores scaled by n/|sample| (the reference's estimator).

The per-(source, node) state is O(V·S) rows for S sources in flight —
the same memory shape as the reference's per-thread double[] arrays,
but sharded across the cluster. For large graphs callers bound S via
sampling (exactly why the reference ships RA-Brandes).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpointing import adaptive_disabled


def betweenness(
    graph: Graph,
    direction: str = "out",
    sample: float | None = None,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """Returns (centrality(id, centrality), stats)."""
    spark = graph.edges.sparkSession
    t0 = time.time()
    n_parts = spark.sparkContext.defaultParallelism
    edges = graph.edges.select("src", "dst").distinct()
    if direction == "both":
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    edges = edges.repartition(n_parts, "src").persist()
    edges.count()
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    n = graph.node_count()
    sources = graph.nodes.select("id")
    scale = 1.0
    if sample is not None and sample < 1.0:
        sources = sources.sample(fraction=sample, seed=seed)
        n_sampled = sources.count()
        scale = n / max(n_sampled, 1)

    # forward BFS: settled(source, node, depth, sigma)
    frontier = sources.select(
        F.col("id").alias("source"), F.col("id").alias("node"),
        F.lit(0).alias("depth"), F.lit(1.0).alias("sigma"),
    )
    settled = frontier
    depth = 0
    with adaptive_disabled(spark):
        settled = settled.localCheckpoint(eager=True)
        frontier = settled
        while True:
            depth += 1
            nxt = (
                edges.join(frontier.withColumnRenamed("node", "src"), "src")
                .groupBy("source", F.col("dst").alias("node"))
                .agg(F.sum("sigma").alias("sigma"))
                .join(settled.select("source", "node"), ["source", "node"], "left_anti")
                .withColumn("depth", F.lit(depth))
                .select("source", "node", "depth", "sigma")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            settled = settled.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        max_depth = depth - 1

        # backward accumulation, depths descending
        delta = settled.select("source", "node", F.lit(0.0).alias("delta"))
        delta = delta.localCheckpoint(eager=True)
        for d in range(max_depth, 0, -1):
            succ = (
                settled.filter(F.col("depth") == d)
                .join(delta, ["source", "node"])
                .select("source", "node", "sigma", "delta")
            )
            # pull: for each predecessor edge (v -> w), v gains
            # σv/σw · (1 + δw); join via reversed edges
            contrib = (
                rev.join(
                    succ.select(
                        "source", F.col("node").alias("src"),
                        F.col("sigma").alias("s_w"), F.col("delta").alias("d_w"),
                    ),
                    "src",
                )
                .select("source", F.col("dst").alias("node"), "s_w", "d_w")
                .join(
                    settled.filter(F.col("depth") == d - 1).select(
                        "source", "node", F.col("sigma").alias("s_v")
                    ),
                    ["source", "node"],
                )
                .groupBy("source", "node")
                .agg(F.sum(F.col("s_v") / F.col("s_w") * (1.0 + F.col("d_w"))).alias("add"))
            )
            delta = (
                delta.join(contrib, ["source", "node"], "left")
                .select(
                    "source", "node",
                    (F.col("delta") + F.coalesce(F.col("add"), F.lit(0.0))).alias("delta"),
                )
                .localCheckpoint(eager=True)
            )
    # centrality = Σ over sources of δ, excluding the source itself
    result = (
        delta.filter(F.col("source") != F.col("node"))
        .groupBy(F.col("node").alias("id"))
        .agg((F.sum("delta") * F.lit(scale)).alias("centrality"))
    )
    result = graph.nodes.select("id").join(result, "id", "left").select(
        "id", F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )
    edges.unpersist()
    stats = {
        "nodes": n,
        "maxDepth": max_depth,
        "scaleFactor": scale,
        "computeMillis": int((time.time() - t0) * 1000),
    }
    return result, stats
