"""Delta-push PageRank — Spark-native rebuild of the reference kernel.

Reference semantics (pinned by its own fixtures, which we replicate in
`tests/test_pagerank.py`):

- scores initialize to ``alpha = 1 - damping`` (`impl/PageRank.java:444-453`)
- each superstep, every node with ``delta > 0`` pushes
  ``damping * delta / outDegree`` to its OUT-neighbors (:455-481);
  the sum received becomes the node's next delta and is added to its
  score (:505-517)
- **dangling nodes push nothing** — no sink-mass redistribution; an
  unreferenced sink keeps exactly ``1-d``
  (`tests/.../impl/PageRankTest.java:139-142`,
  `PageRankWikiTest.java:74,131-141`)
- unweighted; OUTGOING direction (`algo/.../PageRankProc.java:143-147`)
- reference runs a fixed iteration count (default 20, damping 0.85,
  `PageRankProc.java:54-55`); we additionally support a tolerance
  (max |delta| < tol) termination as required by the north rule
  (1e-6 convergence).

Deliberate divergences (documented in SURVEY.md §4):

- no int fixed-point quantization of messages (×100,000,
  `PageRank.java:54,464,512`) — a JVM atomic-contention workaround, not
  semantics; float64 DataFrame math is strictly more accurate.
- the reference's degree-budget thread partitions
  (`PageRank.java:281-309`) become either Catalyst shuffle partitions
  (plan="dataframe") or an explicit cumulative-degree partitioner
  (plan="csr", `plans/partitioning.py`).

Two physical plans (differential-tested against each other):

- ``plan="dataframe"`` — pure joins + two-phase hash aggregation; the
  shuffle-per-superstep is `edges ⨝ active_deltas` then
  `groupBy(dst).sum`. Catalyst does map-side partial aggregation, AQE
  splits skewed reducers.
- ``plan="csr"`` — edges are degree-budget-partitioned once and cached;
  each superstep runs a vectorized numpy gather-scatter
  (`np.add.at`) inside `applyInPandas` per partition, emitting
  pre-combined (dst, partial) messages — the direct analogue of the
  reference's per-partition private score arrays + transpose exchange
  (`PageRank.java:56-84,311-381`), with the final `groupBy(dst).sum`
  as the exchange.

Skew: optional salting (``salt_buckets``) forces an explicit two-phase
aggregation `groupBy(salt, dst) → groupBy(dst)` for power-law in-degree
hubs; high-degree *sources* are handled by the degree-budget partitioner
splitting their edge ranges across partitions.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpointing import IterationCache


def _messages_dataframe(edges_inv: DataFrame, active: DataFrame, damping: float) -> DataFrame:
    """msgs(dst, recv): one shuffle join + hash agg per superstep."""
    return (
        edges_inv.join(active, "src")
        .select("dst", (F.col("delta") * F.col("inv_deg")).alias("m"))
        .groupBy("dst")
        .agg((F.lit(damping) * F.sum("m")).alias("recv"))
    )


def _messages_salted(
    edges_inv: DataFrame, active: DataFrame, damping: float, salt_buckets: int
) -> DataFrame:
    """Explicit two-phase aggregation: partial sums per (dst, salt) —
    salt derived from src so a hub dst's incoming mass is combined in
    `salt_buckets` independent reducers before the final (small) agg."""
    partial = (
        edges_inv.join(active, "src")
        .select(
            "dst",
            F.pmod(F.col("src"), F.lit(salt_buckets)).alias("_salt"),
            (F.col("delta") * F.col("inv_deg")).alias("m"),
        )
        .groupBy("dst", "_salt")
        .agg(F.sum("m").alias("pm"))
    )
    return partial.groupBy("dst").agg((F.lit(damping) * F.sum("pm")).alias("recv"))


def _messages_csr(edges_part: DataFrame, active: DataFrame, damping: float) -> DataFrame:
    """Per-partition vectorized gather-scatter (SpMV) via applyInPandas.

    `edges_part` carries a precomputed `part_id` (degree-budget
    partitioner). Each group gathers its active deltas, scatters
    contributions onto local dst bins with `np.add.at` (pure numpy — no
    per-row Python), and emits pre-combined (dst, partial) rows; the
    final `groupBy(dst).sum` is the inter-partition exchange.
    """
    import numpy as np
    import pandas as pd

    def spmv(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"dst": np.array([], dtype=np.int64),
                                 "pm": np.array([], dtype=np.float64)})
        contrib = pdf["delta"].to_numpy() * pdf["inv_deg"].to_numpy()
        dst = pdf["dst"].to_numpy()
        # local dense reindex of dst ids, then vectorized scatter-add
        uniq, inv = np.unique(dst, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, contrib)
        return pd.DataFrame({"dst": uniq, "pm": acc})

    joined = edges_part.join(active, "src")
    partial = joined.groupBy("part_id").applyInPandas(spmv, "dst long, pm double")
    return partial.groupBy("dst").agg((F.lit(damping) * F.sum("pm")).alias("recv"))


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    plan: str = "dataframe",
    salt_buckets: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    num_partitions: int | None = None,
    fuse: int = 1,
) -> tuple[DataFrame, dict]:
    """Run PageRank; returns (ranks(id, rank), stats).

    stats mirrors the reference's result row
    (`algo/.../results/PageRankScore.java` Stats: nodes, iterations,
    computeMillis) plus per-superstep convergence history.

    ``fuse`` chains that many supersteps into ONE Spark job before
    materializing (join+agg plans compose lazily), amortizing the
    fixed per-job scheduling cost that otherwise dominates when a
    superstep's data work is smaller than the scheduler overhead —
    the Spark analogue of the reference re-submitting ComputeSteps
    without tearing the thread pool down between iterations
    (`impl/PageRank.java:344-354`). Convergence is checked once per
    fused block, so a run may execute up to ``fuse-1`` extra
    supersteps past tolerance (harmless: deltas only shrink).
    """
    spark = graph.edges.sparkSession
    t0 = time.time()

    out_deg = graph.out_degrees().select(
        F.col("id").alias("src"), F.col("degree")
    )
    edges_with_inv = graph.edges.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("degree")).alias("inv_deg")
    )
    if plan == "csr":
        from ..plans.partitioning import degree_budget_partition

        edges_inv = degree_budget_partition(
            edges_with_inv,
            num_partitions=num_partitions or spark.sparkContext.defaultParallelism,
        ).persist()
    else:
        edges_inv = edges_with_inv.persist()
    edges_inv.count()

    alpha = 1.0 - damping
    cache = IterationCache(
        spark,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        collect_partition_metrics=checkpoint_dir is not None,
    )

    start_step = 0
    ranks = None
    if resume and checkpoint_dir:
        latest = cache.latest()
        if latest is not None:
            start_step, ranks, _meta = latest
            start_step += 1
    if ranks is None:
        ranks = graph.nodes.select(
            "id", F.lit(alpha).alias("rank"), F.lit(alpha).alias("delta")
        )
        ranks = cache.step(ranks, 0, {"phase": "init"}, value_col="delta")
        start_step = 1

    def push(cur: DataFrame) -> DataFrame:
        """One delta superstep: cur(id, delta>0) → next deltas(id, delta).

        Iterating on the *delta* frame alone (never the full rank state)
        keeps each superstep's plan referencing its predecessor exactly
        once, so a fused block grows the logical plan linearly instead
        of 2^k (the rank join would reference the state twice).
        """
        active = cur.select(F.col("id").alias("src"), "delta")
        if plan == "csr":
            msgs = _messages_csr(edges_inv, active, damping)
        elif salt_buckets > 1:
            msgs = _messages_salted(edges_inv, active, damping, salt_buckets)
        else:
            msgs = _messages_dataframe(edges_inv, active, damping)
        return msgs.select(F.col("dst").alias("id"), F.col("recv").alias("delta"))

    history: list[dict] = []
    ran = 0
    converged = False
    it = start_step - 1
    while it < max_iterations:
        block = min(max(1, fuse), max_iterations - it)
        # chain `block` delta supersteps lazily; rank absorbs their sum
        # in ONE join at the block boundary (delta-push invariant:
        # rank_t = rank_0 + Σ deltas received, impl/PageRank.java:505-517)
        cur = ranks.select("id", "delta").filter(F.col("delta") > 0)
        partials = []
        for j in range(block):
            cur = push(cur)
            partials.append(
                cur.select("id", "delta", F.lit(int(j == block - 1)).alias("_last"))
            )
        allp = partials[0]
        for p in partials[1:]:
            allp = allp.unionByName(p)
        upd = allp.groupBy("id").agg(
            F.sum("delta").alias("_add"),
            F.sum(F.when(F.col("_last") == 1, F.col("delta")).otherwise(0.0)).alias("_ld"),
        )
        ranks = ranks.join(upd, "id", "left").select(
            "id",
            (F.col("rank") + F.coalesce(F.col("_add"), F.lit(0.0))).alias("rank"),
            F.coalesce(F.col("_ld"), F.lit(0.0)).alias("delta"),
        )
        it += block
        ranks = cache.step(ranks, it, None, value_col="delta")
        if tolerance is not None:
            # one tiny agg per fused block (on the materialized state —
            # no recompute) buys early exit
            max_delta = ranks.agg(F.max("delta")).collect()[0][0] or 0.0
        else:
            max_delta = None
        ran = it
        history.append({"superstep": it, "max_delta": max_delta})
        if tolerance is not None and max_delta < tolerance:
            converged = True
            break

    result = ranks.select("id", "rank")
    stats = {
        "nodes": graph.node_count(),
        "iterations": ran,
        "didConverge": converged,
        "damping": damping,
        "computeMillis": int((time.time() - t0) * 1000),
        "history": history,
        "checkpoints": cache.history,
    }
    edges_inv.unpersist()
    return result, stats
