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
from ..plans.checkpointing import IterationCache, adaptive_disabled, check_termination


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
    fuse: int = 5,
    termination=None,
    source_nodes: DataFrame | None = None,
    weighted: bool = False,
    article: bool = False,
    init_ranks: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Run PageRank; returns (ranks(id, rank), stats).

    ``weighted`` (EXTENSION — the reference loads PageRank unweighted,
    `algo/.../PageRankProc.java:143-147`): each node pushes
    ``damping * delta * w(u,v) / Σ_out w(u,·)`` instead of the uniform
    ``1/outDegree`` split. Only the per-edge push fraction changes — the
    delta recurrence, dangling convention (push nothing), and both
    physical plans are untouched, because the kernel already carries the
    fraction as a per-edge ``inv_deg`` column. Edges with non-positive
    weight are dropped from the push (they contribute no mass, and a
    node whose out-weights sum to 0 behaves as dangling). With all
    weights equal this reduces exactly to the unweighted kernel
    (differential-tested).

    ``article`` (EXTENSION — ArticleRank, ships in later Neo4j
    releases): push denominator ``outDegree + avgOutDegree`` (avg =
    E/V over the whole graph) instead of ``outDegree`` — damping the
    influence of low-out-degree citers. Again only the per-edge
    ``inv_deg`` changes; the affine fixpoint / delta recurrence is
    untouched. Mutually exclusive with ``weighted``.

    ``init_ranks`` (EXTENSION — warm-start / incremental PageRank):
    restart the iteration from a previous (id, rank) estimate — e.g.
    the last converged run before edges were appended. One O(E)
    residual pass seeds ``delta₀ = α + d·Mᵀr₀ − r₀`` and the SAME
    delta-push loop then runs with SIGNED deltas (a graph change can
    lower mass, so negative residuals must propagate; the geometric
    series r* = r₀ + Σ (d·Mᵀ)ᵏ·delta₀ converges identically). The
    residual pass itself counts as a superstep (it applies delta₀).
    Exact identity used by the oracle: residual(r_k of a cold run)
    equals the cold run's delta_{k+1}, so warm-starting from a
    k-iteration estimate and running j loop supersteps reproduces cold
    k+1+j bit-for-float-bit. Nodes absent from ``init_ranks`` (appended
    nodes) start at the cold ``α``. For a small perturbation the
    residual is concentrated near the changed edges, so convergence
    takes O(log(perturbation)/log d) supersteps instead of the full
    cold schedule — the checkpoint-resume story extended to GRAPH
    updates, not just mid-run restarts.

    ``source_nodes`` (EXTENSION — no reference counterpart): personalized
    PageRank. Teleport mass ``1-d`` is seeded ONLY at the given (id)
    frame instead of every node — the delta-push recurrence is otherwise
    identical, so scores are the unnormalized per-seed convention
    consistent with the reference's uniform init (each seed contributes
    exactly the mass a node gets in the global run; divide by |S| for
    the stochastic-vector convention). Nodes unreachable from the seed
    set stay at exactly 0. The first supersteps only touch the seeds'
    out-neighborhoods, so frontier volume starts at O(|S|·deg) — the
    seed-expansion workload this exists for.

    stats mirrors the reference's result row
    (`algo/.../results/PageRankScore.java` Stats: nodes, iterations,
    computeMillis) plus per-superstep convergence history.

    Execution shape (the delta-push invariant rank_t = rank_0 +
    Σ deltas received, `impl/PageRank.java:505-517`, lets the loop
    iterate on the 2-column *delta* frame alone):

    - per superstep: ``edges ⨝ delta`` (edge table cached + hash-
      partitioned once, only the delta frame shuffles) → two-phase
      sum by dst → materialize. No rank state is touched.
    - every ``fuse`` supersteps the materialized delta frames fold
      into the running rank accumulator with one union+sum job.

    This keeps per-superstep shuffle volume at O(active) and the
    stage count at 2, which is what the N→4N scaling criterion needs
    — fixed scheduling overhead is the enemy of scaling efficiency.
    """
    spark = graph.edges.sparkSession
    t0 = time.time()

    # int-id compression (shared Heavy-vs-Huge analogue; bound scan
    # cached per snapshot via graph.id_type). inv_deg and messages stay
    # float64: a float32 reciprocal costs ~3e-8 per hop (measured) —
    # too close to the 1e-6 parity bar.
    id_t = graph.id_type()

    if weighted and article:
        raise ValueError("weighted and article are mutually exclusive")
    if weighted:
        # per-edge push fraction w/Σw replaces 1/deg; everything
        # downstream (both plans, salting, folds) is weight-agnostic
        e_w = graph.edges.filter(F.col("weight") > 0).select(
            F.col("src").cast(id_t).alias("src"),
            F.col("dst").cast(id_t).alias("dst"),
            F.col("weight"),
        )
        w_sum = e_w.groupBy("src").agg(F.sum("weight").alias("_wsum"))
        edges_with_inv = e_w.join(w_sum, "src").select(
            "src", "dst", (F.col("weight") / F.col("_wsum")).alias("inv_deg")
        )
    else:
        out_deg = graph.out_degrees().select(
            F.col("id").cast(id_t).alias("src"), F.col("degree")
        )
        denom = F.col("degree")
        if article:
            avg_deg = graph.edges.count() / max(graph.node_count(), 1)
            denom = F.col("degree") + F.lit(float(avg_deg))
        edges_with_inv = graph.edges.select(
            F.col("src").cast(id_t).alias("src"), F.col("dst").cast(id_t).alias("dst")
        ).join(out_deg, "src").select(
            "src", "dst", (F.lit(1.0) / denom).alias("inv_deg")
        )
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    if plan == "csr":
        from ..plans.partitioning import degree_budget_partition

        edges_inv = degree_budget_partition(edges_with_inv, num_partitions=n_parts).persist()
    else:
        # hash-partition the edge table by src ONCE and cache: every
        # superstep's `edges ⨝ active` then reuses the cached
        # partitioning (InMemoryRelation preserves outputPartitioning),
        # so only the small delta frame shuffles — the edge table never
        # moves again. This is the property that keeps per-superstep
        # shuffle volume O(V) instead of O(E) at 100 TB scale.
        edges_inv = edges_with_inv.repartition(n_parts, "src").persist()
    edges_inv.count()

    alpha = 1.0 - damping
    cache = IterationCache(
        spark,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        collect_partition_metrics=checkpoint_dir is not None,
    )

    start_step = 0
    def send(active: DataFrame) -> DataFrame:
        """d·Mᵀ·active — (id, delta) messages for an (src-named-id,
        delta) frame; shared by the superstep push and the warm-start
        residual pass."""
        if plan == "csr":
            msgs = _messages_csr(edges_inv, active, damping)
        elif salt_buckets > 1:
            msgs = _messages_salted(edges_inv, active, damping, salt_buckets)
        else:
            msgs = _messages_dataframe(edges_inv, active, damping)
        return msgs.select(F.col("dst").alias("id"), F.col("recv").alias("delta"))

    signed = init_ranks is not None
    if signed and source_nodes is not None:
        raise ValueError("init_ranks and source_nodes are mutually exclusive")

    state = None
    if resume and checkpoint_dir:
        latest = cache.latest()
        if latest is not None:
            start_step, state, _meta = latest
            start_step += 1
    if state is None:
        if init_ranks is not None:
            # warm start: delta₀ = α + d·Mᵀ·r₀ − r₀ (one O(E) pass);
            # appended nodes absent from the estimate start cold at α
            r0 = (
                graph.nodes.select(F.col("id").cast(id_t).alias("id"))
                .join(
                    init_ranks.select(
                        F.col("id").cast(id_t).alias("id"), F.col("rank")
                    ),
                    "id", "left",
                )
                .select("id", F.coalesce("rank", F.lit(alpha)).alias("rank"))
                .localCheckpoint(eager=True)  # referenced twice below
            )
            # the residual pass IS a superstep: the loop convention is
            # that state.delta is already folded into state.rank, so
            # rank₀' = r₀ + delta₀ = α + d·Mᵀ·r₀ (warm-starting from a
            # cold k-iteration estimate thus lands exactly on cold k+1,
            # and each loop iteration advances one more cold step)
            msgs = send(r0.select(F.col("id").alias("src"), F.col("rank").alias("delta")))
            state = r0.join(msgs.withColumnRenamed("delta", "_recv"), "id", "left").select(
                "id",
                (F.lit(alpha) + F.coalesce("_recv", F.lit(0.0))).alias("rank"),
                (F.lit(alpha) + F.coalesce("_recv", F.lit(0.0)) - F.col("rank")
                 ).alias("delta"),
            )
        elif source_nodes is not None:
            seeds = source_nodes.select(
                F.col("id").cast(id_t).alias("id"), F.lit(True).alias("_seed")
            ).distinct()
            init = F.when(F.col("_seed"), F.lit(alpha)).otherwise(F.lit(0.0))
            state = (
                graph.nodes.select(F.col("id").cast(id_t).alias("id"))
                .join(seeds, "id", "left")
                .select("id", init.alias("rank"), init.alias("delta"))
            )
        else:
            state = graph.nodes.select(
                F.col("id").cast(id_t).alias("id"),
                F.lit(alpha).alias("rank"), F.lit(alpha).alias("delta"),
            )
        state = cache.step(state, 0, {"phase": "init"}, value_col="delta")
        start_step = 1

    def push(cur: DataFrame) -> DataFrame:
        """One delta superstep: cur(id, active delta) → next deltas.

        Iterating on the *delta* frame alone (never the full rank state)
        keeps each superstep's plan referencing its predecessor exactly
        once, so a fused block grows the logical plan linearly instead
        of 2^k (the rank join would reference the state twice).
        """
        return send(cur.select(F.col("id").alias("src"), "delta"))

    # warm starts propagate SIGNED residuals; cold deltas are >= 0 and
    # the != 0 form would be equivalent, but > 0 keeps the cold plan
    # byte-identical to previous rounds' recorded plans
    active_pred = (
        (F.col("delta") != 0.0) if signed else (F.col("delta") > 0)
    )

    history: list[dict] = []
    ran = 0
    converged = False
    fold = max(1, fuse)
    acc = state.select("id", "rank")
    cur = state.select("id", "delta").filter(active_pred)
    pending: list[DataFrame] = []

    def fold_state(acc: DataFrame, pending: list[DataFrame], cur: DataFrame) -> DataFrame:
        """acc + Σ pending deltas → (id, rank, delta=last delta).

        Each pending frame is re-rooted as a plain RDD scan
        (localCheckpoint reads straight from its cache) before the
        union: union branches over multi-level cached JOIN chains defeat
        Catalyst's cache substitution above the broadcast threshold and
        silently RE-EXECUTE the whole chain (measured 49s vs 1.2s for an
        11-frame fold at 2M nodes)."""
        frames = [p.localCheckpoint(eager=True) for p in pending]
        allp = acc.select("id", F.col("rank").alias("v"))
        last = frames[-1] if frames else cur
        for p in frames:
            allp = allp.unionByName(p.select("id", F.col("delta").alias("v")))
        folded = allp.groupBy("id").agg(F.sum("v").alias("rank"))
        return folded.join(last, "id", "left").select(
            "id", "rank", F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta")
        )

    with adaptive_disabled(spark):
        for it in range(start_step, max_iterations + 1):
            check_termination(spark, termination, it)
            t_it = time.time()
            # persist() (not localCheckpoint) keeps the hash(dst) output
            # partitioning visible to Catalyst, so the next superstep's
            # edge join needs NO exchange; the InMemoryRelation chain
            # stays ≤ fuse deep because every fold below re-roots it
            cur = push(cur).persist()
            cur.count()
            pending.append(cur)
            ran = it
            if tolerance is not None:
                max_delta = (
                    cur.agg(F.max(F.abs(F.col("delta")))).collect()[0][0]
                    if signed
                    else cur.agg(F.max("delta")).collect()[0][0]
                ) or 0.0
                if max_delta < tolerance:
                    converged = True
            else:
                max_delta = None
            last = converged or it == max_iterations
            folded = False
            if len(pending) >= fold or last or (
                checkpoint_dir is not None and it % cache.checkpoint_every == 0
            ):
                # the fold doubles as lineage truncation: the folded
                # state materializes through IterationCache (durable
                # parquet or eager localCheckpoint), and the frontier is
                # RE-ROOTED at that materialized state so every
                # per-block chain hangs off exactly one truncated root —
                # unions mixing several localCheckpoint roots defeat
                # Catalyst's cache lookup and recompute the chains
                # (measured: 11-frame mixed-root fold 49s vs 1.2s)
                state = cache.step(
                    fold_state(acc, pending, cur), it, None, value_col="delta"
                )
                acc = state.select("id", "rank")
                for p in pending:
                    p.unpersist()
                pending = []
                cur = state.select("id", "delta").filter(active_pred)
                folded = True
            history.append({
                "superstep": it, "max_delta": max_delta,
                "secs": round(time.time() - t_it, 2), "folded": folded,
            })
            if last:
                break

    result = acc.select(F.col("id").cast("long").alias("id"), "rank")
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
