"""Weakly connected components (unionFind) — Spark-native rebuild.

Reference: sequential disjoint-set with path compression + union by rank
(`impl/GraphUnionFind.java:57-99`, `core/.../utils/dss/DisjointSetStruct.java:138-222`)
and parallel variants that merge per-range partial DSS structures
(`impl/ParallelUnionFindQueue.java:30-97`, fork-join twins). A DSS is a
shared mutable array — it does not shard across executors, so the
rebuild swaps the algorithm (documented divergence, SURVEY.md §2.c #2)
for the standard distributed equivalent: **iterative min-label
propagation with pointer jumping**, converging to the same partition.

Semantics preserved:

- optional weight `threshold`: union only edges with weight >= t
  (`GraphUnionFind.java:82-99`; fixture
  `algo/UnionFindProcIntegrationTest.java:152-171`)
- output `(id, component)`; the reference's set id is an arbitrary DSS
  root, ours is the deterministic **min original node id** of the
  component — the reference's own tests compare partitions, not ids
  (`impl/UnionFindsTest.java:130-156`)
- `component_stats` = setCount / setSize aggregates
  (`DisjointSetStruct.java:224-243`)

Scale shape: the symmetric edge table is hash-partitioned by `src`
ONCE and cached, so per round only the label frame shuffles into the
`edges ⨝ labels` join (the stationary-edges property PageRank's loop
relies on). Propagation is **frontier-based**: a node offers its label
to neighbors only in the round after the label changed — every value a
node ever holds is offered exactly once, so the fixpoint is identical
to dense propagation (labels are monotone non-increasing), but
per-round join volume decays from O(E) to O(edges incident to the
shrinking frontier). Neighbor-min alone needs O(diameter) rounds; the
pointer jump (comp := comp[comp]) compresses label chains so
convergence is O(log n) rounds on path-like graphs — the distributed
analogue of DSS path compression.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpointing import IterationCache, adaptive_disabled, check_termination


def wcc(
    graph: Graph,
    threshold: float | None = None,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    assume_deduped: bool = False,
    resume: bool = False,
    num_partitions: int | None = None,
    pointer_jump: bool | str = True,
    termination=None,
) -> tuple[DataFrame, dict]:
    """Returns (components(id, component), stats).

    ``assume_deduped=True`` skips the symmetric-edge `distinct()` (a
    full O(E) shuffle) when the caller guarantees the edge table has no
    parallel duplicates — min-label propagation is idempotent over
    duplicates, so dedup is purely a volume optimization anyway.

    ``resume=True`` (with a durable ``checkpoint_dir``) continues from
    the latest complete snapshot instead of re-initializing — min-label
    iteration is monotone in the label frame, so restarting from any
    intermediate labeling converges to the same fixpoint (the north-rule
    "resumable from checkpoint" contract, same shape as
    `pagerank(resume=True)`).

    ``pointer_jump``: True (default — every round), "auto"
    (frontier-gated: jump only while changed·64 ≥ V), False (never).
    Pointer jumping (component := component(component)) is
    LOAD-BEARING: the r5 A/B on the 8M-node chain+hub graph converges
    in 6 rounds with it vs >20 without (577k labels still moving at
    round 20) — the jump join adds ~30-40% to a superstep but buys
    O(log) total rounds, a clear win. It is also the least scalable
    part of a late superstep (label values concentrate onto giant
    components, skewing the exchange), which is why the knob exists:
    "auto" drops it once the frontier is tiny, but that can
    asymptotically INFLATE round counts on high-diameter graphs (a
    path's tail then advances one hop per round), so it is opt-in for
    giant-component-dominated workloads, not the default. The
    min-label fixpoint and the convergence test are jump-agnostic —
    any setting converges to identical components.
    """
    spark = graph.edges.sparkSession
    t0 = time.time()

    edges = graph.edges
    if threshold is not None:
        # ref GraphUnionFind.java:82-99 — union only above-threshold edges
        edges = edges.filter(F.col("weight") >= threshold)
    # int-id compression (shared Heavy-vs-Huge analogue): component
    # labels are node ids, so both the edge tuples AND the label frame
    # shrink when every id — including isolated nodes — fits int32.
    # graph.id_type() covers nodes AND edges and is cached per snapshot
    # (the threshold-filtered edge set is a subset, so the unfiltered
    # bound is a safe over-approximation).
    id_t = graph.id_type()
    sym = (
        edges.select(F.col("src").cast(id_t).alias("src"), F.col("dst").cast(id_t).alias("dst"))
        .unionByName(
            edges.select(
                F.col("dst").cast(id_t).alias("src"), F.col("src").cast(id_t).alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
    )
    if not assume_deduped:
        sym = sym.distinct()
    # hash-partition by the join key ONCE and cache: InMemoryRelation
    # preserves outputPartitioning, so every subsequent round's
    # `sym ⨝ frontier` shuffles only the (shrinking) frontier frame —
    # the O(E) side never moves again (the PageRank stationary-edges
    # property; previously `distinct()` left sym partitioned by
    # (src, dst), which the per-round join on `src` re-shuffled in full)
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    sym = sym.repartition(n_parts, "src").persist()
    sym.count()

    cache = IterationCache(
        spark, checkpoint_dir, checkpoint_every,
        collect_partition_metrics=checkpoint_dir is not None,
    )
    start_it = 1
    comp = None
    if resume and checkpoint_dir:
        latest = cache.latest()
        if latest is not None:
            step, state, _meta = latest
            comp = state.select(
                F.col("id").cast(id_t).alias("id"),
                F.col("component").cast(id_t).alias("component"),
            )
            start_it = step + 1
    if comp is None:
        comp = graph.nodes.select(
            F.col("id").cast(id_t).alias("id"), F.col("id").cast(id_t).alias("component")
        )
        comp = cache.step(comp, 0)

    ran = start_it - 1
    converged = False
    n_nodes = graph.node_count()
    changed = None  # unknown until the first round (jump gate treats as large)
    # frontier = rows whose label changed last round (everyone, in
    # round 1 / on resume). Offering from the frontier alone is exact:
    # labels only decrease, and a node's current label was offered the
    # round it last changed — so by induction every neighbor has seen
    # every value (hence the min) each node ever held.
    frontier = comp
    with adaptive_disabled(spark):
        for it in range(start_it, max_iterations + 1):
            check_termination(spark, termination, it)
            # neighbor-min: every node pulls the smallest label offered
            # by frontier neighbors over one (undirected) hop
            nbr_min = (
                sym.join(frontier.select(F.col("id").alias("src"), "component"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("nbr_comp"))
            )
            # `prev` rides along so convergence is read off the
            # materialized frame with a cached O(V) scan — no separate
            # full-join job per round
            stepped = (
                comp.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.col("component").alias("prev"),
                    F.least(
                        F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                    ).alias("component"),
                )
            )
            # pointer jumping: component := component(component) —
            # compresses label chains (distributed path compression);
            # gating options and the measured cost/benefit trade are in
            # the docstring
            do_jump = pointer_jump is True or (
                pointer_jump == "auto" and (changed is None or changed * 64 >= n_nodes)
            )
            if do_jump:
                parent = stepped.select(
                    F.col("id").alias("component"), F.col("component").alias("jump")
                )
                jumped = (
                    stepped.join(parent, "component", "left")
                    .select(
                        "id", "prev",
                        F.coalesce(F.col("jump"), F.col("component")).alias("component"),
                    )
                )
            else:
                jumped = stepped
            jumped = cache.step(jumped, it)
            changed = jumped.agg(
                F.sum((F.col("component") != F.col("prev")).cast("long")).alias("c")
            ).collect()[0]["c"] or 0
            cache.history[-1]["changed"] = int(changed)
            cache.history[-1]["jumped"] = do_jump
            comp = jumped.select("id", "component")
            # next round's frontier: exactly the rows that changed this
            # round (via neighbor-min OR pointer jump — `prev` predates
            # both). Cheap filter over the just-materialized frame.
            frontier = jumped.filter(F.col("component") != F.col("prev")).select(
                "id", "component"
            )
            ran = it
            if changed == 0:
                converged = True
                break

    stats = {
        "iterations": ran,
        "didConverge": converged,
        "computeMillis": int((time.time() - t0) * 1000),
        "history": cache.history,
    }
    sym.unpersist()
    comp = comp.select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )
    return comp, stats


def component_stats(components: DataFrame) -> tuple[int, DataFrame]:
    """(setCount, setSizes(component, size)) — ref
    `DisjointSetStruct.getSetCount/getSetSize:224-243`."""
    sizes = components.groupBy("component").agg(F.count("*").alias("size"))
    return sizes.count(), sizes
