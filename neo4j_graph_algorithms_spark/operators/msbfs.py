"""Multi-source BFS engine + the centralities built on it.

Reference: bit-parallel MS-BFS — ω=32 sources tracked per machine word,
per VLDB'15 "The More the Merrier" (`impl/msbfs/MultiSourceBFS.java:33-79`,
bitsets `BiMultiBitSet32.java`, `MultiBitSet32.java`). Consumers:

- `algo.closeness` — farness accumulated per depth, C(v) = (n-1)/farness
  (`impl/MSClosenessCentrality.java:43-95`; fixture
  `tests/.../impl/ClosenessCentralityTest.java:73`)
- `algo.harmonic` — Σ 1/depth, normalized by (n-1)
  (`impl/MSHarmonicCentrality.java:55-79`; fixture
  `tests/.../impl/HarmonicCentralityTest.java:126-131` implies BOTH
  traversal: a→b→c / d→e yields [0.375, 0.5, 0.375, 0.25, 0.25])
- `algo.allShortestPaths.stream` unweighted — (source, target, depth)
  rows (`impl/MSBFSAllShortestPaths.java`)

Spark rebuild: the per-word bitset becomes a LongType `mask` column —
64 sources per batch (vs the reference's 32 per int) — and batches
advance together in BOUNDED WAVES of ``wave_size`` sources: within a
wave the frontier DataFrame is keyed ``(batch, node, mask)``, so one
`edges ⨝ frontier` + `groupBy(batch, node).agg(bit_or(mask))` per depth
serves every in-flight batch at once, while peak `visited` state is
O(V · wave_size/64) rows instead of O(V²/64) — the Spark analogue of
the reference streaming its 32-source batches rather than holding every
batch's state simultaneously. Per-depth shuffle volume is O(frontier),
edges stay cached and hash-partitioned. `visited` is a second
(batch, node, seen_mask) frame updated with the same cadence
(localCheckpoint truncation as in PageRank).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, undirect
from ..plans.checkpointing import adaptive_disabled, check_termination


def _number_sources(src_nodes: DataFrame) -> DataFrame:
    """(id, batch, bit): assign each source a 64-wide batch slot.

    Dense fast path: when the id range is at most 2× the source count
    (dense or nearly-dense ids — the normal case after `densify_ids` or
    `spark.range`), batch/bit derive ARITHMETICALLY from the id
    (`batch = (id-min) div 64`, `bit = (id-min) mod 64`) — a pure
    projection, no shuffle at all. Sparse ids fall back to the
    distributed two-level rank scan (`plans/partitioning.
    distributed_rank`) — parallel bucket windows + broadcast bases,
    never a global single-partition window.
    """
    stats = src_nodes.agg(
        F.min("id").alias("mn"), F.max("id").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    n = stats["n"] or 0
    if n and (stats["mx"] - stats["mn"] + 1) <= 2 * n:
        base = int(stats["mn"])
        off = F.col("id") - F.lit(base)
        return src_nodes.select(
            "id", F.floor(off / 64).alias("batch"), F.pmod(off, F.lit(64)).alias("bit")
        )
    from ..plans.partitioning import distributed_rank

    return distributed_rank(src_nodes.select("id"), "id").select(
        "id",
        F.floor(F.col("_rank") / 64).alias("batch"),
        F.pmod(F.col("_rank"), F.lit(64)).alias("bit"),
    )


def _sym_edges(graph: Graph, direction: str) -> DataFrame:
    if direction == "out":
        return graph.edges.select("src", "dst")
    if direction == "in":
        return graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return undirect(graph.edges).select("src", "dst")


def _wave_ranges(numbered: DataFrame, wave_size: int | None) -> list[tuple[int, int]]:
    """Split the numbered source batches into waves of
    ``ceil(wave_size/64)`` batches each (``wave_size=None`` → one wave).

    The wave loop is what bounds peak traversal state: with all batches
    advancing together the `visited` frame is O(V · n_batches) rows
    (O(V²/64) from all-nodes sources); per wave it is O(V · wave/64) —
    the same bound the reference gets by streaming its 32-source batches
    one at a time (`impl/msbfs/MultiSourceBFS.java:33-79`). Results are
    per-source-disjoint, so waves compose by pure union/sum."""
    mx = numbered.agg(F.max("batch")).collect()[0][0]
    if mx is None:
        return []
    n_batches = int(mx) + 1
    wb = n_batches if wave_size is None else max(1, wave_size // 64)
    return [(lo, min(lo + wb, n_batches)) for lo in range(0, n_batches, wb)]


def ms_bfs_depths(
    graph: Graph,
    direction: str = "both",
    sources: DataFrame | None = None,
    max_depth: int | None = None,
    termination=None,
    wave_size: int | None = 4096,
) -> DataFrame:
    """Run MS-BFS from every source (default: all nodes).

    Returns ``(node, depth, n_sources)``: how many sources reach `node`
    at shortest-path distance `depth` (depth ≥ 1). This is the exact
    aggregate both closeness (Σ depth·n) and harmonic (Σ n/depth)
    consume, without materializing the O(V²) pair list.

    ``wave_size`` bounds how many sources are in flight at once (see
    `_wave_ranges`); the output is identical for any wave size.
    """
    spark = graph.edges.sparkSession
    edges = _sym_edges(graph, direction)
    n_parts = spark.sparkContext.defaultParallelism
    edges = edges.repartition(n_parts, "src").persist()
    edges.count()

    src_nodes = sources if sources is not None else graph.nodes.select("id")
    # batch id + bit position per source: 64 sources per batch
    numbered = _number_sources(src_nodes).localCheckpoint(eager=True)
    waves = _wave_ranges(numbered, wave_size)

    results: DataFrame | None = None
    with adaptive_disabled(spark):
        for lo, hi in waves:
            wave_numbered = (
                numbered if len(waves) == 1
                else numbered.filter((F.col("batch") >= lo) & (F.col("batch") < hi))
            )
            frontier = wave_numbered.select(
                "batch", F.col("id").alias("node"),
                F.expr("shiftleft(1L, cast(bit as int))").alias("mask"),
            ).localCheckpoint(eager=True)
            visited = frontier.withColumnRenamed("mask", "seen")
            depth = 0
            while True:
                check_termination(spark, termination, depth)
                depth += 1
                if max_depth is not None and depth > max_depth:
                    break
                # expand: every frontier bit flows along the edges
                nxt = (
                    edges.join(frontier.withColumnRenamed("node", "src"), "src")
                    .groupBy("batch", F.col("dst").alias("node"))
                    .agg(F.bit_or("mask").alias("mask"))
                )
                # drop bits already seen
                nxt = (
                    nxt.join(visited, ["batch", "node"], "left")
                    .select(
                        "batch", "node",
                        F.col("mask").bitwiseAND(F.bitwise_not(F.coalesce(F.col("seen"), F.lit(0).cast("long")))).alias("mask"),
                    )
                    .filter(F.col("mask") != 0)
                )
                nxt = nxt.localCheckpoint(eager=True)
                if nxt.isEmpty():
                    break
                contrib = nxt.select(
                    "node", F.lit(depth).alias("depth"), F.bit_count("mask").alias("n_sources")
                ).groupBy("node", "depth").agg(F.sum("n_sources").alias("n_sources"))
                results = contrib if results is None else results.unionByName(contrib)
                results = results.localCheckpoint(eager=True)
                visited = (
                    visited.join(nxt.withColumnRenamed("mask", "new"), ["batch", "node"], "full")
                    .select(
                        "batch", "node",
                        F.coalesce(F.col("seen"), F.lit(0).cast("long")).bitwiseOR(F.coalesce(F.col("new"), F.lit(0).cast("long"))).alias("seen"),
                    )
                ).localCheckpoint(eager=True)
                frontier = nxt
    edges.unpersist()
    if results is None:
        schema = "node long, depth int, n_sources long"
        return spark.createDataFrame([], schema)
    if len(waves) > 1:
        # the same (node, depth) cell can receive counts from several
        # waves — re-aggregate so the output contract (one row per
        # reached cell) holds for every wave size
        results = results.groupBy("node", "depth").agg(
            F.sum("n_sources").alias("n_sources")
        )
    return results


def closeness(graph: Graph, direction: str = "both") -> tuple[DataFrame, dict]:
    """C(v) = (n-1) / Σ_s d(s, v); 0 for unreachable/isolated nodes.

    Ref `impl/MSClosenessCentrality.java:43-95` — farness from MS-BFS,
    the (n-1) numerator regardless of component size.
    """
    t0 = time.time()
    n = graph.node_count()
    depths = ms_bfs_depths(graph, direction)
    farness = depths.groupBy(F.col("node").alias("id")).agg(
        F.sum(F.col("depth") * F.col("n_sources")).alias("farness")
    )
    result = graph.nodes.select("id").join(farness, "id", "left").select(
        "id",
        F.when(
            F.coalesce(F.col("farness"), F.lit(0)) > 0,
            F.lit(float(n - 1)) / F.col("farness"),
        ).otherwise(F.lit(0.0)).alias("centrality"),
    )
    return result, {"nodes": n, "computeMillis": int((time.time() - t0) * 1000)}


def harmonic(graph: Graph, direction: str = "both") -> tuple[DataFrame, dict]:
    """H(v) = (Σ_s 1/d(s, v)) / (n-1) — ref
    `impl/MSHarmonicCentrality.java:55-79`."""
    t0 = time.time()
    n = graph.node_count()
    depths = ms_bfs_depths(graph, direction)
    inv = depths.groupBy(F.col("node").alias("id")).agg(
        F.sum(F.col("n_sources") / F.col("depth")).alias("inv_sum")
    )
    result = graph.nodes.select("id").join(inv, "id", "left").select(
        "id",
        (F.coalesce(F.col("inv_sum"), F.lit(0.0)) / F.lit(float(max(n - 1, 1)))).alias("centrality"),
    )
    return result, {"nodes": n, "computeMillis": int((time.time() - t0) * 1000)}


def all_shortest_paths(
    graph: Graph, direction: str = "out", max_depth: int | None = None,
    termination=None, wave_size: int | None = 4096,
) -> DataFrame:
    """Unweighted all-pairs (source, target, depth) rows — the
    `algo.allShortestPaths.stream` MS-BFS variant
    (`impl/MSBFSAllShortestPaths.java`). O(V²) output by nature: the
    result stays distributed; callers filter/write rather than collect.

    Spark shape: the bitmask frontier can't carry *which* source each
    bit is without the source numbering, so this variant re-joins the
    per-depth frontier against the (batch, bit) → source map and
    explodes set bits (`F.filter` over a 0..63 sequence — JVM-side,
    no Python row loop). ``wave_size`` bounds in-flight sources (see
    `_wave_ranges`); waves partition the sources, so their row sets are
    disjoint and the union is the exact all-pairs answer.
    """
    spark = graph.edges.sparkSession
    src_nodes = graph.nodes.select("id")
    numbered = _number_sources(src_nodes).localCheckpoint(eager=True)
    waves = _wave_ranges(numbered, wave_size)

    edges = _sym_edges(graph, direction)
    n_parts = spark.sparkContext.defaultParallelism
    edges = edges.repartition(n_parts, "src").persist()

    results: DataFrame | None = None
    with adaptive_disabled(spark):
        for lo, hi in waves:
            wave_numbered = (
                numbered if len(waves) == 1
                else numbered.filter(
                    (F.col("batch") >= lo) & (F.col("batch") < hi)
                ).localCheckpoint(eager=True)
            )
            frontier = wave_numbered.select(
                "batch", F.col("id").alias("node"),
                F.expr("shiftleft(1L, cast(bit as int))").alias("mask"),
            ).localCheckpoint(eager=True)
            visited = frontier.withColumnRenamed("mask", "seen")
            depth = 0
            while True:
                check_termination(spark, termination, depth)
                depth += 1
                if max_depth is not None and depth > max_depth:
                    break
                nxt = (
                    edges.join(frontier.withColumnRenamed("node", "src"), "src")
                    .groupBy("batch", F.col("dst").alias("node"))
                    .agg(F.bit_or("mask").alias("mask"))
                    .join(visited, ["batch", "node"], "left")
                    .select(
                        "batch", "node",
                        F.col("mask").bitwiseAND(F.bitwise_not(F.coalesce(F.col("seen"), F.lit(0).cast("long")))).alias("mask"),
                    )
                    .filter(F.col("mask") != 0)
                    .localCheckpoint(eager=True)
                )
                if nxt.isEmpty():
                    break
                # explode set bits → (batch, bit) → join back to source ids
                hits = nxt.select(
                    "batch", "node",
                    F.explode(
                        F.expr("filter(sequence(0, 63), b -> (mask & shiftleft(1L, b)) != 0)")
                    ).alias("bit"),
                )
                rows = (
                    hits.join(wave_numbered, ["batch", "bit"])
                    .select(
                        F.col("id").alias("source"),
                        F.col("node").alias("target"),
                        F.lit(depth).alias("depth"),
                    )
                )
                results = rows if results is None else results.unionByName(rows)
                results = results.localCheckpoint(eager=True)
                visited = (
                    visited.join(nxt.withColumnRenamed("mask", "new"), ["batch", "node"], "full")
                    .select(
                        "batch", "node",
                        F.coalesce(F.col("seen"), F.lit(0).cast("long")).bitwiseOR(F.coalesce(F.col("new"), F.lit(0).cast("long"))).alias("seen"),
                    )
                    .localCheckpoint(eager=True)
                )
                frontier = nxt
    edges.unpersist()
    if results is None:
        return spark.createDataFrame([], "source long, target long, depth int")
    return results
