"""Round-4 regression tests.

Covers:
- the deep-iteration driver blowup fix (`plans/checkpointing.
  truncate_plan`): every BFS-family kernel previously went exponential
  in DRIVER time past ~20 supersteps (Catalyst stats walking the
  localCheckpoint origin-plan diamond), i.e. hung on any graph of
  diameter ≳22 regardless of size. These tests run the kernels to FULL
  depth on diameter-30+ fixtures — they complete in seconds now and
  would effectively hang (hours) under the old materialization.
- the lazy accumulation discipline: per-depth result/assignment frames
  are collected lazily and unioned once; the structural tests intercept
  `DataFrame.localCheckpoint` and assert the accumulated output is
  never re-materialized per depth (the old union+checkpoint pattern
  rewrote O(depth × settled) rows).
- `Graph.id_type()` caching + correctness bounds.
- hot-bucket caps on the ANN top-k candidate joins.
- `_cap_hot_buckets` stats surfacing.
- incremental-WCC orphan sweep.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.graph import Graph


def _path_graph(spark, n, directed=True):
    rows = [(i, i + 1, 1.0) for i in range(n - 1)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    return Graph.from_edges(e, weight="weight")


# ---------------------------------------------------------------- deep loops


def test_msbfs_full_depth_long_path(spark):
    """Full-depth MS-BFS on a diameter-39 path — the exact shape that
    previously exploded (driver-side) past depth ~20."""
    from neo4j_graph_algorithms_spark.operators.msbfs import ms_bfs_depths

    n = 40
    g = _path_graph(spark, n)
    depths = ms_bfs_depths(g, direction="both").collect()
    # undirected path: every ordered pair (s != t) reached exactly once
    assert sum(r["n_sources"] for r in depths) == n * (n - 1)
    assert max(r["depth"] for r in depths) == n - 1
    # node i at depth d is reached by (i-d >= 0) + (i+d <= n-1) sources
    cells = {(r["node"], r["depth"]): r["n_sources"] for r in depths}
    for i in (0, 7, 20, 39):
        for d in (1, 5, 39):
            expect = (1 if i - d >= 0 else 0) + (1 if i + d <= n - 1 else 0)
            assert cells.get((i, d), 0) == expect


def test_sssp_full_length_path(spark):
    """40 relaxation rounds of the dist/frontier diamond."""
    from neo4j_graph_algorithms_spark.operators.shortest_path import shortest_paths

    n = 40
    g = _path_graph(spark, n)
    dist, stats = shortest_paths(g, source=0)
    rows = {r["id"]: r["distance"] for r in dist.collect()}
    assert all(rows[i] == float(i) for i in range(n))
    assert stats["iterations"] >= n - 1


def test_scc_long_cycle(spark):
    """One 32-cycle: the color fixpoint runs ~32 rounds of the
    color/pushed diamond before the backward sweep."""
    from neo4j_graph_algorithms_spark.operators.scc import scc

    n = 32
    rows = [(i, (i + 1) % n, 1.0) for i in range(n)]
    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = Graph.from_edges(e, weight="weight")
    comp, stats = scc(g)
    got = comp.collect()
    assert len(got) == n
    assert len({r["component"] for r in got}) == 1
    assert stats["didConverge"]


def test_betweenness_full_depth_path(spark):
    """Directed 20-path, no depth bound: 19 forward + 19 backward
    layers. Closed form for a directed path: δ(i) = i · (n−1−i)."""
    from neo4j_graph_algorithms_spark.operators.betweenness import betweenness

    n = 20
    g = _path_graph(spark, n)
    cent, stats = betweenness(g, direction="out")
    rows = {r["id"]: r["centrality"] for r in cent.collect()}
    for i in range(n):
        assert rows[i] == pytest.approx(i * (n - 1 - i))
    assert stats["maxDepth"] == n - 1


# ------------------------------------------------ structural: lazy accumulate


class _CheckpointRecorder:
    """Intercept DataFrame.localCheckpoint and tally rows per schema.

    Spark 4 splits `pyspark.sql.DataFrame` (abstract) from the classic
    implementation subclass — patch the class the session actually
    instantiates, or the wrapper never fires."""

    def __init__(self):
        self.by_schema: dict[tuple, int] = {}

    def install(self, monkeypatch):
        try:
            from pyspark.sql.classic.dataframe import DataFrame as ClassicDF
        except ImportError:  # older layout
            ClassicDF = DataFrame
        orig = ClassicDF.localCheckpoint
        rec = self

        def wrapper(self, eager=True):
            out = orig(self, eager=eager)
            key = tuple(sorted(out.columns))
            rec.by_schema[key] = rec.by_schema.get(key, 0) + out.count()
            return out

        monkeypatch.setattr(ClassicDF, "localCheckpoint", wrapper)

    def total(self) -> int:
        return sum(self.by_schema.values())


def test_msbfs_result_frames_never_rematerialized(spark, monkeypatch):
    """The (node, depth, n_sources) output is assembled lazily: no
    checkpoint of a result-schema frame happens inside the depth loop
    (the old code checkpointed the cumulative union every depth)."""
    from neo4j_graph_algorithms_spark.operators.msbfs import ms_bfs_depths

    rec = _CheckpointRecorder()
    rec.install(monkeypatch)
    g = _path_graph(spark, 24)
    out = ms_bfs_depths(g, direction="both")
    assert sum(r["n_sources"] for r in out.collect()) == 24 * 23
    assert rec.total() > 0  # interception is live (frontier/visited frames)
    assert rec.by_schema.get(("depth", "n_sources", "node"), 0) == 0


def test_betweenness_layers_checkpointed_once(spark, monkeypatch):
    """Forward layers are checkpointed exactly once each: the total
    rows materialized under the layer schema equals the settled total
    (old code: Σ_d cumulative ≈ (depth/2)× more)."""
    from neo4j_graph_algorithms_spark.operators.betweenness import betweenness

    rec = _CheckpointRecorder()
    rec.install(monkeypatch)
    n = 12
    g = _path_graph(spark, n)
    cent, _ = betweenness(g, direction="out")
    cent.collect()
    settled_total = n * (n + 1) // 2  # pairs (s, t>=s) on a directed path
    layer_rows = rec.by_schema.get(("node", "sigma", "source"), 0)
    assert 0 < layer_rows <= settled_total
    # backward per-layer δ frames: also once each (layer 0 and the
    # deepest layer are never re-checkpointed)
    delta_rows = rec.by_schema.get(("delta", "node", "sigma", "source"), 0)
    assert delta_rows <= settled_total


# ------------------------------------------------------------- id-type cache


def test_graph_id_type_cached_and_bounded(spark):
    small = Graph.from_edges(
        spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double")
    )
    assert small.id_type() == "int"
    assert small._id_type == "int"  # cached on the snapshot
    assert small.id_type() == "int"

    big_node = Graph.from_edges(
        spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, weight double"),
        nodes=spark.createDataFrame([(1,), (2,), (1 << 40,)], "id long"),
    )
    # edges fit int32 but an ISOLATED node id does not → must stay long
    assert big_node.id_type() == "long"

    neg = Graph.from_edges(
        spark.createDataFrame(
            [(-(1 << 33), 2, 1.0)], "src long, dst long, weight double"
        )
    )
    assert neg.id_type() == "long"


# --------------------------------------------------------------- ANN caps


def _clustered_embeddings(spark, n_dup=300, n_distinct=40, dim=8, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    base = rng.normal(size=dim)
    for i in range(n_dup):  # one near-identical mega-cluster
        v = base + rng.normal(scale=1e-4, size=dim)
        rows.append((i, [float(x) for x in v]))
    for i in range(n_distinct):
        v = rng.normal(size=dim)
        rows.append((n_dup + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_topk_hot_bucket_cap(spark):
    """A degenerate near-identical cluster must not blow up the
    candidate join; capped run completes and still returns top-k rows
    for the distinct (healthy) queries."""
    from neo4j_graph_algorithms_spark.pipeline.similarity import lsh_cosine_topk

    df = _clustered_embeddings(spark)
    queries = df.filter(F.col("vec_id") >= 300)  # the healthy ones
    out = lsh_cosine_topk(
        queries, df, k=3, n_tables=4, n_bits=6, max_bucket_df=50
    )
    got = out.collect()
    assert len(got) > 0
    assert all(r["rank"] <= 3 for r in got)
    per_q: dict[int, int] = {}
    for r in got:
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v <= 3 for v in per_q.values())


def test_ivf_topk_hot_cell_cap(spark):
    from neo4j_graph_algorithms_spark.pipeline.similarity import ivf_cosine_topk

    df = _clustered_embeddings(spark, n_dup=200, n_distinct=30)
    queries = df.filter(F.col("vec_id") >= 200).limit(5)
    out = ivf_cosine_topk(
        queries, df, k=3, n_cells=8, nprobe=3, max_cell_df=80
    )
    got = out.collect()
    assert len(got) > 0
    assert all(r["rank"] <= 3 for r in got)


def test_cap_stats_surfaced(spark):
    """simhash_near_pairs exposes dropped-bucket counts via stats= and
    reports zeros when nothing is dropped."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import simhash_near_pairs

    docs = spark.createDataFrame(
        [(i, "the same boilerplate license text repeated " * 3) for i in range(60)]
        + [(100 + i, f"unique document number {i} with its own words") for i in range(5)],
        "doc_id long, text string",
    )
    stats: dict = {}
    out = simhash_near_pairs(docs, max_bucket_df=10, stats=stats)
    out.count()
    assert stats["dropped_buckets"] > 0
    assert stats["dropped_rows"] >= stats["dropped_buckets"]

    stats2: dict = {}
    few = spark.createDataFrame(
        [(i, f"document {i} entirely different words {i * 7}") for i in range(6)],
        "doc_id long, text string",
    )
    simhash_near_pairs(few, max_bucket_df=100, stats=stats2).count()
    assert stats2["dropped_buckets"] == 0
    assert stats2["dropped_rows"] == 0


# ----------------------------------------------------------- ingest GC sweep


def test_incremental_wcc_orphan_sweep(spark, tmp_path):
    """Version dirs orphaned by a crash in buckets no later batch
    touches are swept on sink start; live dirs and the manifest
    survive."""
    from neo4j_graph_algorithms_spark.streaming.ingest import IncrementalWCC

    state = str(tmp_path / "state")
    sink = IncrementalWCC(spark, state, n_buckets=8)
    batch = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (10, 11, 1.0)], "src long, dst long, weight double"
    )
    sink.process_batch(batch, batch_id=0)
    comp0 = {r["id"]: r["component"] for r in sink.components().collect()}

    # plant a crashed-attempt orphan in an existing bucket, an orphan
    # bucket dir the manifest has never heard of, and a stray staging dir
    manifest = sink._read_manifest()
    some_bucket = next(iter(manifest))
    orphan1 = os.path.join(sink.path, f"bucket={some_bucket}", "v9_deadbeef")
    os.makedirs(orphan1)
    orphan2 = os.path.join(sink.path, "bucket=7", "v3_cafecafe")
    os.makedirs(orphan2, exist_ok=True)
    staging = os.path.join(sink.path, "_staging_99")
    os.makedirs(staging)

    sink._sweep_orphans()
    assert not os.path.exists(orphan1)
    assert not os.path.exists(orphan2)
    assert not os.path.exists(staging)
    # committed state intact
    comp1 = {r["id"]: r["component"] for r in sink.components().collect()}
    assert comp1 == comp0


# -------------------------------------------------------- multilevel louvain


def _clique_edges(members):
    return [
        (a, b, 1.0) for i, a in enumerate(members) for b in members[i + 1:]
    ]


def test_louvain_multilevel_collapses_cliques(spark):
    """Two 4-cliques + bridge: the hierarchy must end at exactly the two
    cliques, every clique member sharing its clique-mates' label."""
    from neo4j_graph_algorithms_spark.operators.louvain import louvain_multilevel

    rows = _clique_edges([0, 1, 2, 3]) + _clique_edges([4, 5, 6, 7]) + [(3, 4, 1.0)]
    g = Graph.from_edges(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    )
    assign, stats = louvain_multilevel(g, levels=4)
    got = {r["id"]: r["community"] for r in assign.collect()}
    assert len(got) == 8
    assert len({got[i] for i in range(8)}) == 2
    assert {got[0], got[1], got[2], got[3]} == {got[0]}
    assert {got[4], got[5], got[6], got[7]} == {got[4]}
    assert got[0] != got[4]
    # the level sequence is non-increasing and actually contracted
    counts = stats["communityCountPerLevel"]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] == 2


def test_louvain_selfloops_ignored_when_absent(spark):
    """Self-loop accounting must not change results on loop-free graphs
    (the reference fixture shape): single-level result identical with a
    neutral self-loop added vs a heavier intra edge."""
    from neo4j_graph_algorithms_spark.operators.louvain import louvain

    rows = _clique_edges([0, 1, 2]) + _clique_edges([3, 4, 5]) + [(2, 3, 0.5)]
    g = Graph.from_edges(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    )
    comm, _ = louvain(g)
    got = {r["id"]: r["community"] for r in comm.collect()}
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


# ------------------------------------------------------------ triangles path


def test_triangles_broadcast_matches_shuffle(spark):
    """Broadcast-degree orientation must produce identical results to
    the shuffle-join orientation."""
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count

    import random

    rnd = random.Random(13)
    edges = {(rnd.randrange(30), rnd.randrange(30)) for _ in range(120)}
    rows = [(a, b, 1.0) for a, b in edges if a != b]
    g = Graph.from_edges(
        spark.createDataFrame(rows, "src long, dst long, weight double")
    )
    per_b, stats_b = triangle_count(g, broadcast_degrees=True)
    per_s, stats_s = triangle_count(g, broadcast_degrees=False)
    assert stats_b["triangleCount"] == stats_s["triangleCount"]
    a = {(r["id"], r["triangles"]) for r in per_b.collect()}
    b = {(r["id"], r["triangles"]) for r in per_s.collect()}
    assert a == b
