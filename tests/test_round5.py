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


# ------------------------------------------------ anti-skew auto caps


def test_node_similarity_auto_cap_engages_on_hub(spark):
    """A shared neighbor with in-degree > AUTO_CAP_FLOOR is dropped by
    the DEFAULT config (VERDICT r4 "What's wrong" #2a): the hub's
    O(in_deg²) pair fan-out never materializes, the dropped-hub count
    is surfaced, and the answer equals the explicit-cap answer."""
    from neo4j_graph_algorithms_spark.operators.node_similarity import (
        AUTO_CAP_FLOOR,
        node_similarity,
    )

    n = AUTO_CAP_FLOOR + 100
    hub = 10_000_000
    # n spokes all point at the hub; spokes 0..3 also share private
    # neighbor 20M (+ spoke parity neighbor) so real pairs survive
    rows = [(s, hub) for s in range(n)]
    rows += [(s, 20_000_000) for s in range(4)]
    rows += [(s, 20_000_001 + (s % 2)) for s in range(4)]
    g = _graph(spark, rows)

    auto_out, st = node_similarity(g, threshold=0.01, return_stats=True)
    assert st["cap"] == AUTO_CAP_FLOOR
    assert st["dropped_hubs"] == 1
    assert st["dropped_edges"] == n
    explicit = node_similarity(g, threshold=0.01, max_common_degree=AUTO_CAP_FLOOR)
    assert sorted(auto_out.collect()) == sorted(explicit.collect())
    # bounded fan-out: only the 4 private-neighbor spokes can pair up
    assert auto_out.count() <= 6
    got = {(r.id_a, r.id_b) for r in auto_out.collect()}
    assert all(a < 4 and b < 4 for a, b in got)


def test_node_similarity_auto_is_exact_without_hubs(spark):
    """Hub-free graph: auto must NOT engage (cap None in stats-free
    path ≡ exact uncapped answer)."""
    from neo4j_graph_algorithms_spark.operators.node_similarity import (
        node_similarity,
    )

    rows = [(i, 100 + (i % 5)) for i in range(30)] + [(i, 200 + (i % 3)) for i in range(30)]
    g = _graph(spark, rows)
    auto_out, st = node_similarity(g, threshold=0.2, return_stats=True)
    assert st["cap"] is None and st["dropped_hubs"] == 0
    exact = node_similarity(g, threshold=0.2, max_common_degree=None)
    assert sorted(auto_out.collect()) == sorted(exact.collect())


def test_auto_salt_buckets_derivation():
    """Pure derivation: 1 whenever the worst group fits the buffer
    budget; ceil-scaled and capped past it."""
    from neo4j_graph_algorithms_spark.operators.neighborhood import (
        _SALT_MAX,
        _auto_salt_buckets,
    )

    assert _auto_salt_buckets(0, 1024) == 1
    assert _auto_salt_buckets(8192, 1024) == 1  # exactly the budget
    assert _auto_salt_buckets(8193, 1024) == 2
    assert _auto_salt_buckets(100_000, 1024) == 13
    assert _auto_salt_buckets(10**9, 1024) == _SALT_MAX
    # smaller sketches => bigger groups allowed
    assert _auto_salt_buckets(100_000, 64) == 1


def test_neighborhood_auto_salt_matches_forced_salt(spark):
    """salt="auto" (1 on this small graph) ≡ a forced 4-bucket
    two-phase merge — elementwise max is associative/commutative, so
    the estimates are bit-identical; the chosen count is surfaced."""
    from neo4j_graph_algorithms_spark.operators.neighborhood import (
        neighborhood_function,
    )

    rows = [(i, (i + 1) % 12) for i in range(12)] + [(i, (i + 5) % 12) for i in range(12)]
    g = _graph(spark, rows)
    a, st_a = neighborhood_function(g, max_depth=3, p=6)
    b, st_b = neighborhood_function(g, max_depth=3, p=6, salt_buckets=4)
    assert st_a["salt_buckets"] == 1 and st_b["salt_buckets"] == 4
    assert sorted(a.collect()) == sorted(b.collect())


# ------------------------------------------ new pipeline ops (round 5)


def test_tfidf_keywords_hand_fixture(spark):
    """3 docs, hand-computed rational tf-idf: 'cat' is doc-0's top term
    (tf 2, df 1 → 2·4/2 = 4.0), the everywhere-term 'the' scores 1·4/4."""
    from neo4j_graph_algorithms_spark.pipeline.text import tfidf_keywords

    docs = spark.createDataFrame(
        [(0, "cat cat the dog"), (1, "the dog runs"), (2, "the fish")],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2)
    rows = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.score) for r in out.collect()}
    assert rows[(0, 1)] == ("cat", 2, 1, 4.0)
    # doc 0 rank 2: 'dog' tf1 df2 → 4/3 beats 'the' tf1 df3 → 1.0
    assert rows[(0, 2)][0] == "dog" and abs(rows[(0, 2)][3] - 4 / 3) < 1e-12
    assert rows[(2, 1)] == ("fish", 1, 1, 2.0)
    assert out.filter(F.col("rank") > 2).count() == 0


def test_repeated_ngrams_hand_fixture(spark):
    """df counts DISTINCT docs; within-doc repeats collapse; short docs
    yield no grams."""
    from neo4j_graph_algorithms_spark.pipeline.text import repeated_ngrams

    docs = spark.createDataFrame(
        [
            (0, "a b c a b c"),   # contains 'a b c' twice -> counted once
            (1, "x a b c y"),
            (2, "a b"),           # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    out = {r.ngram: r.df for r in repeated_ngrams(docs, n=3, min_df=2).collect()}
    assert out == {"a b c": 2}


def test_sessionize_hand_fixture(spark):
    """Gap splits, tie-broken deterministically; session ids dense per
    user; aggregates exact."""
    from datetime import datetime

    from neo4j_graph_algorithms_spark.pipeline.sessionize import sessionize

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        (1, 10, t(0), 1.0),
        (2, 10, t(5), 2.0),    # +5min  -> same session
        (3, 10, t(50), 4.0),   # +45min -> new session (gap 30)
        (4, 20, t(0), 8.0),
        (5, 20, t(31), 16.0),  # +31min -> new session
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double"
    )
    out = {
        (r.user_id, r.session_id): (r.n_events, r.sum_value)
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert out == {
        (10, 1): (2, 3.0),
        (10, 2): (1, 4.0),
        (20, 1): (1, 8.0),
        (20, 2): (1, 16.0),
    }


# ----------------------------------------------- wcc pointer-jump knob


def test_wcc_pointer_jump_modes_identical_components(spark):
    """The min-label fixpoint is jump-agnostic: True / 'auto' / False
    all converge to the identical component assignment (jumping only
    changes ROUND COUNT — asserted: no-jump takes strictly more rounds
    on a path, where chain compression is the whole game)."""
    from neo4j_graph_algorithms_spark.operators.wcc import wcc

    rows = [(i, i + 1) for i in range(40)]  # diameter-40 path
    rows += [(100, 101), (101, 102), (102, 100)]  # separate triangle
    g = _graph(spark, rows)
    results = {}
    rounds = {}
    for mode in (True, "auto", False):
        comp, st = wcc(g, max_iterations=100, pointer_jump=mode)
        results[str(mode)] = sorted((r.id, r.component) for r in comp.collect())
        rounds[str(mode)] = st["iterations"]
    assert results["True"] == results["auto"] == results["False"]
    assert rounds["False"] > rounds["True"]


# --------------------------------------------- checkpoint-resume (r4 kernels)


def test_kcore_resume_matches_uninterrupted(spark, tmp_path):
    """Kill a deep h-index run mid-way; the resumed run must produce
    the uninterrupted core numbers (the snapshot's _chg column restores
    the exact change frontier)."""
    from neo4j_graph_algorithms_spark.operators.kcore import core_decomposition

    n = 20
    rows = [(i, i + 1) for i in range(n - 1)]
    clique = [100, 101, 102, 0]
    rows += [(a, b) for a in clique for b in clique if a < b]
    g = _graph(spark, rows)

    full, full_stats = core_decomposition(g)
    expected = {r.id: r.core for r in full.collect()}
    assert full_stats["rounds"] >= 6  # deep enough to interrupt

    ck = str(tmp_path / "kcore_ck")
    core_decomposition(g, max_iterations=4, checkpoint_dir=ck, checkpoint_every=4)
    resumed, stats = core_decomposition(
        g, checkpoint_dir=ck, checkpoint_every=4, resume=True
    )
    assert stats["history"][0]["round"] == 5  # really resumed
    got = {r.id: r.core for r in resumed.collect()}
    assert got == expected


def test_neighborhood_resume_matches_uninterrupted(spark, tmp_path):
    """HyperANF resumed from a mid-depth snapshot: identical N(t) series
    (sketches are deterministic, _changed restores the frontier, and the
    running history rides in meta.json)."""
    from neo4j_graph_algorithms_spark.operators.neighborhood import (
        neighborhood_function,
    )

    rows = [(i, i + 1) for i in range(15)] + [(i, (i + 4) % 15) for i in range(15)]
    g = _graph(spark, rows)
    full, _ = neighborhood_function(g, max_depth=6, p=6)
    expected = sorted(full.collect())

    ck = str(tmp_path / "anf_ck")
    neighborhood_function(g, max_depth=3, p=6, checkpoint_dir=ck, checkpoint_every=3)
    resumed, stats = neighborhood_function(
        g, max_depth=6, p=6, checkpoint_dir=ck, checkpoint_every=3, resume=True
    )
    assert stats["history"][0]["depth"] == 1  # restored history intact
    assert stats["history"][3]["depth"] == 4  # and continued from 4
    got = sorted(resumed.collect())
    assert [r.depth for r in got] == [r.depth for r in expected]
    for a, b in zip(got, expected):
        # the SKETCH state round-trips exactly; the per-depth float SUM
        # may differ in the last ulp (parquet re-read changes the
        # summation order), so compare to relative 1e-12
        assert a.n_pairs_est == pytest.approx(b.n_pairs_est, rel=1e-12)


def test_random_walk_resume_matches_uninterrupted(spark, tmp_path):
    """Walks resumed from the durable prefix continue the IDENTICAL
    trajectories (pure-hash next-hop), so resumed == uninterrupted."""
    from neo4j_graph_algorithms_spark.operators.random_walk import random_walks

    rows = [(i, (i * 3 + 1) % 30) for i in range(30)] + [
        (i, (i * 7 + 2) % 30) for i in range(30)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    g = _graph(spark, rows)
    full, _ = random_walks(g, walk_length=8, walks_per_node=2, seed=11)
    expected = sorted(full.collect())

    ck = str(tmp_path / "walk_ck")
    random_walks(
        g, walk_length=4, walks_per_node=2, seed=11,
        checkpoint_dir=ck, checkpoint_every=4,
    )
    resumed, stats = random_walks(
        g, walk_length=8, walks_per_node=2, seed=11,
        checkpoint_dir=ck, checkpoint_every=4, resume=True,
    )
    assert stats["steps_run"] == 8
    assert sorted(resumed.collect()) == expected


# ------------------------------------------------------ adaptive delta


def test_delta_stepping_auto_delta_matches_fixed(spark):
    """Δ only affects scheduling, never the fixpoint: auto-derived Δ
    answers identical to explicit Δ on a weighted fixture."""
    from neo4j_graph_algorithms_spark.operators.shortest_path import delta_stepping

    rows = [
        (i, j, float((i * 7 + j * 3) % 9 + 1))
        for i in range(16)
        for j in ((i + 1) % 16, (i + 5) % 16)
    ]
    g = _graph(spark, rows, weighted=True)
    auto, st = delta_stepping(g, source=0)
    fixed, _ = delta_stepping(g, source=0, delta=2.0)
    assert st["delta"] > 0 and st["buckets"] >= 1
    a = {r.id: r.distance for r in auto.collect()}
    b = {r.id: r.distance for r in fixed.collect()}
    assert a == b


def test_delta_stepping_auto_bounds_bands_on_wide_weights(spark):
    """Wide-range weights (mean 1, max 8192): a mean-anchored Δ
    processes hundreds of near-empty bands; the auto Δ's w_max/128
    floor must cut the bucket count while keeping identical answers."""
    from neo4j_graph_algorithms_spark.operators.shortest_path import delta_stepping

    # a path of unit edges, plus one heavy shortcut forcing a huge
    # distance range
    rows = [(i, i + 1, 1.0) for i in range(20)]
    rows += [(0, 100, 8192.0), (100, 101, 1.0)]
    g = _graph(spark, rows, weighted=True)
    naive, st_naive = delta_stepping(g, source=0, delta=1.0)
    auto, st_auto = delta_stepping(g, source=0)
    assert st_auto["delta"] >= 8192.0 / 128.0
    assert st_auto["buckets"] < st_naive["buckets"] / 4
    a = {r.id: r.distance for r in auto.collect()}
    b = {r.id: r.distance for r in naive.collect()}
    assert a == b


# ------------------------------------------- multilevel contraction


def _clique(ids, w=1.0):
    return [(a, b, w) for a in ids for b in ids if a < b]


def test_contract_graph_preserves_m2_on_reciprocal_edges(spark):
    """ADVICE r4: contraction must aggregate the EFFECTIVE graph the
    level optimized (max-deduped symmetric mass + self-loops), so m2 is
    invariant level-over-level even with reciprocal duplicate edges —
    summing raw directed rows would carry w1+w2 where the level scored
    max(w1, w2)."""
    from neo4j_graph_algorithms_spark.operators.louvain import (
        contract_graph,
        level_m2,
    )

    rows = _clique([0, 1, 2]) + _clique([3, 4, 5]) + [(2, 3, 0.5)]
    # reciprocal duplicates with asymmetric weights inside community 0
    rows += [(1, 0, 4.0), (2, 1, 2.0)]
    # and a pre-existing self-loop
    rows += [(4, 4, 1.5)]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    comm = spark.createDataFrame(
        [(i, 0 if i < 3 else 3) for i in range(6)], "id long, community long"
    )
    contracted = contract_graph(edges, comm)
    assert abs(level_m2(edges) - level_m2(contracted)) < 1e-9
    got = {(r.src, r.dst): r.weight for r in contracted.collect()}
    # effective intra mass of {0,1,2}: max(1,4)+max(1,2)+1 = 7 → self 7
    assert abs(got[(0, 0)] - 7.0) < 1e-9
    # {3,4,5}: 3 unit edges + member self-loop 1.5 → 4.5
    assert abs(got[(3, 3)] - 4.5) < 1e-9
    assert abs(got[(0, 3)] - 0.5) < 1e-9


def test_louvain_multilevel_collapses_cliques_reciprocal(spark):
    """The clique-collapse semantics hold when clique edges appear in
    BOTH directions with unequal weights (the case the old raw-sum
    contraction mis-weighted)."""
    from neo4j_graph_algorithms_spark.operators.louvain import louvain_multilevel

    rows = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4, 1.0)]
    # reciprocal duplicates: every clique edge also reversed at weight 3
    rows += [(b, a, 3.0) for a, b, _ in _clique([0, 1, 2, 3])]
    rows += [(b, a, 3.0) for a, b, _ in _clique([4, 5, 6, 7])]
    g = _graph(spark, rows, weighted=True)
    assign, stats = louvain_multilevel(g, levels=4)
    got = {r["id"]: r["community"] for r in assign.collect()}
    assert len({got[i] for i in range(8)}) == 2
    assert {got[0], got[1], got[2], got[3]} == {got[0]}
    assert {got[4], got[5], got[6], got[7]} == {got[4]}
    assert got[0] != got[4]
    assert stats["communityCountPerLevel"][-1] == 2


# -------------------------------------------- k-core structural prune


def test_kcore_structural_frontier_shrinks_and_exact(spark):
    """Deep fixture (VERDICT r4 #3): a 24-node path peels one node per
    round from each end under the h-index fixpoint (~11 rounds), so the
    affected-neighborhood frame must SHRINK to a handful of edges in
    late rounds — structurally, not by optimizer grace — while the
    answer stays the exact peeling core numbers."""
    from neo4j_graph_algorithms_spark.operators.kcore import (
        core_decomposition,
        peel_core_numbers,
    )

    n = 24
    rows = [(i, i + 1) for i in range(n - 1)]
    # a 4-clique glued at node 0 keeps a second core level in play
    clique = [100, 101, 102, 0]
    rows += [(a, b) for a in clique for b in clique if a < b]
    g = _graph(spark, rows)
    cores, stats = core_decomposition(g, track_affected=True)
    got = {r.id: r.core for r in cores.collect()}
    want = peel_core_numbers(rows)
    for node, c in want.items():
        assert got[node] == c, (node, got[node], c)
    aff = [h["affected_edges"] for h in stats["history"] if "affected_edges" in h]
    assert len(aff) >= 5  # genuinely deep run
    n_edges_sym = 2 * len(rows)
    # late rounds touch a small fraction of the adjacency
    assert aff[-1] <= 8
    assert aff[-1] < n_edges_sym / 4
    # and the series is (weakly) shrinking from its early peak
    assert max(aff[-3:]) <= max(aff[:3])


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
