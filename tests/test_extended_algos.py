"""Phase-4 kernels vs reference fixtures (file:line cites per test)."""

import math

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.operators.betweenness import betweenness
from neo4j_graph_algorithms_spark.operators.louvain import louvain
from neo4j_graph_algorithms_spark.operators.msbfs import (
    all_shortest_paths,
    closeness,
    harmonic,
)
from neo4j_graph_algorithms_spark.operators.mst import mst
from neo4j_graph_algorithms_spark.operators.scc import scc
from neo4j_graph_algorithms_spark.operators.shortest_path import (
    delta_stepping,
    shortest_path,
    shortest_paths,
)
from neo4j_graph_algorithms_spark import runner


def _vals(df, key="id", val=None):
    rows = df.collect()
    if val is None:
        val = [c for c in df.columns if c != key][0]
    return {r[key]: r[val] for r in rows}


def test_closeness_path_fixture(spark):
    # ClosenessCentralityTest.java:90-103,73: undirected 5-path
    # a-b-c-d-e → (n-1)/farness = [0.4, 0.57, 0.66, 0.57, 0.4]
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    g = Graph.from_edge_list(spark, edges, n_nodes=5)
    result, _ = closeness(g, direction="out")
    got = _vals(result)
    expected = {0: 0.4, 1: 0.571, 2: 0.667, 3: 0.571, 4: 0.4}
    for k, v in expected.items():
        assert math.isclose(got[k], v, abs_tol=0.1), (k, got[k], v)


def test_harmonic_fixture(spark):
    # HarmonicCentralityTest.java:94-131: a→b→c, d→e (BOTH traversal)
    # → [0.375, 0.5, 0.375, 0.25, 0.25]
    edges = [(0, 1), (1, 2), (3, 4)]
    g = Graph.from_edge_list(spark, edges, n_nodes=5)
    result, _ = harmonic(g, direction="both")
    got = _vals(result)
    expected = {0: 0.375, 1: 0.5, 2: 0.375, 3: 0.25, 4: 0.25}
    for k, v in expected.items():
        assert math.isclose(got[k], v, abs_tol=0.1), (k, got[k], v)


def test_betweenness_path_fixture(spark):
    # BetweennessCentralityTest.java:57-66,159-163: a→b→c→d→e
    # → [0, 3, 4, 3, 0]
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, n_nodes=5)
    result, _ = betweenness(g)
    got = _vals(result, val="centrality")
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


def test_scc_three_cycles_fixture(spark):
    # SCCTest.java:60-157: cycles a-b-c, d-e-f, g-h-i; bridge a→d;
    # x isolated → partitions {0,1,2} {3,4,5} {6,7,8} {9}
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 3),
             (6, 7), (7, 8), (8, 6)]
    g = Graph.from_edge_list(spark, edges, n_nodes=10)
    result, _ = scc(g)
    got = _vals(result, val="component")
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[6] == got[7] == got[8]
    comps = {got[0], got[3], got[6], got[9]}
    assert len(comps) == 4


def test_shortest_path_dijkstra_fixture(spark):
    # ShortestPathDijkstraTest.java:54-69,129-149: a..f with costs;
    # a→f = [a, c, e, d, f], total 20
    edges = [(0, 1, 4.0), (0, 2, 2.0), (1, 2, 5.0), (1, 3, 10.0),
             (2, 4, 3.0), (3, 5, 11.0), (4, 3, 4.0)]
    g = Graph.from_edge_list(spark, edges, n_nodes=6)
    path, cost, _ = shortest_path(g, 0, 5)
    assert path == [0, 2, 4, 3, 5]
    assert math.isclose(cost, 20.0, abs_tol=0.01)


def test_shortest_paths_distances(spark):
    edges = [(0, 1, 4.0), (0, 2, 2.0), (1, 2, 5.0), (1, 3, 10.0),
             (2, 4, 3.0), (3, 5, 11.0), (4, 3, 4.0)]
    g = Graph.from_edge_list(spark, edges, n_nodes=6)
    dist, _ = shortest_paths(g, 0)
    got = _vals(dist, val="distance")
    assert got == {0: 0.0, 1: 4.0, 2: 2.0, 3: 9.0, 4: 5.0, 5: 20.0}


def test_delta_stepping_fixture(spark):
    # ShortestPathDeltaSteppingTest.java:44-95: s→x = 8 over the
    # 3-lane braid; ids in creation order s,a..i,x = 0..10
    edges = [(0, 1, 5.0), (1, 2, 5.0), (2, 3, 5.0), (3, 10, 5.0),
             (1, 7, 2.0), (2, 8, 2.0), (3, 9, 2.0),
             (0, 4, 3.0), (4, 5, 3.0), (5, 6, 3.0), (6, 10, 3.0),
             (4, 7, 3.0), (5, 8, 3.0), (6, 9, 3.0),
             (0, 7, 2.0), (7, 8, 2.0), (8, 9, 2.0), (9, 10, 2.0),
             (10, 0, 2.0)]
    g = Graph.from_edge_list(spark, edges, n_nodes=11)
    dist, _ = delta_stepping(g, 0, delta=3.0)
    got = _vals(dist, val="distance")
    assert math.isclose(got[10], 8.0, abs_tol=0.01)


def test_mst_prim_fixture(spark):
    # MSTPrimTest.java:39-50,128-133: a-b:1 a-c:2 b-c:3 b-d:4 c-e:5
    # d-e:6 → tree {ab, ac, bd, ce}, weight sum 12
    edges = [(0, 1, 1.0), (0, 2, 2.0), (1, 2, 3.0), (1, 3, 4.0),
             (2, 4, 5.0), (3, 4, 6.0)]
    g = Graph.from_edge_list(spark, edges, n_nodes=5)
    tree, stats = mst(g, start_node=0)
    got = {(r["src"], r["dst"]) for r in tree.collect()}
    assert got == {(0, 1), (0, 2), (1, 3), (2, 4)}
    assert math.isclose(stats["weightSum"], 12.0, abs_tol=0.01)


def test_louvain_two_cliques_fixture(spark):
    # LouvainTest.java:60-86,215-226: 4-cliques {a,b,c,d} {e,f,g,h} +
    # weighted bridge e→b(5), z isolated. Unweighted asserts:
    # {a,c,d} union, {f,g,h} union, {a,f,z} disjoint.
    clique1 = [(0, 1), (0, 2), (0, 3), (2, 3), (2, 1), (1, 3)]
    clique2 = [(4, 5), (4, 6), (4, 7), (5, 7), (5, 6), (6, 7)]
    bridge = [(4, 1)]
    g = Graph.from_edge_list(spark, clique1 + clique2 + bridge, n_nodes=9)
    comm, stats = louvain(g, iterations=10)
    got = _vals(comm, val="community")
    assert got[0] == got[2] == got[3]
    assert got[5] == got[6] == got[7]
    assert len({got[0], got[5], got[8]}) == 3


def test_all_shortest_paths_stream(spark):
    # MSBFSAllShortestPaths semantics on a 3-path: exact depth rows
    edges = [(0, 1), (1, 2)]
    g = Graph.from_edge_list(spark, edges, n_nodes=3)
    rows = {(r["source"], r["target"], r["depth"])
            for r in all_shortest_paths(g, direction="out").collect()}
    assert rows == {(0, 1, 1), (0, 2, 2), (1, 2, 1)}


def test_registry_and_runner(spark, tmp_path):
    # ListProc.java:32-59 analogue + write-mode sink
    names = {p["name"] for p in runner.list_procedures()}
    assert {"algo.pageRank", "algo.unionFind", "algo.louvain",
            "algo.mst", "algo.scc", "algo.betweenness"} <= names
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], n_nodes=3)
    df, stats = runner.run(
        "algo.pageRank", g, mode="write",
        write_path=str(tmp_path / "pr"), max_iterations=5,
    )
    assert stats["writeMillis"] >= 0
    assert spark.read.parquet(str(tmp_path / "pr")).count() == 3


def test_scalar_functions(spark):
    from neo4j_graph_algorithms_spark.functions.scalars import is_finite, is_infinite

    df = spark.createDataFrame(
        [(1.0,), (float("inf"),), (float("nan"),), (None,)], "x double"
    ).select(
        is_finite("x").alias("fin"), is_infinite("x").alias("inf")
    )
    rows = [(r["fin"], r["inf"]) for r in df.collect()]
    assert rows == [(True, False), (False, True), (False, False), (False, False)]
