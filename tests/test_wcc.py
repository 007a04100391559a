"""unionFind/WCC vs reference fixtures
(UnionFindProcIntegrationTest.java:54-171, UnionFindsTest.java:54-156)."""

from __future__ import annotations

from neo4j_graph_algorithms_spark import fixtures as FX
from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.operators.wcc import component_stats, wcc


def _partition(components):
    """component label -> frozenset of member ids."""
    groups = {}
    for r in components.collect():
        groups.setdefault(r["component"], set()).add(r["id"])
    return {k: frozenset(v) for k, v in groups.items()}


def _uf_graph(spark):
    ids = {n: i for i, n in enumerate(FX.UNIONFIND_NODES)}
    return Graph.from_edge_list(
        spark,
        FX.name_edges_to_ids(FX.UNIONFIND_EDGES, ids=ids),
        n_nodes=len(FX.UNIONFIND_NODES),
    )


def test_unionfind_plain(spark):
    comp, stats = wcc(_uf_graph(spark))
    assert stats["didConverge"]
    n_sets, sizes = component_stats(comp)
    assert n_sets == 3
    assert sorted(r["size"] for r in sizes.collect()) == [1, 2, 7]
    # components are exactly {A..G}, {H,I}, {J}; representative = min id
    parts = _partition(comp)
    assert frozenset(range(7)) in parts.values()
    assert frozenset({7, 8}) in parts.values()
    assert frozenset({9}) in parts.values()
    assert set(parts.keys()) == {0, 7, 9}


def test_unionfind_threshold_drops_edge(spark):
    # threshold 5.0: D->E (4.2) dropped => sizes {4,3,2,1}
    comp, _ = wcc(_uf_graph(spark), threshold=5.0)
    _, sizes = component_stats(comp)
    assert sorted(r["size"] for r in sizes.collect()) == [1, 2, 3, 4]


def test_unionfind_threshold_keeps_edge(spark):
    # threshold 3.14: D->E kept => sizes {7,2,1}
    comp, _ = wcc(_uf_graph(spark), threshold=3.14)
    _, sizes = component_stats(comp)
    assert sorted(r["size"] for r in sizes.collect()) == [1, 2, 7]


def test_unionfind_sixteen_lines(spark):
    """16 disjoint 10-node chains — partition consistency
    (UnionFindsTest.java:130-156)."""
    g = Graph.from_edge_list(spark, FX.UNIONFIND_LINES_EDGES, n_nodes=160)
    comp, stats = wcc(g)
    n_sets, _ = component_stats(comp)
    assert n_sets == 16
    parts = _partition(comp)
    for k in range(16):
        assert frozenset(range(10 * k, 10 * k + 10)) in parts.values()
    # pointer jumping: a 10-node chain must converge well under 10 rounds
    assert stats["iterations"] <= 6


def test_wcc_isolated_nodes_and_self_loops(spark):
    g = Graph.from_edge_list(spark, [(0, 0), (1, 2)], n_nodes=4)
    comp, _ = wcc(g)
    parts = _partition(comp)
    assert frozenset({0}) in parts.values()
    assert frozenset({1, 2}) in parts.values()
    assert frozenset({3}) in parts.values()
