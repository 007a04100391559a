"""Label propagation vs reference fixtures
(LabelPropagationProcIntegrationTest.java:49-174,
LabelPropagation420Test.java:84-178)."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark import fixtures as FX
from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.operators.label_propagation import label_propagation


def _seeded_graph(spark, with_partition=True):
    e = spark.createDataFrame(FX.LPA_EDGES, "src long, dst long, weight double")
    if with_partition:
        n = spark.createDataFrame(FX.LPA_NODES, "id long, partition long")
    else:
        n = spark.createDataFrame([(i,) for i, _ in FX.LPA_NODES], "id long")
    return Graph.from_edges(e, nodes=n, weight="weight")


def test_lpa_seeded_one_iteration(spark):
    """Weight 8 beats 1+2+1+1=5: nodes 0 and 1 adopt partition 2
    (:117-137)."""
    labels, stats = label_propagation(_seeded_graph(spark), iterations=1)
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == 2
    assert got[1] == 2
    # leaf nodes (no out-edges) keep their seeds
    for i in (2, 4, 5, 7, 9, 10):
        assert got[i] == 1
    assert got[6] == 2 and got[11] == 2
    assert stats["ranIterations"] == 1


def test_lpa_default_seed_is_node_id(spark):
    """Missing partition property -> initial label = node id; after one
    OUT round a adopts 6's id... ref asserts a->6, b->11 (:140-151)."""
    labels, _ = label_propagation(
        _seeded_graph(spark, with_partition=False), iterations=1
    )
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == 6
    assert got[1] == 11


def test_lpa_incoming_direction(spark):
    """INCOMING: followers gather the seed node's label — nodes 2..6
    adopt 42 (:167-174)."""
    labels, _ = label_propagation(_seeded_graph(spark), iterations=1, direction="in")
    got = {r["id"]: r["label"] for r in labels.collect()}
    for i in (2, 3, 4, 5, 6):
        assert got[i] == 42


def test_lpa_420_convergence_partition(spark):
    """Converged communities {0,1,5} and {2,3,4}
    (LabelPropagation420Test.java:142-178 — oscillation-tolerant,
    asserts the final partition). Note the reference loads
    `withNodeProperty("partition", 0.0)` with no such property in the
    fixture, so seeds are node ids (:196-202), direction OUTGOING
    (:146); its `label:2..4` node properties are unused."""
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in FX.LPA420_EDGES], "src long, dst long, weight double"
    )
    n = spark.createDataFrame([(i,) for i, _ in FX.LPA420_NODES], "id long")
    g = Graph.from_edges(e, nodes=n, weight="weight")
    labels, stats = label_propagation(g, iterations=10, direction="out")
    got = {r["id"]: r["label"] for r in labels.collect()}
    groups = {}
    for i, lab in got.items():
        groups.setdefault(lab, set()).add(i)
    assert {frozenset(v) for v in groups.values()} == {
        frozenset({0, 1, 5}),
        frozenset({2, 3, 4}),
    }


def test_lpa_converges_and_reports(spark):
    e = spark.createDataFrame([(0, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double")
    g = Graph.from_edges(e, weight="weight")
    labels, stats = label_propagation(g, iterations=20)
    assert stats["didConverge"]
    assert stats["ranIterations"] < 20
    got = {r["id"]: r["label"] for r in labels.collect()}
    assert got[0] == got[1]
