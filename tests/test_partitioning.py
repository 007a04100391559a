"""Degree-budget partitioner + high-degree splitting (plans/partitioning.py).

The reference balances superstep work by Σout-degree, not node count
(`impl/PageRank.java:281-309`); our partitioner additionally SPLITS a
source whose degree alone exceeds the budget — the anti-supernode
behavior the north rule requires."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.plans.partitioning import (
    degree_budget_partition,
    split_high_degree,
)


def _skewed_edges(spark):
    # hub node 0 with 60 out-edges + 20 normal nodes with 3 each
    hub = [(0, 100 + i, 1.0) for i in range(60)]
    normal = [(n, 200 + 3 * n + j, 1.0) for n in range(1, 21) for j in range(3)]
    return spark.createDataFrame(hub + normal, "src long, dst long, weight double")


def test_degree_budget_partition_splits_hubs(spark):
    edges = _skewed_edges(spark)  # 120 edges
    out = degree_budget_partition(edges, num_partitions=8).persist()
    assert out.count() == 120

    sizes = {r["part_id"]: r["n"] for r in
             out.groupBy("part_id").agg(F.count("*").alias("n")).collect()}
    # every partition holds ~budget edges (120/8 = 15): no partition is
    # dominated by the hub
    assert max(sizes.values()) <= 2 * 15
    # the hub's 60 edges span at least 60/15 = 4 part_ids (split!)
    hub_parts = out.filter(F.col("src") == 0).select("part_id").distinct().count()
    assert hub_parts >= 4
    # non-hub sources keep contiguous adjacency: ≤ 2 partitions each
    spread = (
        out.filter(F.col("src") != 0)
        .groupBy("src").agg(F.countDistinct("part_id").alias("p"))
        .agg(F.max("p")).collect()[0][0]
    )
    assert spread <= 2


def test_split_high_degree_replicas(spark):
    edges = _skewed_edges(spark)
    out = split_high_degree(edges, threshold=10, replicas=4).persist()
    # hub edges spread across 4 replica ids; normal sources stay at 0
    hub_replicas = out.filter(F.col("src") == 0).select("replica").distinct().count()
    assert hub_replicas == 4
    normal = out.filter(F.col("src") != 0).select("replica").distinct().collect()
    assert [r["replica"] for r in normal] == [0]
    # row count unchanged (replication is an annotation, not duplication)
    assert out.count() == 120
