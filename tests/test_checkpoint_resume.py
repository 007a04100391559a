"""Durable superstep checkpoints: per-partition lineage metrics in
meta.json, and bit-identical resume from the latest snapshot."""

import json
import os

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.graph import Graph
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 3)]


def _ranks_dict(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_durable_checkpoint_writes_partition_metrics(spark, tmp_path):
    ckpt = str(tmp_path / "ck")
    g = Graph.from_edge_list(spark, EDGES, n_nodes=5)
    _r, stats = pagerank(
        g, max_iterations=6, checkpoint_dir=ckpt, checkpoint_every=3, fuse=3
    )
    steps = sorted(d for d in os.listdir(ckpt) if d.startswith("step_"))
    assert steps, "no durable checkpoints written"
    last = steps[-1]
    meta = json.load(open(os.path.join(ckpt, last, "meta.json")))
    assert meta["superstep"] == 6
    # per-partition lineage metrics present with row counts + the
    # convergence column max (north rule: resumable runs carry
    # per-partition lineage + convergence metrics)
    assert meta["partitions"]
    assert all("rows" in p and "max_delta" in p for p in meta["partitions"])
    assert sum(p["rows"] for p in meta["partitions"]) == 5
    assert os.path.exists(os.path.join(ckpt, last, "_SUCCESS_META"))


def test_resume_matches_uninterrupted_run(spark, tmp_path):
    ckpt = str(tmp_path / "ck2")
    g = Graph.from_edge_list(spark, EDGES, n_nodes=5)

    full, _ = pagerank(g, max_iterations=10, fuse=5)
    expected = _ranks_dict(full)

    # interrupted run: stops at superstep 5 with a durable snapshot
    pagerank(g, max_iterations=5, checkpoint_dir=ckpt, checkpoint_every=5, fuse=5)
    # resumed run continues 6..10 from the snapshot
    resumed, stats = pagerank(
        g, max_iterations=10, checkpoint_dir=ckpt, checkpoint_every=5,
        fuse=5, resume=True,
    )
    got = _ranks_dict(resumed)
    assert stats["history"][0]["superstep"] == 6  # really resumed, not re-run
    for k, v in expected.items():
        assert abs(got[k] - v) < 1e-12, (k, got[k], v)
