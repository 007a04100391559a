"""Structured Streaming plane: file-source ingest, stateful degree agg,
watermarked windows, incremental WCC across micro-batches."""

import os

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.streaming.ingest import (
    EDGE_SCHEMA,
    IncrementalWCC,
    stream_edges,
    streaming_degrees,
    streaming_event_counts,
)


def _write_edges(spark, path, rows):
    spark.createDataFrame(rows, EDGE_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_degrees_and_windows(spark, tmp_path):
    src_dir = str(tmp_path / "edges")
    _write_edges(spark, src_dir, [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)])

    stream = stream_edges(spark, src_dir)
    assert stream.isStreaming
    deg = streaming_degrees(stream)
    q = (
        deg.writeStream.format("memory")
        .queryName("deg_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["out_degree"] for r in spark.sql("select * from deg_t").collect()}
    assert got == {0: 2, 1: 1}

    # watermarked tumbling window over an events-shaped stream
    ev_dir = str(tmp_path / "events")
    spark.createDataFrame(
        [
            ("2026-01-01 10:05:00", "click", 1.0),
            ("2026-01-01 10:45:00", "click", 2.0),
            ("2026-01-01 11:05:00", "view", 3.0),
        ],
        "ts_s string, event_type string, value double",
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value") \
        .coalesce(1).write.mode("append").parquet(ev_dir)
    ev_stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(ev_dir)
    )
    win = streaming_event_counts(ev_stream, window="1 hour", watermark="2 hours")
    q2 = (
        win.writeStream.format("memory")
        .queryName("win_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_t").collect()
    }
    assert rows[("2026-01-01 10:00:00", "click")] == (2, 3.0)
    assert rows[("2026-01-01 11:00:00", "view")] == (1, 3.0)


def test_incremental_wcc_micro_batches(spark, tmp_path):
    src_dir = str(tmp_path / "inc_edges")
    state_dir = str(tmp_path / "wcc_state")

    sink = IncrementalWCC(spark, state_dir)

    # batch 1: two separate components {0,1} {2,3}
    _write_edges(spark, src_dir, [(0, 1, 1.0), (2, 3, 1.0)])
    q = sink.start(stream_edges(spark, src_dir))
    q.awaitTermination(180)
    got = {r["id"]: r["component"] for r in sink.components().collect()}
    assert got[0] == got[1] and got[2] == got[3] and got[0] != got[2]

    # batch 2: bridge 1-2 merges them; 5-6 appears as a new component
    _write_edges(spark, src_dir, [(1, 2, 1.0), (5, 6, 1.0)])
    q = sink.start(stream_edges(spark, src_dir))
    q.awaitTermination(180)
    got = {r["id"]: r["component"] for r in sink.components().collect()}
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[5] == got[6] and got[5] != got[0]
