"""Structured Streaming plane — continuous edge ingest + incremental
maintenance.

The reference has no streaming surface (its lifecycle is load→compute→
write, SURVEY.md §3); this module is the engine's forward-looking
ingest path for the 100 TB deployment: edges land as files (the
Iceberg-commit stand-in), a stream job maintains cheap incremental
state (degrees, component assignments) so the heavy kernels start from
warm state instead of cold scans.

Pieces:

- `stream_edges(spark, path)` — file-source `readStream` over the
  canonical (src, dst, weight) parquet layout.
- `streaming_degrees` — stateful `groupBy(src).count()` in update mode;
  Spark's incremental HashAggregate state store does the work.
- `streaming_event_counts` — watermarked tumbling-window aggregation
  over the events shape (ts, event_type, value): late rows beyond the
  watermark are dropped, window state is evicted — bounded state at
  unbounded input.
- `incremental_wcc_sink` — `foreachBatch` union-merge: each micro-batch
  merges new edges into a persisted component table by re-running the
  min-label fixpoint ONLY over components touched by the batch (the
  classic incremental-CC trick: a new edge merging components c1, c2
  relabels min(c1,c2) over the members of both — a join against the
  state table, not a full recompute).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src long, dst long, weight double"


def stream_edges(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return (
        spark.readStream.format(fmt)
        .schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(path)
    )


def streaming_degrees(edge_stream: DataFrame) -> DataFrame:
    """Continuously-maintained out-degrees (update output mode)."""
    return edge_stream.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )


def streaming_event_counts(
    event_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type."""
    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


class IncrementalWCC:
    """foreachBatch sink maintaining (id, component) across micro-batches.

    State lives in `state_dir` as parquet PARTITIONED BY a hash bucket
    of the node id (the Iceberg-table stand-in; Iceberg would make this
    a `bucket(id)` partition spec + MERGE). Per batch: load state,
    attach known components to the new edges' endpoints, run the
    min-label fixpoint over the UNION of new edges and one star edge
    per already-known member of a touched component — so compute scales
    with the affected region — and then rewrite ONLY the bucket
    partitions that contain relabeled rows (dynamic partition
    overwrite). Batch I/O is O(affected buckets), never the O(V)
    whole-table rewrite.
    """

    def __init__(self, spark: SparkSession, state_dir: str, n_buckets: int = 64):
        self.spark = spark
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        self.path = os.path.join(state_dir, "components")

    def _load_state(self) -> DataFrame | None:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return None

    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("id"), F.lit(self.n_buckets))
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..graph import Graph
        from ..operators.wcc import wcc

        state = self._load_state()
        new_edges = batch.select("src", "dst").distinct()
        if state is not None:
            # touched = components containing any endpoint of the batch
            endpoints = new_edges.select(F.col("src").alias("id")).unionByName(
                new_edges.select(F.col("dst").alias("id"))
            ).distinct()
            touched = state.join(endpoints, "id", "left_semi").select("component").distinct()
            members = state.join(touched, "component", "left_semi")
            # collapse each touched component to a star on its label so
            # the fixpoint only relabels, never re-walks old structure
            star = members.select(
                F.col("component").alias("src"), F.col("id").alias("dst")
            )
            work_edges = new_edges.unionByName(star)
        else:
            work_edges = new_edges

        g = Graph.from_edges(work_edges.withColumn("weight", F.lit(1.0)), weight="weight")
        comp, _ = wcc(g)
        # `comp` covers every row whose assignment may have changed (new
        # nodes + all members of touched components); rows in other
        # buckets are untouched by construction and never rewritten
        updated = self._bucketed(comp)
        if state is None:
            updated.write.mode("overwrite").partitionBy("bucket").parquet(self.path)
            return
        buckets = [r["bucket"] for r in updated.select("bucket").distinct().collect()]
        # rebuild only affected buckets: surviving old rows + updates;
        # the bucket filter prunes the state scan to those partitions
        keep = state.filter(F.col("bucket").isin(buckets)).join(
            updated.select("id"), "id", "left_anti"
        )
        replacement = keep.unionByName(updated).localCheckpoint(eager=True)
        prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic mode replaces ONLY the bucket= partitions present
            # in `replacement` (materialized above, so the concurrent
            # read-own-path hazard is gone)
            replacement.write.mode("overwrite").partitionBy("bucket").parquet(self.path)
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def start(self, edge_stream: DataFrame, checkpoint: str | None = None):
        q = (
            edge_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint or os.path.join(self.state_dir, "ckpt"))
            .trigger(availableNow=True)
        )
        return q.start()

    def components(self) -> DataFrame | None:
        state = self._load_state()
        return None if state is None else state.select("id", "component")
