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

    State lives in `state_dir/components` as VERSIONED parquet bucket
    files plus a MANIFEST — a miniature of Iceberg's snapshot commit
    (which is what the 100 TB deployment would use: `bucket(id)`
    partition spec + MERGE, one atomic snapshot swap per batch):

    - data: ``bucket={b}/v{batch_id}/part-*.parquet`` — each batch
      writes NEW files for the buckets it touches, never in place;
    - commit: ``manifest.json`` maps every bucket to its current
      version directory and is replaced atomically (``os.replace``).

    A reader (or a replay after a crash) therefore always sees one
    consistent snapshot: a failure anywhere before the manifest swap
    leaves the previous snapshot fully intact — the earlier
    dynamic-partition-overwrite scheme could die mid-write and leave a
    mix of old and new buckets, after which touched-component detection
    read half-relabeled rows and stranded the rest of the component.

    Per batch: attach known components to the new edges' endpoints, run
    the min-label fixpoint over the UNION of new edges and one star
    edge per member of a touched component — compute scales with the
    affected region — and rewrite only the touched buckets' files.
    Batch I/O is O(affected buckets), never an O(V) whole-table
    rewrite; unaffected buckets keep their existing files byte-for-byte
    (the manifest entry simply carries over).
    """

    def __init__(self, spark: SparkSession, state_dir: str, n_buckets: int = 64):
        self.spark = spark
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        self.path = os.path.join(state_dir, "components")
        self.manifest_path = os.path.join(self.path, "manifest.json")

    # -------------------------------------------------- snapshot plumbing

    def _read_manifest(self) -> dict[str, str] | None:
        """bucket(str) → current version dir, relative to self.path."""
        import json

        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as fh:
            return json.load(fh)["buckets"]

    def _commit_manifest(self, buckets: dict[str, str]) -> None:
        import json

        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"buckets": buckets, "n_buckets": self.n_buckets}, fh)
            # fsync BEFORE the rename: os.replace alone is atomic against
            # process crashes but not power loss — without the flush+fsync
            # the journal can replay the rename before the data blocks,
            # landing a torn/empty manifest as the "committed" snapshot
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.manifest_path)  # the atomic commit point
        # fsync the parent directory so the rename itself is durable
        dfd = os.open(os.path.dirname(self.manifest_path), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _load_state(self) -> DataFrame | None:
        manifest = self._read_manifest()
        if not manifest:
            return None
        paths = [os.path.join(self.path, rel) for rel in manifest.values()]
        return self.spark.read.parquet(*paths)

    def _bucketed(self, df: DataFrame) -> DataFrame:
        # bucket is a pure function of id — recomputed on read, never
        # stored, so version dirs are readable standalone
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("id"), F.lit(self.n_buckets))
        )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        import shutil

        from ..graph import Graph
        from ..operators.wcc import wcc

        manifest = self._read_manifest() or {}
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
        # nodes + all members of touched components); other buckets'
        # files are untouched by construction and carry over verbatim
        updated = self._bucketed(comp).localCheckpoint(eager=True)
        affected = sorted(
            r["bucket"] for r in updated.select("bucket").distinct().collect()
        )
        # surviving old rows of ONLY the affected buckets (path-level
        # pruning via the manifest — no filter over the full table)
        old_paths = [
            os.path.join(self.path, manifest[str(b)])
            for b in affected if str(b) in manifest
        ]
        if old_paths:
            keep = self._bucketed(self.spark.read.parquet(*old_paths)).join(
                updated.select("id"), "id", "left_anti"
            )
            replacement = keep.unionByName(updated)
        else:
            replacement = updated

        staging = os.path.join(self.path, f"_staging_{batch_id}")
        if os.path.exists(staging):  # crashed earlier attempt of this batch
            shutil.rmtree(staging)
        replacement.write.mode("overwrite").partitionBy("bucket").parquet(staging)

        # version dirs carry a uniquifier so a replay of the same batch
        # never collides with (and never deletes) a dir the committed
        # manifest still references
        import uuid

        token = uuid.uuid4().hex[:8]
        new_manifest = dict(manifest)
        for b in affected:
            src = os.path.join(staging, f"bucket={b}")
            rel = os.path.join(f"bucket={b}", f"v{batch_id}_{token}")
            dst = os.path.join(self.path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            new_manifest[str(b)] = rel
        self._commit_manifest(new_manifest)
        # post-commit GC (best-effort): staging plus every version dir
        # of an affected bucket that the committed manifest no longer
        # references (superseded versions AND crashed-attempt orphans)
        shutil.rmtree(staging, ignore_errors=True)
        for b in affected:
            bdir = os.path.join(self.path, f"bucket={b}")
            current = os.path.basename(new_manifest[str(b)])
            for v in os.listdir(bdir):
                if v != current:
                    shutil.rmtree(os.path.join(bdir, v), ignore_errors=True)

    def _sweep_orphans(self) -> None:
        """GC version dirs the committed manifest doesn't reference —
        across ALL buckets, not just ones a batch touches.

        The per-batch GC only sweeps affected buckets, so a version dir
        orphaned by a crash (renamed into place before the manifest swap
        failed) in a bucket that never gets touched again would
        accumulate forever. Run on sink start: anything not named by the
        committed manifest is garbage by construction (renames happen
        before commit; replays use fresh uniquified dirs)."""
        import shutil

        manifest = self._read_manifest() or {}
        if not os.path.isdir(self.path):
            return
        for entry in os.listdir(self.path):
            full = os.path.join(self.path, entry)
            if entry.startswith("_staging_"):
                shutil.rmtree(full, ignore_errors=True)
                continue
            if not entry.startswith("bucket=") or not os.path.isdir(full):
                continue
            b = entry.split("=", 1)[1]
            current = os.path.basename(manifest.get(b, ""))
            for v in os.listdir(full):
                if v != current:
                    shutil.rmtree(os.path.join(full, v), ignore_errors=True)

    def start(self, edge_stream: DataFrame, checkpoint: str | None = None):
        self._sweep_orphans()
        q = (
            edge_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint or os.path.join(self.state_dir, "ckpt"))
            .trigger(availableNow=True)
        )
        return q.start()

    def components(self) -> DataFrame | None:
        state = self._load_state()
        return None if state is None else state.select("id", "component")
