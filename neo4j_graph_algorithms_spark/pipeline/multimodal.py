"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata.

The decode/resize/feature kernels themselves need codec libraries that
are NOT in this environment, so the pixel/sample math is stubbed behind
`deterministic_fake=True` (a seeded, shape-correct fake derived from the
payload hash) or raises NotImplementedError — but everything Spark-side
is real and tested: the schema contract, Arrow batch shapes, mapInPandas
signatures, partition sizing, and the metadata fast paths that never
touch the payload.

Schema contract (one row per asset):

    asset_id: long, modality: string ('image'|'audio'|'video'),
    payload: binary, mime: string,
    meta: struct<width:int, height:int, channels:int,
                 sample_rate:int, n_frames:int, duration_ms:long>

Scale notes: payloads dominate row size, so ops that only need `meta`
must never deserialize `payload` — column pruning does that for free if
the op selects only what it needs (verified by `.explain` ReadSchema in
tests). Decode fans out via mapInPandas with a small
`maxRecordsPerBatch` so a batch of 100 MB images doesn't blow the Arrow
buffer.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def arrow_batch_size(spark, rows: int):
    """Scoped `spark.sql.execution.arrow.maxRecordsPerBatch` override.

    Payload-heavy decode stages want tiny Arrow batches (100 MB of
    images in one default-10k-row batch blows the buffer), but the
    setting is session-global and Spark plans lazily — so the CALLER
    wraps the *materialization* (collect/write/count) in this context,
    and every other query in the session keeps the default batch size.
    """
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(rows))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

META_SCHEMA = (
    "width int, height int, channels int, sample_rate int, n_frames int, duration_ms long"
)
ASSET_SCHEMA = f"asset_id long, modality string, payload binary, mime string, meta struct<{META_SCHEMA}>"


def synthetic_assets(spark, n: int = 100, seed: int = 7) -> DataFrame:
    """Deterministic fake asset table with realistic metadata and small
    hash-derived binary payloads (arithmetic on the id — regenerates
    identically at any scale)."""
    df = spark.range(n)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.unhex(F.sha2(F.concat(F.lit(f"seed{seed}-"), F.col("id")), 256))
    return df.select(
        F.col("id").alias("asset_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.when(modality == "image", "image/png")
        .when(modality == "audio", "audio/wav")
        .otherwise("video/mp4").alias("mime"),
        F.struct(
            (64 + (F.col("id") % 8) * 32).cast("int").alias("width"),
            (64 + (F.col("id") % 5) * 32).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.when(modality == "audio", 16000).otherwise(0).cast("int").alias("sample_rate"),
            F.when(modality == "video", 24 + (F.col("id") % 10)).otherwise(1).cast("int").alias("n_frames"),
            ((F.col("id") % 30 + 1) * 1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def metadata_stats(assets: DataFrame) -> DataFrame:
    """Per-modality size/shape stats — touches only metadata columns
    (payload pruned at scan)."""
    return assets.groupBy("modality").agg(
        F.count("*").alias("n_assets"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.height").alias("avg_height"),
        F.sum("meta.duration_ms").alias("total_duration_ms"),
    )


def _fake_pixels(payload: bytes, w: int, h: int, c: int):
    """Deterministic stand-in for a real decoder: tile the payload hash
    bytes to (h, w, c). Shape-correct, cheap, reproducible."""
    import numpy as np

    base = np.frombuffer(payload, dtype=np.uint8)
    need = w * h * c
    reps = need // len(base) + 1
    return np.tile(base, reps)[:need].reshape(h, w, c)


def decode_images(
    assets: DataFrame,
    deterministic_fake: bool = True,
) -> DataFrame:
    """(asset_id, height, width, channels, mean_intensity): the decode →
    feature step. Real codecs are unavailable in this environment; with
    `deterministic_fake=False` this raises NotImplementedError from the
    executor (documenting exactly where a PIL/libvips call slots in).

    Bound Arrow batch bytes by wrapping the *materialization* in
    `arrow_batch_size(spark, rows)` — the conf is session-global, so
    this function no longer mutates it behind the caller's back.
    """

    def go(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake and len(pdf):
                raise NotImplementedError(
                    "real image decode requires PIL/libvips; not present in this env"
                )
            out = []
            # per-ASSET loop (one decode call per image, like any codec
            # binding); columns pulled once as arrays — no pandas
            # per-row Series construction
            for aid, payload, w, h, c in zip(
                pdf["asset_id"].to_numpy(), pdf["payload"],
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
                pdf["channels"].to_numpy(),
            ):
                px = _fake_pixels(payload, int(w), int(h), int(c))
                out.append((aid, int(h), int(w), int(c), float(px.mean())))
            yield pd.DataFrame(
                out, columns=["asset_id", "height", "width", "channels", "mean_intensity"]
            )

    imgs = assets.filter(F.col("modality") == "image").select(
        "asset_id", "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
    )
    return imgs.mapInPandas(
        go, "asset_id long, height int, width int, channels int, mean_intensity double"
    )


def resize_images(
    assets: DataFrame, target: int = 64, deterministic_fake: bool = True
) -> DataFrame:
    """(asset_id, payload binary): nearest-neighbor resize of the fake
    pixel grid, re-encoded as raw bytes — the plumbing (binary in,
    binary out, metadata update) is the tested part."""

    def go(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake and len(pdf):
                raise NotImplementedError("real resize requires an image codec")
            ids, payloads = [], []
            for aid, payload, w, h, c in zip(
                pdf["asset_id"].to_numpy(), pdf["payload"],
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
                pdf["channels"].to_numpy(),
            ):
                px = _fake_pixels(payload, int(w), int(h), int(c))
                ys = (np.arange(target) * px.shape[0] // target)
                xs = (np.arange(target) * px.shape[1] // target)
                small = px[ys][:, xs]
                ids.append(aid)
                payloads.append(small.tobytes())
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    imgs = assets.filter(F.col("modality") == "image").select(
        "asset_id", "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
    )
    return imgs.mapInPandas(go, "asset_id long, payload binary")


def sample_video_frames(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """(asset_id, frame_index): frame-sampling plan — pure metadata math
    (no payload touch): one row per sampled frame index."""
    vids = assets.filter(F.col("modality") == "video").select(
        "asset_id", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )
