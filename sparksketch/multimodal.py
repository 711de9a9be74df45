"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The actual codec libraries (Pillow/ffmpeg/librosa) are NOT available in
this environment, so the decode kernels are STUBBED: by default they raise
``NotImplementedError``; with ``fake=True`` they produce a deterministic
fake decode (seeded from the payload hash) so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested end-to-end.  Swapping in a real codec is a one-function change."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("mime", StringType()),
    StructField("width", IntegerType()),      # typed metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])


def synthesize_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    generated JVM-side from the id hash."""
    return (spark.range(0, n, 1, partitions).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.unbase64(F.base64(F.encode(
            F.repeat(F.md5(F.col("id").cast("string")), 8), "utf-8"))).alias("payload"),
        F.lit("application/x-fake").alias("mime"),
        F.lit(64).alias("width"), F.lit(48).alias("height"),
        F.lit(1000).alias("duration_ms")))


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real implementation would be ``PIL.Image.open(BytesIO(...))``.
    Deterministic fake keeps the distributed pipeline testable."""
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "or plug a real decoder here")
    return _fake_pixels(payload, 48, 64)


def image_features(df: DataFrame, fake: bool = False,
                   batch_hint: int = 64) -> DataFrame:
    """Decode + feature-extract via mapInPandas: mean/std per channel and a
    16-bin luma histogram — the Arrow batch shape and output schema are the
    production contract; only the decode call is stubbed."""
    out_schema = ("media_id long, mean_r float, mean_g float, mean_b float, "
                  "std_luma float, histo array<float>")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload), fake=fake).astype(np.float32)
                luma = px @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
                hist = np.histogram(luma, bins=16, range=(0, 256))[0]
                rows.append((mid, float(px[..., 0].mean()),
                             float(px[..., 1].mean()), float(px[..., 2].mean()),
                             float(luma.std()),
                             (hist / hist.sum()).astype(np.float32).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "mean_r", "mean_g",
                                              "mean_b", "std_luma", "histo"])

    return (df.filter(F.col("kind") == "image")
              .select("media_id", "payload")
              .mapInPandas(fn, schema=out_schema))


def resize_images(df: DataFrame, out_w: int, out_h: int,
                  fake: bool = False) -> DataFrame:
    """Resize kernel (nearest-neighbor on the decoded array; re-encode
    stubbed as raw bytes).  Shows the binary-in/binary-out contract."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload), fake=fake)
                ys = (np.arange(out_h) * px.shape[0] // out_h)
                xs = (np.arange(out_w) * px.shape[1] // out_w)
                small = px[ys][:, xs]
                out.append((mid, small.tobytes()))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return (df.filter(F.col("kind") == "image")
              .select("media_id", "payload")
              .mapInPandas(fn, schema="media_id long, payload binary"))


def sample_video_frames(df: DataFrame, every_ms: int = 200,
                        fake: bool = False) -> DataFrame:
    """Frame-sampling contract: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame binary).  Decode stubbed."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                if not fake:
                    raise NotImplementedError(
                        "video codec not available; pass fake=True")
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    frame = _fake_pixels(bytes(payload) + i.to_bytes(4, "little"),
                                         8, 8)
                    rows.append((mid, i, ts, frame.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "ts_ms", "frame"])

    return (df.filter(F.col("kind") == "video")
              .select("media_id", "payload", "duration_ms")
              .mapInPandas(
                  fn, schema="media_id long, frame_idx int, ts_ms int, "
                             "frame binary"))
