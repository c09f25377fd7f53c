"""Multimodal columns (SURVEY.md B8): image/audio/video as opaque binary
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio codecs, so the decode step is STUBBED —
``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is requested — but everything Spark-side is real and tested:
the schema, the partitioning, the UDF signatures, and the batch shapes are
exactly what a production decode/resize/frame-sample pipeline uses; only
the bytes→pixels call swaps.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # typed metadata...
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, modality string, payload_bytes int, payload_sha256 string, "
    "feature array<float>, n_frames int"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """bytes → pixel features. Real codecs are unavailable in this
    environment (no PIL/cv2); ``fake=True`` selects the deterministic
    stand-in (16 floats derived from the payload digest) that keeps every
    downstream shape honest."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not installed in this container; "
            "pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 127.5 - 1.0 for b in digest[:16]]


def extract_features(media: DataFrame, frame_stride: int = 10, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams each partition in pandas batches; per batch we decode,
    (for video) sample every ``frame_stride``-th frame, and emit fixed-dim
    features. Partition-level batching is the same shape a GPU decode
    stage needs — swap the inner function, keep the plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            feats = payloads.map(lambda b: decode_image(b, fake=fake_decode))
            n_frames = pdf.apply(
                lambda r: max(1, int((r["duration_ms"] or 0) / (frame_stride * 1000)) + 1)
                if r["modality"] == "video"
                else 1,
                axis=1,
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": payloads.map(len).astype("int32"),
                    "payload_sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": feats,
                    "n_frames": n_frames.astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame_feature array<float>"


def sample_frames(media: DataFrame, stride_ms: int = 10_000, fake_decode: bool = True) -> DataFrame:
    """Frame sampling: explode each video row into one row per sampled
    frame (every ``stride_ms``) with a per-frame feature — the
    one-media-row → many-frame-rows shape a video training pipeline feeds
    to a frame encoder. Non-video rows emit a single frame at t=0.

    The per-frame "decode" hashes (payload, frame_ts) through the
    deterministic stub; a real decoder seeks the container instead — the
    batch plumbing (Arrow in, exploded Arrow out) is identical. The
    frame-point expansion is vectorized (numpy repeat + cumcount index
    arithmetic) — the only per-row Python left is the decode call itself,
    which is exactly the part a real codec replaces.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            duration = (
                pdf["duration_ms"].fillna(0).astype("int64")
                * (pdf["modality"] == "video").astype("int64")
            ).to_numpy()
            n_frames = np.where(duration > 0, duration // stride_ms + 1, 1)
            # explode: row j repeats n_frames[j] times; frame_idx counts
            # within each row; frame_ts = frame_idx * stride (0 for stills)
            rep = np.repeat(np.arange(len(pdf)), n_frames)
            ends = np.cumsum(n_frames)
            frame_idx = (np.arange(ends[-1]) - np.repeat(ends - n_frames, n_frames)).astype("int32")
            frame_ts = frame_idx.astype("int64") * stride_ms * (duration[rep] > 0)
            pl = payloads.to_numpy()
            feats = [
                decode_image(pl[j] + int(ts).to_bytes(4, "big"), fake=fake_decode)
                for j, ts in zip(rep, frame_ts)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[rep],
                    "frame_idx": frame_idx,
                    "frame_ts_ms": frame_ts.astype("int32"),
                    "frame_feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-expression resize bookkeeping: target dimensions preserving
    aspect ratio — the catalog-side half of a resize stage (the pixel op
    itself joins the decode stub above)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.withColumn("target_width", F.floor(F.col("width") * scale).cast("int")).withColumn(
        "target_height", F.floor(F.col("height") * scale).cast("int")
    )
