"""Multimodal column plumbing: image/audio/video as opaque binary.

The engine treats media as ``binary`` payload columns + typed metadata
(schemas.MEDIA_SCHEMA). Everything Spark-side is real and tested —
schema, Arrow batch shape, mapInPandas partitioning, deterministic
hashing/feature plumbing. The actual codec work (JPEG decode, audio
resample, video frame-sample) is STUBBED: the container ships no
image/audio libraries, so ``decode=`real'`` raises NotImplementedError
while ``decode='fake'`` produces a deterministic payload-derived
feature vector with the exact shapes a real decoder would emit.

Scale notes: payloads never shuffle — features are extracted in a
narrow mapInPandas pass straight off the scan, and only the (small)
feature columns flow downstream. ``spark.sql.files.maxPartitionBytes``
bounds per-task Arrow batch memory for fat binary rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("byte_count", LongType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: seeds a
    PRNG from the payload digest. Stable across runs and engines."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).normal(size=dim)


def extract_media_features(
    media: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    decode: str = "fake",
    feature_dim: int = 8,
) -> DataFrame:
    """byte_count + sha256 + feature vector per asset via mapInPandas.

    ``decode='real'`` is the integration point for actual codecs
    (PIL/torchaudio/ffmpeg) — deliberately NotImplemented here.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not "
                    "shipped in this environment; use decode='fake'"
                )
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype(str),
                    "byte_count": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "feature": [
                        _fake_feature(p, feature_dim).tolist() for p in payloads
                    ],
                }
            )

    cols = media.select(F.col(id_col), F.col(payload_col))
    return cols.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


IMAGE_RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    decode: str = "fake",
) -> DataFrame:
    """Image resize over mapInPandas — the Spark-side plumbing (schema,
    Arrow batch shape, partition-parallel execution) is real; the codec
    is stubbed. ``decode='fake'`` emits a deterministic payload-derived
    pseudo-bitmap of exactly target_width*target_height bytes, so
    downstream size/packing logic is testable; ``decode='real'`` is
    the PIL/opencv integration point (NotImplemented here)."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv, not shipped here"
                )
            out_payloads = []
            for p in pdf[payload_col]:
                seed = int.from_bytes(
                    hashlib.sha256(bytes(p or b"")).digest()[:4], "big"
                )
                rng = np.random.RandomState(seed)
                out_payloads.append(
                    rng.randint(
                        0, 256, size=target_width * target_height, dtype=np.uint8
                    ).tobytes()
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype(str),
                    "width": target_width,
                    "height": target_height,
                    "payload": out_payloads,
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _resize, schema=IMAGE_RESIZE_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("frame_index", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1_000,
    max_frames: int = 8,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    decode: str = "fake",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a
    1:N mapInPandas — the batch-shape contract real ffmpeg plumbing
    needs). Frame count derives from the asset's duration metadata;
    the frame payload is a deterministic stub keyed on (payload,
    frame index)."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg, not shipped here"
                )
            ids, idxs, tss, payloads = [], [], [], []
            for aid, p, dur in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                n = min(max(dur // every_ms, 1), max_frames)
                digest = hashlib.sha256(bytes(p or b"")).digest()
                for i in range(n):
                    ids.append(str(aid))
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(
                        hashlib.sha256(digest + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_index": idxs,
                    "frame_ts_ms": tss,
                    "payload": payloads,
                }
            )

    return media.select(
        F.col(id_col), F.col(payload_col), F.col(duration_col)
    ).mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)


def media_from_text(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a synthetic media table from a text corpus (UTF-8 bytes as
    payload) — exercises the full binary-column path with testdata."""
    return docs.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
