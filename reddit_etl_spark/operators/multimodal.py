"""Multimodal column plumbing: image/audio/video as opaque binary.

The engine treats media as ``binary`` payload columns + typed metadata
(schemas.MEDIA_SCHEMA). Everything Spark-side is real and tested —
schema, Arrow batch shape, mapInPandas partitioning, deterministic
hashing/feature plumbing. ``decode='real'`` runs actual codecs via
``operators.codecs``: PIL when importable, else pure-stdlib decoders
(PNG/BMP/PPM/PGM images, WAV audio, concatenated-PNG frame streams).
``decode='fake'`` remains the deterministic payload-derived stand-in
for formats no available codec covers (e.g. JPEG without PIL).

Scale notes: payloads never shuffle — features are extracted in a
narrow mapInPandas pass straight off the scan, and only the (small)
feature columns flow downstream. ``spark.sql.files.maxPartitionBytes``
bounds per-task Arrow batch memory for fat binary rows. Undecodable
assets in a 100 TB corpus are the norm, not the exception, so the
real path supports ``on_error='null'`` dead-lettering: bad payloads
yield NULL features instead of failing the stage.
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

from reddit_etl_spark.operators import codecs
from reddit_etl_spark.operators.codecs import UnsupportedMediaError

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


def _real_feature(payload: bytes, dim: int) -> np.ndarray:
    """Decode the payload with a real codec and featurize: images →
    normalized grayscale intensity histogram; WAV audio → normalized
    amplitude histogram. Raises UnsupportedMediaError otherwise."""
    if codecs.sniff(payload) == "wav":
        samples, _rate = codecs.decode_wav(payload)
        hist, _ = np.histogram(samples, bins=dim, range=(-1.0, 1.0))
        total = hist.sum()
        return hist / total if total else hist.astype(np.float64)
    return codecs.image_histogram(codecs.decode_image(payload), dim)


def extract_media_features(
    media: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    decode: str = "fake",
    feature_dim: int = 8,
    on_error: str = "raise",
) -> DataFrame:
    """byte_count + sha256 + feature vector per asset via mapInPandas.

    ``decode='real'`` decodes with actual codecs (PIL if importable,
    else stdlib PNG/BMP/PPM/WAV — see operators.codecs). With
    ``on_error='null'`` undecodable payloads yield a NULL feature
    (dead-letter pattern) instead of failing the stage.
    """
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            feats: list[list[float] | None] = []
            for p in payloads:
                if decode == "fake":
                    feats.append(_fake_feature(p, feature_dim).tolist())
                    continue
                try:
                    feats.append(_real_feature(p, feature_dim).tolist())
                except UnsupportedMediaError:
                    if on_error == "raise":
                        raise
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype(str),
                    "byte_count": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "feature": feats,
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
    on_error: str = "raise",
) -> DataFrame:
    """Image resize over mapInPandas. ``decode='real'`` decodes with a
    real codec (PIL if importable, else stdlib PNG/BMP/PPM), converts
    to grayscale, and nearest-neighbour-resizes to the target; the
    output payload is the raw W*H grayscale bitmap. ``decode='fake'``
    emits a deterministic payload-derived pseudo-bitmap of the same
    shape for formats no codec covers, keeping downstream size/packing
    logic testable."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf[payload_col]:
                if decode == "real":
                    try:
                        gray = codecs.to_grayscale(
                            codecs.decode_image(bytes(p or b""))
                        )
                        out_payloads.append(
                            codecs.resize_nearest(
                                gray, target_width, target_height
                            ).tobytes()
                        )
                    except UnsupportedMediaError:
                        if on_error == "raise":
                            raise
                        out_payloads.append(None)  # dead-lettered asset
                    continue
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
    on_error: str = "raise",
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a
    1:N mapInPandas — the batch-shape contract real ffmpeg plumbing
    needs). Frame count derives from the asset's duration metadata.
    ``decode='real'`` reads the engine's raw-frames container (a
    concatenated-PNG stream, what an upstream ffmpeg dump emits) or an
    animated GIF (frames composited with disposal handling, re-encoded
    as PNG payloads) and emits the source frame nearest each sampled
    timestamp; compressed containers (mp4/webm) remain the ffmpeg
    integration point. ``decode='fake'`` emits a deterministic stub
    keyed on (payload, frame index)."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for aid, p, dur in zip(
                pdf[id_col], pdf[payload_col], pdf[duration_col]
            ):
                dur = int(dur) if dur is not None and not pd.isna(dur) else 0
                n = min(max(dur // every_ms, 1), max_frames)
                if decode == "real":
                    try:
                        raw = bytes(p or b"")
                        if codecs.sniff(raw) == "gif":
                            frames = [
                                codecs.encode_png(f)
                                for f in codecs.decode_gif_frames(raw)
                            ]
                        else:
                            frames = codecs.split_png_frames(raw)
                    except UnsupportedMediaError:
                        if on_error == "raise":
                            raise
                        continue  # dead-letter: emit no frames (1:N op)
                    for i in range(n):
                        t = i * every_ms
                        src = min(
                            int(t * len(frames) / dur) if dur else 0,
                            len(frames) - 1,
                        )
                        ids.append(str(aid))
                        idxs.append(i)
                        tss.append(t)
                        payloads.append(frames[src])
                    continue
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


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("sample_rate", LongType()),
        StructField("num_samples", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resample_audio(
    media: DataFrame,
    target_rate: int = 16_000,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Resample WAV audio payloads to ``target_rate`` (stdlib ``wave``
    decode → numpy linear-interpolation resample → 16-bit WAV
    re-encode) in a narrow mapInPandas pass — payloads never shuffle.
    ``on_error='null'`` dead-letters undecodable payloads as NULL."""
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, counts, payloads = [], [], [], []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(str(aid))
                try:
                    samples, rate = codecs.decode_wav(bytes(p or b""))
                    out = codecs.resample_linear(samples, rate, target_rate)
                    rates.append(target_rate)
                    counts.append(out.shape[0])
                    payloads.append(codecs.encode_wav(out, target_rate))
                except UnsupportedMediaError:
                    if on_error == "raise":
                        raise
                    rates.append(None)
                    counts.append(None)
                    payloads.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "sample_rate": pd.array(rates, dtype="Int64"),
                    "num_samples": pd.array(counts, dtype="Int64"),
                    "payload": payloads,
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _resample, schema=AUDIO_RESAMPLE_SCHEMA
    )


def media_from_text(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a synthetic media table from a text corpus (UTF-8 bytes as
    payload) — exercises the full binary-column path with testdata."""
    return docs.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) + Hamming-banded near-duplicate pairs
# ---------------------------------------------------------------------------

_DCT32: np.ndarray | None = None


def _dct32() -> np.ndarray:
    """Orthonormal 32x32 DCT-II matrix (same construction as the JPEG
    codec's 8x8 one, codecs._dct_matrix)."""
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)
        m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
        m[0] *= np.sqrt(1 / n)
        m[1:] *= np.sqrt(2 / n)
        _DCT32 = m
    return _DCT32


def phash64(payload: bytes) -> int:
    """64-bit perceptual hash of an encoded image: decode -> Rec.601
    grayscale -> 32x32 nearest resize -> 2D DCT-II -> sign of each
    top-left 8x8 coefficient vs the median of the 63 ACs (DC bit
    always 0 — DC is overall brightness, which pHash must ignore).

    Invariances (tested): exact under uniform brightness shift (a
    constant offset moves only the DC coefficient) and under positive
    contrast scaling (all coefficients AND their median scale
    together, so every sign comparison is unchanged). Re-encoding,
    mild noise, and small resizes move only a few bits — near-dups
    land within a small Hamming radius.

    Raises UnsupportedMediaError for undecodable payloads (same
    dead-letter class as every codec entry point). Returned as a
    SIGNED 64-bit int (bit 63 in the sign position) so it stores in a
    Spark/parquet BIGINT without widening.
    """
    gray = codecs.to_grayscale(codecs.decode_image(payload)).astype(np.float64)
    small = codecs.resize_nearest(gray, 32, 32)
    c = _dct32()
    coeffs = (c @ small @ c.T)[:8, :8].ravel()
    med = float(np.median(coeffs[1:]))
    bits = coeffs > med
    bits[0] = False
    h = 0
    for i in range(64):
        if bits[i]:
            h |= 1 << i
    return int(np.int64(np.uint64(h)))


PHASH_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("phash", LongType()),
    ]
)


def phash_table(
    media: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """(asset_id, phash BIGINT) via one narrow mapInPandas pass off the
    scan — payloads never shuffle, only the 8-byte hash flows
    downstream. ``on_error='null'`` dead-letters undecodable assets as
    NULL hashes instead of failing the stage."""
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[int | None] = []
            for p in pdf[payload_col]:
                try:
                    out.append(phash64(bytes(p) if p is not None else b""))
                except UnsupportedMediaError:
                    if on_error == "raise":
                        raise
                    out.append(None)
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype(str), "phash": out}
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _hash, schema=PHASH_SCHEMA
    )


def phash_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    id_col: str = "asset_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate image pairs: all (id_a < id_b) with
    Hamming(phash_a, phash_b) <= ``max_hamming``.

    Bucketed, not all-pairs: the 64-bit hash splits into 4 x 16-bit
    bands; by pigeonhole, any pair within Hamming distance 3 agrees
    EXACTLY on at least one band (3 differing bits cannot touch all 4
    bands), so a self-join on (band_index, band_value) finds every
    qualifying pair — completeness is structural, and tested against
    brute force. ``max_hamming`` > 3 would need wider bands (the
    pigeonhole argument requires max_hamming < bands) and raises.

    Plan: explode to 4 band rows per asset (longs only), self-join on
    the 24-byte band key, dedupe candidates, re-join the two 8-byte
    hashes once, exact distance via bit_count(a XOR b) in codegen.
    Shuffles carry (id, long) pairs, never pixels. Band buckets over
    real imagery are near-uniform (DCT sign bits are balanced), so no
    salt is needed; a pathological single-color corpus degrades to the
    exact-dup case, where candidates equal true dups anyway.
    """
    if max_hamming >= 4:
        raise ValueError(
            "phash_pairs guarantees completeness only for max_hamming <= 3 "
            "(4 x 16-bit band pigeonhole); use more bands / a wider hash "
            "for larger radii"
        )
    h = hashes.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h")
    ).filter(F.col("h").isNotNull())
    bands = h.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.expr(f"shiftrightunsigned(h, {16 * i}) & 65535").alias(
                            "bv"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "h", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    a = bands.select(
        F.col("id").alias("id_a"), F.col("h").alias("h_a"), "bi", "bv"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("h").alias("h_b"), "bi", "bv"
    )
    cand = (
        a.join(b, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.expr("h_a ^ h_b")).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def images_from_text(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    side: int = 64,
) -> DataFrame:
    """Deterministic synthetic image table from a text corpus: each
    document's UTF-8 bytes tile a ``side`` x ``side`` grayscale raster,
    PNG-encoded with the stdlib codec. Identical texts yield identical
    payloads; near-duplicate texts (shared prefixes/spans) yield
    rasters that agree on most pixels — so the pHash pipeline has
    realistic near-dup structure to find. Testdata plumbing for the
    image path (the container has no image corpus), same role as
    media_from_text for the feature path."""
    n = side * side

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                raw = (t or "").encode("utf-8") or b"\x00"
                reps = -(-n // len(raw))  # ceil
                px = np.frombuffer(raw * reps, dtype=np.uint8)[:n]
                payloads.append(
                    codecs.encode_png(px.reshape(side, side).copy())
                )
            yield pd.DataFrame(
                {"asset_id": pdf[id_col].astype(str), "payload": payloads}
            )

    return docs.select(
        F.col(id_col), F.col(text_col)
    ).mapInPandas(
        _render,
        schema=StructType(
            [
                StructField("asset_id", StringType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
