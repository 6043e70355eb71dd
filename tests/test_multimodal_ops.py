"""Resize / frame-sample plumbing tests: Arrow batch shapes, schemas,
1:N expansion, determinism — the contract a real codec drops into."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.multimodal import (
    media_from_text,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "first payload"), (2, "second payload"), (3, "third")],
        "doc_id long, text string",
    )
    return media_from_text(docs, "doc_id", "text").withColumn(
        "duration_ms", F.col("asset_id").cast("long") * 2_500
    )


def test_resize_shapes_and_determinism(media):
    out = resize_images(media, target_width=16, target_height=9)
    rows = {r.asset_id: r for r in out.collect()}
    assert set(rows) == {"1", "2", "3"}
    for r in rows.values():
        assert (r.width, r.height) == (16, 9)
        assert len(r.payload) == 16 * 9
    again = {r.asset_id: bytes(r.payload) for r in out.collect()}
    assert again == {k: bytes(v.payload) for k, v in rows.items()}


def test_resize_real_decode_rejects_unknown_format(media):
    # text bytes are no image; the real path raises a typed codec error
    with pytest.raises(Exception, match="UnsupportedMediaError|no codec"):
        resize_images(media, decode="real").collect()


def test_sample_frames_one_to_many(media):
    out = sample_frames(media, every_ms=1_000, max_frames=4)
    rows = out.collect()
    by_asset: dict[str, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    # durations 2500/5000/7500 ms -> 2/4(capped)/4(capped) frames
    assert sorted(len(v) for v in by_asset.values()) == [2, 4, 4]
    for frames in by_asset.values():
        idxs = sorted(f.frame_index for f in frames)
        assert idxs == list(range(len(frames)))
        for f in frames:
            assert f.frame_ts_ms == f.frame_index * 1_000
            assert len(f.payload) == 32  # stub frame digest
    # frames are distinct per index but deterministic across runs
    again = sorted(bytes(r.payload) for r in out.collect())
    assert again == sorted(bytes(r.payload) for r in rows)


def test_sample_frames_null_duration(spark):
    media = spark.createDataFrame(
        [("x", bytearray(b"p"), None)],
        "asset_id string, payload binary, duration_ms long",
    )
    rows = sample_frames(media).collect()
    assert len(rows) == 1 and rows[0].frame_index == 0
