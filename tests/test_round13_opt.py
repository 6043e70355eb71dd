"""Focused tests for the round-13 OPTIMIZATION changes — every entry
pins an internals change to its unchanged-results contract:

- guard_rows_or_raise (the merged-guard filter condition) matches
  guard_distinct_frame's semantics: passthrough below the limit,
  loud raise past it, empty frames pass;
- exact_dedup(extra_aggs=...) returns exactly what the old
  dedup-then-join-back composition returned;
- the mapInArrow banded-signature kernel tolerates NULL/empty texts
  and agrees with a direct NumPy reference on the band hashes;
- lsh_topk / cosine_neardup_pairs degenerate to empty output (same
  schema) on empty and all-NULL-vector inputs now that the driver-
  side dim probe is gone.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import reddit_etl_spark.operators.scale_lanes as _sl
from reddit_etl_spark.operators.scale_lanes import guard_rows_or_raise


def test_guard_rows_cond_passthrough_and_raise(spark):
    df = spark.createDataFrame([(i, 5) for i in range(5)], "v long, n long")
    ok = df.filter(guard_rows_or_raise(F.col("n"), "op_x", limit=5))
    assert ok.count() == 5
    bad = df.filter(guard_rows_or_raise(F.col("n"), "op_x", limit=4))
    with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
        bad.collect()


def test_guard_rows_cond_reads_limit_at_call_time(spark):
    real = _sl.EXACT_RANK_MAX_ROWS
    df = spark.createDataFrame([(1, 100)], "v long, n long")
    try:
        _sl.EXACT_RANK_MAX_ROWS = 10
        with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
            df.filter(guard_rows_or_raise(F.col("n"), "op_x")).collect()
    finally:
        _sl.EXACT_RANK_MAX_ROWS = real


def test_guard_rows_cond_null_count_passes(spark):
    # empty-input totals produce NULL counts; the guard must not raise
    df = spark.createDataFrame([(1, None)], "v long, n long")
    out = df.filter(guard_rows_or_raise(F.col("n"), "op_x", limit=1))
    assert out.count() == 1


def test_exact_dedup_extra_aggs_matches_join_back(spark):
    from reddit_etl_spark.operators.dedup import exact_dedup

    rows = [
        (1, "a  b", 10),
        (2, "a b", 10),   # same normalized content as id 1
        (3, "c", 7),
        (4, "c", 7),
        (5, "d e f", 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tc long")
    merged = exact_dedup(
        df, "doc_id", ["text"], extra_aggs=[F.min("tc").alias("tc")]
    )
    joined = exact_dedup(df, "doc_id", ["text"]).join(
        df.select("doc_id", "tc"), "doc_id"
    )
    assert sorted(map(tuple, merged.select("doc_id", "dup_count", "tc").collect())) == sorted(
        map(tuple, joined.select("doc_id", "dup_count", "tc").collect())
    )
    # no-extra path: column contract unchanged
    assert exact_dedup(df, "doc_id", ["text"]).columns == ["doc_id", "dup_count"]


def test_banded_signatures_null_and_empty_texts(spark):
    from reddit_etl_spark.operators.dedup import _banded_signatures

    rows = [(1, "alpha beta gamma delta"), (2, None), (3, ""), (4, "alpha beta gamma delta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _banded_signatures(df, "doc_id", "text", 3, 8, 4, 42).collect()
    ids = {r["__mid"] for r in out}
    # shingles_col degenerates BOTH NULL and "" text to the single
    # empty-string shingle (concat_ws over a NULL slice), so every doc
    # bands — identical to the pre-round-13 kernel; the kernel's
    # NULL-list guard exists for callers passing genuinely NULL
    # pre-hashed arrays, exercised via the empty-input suite
    assert ids == {1, 2, 3, 4}
    by_id = {}
    for r in out:
        by_id.setdefault(r["__mid"], set()).add((r["band"], r["bh"]))
    assert by_id[1] == by_id[4]  # identical docs -> identical band keys
    assert by_id[2] == by_id[3]  # NULL and "" share the empty shingle
    assert len(by_id[1]) == 4  # one row per band


def test_banded_signatures_matches_numpy_reference(spark):
    from reddit_etl_spark.operators.dedup import (
        _banded_signatures,
        _splitmix64,
        hashed_shingles_col,
    )

    rows = [(1, "a b c d e f"), (2, "x y z w v u t"), (3, "a b c d e g")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    num_hashes, bands, seed = 16, 4, 7
    r = num_hashes // bands
    got = {}
    for rec in _banded_signatures(df, "doc_id", "text", 3, num_hashes, bands, seed).collect():
        got[(rec["__mid"], rec["band"])] = rec["bh"]
    seeds = (
        np.random.RandomState(seed)
        .randint(0, 1 << 63, size=num_hashes, dtype=np.int64)
        .astype(np.uint64)
    )
    mult = np.uint64(0x100000001B3)
    arrs = df.select("doc_id", hashed_shingles_col(F.col("text"), 3).alias("h")).collect()
    for rec in arrs:
        h = np.asarray(rec["h"], dtype=np.int64).view(np.uint64)
        m = _splitmix64(h[:, None] ^ seeds[None, :]).min(axis=0)  # (H,)
        folded = m.reshape(bands, r)
        for b in range(bands):
            bh = np.uint64(0)
            for j in range(r):
                bh = (bh * mult + folded[b, j]).astype(np.uint64)
            signed = int(bh) - (1 << 64) if int(bh) >= (1 << 63) else int(bh)
            assert got[(rec["doc_id"], b)] == signed, (rec["doc_id"], b)


def test_lsh_topk_empty_and_all_null_inputs(spark):
    from reddit_etl_spark.operators.similarity import lsh_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = lsh_topk(empty, empty, "vec_id", "embedding", "vec_id", k=3)
    assert out.columns == ["query_id", "neighbor_id", "cosine_sim"]
    assert out.count() == 0
    nulls = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert lsh_topk(nulls, nulls, "vec_id", "embedding", "vec_id", k=3).count() == 0


def test_cosine_neardup_empty_input(spark):
    from reddit_etl_spark.operators.similarity import cosine_neardup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = cosine_neardup_pairs(empty, "vec_id", "embedding")
    assert out.count() == 0
