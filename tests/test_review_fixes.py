"""Regression tests for the code-review findings: each test fails on
the pre-fix implementation."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_simhash_matches_python_reference(spark):
    """Signatures must equal an exact-integer Python computation over
    the same token hashes (the float64-promotion bug silently zeroed
    the low ~11 bits whenever bit 63 was set)."""
    from reddit_etl_spark.operators.dedup import simhash_signatures
    from reddit_etl_spark.operators.text import normalize_text_col

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "spark engines process large corpora efficiently"),
            (3, "one"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.simhash for r in simhash_signatures(df, "doc_id", "text").collect()
    }

    hashes = {
        r.doc_id: list(r.h)
        for r in df.select(
            "doc_id",
            F.transform(
                F.split(normalize_text_col("text"), " "), lambda t: F.xxhash64(t)
            ).alias("h"),
        ).collect()
    }
    for doc_id, hs in hashes.items():
        votes = [0] * 64
        for h in hs:
            u = h & 0xFFFFFFFFFFFFFFFF
            for b in range(64):
                votes[b] += 1 if (u >> b) & 1 else -1
        expected_u = sum(1 << b for b in range(64) if votes[b] > 0)
        expected = expected_u - (1 << 64) if expected_u >= (1 << 63) else expected_u
        assert got[doc_id] == expected, f"doc {doc_id}"
    # at least one fixture doc must exercise the high bit
    assert any(v < 0 for v in got.values())


def test_asof_null_column_no_row_mixing(spark):
    """The matched right row must be carried atomically: a NULL in the
    latest right row must NOT be backfilled from an older row."""
    from reddit_etl_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 9, 1, 12, 0, s)  # noqa: E731
    right = spark.createDataFrame(
        [("k", t(1), 100.0, 5), ("k", t(2), 200.0, None)],
        "k string, rts timestamp, price double, size long",
    )
    left = spark.createDataFrame([("k", t(3), 1)], "k string, lts timestamp, x long")
    r = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["price", "size"],
    ).first()
    assert r.price == 200.0
    assert r.size is None  # NOT 5 from the older row


def test_asof_tolerance_atomic(spark):
    from reddit_etl_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2025, 9, 1, 12, 0, s)  # noqa: E731
    right = spark.createDataFrame(
        [("k", t(0), 100.0)], "k string, rts timestamp, price double"
    )
    left = spark.createDataFrame(
        [("k", t(30), 1)], "k string, lts timestamp, x long"
    )
    r = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        tolerance="10 seconds",
    ).first()
    assert r.price is None  # 30s old > 10s tolerance


def test_interval_join_left_null_payload_no_duplicates(spark):
    from reddit_etl_spark.operators.rangejoin import interval_join

    t = lambda m: dt.datetime(2025, 9, 1, 0, 0) + dt.timedelta(minutes=m)  # noqa: E731
    points = spark.createDataFrame(
        [("u", None, t(30)), ("u", 2, t(30))],
        "k string, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u", 1, t(0), t(60))], "k string, iid long, s timestamp, e timestamp"
    )
    rows = interval_join(
        points, intervals, ["k"], "ts", "s", "e", how="left"
    ).collect()
    # both points match exactly once — the NULL pid row must not also
    # appear as a spurious unmatched duplicate
    assert len(rows) == 2
    assert all(r.iid == 1 for r in rows)


def test_salted_join_rejects_outer_modes(spark):
    from reddit_etl_spark.operators.skew import salted_join

    a = spark.createDataFrame([("k", 1)], "k string, v long")
    b = spark.createDataFrame([("k", 2)], "k string, w long")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(a, b, ["k"], how=how)


def test_lsh_and_ivf_empty_corpus(spark):
    from reddit_etl_spark.operators.similarity import (
        cosine_neardup_pairs,
        ivf_topk,
        lsh_topk,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert lsh_topk(empty, empty, "vec_id", "embedding", "vec_id").count() == 0
    assert ivf_topk(empty, empty, "vec_id", "embedding", "vec_id").count() == 0
    assert cosine_neardup_pairs(empty, "vec_id", "embedding").count() == 0


def test_marker_count_escapes_metacharacters(spark):
    from reddit_etl_spark.operators.text import marker_count_col

    df = spark.createDataFrame(
        [("i code c++ and a.b daily axb",)], "text string"
    )
    n = df.select(
        marker_count_col("text", ["c++", "a.b"]).alias("n")
    ).first().n
    assert n == 2  # literal matches only; 'axb' must NOT match 'a.b'


def test_engine_analysis_rejects_non_date_as_of(spark, posts, comments, tmp_path):
    from reddit_etl_spark.engine import Engine
    from reddit_etl_spark.sinks.writers import append_parquet

    append_parquet(posts, str(tmp_path / "p"))
    append_parquet(comments, str(tmp_path / "c"))
    eng = Engine(spark, str(tmp_path / "p"), str(tmp_path / "c"))
    with pytest.raises(ValueError):
        eng.analysis("q13", as_of="2024-01-01' OR '1'='1")


def test_stream_reader_handles_aware_timestamps(tmp_path):
    import json

    from reddit_etl_spark.sources.reddit_datasource import (
        RedditStreamReader,
    )

    rows = [
        dict(
            id="x1", title="t", author="u", subreddit="python", score=1,
            upvote_ratio=0.5, num_comments=0,
            created_utc="2025-09-01T10:00:00+00:00",  # tz-AWARE iso
            selftext=None, url="u", is_video=False,
            is_original_content=False, over_18=False, stickied=False,
            locked=False,
        )
    ]
    p = tmp_path / "posts.json"
    p.write_text(json.dumps(rows))
    reader = RedditStreamReader(
        {"subreddits": "python", "mode": "mock", "mock_path": str(p)}
    )
    out, end = reader.read(reader.initialOffset())
    assert len(list(out)) == 1
    # and a second poll from the new offset yields nothing
    out2, _ = reader.read(end)
    assert list(out2) == []


def test_sample_fraction_one_keeps_everything(spark):
    """hash_threshold(1.0) must select ALL rows: the old 5-char '10000'
    threshold lexicographically excluded ~94% of 4-char hex prefixes."""
    from reddit_etl_spark.operators.curation import (
        deterministic_sample,
        hash_threshold,
        split_col,
    )

    ids = spark.range(0, 500)
    assert deterministic_sample(ids, "id", 1.0).count() == 500
    tagged = ids.select(split_col("id", 1.0).alias("split"))
    assert tagged.filter(F.col("split") == "train").count() == 500
    # threshold string itself sorts above every 4-char lowercase hex
    assert hash_threshold(1.0) > "ffff"


def test_simhash_tolerates_null_text(spark):
    """NULL text must yield a zero signature, not a kernel TypeError
    (parity with the exact/minhash NULL tolerance)."""
    from reddit_etl_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(1, "some real text here"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash_signatures(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] == 0  # NULL text -> zero signature, no TypeError


def test_dedup_survivors_majority_duplicate_corpus(spark):
    """Survivor selection with a loser set that is most of the corpus
    (the broadcast hint removed: the anti-join must not rely on the
    loser side being tiny)."""
    from reddit_etl_spark.operators.graph import connected_components, dedup_survivors

    # 900 of 1000 docs are duplicates of doc 0 (one giant cluster)
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    edges = spark.range(1, 901).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    comp = connected_components(edges, "a", "b")
    kept = dedup_survivors(docs, comp, "doc_id")
    got = sorted(r.doc_id for r in kept.collect())
    assert got == [0] + list(range(901, 1000))


def test_interval_join_left_stable_after_shuffle(spark):
    """Left path must keep unmatched points exactly once even when the
    points subtree contains an upstream shuffle (nondeterministic row
    order across the two subtree evaluations)."""
    import datetime as dt

    from reddit_etl_spark.operators.rangejoin import interval_join

    t0 = dt.datetime(2025, 9, 1)
    pts = spark.createDataFrame(
        [("u", i, t0 + dt.timedelta(minutes=i)) for i in range(200)],
        "k string, pid long, ts timestamp",
    ).repartition(8, "pid")  # upstream shuffle before id assignment
    ivs = spark.createDataFrame(
        [("u", 1, t0, t0 + dt.timedelta(minutes=49))],
        "k string, iid long, s timestamp, e timestamp",
    )
    out = interval_join(pts, ivs, ["k"], "ts", "s", "e", bucket="30 minutes", how="left")
    assert out.count() == 200
    matched = out.filter(F.col("iid").isNotNull()).count()
    assert matched == 50
    assert out.select("pid").distinct().count() == 200
