"""Property-based tests (hypothesis): operators vs independent
reference implementations on randomized inputs. Few examples, each a
real Spark job — the domains are small enough that random + the
deterministic edge suites give strong coverage."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    scores=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=50
    )
)
def test_score_category_matches_pd_cut(spark, scores):
    from reddit_etl_spark.transform import score_category_col

    got = [
        r.cat
        for r in spark.createDataFrame([(s,) for s in scores], "score long")
        .select(score_category_col("score").alias("cat"))
        .collect()
    ]
    want = pd.cut(
        pd.Series(scores),
        bins=[-float("inf"), 0, 10, 100, 1000, float("inf")],
        labels=["Negative", "Low", "Medium", "High", "Viral"],
    ).astype(str).tolist()
    assert got == want


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2", "u3"]),
            st.integers(min_value=0, max_value=10_000),  # minutes offset
        ),
        min_size=1,
        max_size=60,
    ),
    gap_min=st.integers(min_value=1, max_value=120),
)
def test_sessionize_matches_python_reference(spark, events, gap_min):
    from reddit_etl_spark.operators.sessions import sessionize

    base = dt.datetime(2025, 1, 1)
    rows = [(u, base + dt.timedelta(minutes=m)) for u, m in events]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    got = {
        (r.user, r.ts): r.session_id
        for r in sessionize(df, ["user"], "ts", gap=f"{gap_min} minutes").collect()
    }

    # reference: sort per user, increment on gap > threshold. Ties on
    # identical timestamps share a session by construction (gap 0).
    want = {}
    by_user: dict[str, list[dt.datetime]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        sid, prev = 0, None
        for ts in sorted(tss):
            if prev is not None and (ts - prev) > dt.timedelta(minutes=gap_min):
                sid += 1
            want[(u, ts)] = sid
            prev = ts
    assert got == want


@settings(**SETTINGS)
@given(
    left_keys=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=40
    ),
    right_keys=st.lists(
        st.integers(min_value=0, max_value=5), min_size=0, max_size=10
    ),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, left_keys, right_keys, how):
    from reddit_etl_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [(k, i) for i, k in enumerate(left_keys)], "k long, v long"
    )
    other = spark.createDataFrame(
        [(k, i * 100) for i, k in enumerate(right_keys)], "k long, w long"
    ).dropDuplicates(["k"])
    got = sorted(
        map(tuple, salted_join(skewed, other, ["k"], salt=4, how=how).collect())
    )
    want = sorted(map(tuple, skewed.join(other, ["k"], how).collect()))
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab c.!?",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_partition_property(spark, texts):
    """exact_dedup must partition ids: every id in exactly one group,
    dup_counts summing to the row count, survivors = min id of each
    normalized-content class."""
    from reddit_etl_spark.operators.dedup import exact_dedup
    from reddit_etl_spark.operators.text import normalize_text_col  # noqa: F401

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = exact_dedup(df, "doc_id", ["text"]).collect()
    assert sum(r.dup_count for r in rows) == len(texts)

    import re

    classes: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        classes.setdefault(norm, []).append(i)
    want = {min(ids): len(ids) for ids in classes.values()}
    assert {r.doc_id: r.dup_count for r in rows} == want


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "DUP LINE"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_segment_dedup_sep_mode_invariants(spark, docs):
    """Randomized line corpora: (a) conservation — surviving segment
    count equals n_segments - n_removed; (b) idempotence — re-running
    keep='first' on its own output removes nothing (line boundaries
    are stable under removal, unlike word windows)."""
    from reddit_etl_spark.operators.dedup import segment_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = segment_dedup(df, "doc_id", "text", sep="\n", keep="first")
    collected = out.collect()
    for r in collected:
        survivors = [s for s in r["text_deduped"].split("\n") if s]
        assert len(survivors) == r["n_segments"] - r["n_removed"]
    again = segment_dedup(
        out.select("doc_id", F.col("text_deduped").alias("text")),
        "doc_id",
        "text",
        sep="\n",
        keep="first",
    )
    assert again.agg(F.sum("n_removed")).first()[0] == 0
    # global uniqueness: each distinct normalized line survives once
    from collections import Counter

    c = Counter()
    for r in collected:
        for s in r["text_deduped"].split("\n"):
            if s:
                c[s.lower()] += 1
    assert all(v == 1 for v in c.values())


@settings(**SETTINGS)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll",), max_codepoint=0x24F
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_unigram_encode_always_roundtrips(spark, words):
    """Any corpus — including unicode outside the trained charset —
    must encode losslessly: single-char coverage plus the UNK
    fallback guarantee concatenating the pieces rebuilds each word."""
    from reddit_etl_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    model = train_unigram(df, "text", vocab_size=30, em_iters=1)
    out = unigram_encode(
        spark.createDataFrame(
            [(1, text), (2, text + " zzéxtra")],
            "doc_id long, text string",
        ),
        "text",
        model,
    ).collect()
    got = {r["doc_id"]: "".join(r["pieces"]) for r in out}
    assert got[1] == text.lower().replace(" ", "")
    assert got[2] == (text + " zzéxtra").lower().replace(" ", "")
