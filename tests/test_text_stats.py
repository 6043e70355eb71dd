"""Vocabulary / TF-IDF operators: hand-computable micro-corpus checks
plus plan-shape assertions (broadcast re-join, TakeOrderedAndProject)."""

import math

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.text import term_stats, tfidf_top_terms, vocab_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple  CHERRY cherry"),  # double space + case fold
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_stats_counts(corpus):
    got = {r["term"]: (r["tf"], r["df"]) for r in term_stats(corpus, "doc_id", "text").collect()}
    assert got == {
        "apple": (3, 2),
        "banana": (2, 2),
        "cherry": (3, 2),
    }


def test_vocab_topk_deterministic_tiebreak(corpus):
    rows = vocab_topk(corpus, "doc_id", "text", k=2).collect()
    # apple and cherry tie at tf=3 -> term asc breaks the tie
    assert [(r["term"], r["tf"]) for r in rows] == [("apple", 3), ("cherry", 3)]


def test_tfidf_scores_match_hand_computation(corpus):
    rows = tfidf_top_terms(corpus, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # idf uses N = count of docs incl. empty ones (5 docs)
    idf = lambda df_t: math.log(5 / df_t)  # noqa: E731
    doc1 = {r["term"]: r["tfidf"] for r in by_doc[1]}
    assert doc1["apple"] == pytest.approx(round(2 * idf(2), 6), abs=1e-9)
    # ranks are dense 1..k and unique per doc
    for recs in by_doc.values():
        assert sorted(r["rank"] for r in recs) == list(range(1, len(recs) + 1))


def test_tfidf_join_is_broadcast(corpus):
    plan = tfidf_top_terms(corpus, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_vocab_topk_plans_take_ordered(corpus):
    plan = vocab_topk(corpus, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
