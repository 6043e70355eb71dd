"""Multinomial Naive Bayes: hand-computed posterior checks, smoothing
floors, tie-breaks, and the self-training pipeline contract."""

import math

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.classify import (
    nb_predict,
    nb_self_train_language,
    nb_train,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "spam spam offer", "spam"),
        (2, "offer spam", "spam"),
        (3, "meeting notes agenda", "ham"),
        (4, "agenda notes", "ham"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_train_counts(tiny):
    class_stats, term_counts = nb_train(tiny, "doc_id", "text", "label")
    cs = {r["label"]: (r["n_docs"], r["n_tokens"]) for r in class_stats.collect()}
    assert cs == {"spam": (2.0, 5.0), "ham": (2.0, 5.0)}
    tc = {(r["label"], r["term"]): r["n"] for r in term_counts.collect()}
    assert tc[("spam", "spam")] == 3.0
    assert tc[("spam", "offer")] == 2.0
    assert tc[("ham", "notes")] == 2.0


def test_nb_predict_hand_computed_posterior(spark, tiny):
    class_stats, term_counts = nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame([(9, "spam offer")], "doc_id long, text string")
    rows = nb_predict(
        test, "doc_id", "text", class_stats, term_counts, label_col="label"
    ).collect()
    assert len(rows) == 1 and rows[0]["predicted"] == "spam"
    # |V| = 5 (spam offer meeting notes agenda); T(spam)=5, alpha=1
    lp = math.log((3 + 1) / (5 + 5)) + math.log((2 + 1) / (5 + 5))
    expected = round(math.log(0.5) + round(lp, 6), 6)
    assert rows[0]["score"] == pytest.approx(expected, abs=1e-9)


def test_nb_unseen_token_uses_floor_not_crash(spark, tiny):
    class_stats, term_counts = nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame(
        [(9, "zebra zebra offer")], "doc_id long, text string"
    )
    rows = nb_predict(
        test, "doc_id", "text", class_stats, term_counts, label_col="label"
    ).collect()
    # 'zebra' floors equally in both classes; 'offer' decides for spam
    assert rows[0]["predicted"] == "spam"


def test_nb_empty_doc_absent_and_tiebreak_to_first_class(spark, tiny):
    class_stats, term_counts = nb_train(tiny, "doc_id", "text", "label")
    test = spark.createDataFrame(
        [(8, ""), (9, None), (10, "zebra")], "doc_id long, text string"
    )
    rows = nb_predict(
        test, "doc_id", "text", class_stats, term_counts, label_col="label"
    ).collect()
    # empty/null docs have no tokens -> absent; 'zebra' scores the same
    # floor in both classes (equal priors, equal totals) -> 'ham' wins
    # the class-name tiebreak
    assert {r["doc_id"]: r["predicted"] for r in rows} == {10: "ham"}


def test_self_train_language_agrees_with_confident_teacher(spark):
    rows = [
        (i, "the cat and the dog is a friend of the house") for i in range(5)
    ] + [
        (10 + i, "el perro y los gatos que viven en la casa") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = nb_self_train_language(df, "doc_id", "text").collect()
    for r in out:
        assert r["predicted"] == r["label"]
    langs = {r["predicted"] for r in out}
    assert langs == {"en", "es"}


def test_nb_model_joins_are_broadcast(spark, tiny):
    class_stats, term_counts = nb_train(tiny, "doc_id", "text", "label")
    plan = (
        nb_predict(tiny, "doc_id", "text", class_stats, term_counts, "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
