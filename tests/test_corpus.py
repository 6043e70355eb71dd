"""Corpus facade: the fluent chain must equal the individually-applied
operators and stay one lazy plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.corpus import Corpus

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_chain_matches_componentwise(spark, docs):
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    c = (
        Corpus(docs)
        .quality_filter(min_tokens=20, max_punct_ratio=0.1)
        .dedup_exact()
        .dedup_near(threshold=0.5)
        .decontaminate(bench)
    )
    got = {r.doc_id for r in c.df.select("doc_id").collect()}

    # componentwise replica
    from reddit_etl_spark.operators.curation import decontaminate
    from reddit_etl_spark.operators.dedup import exact_dedup, ngram_jaccard_pairs
    from reddit_etl_spark.operators.graph import (
        connected_components,
        dedup_survivors,
    )
    from reddit_etl_spark.operators.text import punct_count_col, token_count_col

    kept = docs.filter(
        (token_count_col(F.col("text")) >= 20)
        & (punct_count_col(F.col("text")) / F.length("text") <= 0.1)
    )
    k2 = kept.join(
        exact_dedup(kept, "doc_id", ["text"]).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    comps = connected_components(
        ngram_jaccard_pairs(k2, "doc_id", "text", n=3, threshold=0.5),
        "id_a",
        "id_b",
    )
    surv = dedup_survivors(k2, comps, "doc_id")
    cont = decontaminate(surv, bench, "doc_id", "text", n=5)
    want = {
        r.doc_id
        for r in surv.join(
            cont.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id").collect()
    }
    assert got == want and got


def test_terminal_actions(spark, docs):
    c = Corpus(docs).quality_filter()
    budget = c.token_budget().first()
    assert budget.docs > 0 and budget.tokens > 0
    packed = c.pack(budget=2000, group_col="source")
    assert packed.count() == budget.docs
    assert packed.filter(F.col("bin") < 0).count() == 0


def test_sampling_steps(spark, docs):
    half = Corpus(docs).sample(0.5)
    n = half.df.count()
    assert 0.35 * 500 < n < 0.65 * 500
    top = Corpus(docs).weighted_sample(3, "n_chars", group_col="source")
    counts = top.df.groupBy("source").count().collect()
    assert all(r["count"] == 3 for r in counts)


def test_bloom_method_superset(spark, docs):
    bench = docs.filter(F.col("doc_id") % 23 == 0)
    exact_kept = {
        r.doc_id
        for r in Corpus(docs).decontaminate(bench, method="set").df.collect()
    }
    bloom_kept = {
        r.doc_id
        for r in Corpus(docs).decontaminate(bench, method="bloom").df.collect()
    }
    # bloom flags a superset -> keeps a subset
    assert bloom_kept <= exact_kept


def test_corpus_tokenize_bpe_chain(spark):
    """tokenize_bpe slots into the fluent chain; token_budget then
    sums the REAL BPE counts instead of the regex approximation."""
    from reddit_etl_spark.corpus import Corpus

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "newer newest"), (3, "the fox")],
        "doc_id long, text string",
    )
    c = Corpus(df, id_col="doc_id", text_col="text").tokenize_bpe(num_merges=10)
    out = c.df
    assert "bpe_tokens" in out.columns and "bpe_token_count" in out.columns
    budget = c.token_budget().first()
    assert budget.docs == 3
    assert budget.tokens == out.agg(
        F.sum("bpe_token_count")
    ).first()[0]
    # pre-trained merges keep the chain lazy and reproducible
    from reddit_etl_spark.operators.bpe import train_bpe

    merges = train_bpe(df, "text", num_merges=10)
    c2 = Corpus(df, id_col="doc_id", text_col="text").tokenize_bpe(merges)
    assert (
        c2.df.select("doc_id", "bpe_tokens").collect()
        == c.df.select("doc_id", "bpe_tokens").collect()
    )
