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


def test_corpus_chunk_dedup_search_chain(spark):
    """The round-5 retrieval chain: chunk -> dedup -> bm25/hybrid
    search, every step the same facade verbs as the document-level
    chain (chunk() re-keys on chunk_uid/chunk_text)."""
    import numpy as np

    from reddit_etl_spark.operators.text import bm25_scores, chunk_documents

    long_a = " ".join(["data model training"] * 20)  # 60 tokens
    docs = spark.createDataFrame(
        [
            (0, long_a),
            (1, long_a),  # exact dup of doc 0 -> identical chunks
            (2, "weather report sunny and short"),
        ],
        "doc_id long, text string",
    )
    c = Corpus(docs).chunk(chunk_tokens=16, overlap=4).dedup_exact()
    out = c.df
    assert c.id_col == "chunk_uid" and c.text_col == "chunk_text"
    # provenance columns survive the chain
    assert {"doc_id", "chunk_id", "chunk_uid", "chunk_text"} <= set(out.columns)
    # dedup collapsed doc 1's chunks into doc 0's (identical windows) —
    # and the periodic text also collapses doc 0's internal repeats, so
    # the survivors are exactly doc 0's DISTINCT window texts
    n_distinct_windows = (
        chunk_documents(docs.filter("doc_id = 0"), "doc_id", "text", 16, 4)
        .select("chunk_text")
        .distinct()
        .count()
    )
    surviving_docs = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert surviving_docs == {0, 2}
    assert out.filter("doc_id = 0").count() == n_distinct_windows

    # bm25 over the chunk corpus matches the direct scorer on c.df
    scores = {r.chunk_uid: r.bm25 for r in c.bm25(["data", "model"]).collect()}
    direct = {
        r.chunk_uid: r.bm25
        for r in bm25_scores(out, "chunk_uid", "chunk_text", ["data", "model"]).collect()
    }
    assert scores == direct and len(scores) > 0
    # index form agrees too
    from reddit_etl_spark.operators.text import bm25_from_index

    postings, stats = c.bm25_index()
    via_index = {
        r.chunk_uid: r.bm25
        for r in bm25_from_index(postings, stats, "chunk_uid", ["data", "model"]).collect()
    }
    assert via_index == direct


def test_corpus_hybrid_search_drops_filtered_embeddings(spark):
    """Corpus.hybrid_search restricts the vector leg to chain
    survivors, so a doc dropped upstream cannot reappear via ANN."""
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(12, 6))
    docs = spark.createDataFrame(
        [(i, "data model training useful text here") for i in range(10)]
        + [(10, "x" * 400), (11, "data model training useful text here")],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    c = Corpus(docs).quality_filter(min_tokens=5, max_punct_ratio=0.1)
    kept = {r.doc_id for r in c.df.select("doc_id").collect()}
    assert 10 not in kept  # the punctuation-free x-wall fails the gate
    fused = c.hybrid_search(emb, ["data", "model"], query_vec_id=0, k=8)
    fused_docs = {r.doc_id for r in fused.collect()}
    assert 10 not in fused_docs and len(fused_docs) > 0
    assert fused.columns == ["doc_id", "rrf", "lex_rank", "ann_rank"]


def test_perplexity_filter_drops_gibberish(spark):
    from reddit_etl_spark.corpus import Corpus

    fluent = "the cat sat on the mat and the dog sat on the rug"
    # NOTE: no rare-token gibberish doc here on purpose — a SELF-trained
    # bigram LM assigns a self-consistent rare doc high probability (its
    # own bigrams are the only evidence for its contexts); the gate
    # separates REORDERINGS of common words, which is what it is for
    rows = [(i, fluent) for i in range(8)] + [
        (90, "rug the mat on dog sat the cat and on the the sat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = Corpus(df)
    scored = {
        r["doc_id"]: r["perplexity"]
        for r in __import__(
            "reddit_etl_spark.operators.text", fromlist=["bigram_logprob_score"]
        ).bigram_logprob_score(df, "doc_id", "text").collect()
    }
    cut = (max(scored[i] for i in range(8)) + scored[90]) / 2
    kept = {r["doc_id"] for r in base.perplexity_filter(cut).df.collect()}
    assert kept == set(range(8))


def test_corpus_classify_uses_explicit_labels(spark):
    from reddit_etl_spark.corpus import Corpus

    rows = [
        (1, "spam spam offer", "spam"),
        (2, "offer spam spam", "spam"),
        (3, "meeting notes agenda", "ham"),
        (4, "notes agenda notes", "ham"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    out = Corpus(df).classify(label_col="label").collect()
    assert {r["doc_id"]: r["predicted"] for r in out} == {
        1: "spam", 2: "spam", 3: "ham", 4: "ham",
    }


def test_corpus_duplicate_spans_surfaces_boilerplate(spark):
    from reddit_etl_spark.corpus import Corpus

    boiler = "this content is provided as is without warranty of any kind"
    # one distinct single-token suffix per doc, so every 8-token span
    # crossing the boundary is unique to its doc and only spans fully
    # inside the boilerplate repeat across documents
    rows = [(i, f"{boiler} unique{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = Corpus(df).duplicate_spans(n=8, k=5).collect()
    assert spans and spans[0]["n_docs"] == 4
    assert spans[0]["span"] in boiler


def test_corpus_dedup_segments_strips_boilerplate_in_chain(spark):
    from reddit_etl_spark.corpus import Corpus

    rows = [
        (1, "all rights reserved\nalpha beta gamma"),
        (2, "all rights reserved\ndelta epsilon zeta"),
        (3, "all rights reserved\neta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text"]
        for r in Corpus(df)
        .dedup_segments(sep="\n", keep="none", min_docs=3)
        .df.collect()
    }
    assert out == {
        1: "alpha beta gamma",
        2: "delta epsilon zeta",
        3: "eta theta iota",
    }
    # keep='first' retains exactly one copy of the shared line
    first = {
        r["doc_id"]: r["text"]
        for r in Corpus(df).dedup_segments(sep="\n", keep="first").df.collect()
    }
    assert first[1] == rows[0][1]
    assert first[2] == "delta epsilon zeta"


def test_corpus_tokenize_unigram_chain(spark):
    from reddit_etl_spark.corpus import Corpus

    rows = [(i, "unigram pieces segment unigram text") for i in range(15)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = Corpus(df).tokenize_unigram(vocab_size=40).df.first()
    assert "".join(out["unigram_pieces"]) == "unigrampiecessegmentunigramtext"


def test_corpus_search_eval_and_zipf_compose(spark):
    from reddit_etl_spark.corpus import Corpus

    rows = [
        (1, "spark join hash join"),
        (2, "hash table scan"),
        (3, "window stream batch"),
        (4, "join hash spark spark"),
        (5, "unrelated words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = Corpus(df, id_col="doc_id", text_col="text")
    ev = {r["query_id"]: r for r in
          c.search_eval({"q": ["join", "hash"]}, k=3).collect()}
    assert set(ev) == {"q"}
    assert ev["q"]["n_rel"] == 3          # docs 1, 2, 4 contain terms
    assert ev["q"]["precision"] == 1.0    # top-3 are exactly those
    assert ev["q"]["ndcg"] is not None

    z = c.zipf(top_n=3).collect()[0]
    assert z["n"] == 3 and z["slope"] is not None

    # the gauge runs on the SURVIVING chain: dedup drops doc 4's twin
    # vocabulary weight and the fit changes deterministically
    z2 = c.dedup_exact().zipf(top_n=3).collect()[0]
    assert z2["n"] == 3


def test_corpus_leakage_safe_splits_chain(spark):
    from reddit_etl_spark.corpus import Corpus

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),      # exact twin of 1
        (3, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster"], r["split"]) for r in
           Corpus(df, id_col="doc_id", text_col="text")
           .leakage_safe_splits(threshold=0.5).collect()}
    assert got[1] == got[2]          # the twin pair stays together
    assert got[3][0] == 3            # singleton keeps its own id
