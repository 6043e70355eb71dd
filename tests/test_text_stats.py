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


def test_repetition_profile_hand_computed(spark):
    from reddit_etl_spark.operators.text import repetition_profile

    df = spark.createDataFrame(
        [
            # 6 tokens: 'a b a b a b' -> distinct {a,b}; bigrams
            # [ab,ba,ab,ba,ab] -> top 'a b' 3/5; trigrams
            # [aba,bab,aba,bab] -> distinct 2/4
            (1, "a b a b a b"),
            # all-distinct doc: zero repetition; long enough that the
            # 1/n_bigrams floor of top_bigram_frac clears the 0.18 gate
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            repetition_profile(df, "doc_id", "text").collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["n_tokens"] == 6
    assert r1["dup_unigram_frac"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r1["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert r1["dup_trigram_frac"] == pytest.approx(1 - 2 / 4, abs=1e-6)
    assert not r1["passes_repetition"]
    assert r2["dup_unigram_frac"] == 0.0
    assert r2["dup_trigram_frac"] == 0.0
    assert r2["passes_repetition"]


def test_repetition_profile_shuffle_free_after_fanout(spark):
    from reddit_etl_spark.operators.text import repetition_profile

    df = spark.range(64).select(
        F.col("id").alias("doc_id"), F.lit("w x y z").alias("text")
    )
    plan = repetition_profile(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    # the only exchange allowed is fan_out's round-robin repartition;
    # the statistics themselves never shuffle
    assert plan.count("Exchange") <= 1
    assert "SortAggregate" not in plan and "HashAggregate" not in plan


def test_unigram_logprob_ranks_fluent_above_gibberish(spark):
    from reddit_etl_spark.operators.text import unigram_logprob_score

    common = "the quick brown fox and the lazy dog"
    docs = spark.createDataFrame(
        [(i, common) for i in range(20)]
        + [(100, "the quick brown fox"), (101, "zxqv jkwp mmtr qqzz")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in unigram_logprob_score(docs, "doc_id", "text", vocab_size=10).collect()
    }
    # doc built of corpus-frequent tokens outranks rare-token soup
    assert rows[100].avg_logprob > rows[101].avg_logprob
    assert rows[100].n_tokens == 4
    # OOV floor: gibberish tokens fall outside the top-10 vocab and get
    # the sub-vocab floor, so the score is very low
    assert rows[101].avg_logprob < rows[0].avg_logprob


def test_unigram_logprob_empty_and_oov_floor(spark):
    import math

    from reddit_etl_spark.operators.text import unigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_score(docs, "doc_id", "text").collect()}
    # all-whitespace / NULL docs produce no token rows at all
    assert set(rows) == {1}
    # both tokens in vocab (corpus of 2 tokens): p=0.5 each
    assert rows[1].avg_logprob == pytest.approx(round(math.log(0.5), 6), abs=1e-6)


def test_normalize_unicode_nfc_merges_decomposed(spark):
    from reddit_etl_spark.operators.dedup import exact_dedup
    from reddit_etl_spark.operators.text import normalize_unicode

    composed = "café society"          # é as U+00E9
    decomposed = "café society"       # e + combining acute
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in normalize_unicode(df, "text").collect()}
    assert out[1] == out[2] == composed
    assert out[3] is None
    # the multilingual-dedup motivation: without NFC these are distinct
    raw_groups = exact_dedup(df, "doc_id", ["text"]).count()
    nfc_groups = exact_dedup(
        normalize_unicode(df, "text"), "doc_id", ["text"]
    ).count()
    assert raw_groups == 3 and nfc_groups == 2


def test_normalize_unicode_out_col_and_forms(spark):
    from reddit_etl_spark.operators.text import normalize_unicode

    df = spark.createDataFrame([(1, "ﬁle")], "doc_id long, text string")
    # NFKC folds the fi ligature; NFC does not
    nfkc = normalize_unicode(df, "text", form="NFKC", out_col="norm").first()
    assert nfkc.text == "ﬁle" and nfkc.norm == "file"


def test_split_sentences(spark):
    from reddit_etl_spark.operators.text import split_sentences

    df = spark.createDataFrame(
        [(1, "First one. Second one! Third?  "), (2, "no terminal punct")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.sentence_idx, r.sentence)
        for r in split_sentences(df, "doc_id", "text").collect()
    )
    assert rows == [
        (1, 0, "First one"),
        (1, 1, "Second one"),
        (1, 2, "Third"),
        (2, 0, "no terminal punct"),
    ]


def test_chunk_documents_window_invariants(spark):
    """Every token lands in >=1 chunk; consecutive chunks overlap by
    exactly `overlap` tokens; short docs yield one chunk; no UDF or
    exchange in the plan."""
    from reddit_etl_spark.operators.text import chunk_documents

    texts = {
        1: " ".join(f"t{i}" for i in range(23)),
        2: "a b c",                                   # shorter than chunk
        3: " ".join(f"x{i}" for i in range(10)),      # exactly one chunk
        4: " ".join(f"y{i}" for i in range(17)),      # exact two-stride fit
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap=3)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id))
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "a b c"
    assert len(by_doc[3]) == 1
    for doc_id, chunks in by_doc.items():
        toks = texts[doc_id].split()
        # coverage: concatenating de-overlapped chunks rebuilds the doc
        rebuilt = chunks[0].chunk_text.split()
        for prev, cur in zip(chunks, chunks[1:]):
            p, c = prev.chunk_text.split(), cur.chunk_text.split()
            stride = 10 - 3
            assert p[stride:] == c[: len(p) - stride]  # shared context
            rebuilt.extend(c[len(p) - stride:])
        assert rebuilt == toks
        for r in chunks:
            assert r.chunk_token_count == len(r.chunk_text.split())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow off the scan
    import pytest

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_bm25_matches_reference_implementation(spark):
    """Spark BM25 vs a direct python computation of the
    Robertson-Sparck-Jones formula on a hand-sized corpus."""
    import math

    from reddit_etl_spark.operators.text import bm25_scores

    corpus = {
        1: "data model training data data",
        2: "model serving pipeline",
        3: "weather report sunny",
        4: "training data for the model",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    q = ["data", "model", "training"]
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, "doc_id", "text", q).collect()}

    n = len(corpus)
    dls = {d: len(t.split()) for d, t in corpus.items()}
    avgdl = sum(dls.values()) / n
    dfreq = {t: sum(1 for txt in corpus.values() if t in txt.split()) for t in q}
    want = {}
    for d, txt in corpus.items():
        s = 0.0
        for t in q:
            tf = txt.split().count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        if s > 0:
            want[d] = round(s, 6)
    assert set(got) == set(want)  # doc 3 matches nothing -> absent
    for d in want:
        assert abs(got[d] - want[d]) < 1e-6, (d, got[d], want[d])
    # heaviest term stuffing + repetition ranks doc 1 first
    assert max(got, key=got.get) == 1


def test_bm25_index_path_equals_direct_scorer(spark, tmp_path):
    """bm25_from_index over a PERSISTED build_bm25_index output must
    reproduce bm25_scores exactly — the repeated-retrieval contract
    (score from the index, never rescan the corpus)."""
    from reddit_etl_spark.operators.text import (
        bm25_from_index,
        bm25_scores,
        build_bm25_index,
    )

    df = spark.createDataFrame(
        [
            (1, "data model training data data"),
            (2, "model serving pipeline"),
            (3, "weather report sunny"),
            (4, "training data for the model"),
            (5, "   "),  # whitespace-only doc: counted in N/avgdl only
        ],
        "doc_id long, text string",
    )
    q = ["data", "model", "training"]
    postings, stats = build_bm25_index(df, "doc_id", "text")
    # round-trip through parquet, term-partitioned (the deployment
    # layout: a 3-term query scans 3 partitions, not the corpus)
    postings.write.partitionBy("term").parquet(str(tmp_path / "postings"))
    stats.write.parquet(str(tmp_path / "stats"))
    p2 = spark.read.parquet(str(tmp_path / "postings"))
    s2 = spark.read.parquet(str(tmp_path / "stats"))

    direct = {r.doc_id: r.bm25 for r in bm25_scores(df, "doc_id", "text", q).collect()}
    indexed = {
        r.doc_id: r.bm25
        for r in bm25_from_index(p2, s2, "doc_id", q).collect()
    }
    assert indexed == direct and len(direct) > 0
    # term partition pruning reaches the scan: only query-term dirs read
    plan = bm25_from_index(
        p2, s2, "doc_id", q
    )._jdf.queryExecution().executedPlan().toString()
    assert "term IN (data,model,training)" in plan or "PartitionFilters" in plan


def test_hybrid_search_ann_dispatch(spark):
    """retrieval.hybrid_search fuses BM25 + ANN; the bucketed legs
    ('lsh'/'ivf') must return the same schema as the exact leg and
    rank fused docs plausibly (exact-leg parity checked where the
    candidate sets align)."""
    import numpy as np
    import pytest

    from reddit_etl_spark.operators.retrieval import hybrid_search

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(30, 8)).tolist()
    docs = spark.createDataFrame(
        [(i, "data model training" if i % 3 == 0 else "weather sunny")
         for i in range(30)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    exact = hybrid_search(
        docs, emb, "doc_id", "text", ["data", "model"], "vec_id",
        "embedding", 0, k=5, ann="exact",
    )
    cols = ["doc_id", "rrf", "lex_rank", "ann_rank"]
    assert exact.columns == cols
    er = exact.collect()
    assert 0 < len(er) <= 10  # two k=5 legs, overlap possible
    for alg in ("lsh", "ivf"):
        out = hybrid_search(
            docs, emb, "doc_id", "text", ["data", "model"], "vec_id",
            "embedding", 0, k=5, ann=alg,
        )
        assert out.columns == cols
        rows = out.collect()
        # the lex leg is deterministic: its ranked docs appear identically
        lex_exact = {r.doc_id: r.lex_rank for r in er if r.lex_rank > 0}
        lex_alg = {r.doc_id: r.lex_rank for r in rows if r.lex_rank > 0}
        assert lex_alg == lex_exact
    with pytest.raises(ValueError, match="ann must be one of"):
        hybrid_search(
            docs, emb, "doc_id", "text", ["data"], "vec_id",
            "embedding", 0, ann="hnsw",
        )


class TestBigramLogprobScore:
    """Hand-computable bigram-LM checks on a 3-doc micro-corpus."""

    @pytest.fixture(scope="class")
    def scored(self, spark):
        from reddit_etl_spark.operators.text import bigram_logprob_score

        rows = [
            (1, "a b a b"),
            (2, "a b c"),
            (3, "solo"),
            (4, None),
            (5, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = bigram_logprob_score(df, "doc_id", "text", vocab_size=100)
        return {r["doc_id"]: r for r in out.collect()}

    def test_hand_computed_model(self, scored):
        # corpus bigrams: d1 -> (a,b)(b,a)(a,b); d2 -> (a,b)(b,c)
        # c(a,b)=3 c(b,a)=1 c(b,c)=1 ; c(a,.)=3 c(b,.)=2 ; V=4 (a b c solo)
        k, V = 0.5, 4.0
        lp_ab = math.log((3 + k) / (3 + k * V))
        lp_ba = math.log((1 + k) / (2 + k * V))
        lp_bc = math.log((1 + k) / (2 + k * V))
        d1 = round(round(2 * lp_ab + lp_ba, 6) / 3, 6)
        d2 = round(round(lp_ab + lp_bc, 6) / 2, 6)
        assert scored[1]["n_bigrams"] == 3
        assert scored[1]["avg_logprob"] == pytest.approx(d1, abs=1e-9)
        assert scored[2]["avg_logprob"] == pytest.approx(d2, abs=1e-9)
        assert scored[1]["perplexity"] == pytest.approx(
            round(math.exp(-d1), 2), abs=1e-9
        )

    def test_short_null_empty_docs_absent(self, scored):
        # <2 tokens => no bigrams => no row
        assert set(scored) == {1, 2}

    def test_fluent_beats_shuffled(self, spark):
        # repeated common transitions score higher than a one-off
        # permutation with the SAME unigram profile
        from reddit_etl_spark.operators.text import bigram_logprob_score

        fluent = "the cat sat on the mat"
        rows = [(i, fluent) for i in range(10)] + [(99, "mat the on sat cat the")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r["avg_logprob"]
               for r in bigram_logprob_score(df, "doc_id", "text").collect()}
        assert out[0] > out[99]


class TestDuplicateSpans:
    def test_shared_span_detected_with_counts(self, spark):
        from reddit_etl_spark.operators.text import duplicate_spans

        shared = "one two three four"
        rows = [
            (1, f"{shared} alpha beta"),
            (2, f"gamma {shared} delta"),
            (3, f"{shared} epsilon {shared}"),   # twice in one doc
            (4, "totally unrelated words here now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = duplicate_spans(df, "doc_id", "text", n=4, min_docs=2, k=10).collect()
        got = {r.span: (r.n_docs, r.n_occurrences) for r in out}
        assert got[shared] == (3, 4)
        # spans crossing into doc-specific suffixes never reach min_docs
        assert all(r.n_docs >= 2 for r in out)

    def test_docs_shorter_than_n_contribute_nothing(self, spark):
        from reddit_etl_spark.operators.text import duplicate_spans

        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c"), (3, None), (4, "")],
            "doc_id long, text string",
        )
        assert duplicate_spans(df, "doc_id", "text", n=4).count() == 0
        # at n=3 the whole doc is the span, shared by docs 1 and 2
        rows = duplicate_spans(df, "doc_id", "text", n=3).collect()
        assert [(r.span, r.n_docs) for r in rows] == [("a b c", 2)]

    def test_plans_take_ordered(self, spark):
        from reddit_etl_spark.operators.text import duplicate_spans

        df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        plan = (
            duplicate_spans(df, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# rake_keyphrases — RAKE keyword extraction
# ---------------------------------------------------------------------------


def test_rake_multiword_phrases_outrank_frequent_words(spark):
    from reddit_etl_spark.operators.text import rake_keyphrases

    text = (
        "machine learning systems and data. the machine learning "
        "systems in production. quality matters and quality helps."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = rake_keyphrases(df, "doc_id", "text", top_k=3).collect()
    ranked = [r["phrase"] for r in sorted(got, key=lambda r: r["rank"])]
    # the 3-word phrase dominates: each word has freq 2, degree 6 ->
    # word score 3, phrase score 9; "quality matters"/"quality helps"
    # score 4
    assert ranked[0] == "machine learning systems"
    assert all(r["score"] > 0 for r in got)


def test_rake_repeated_candidate_scores_once(spark):
    from reddit_etl_spark.operators.text import rake_keyphrases

    # "green widget" appears 3x; its phrase score must equal the
    # hand-computed word-score sum, not 3x it
    text = "green widget. green widget. green widget."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {r["phrase"]: r["score"] for r in rake_keyphrases(df, "doc_id", "text").collect()}
    # each word: freq 3, degree 3*2=6 -> score 2.0; phrase = 4.0
    assert got == {"green widget": 4.0}


def test_rake_stopwords_split_phrases(spark):
    from reddit_etl_spark.operators.text import rake_keyphrases

    df = spark.createDataFrame(
        [(1, "deep learning and neural networks")], "doc_id long, text string"
    )
    got = {r["phrase"] for r in rake_keyphrases(df, "doc_id", "text").collect()}
    # "and" splits the candidates; no phrase crosses it
    assert got == {"deep learning", "neural networks"}


def test_rake_phrase_length_cap(spark):
    from reddit_etl_spark.operators.text import rake_keyphrases

    df = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    got = rake_keyphrases(df, "doc_id", "text", max_phrase_words=4).collect()
    assert got == []  # the 6-word run exceeds the cap and is dropped


class TestRankingMetrics:
    def _run(self, spark, ranked, qrels, k):
        from reddit_etl_spark.operators.retrieval import ranking_metrics

        r = spark.createDataFrame(
            ranked, "query_id string, doc_id long, rank long"
        )
        q = spark.createDataFrame(
            qrels, "query_id string, doc_id long, rel long"
        )
        return {
            row["query_id"]: row
            for row in ranking_metrics(r, q, k=k).collect()
        }

    def test_hand_computed_ndcg_mrr_precision_recall(self, spark):
        import math

        ranked = [("a", 1, 1), ("a", 2, 2), ("a", 3, 3)]
        qrels = [("a", 2, 2), ("a", 9, 1), ("a", 3, 1)]
        got = self._run(spark, ranked, qrels, k=3)["a"]
        dcg = round(2 / math.log2(3) + 1 / math.log2(4), 6)
        idcg = round(2 / 1 + 1 / math.log2(3) + 1 / math.log2(4), 6)
        assert got["ndcg"] == round(dcg / idcg, 6)
        assert got["mrr"] == 0.5            # first hit at rank 2
        assert got["precision"] == round(2 / 3, 6)
        assert got["recall"] == round(2 / 3, 6)
        assert got["n_ranked"] == 3 and got["n_rel"] == 3

    def test_no_judged_relevants_yields_null_ndcg(self, spark):
        ranked = [("b", 1, 1), ("b", 2, 2)]
        qrels = [("a", 1, 1)]  # nothing judged for b
        got = self._run(spark, ranked, qrels, k=5)["b"]
        assert got["ndcg"] is None and got["recall"] is None
        assert got["mrr"] == 0.0 and got["precision"] == 0.0
        assert got["n_rel"] == 0

    def test_rank_cut_and_perfect_ordering(self, spark):
        # relevant doc sits at rank 11 -> outside k=10, not counted;
        # a perfectly ordered top-k scores ndcg exactly 1.
        ranked = [("c", i, i) for i in range(1, 12)]
        qrels = [("c", 1, 3), ("c", 2, 2), ("c", 11, 2)]
        got = self._run(spark, ranked, qrels, k=10)["c"]
        assert got["n_ranked"] == 10 and got["n_rel"] == 3
        assert got["recall"] == round(2 / 3, 6)
        perfect = [("d", 1, 1), ("d", 2, 2)]
        pq = [("d", 1, 2), ("d", 2, 1)]
        pgot = self._run(spark, perfect, pq, k=2)["d"]
        assert pgot["ndcg"] == 1.0 and pgot["mrr"] == 1.0

    def test_rejects_bad_k(self, spark):
        import pytest as _p

        from reddit_etl_spark.operators.retrieval import ranking_metrics

        df = spark.createDataFrame(
            [("a", 1, 1)], "query_id string, doc_id long, rank long"
        )
        with _p.raises(ValueError, match="k >= 1"):
            ranking_metrics(df, df, k=0)


def test_zipf_fit_recovers_exact_power_law(spark):
    import math

    from reddit_etl_spark.operators.text import zipf_fit

    # Frequencies follow f = 48/rank exactly, so log2(f) =
    # log2(48) - log2(rank): a perfect slope -1 line (up to the
    # rounded-moment quantization, which perturbs at the 1e-6 scale).
    freqs = {"aa": 48, "bb": 24, "cc": 16, "dd": 12}
    text = " ".join(t for t, n in freqs.items() for _ in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = zipf_fit(df, "doc_id", "text", top_n=4).collect()[0]
    assert row["n"] == 4
    assert abs(row["slope"] - (-1.0)) <= 5e-6
    assert abs(row["intercept"] - math.log2(48)) <= 1e-5
    assert row["r2"] is not None and row["r2"] >= 0.999999


def test_zipf_fit_top_n_cut_is_deterministic(spark):
    from reddit_etl_spark.operators.text import zipf_fit

    # ties at the cut boundary resolve by term asc: with top_n=2 and
    # three terms at tf=2, the kept set is stable -> zero x-variance
    # is impossible here, but the fit must be reproducible run-to-run
    df = spark.createDataFrame(
        [(1, "x x y y z z w")], "doc_id long, text string"
    )
    a = zipf_fit(df, "doc_id", "text", top_n=2).collect()[0]
    b = zipf_fit(df, "doc_id", "text", top_n=2).collect()[0]
    assert a == b and a["n"] == 2


def test_ranking_metrics_empty_ranked_list_emits_zero_row(spark):
    from reddit_etl_spark.operators.retrieval import ranking_metrics

    ranked = spark.createDataFrame(
        [], "query_id string, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 2), ("q", 2, 1)], "query_id string, doc_id long, rel long"
    )
    rows = ranking_metrics(ranked, qrels, k=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_ranked"] == 0 and r["n_rel"] == 2
    assert r["mrr"] == 0.0 and r["precision"] == 0.0 and r["recall"] == 0.0
    assert r["ndcg"] is None


def test_bm25_search_eval_seeds_no_match_queries_and_rejects_empty(spark):
    import pytest as _p

    from reddit_etl_spark.operators.retrieval import bm25_search_eval

    docs = spark.createDataFrame(
        [(1, "spark join hash"), (2, "hash scan")],
        "doc_id long, text string",
    )
    got = {
        r["query_id"]: r
        for r in bm25_search_eval(
            docs, "doc_id", "text",
            {"hit": ["hash"], "miss": ["xyzzy"]}, k=3
        ).collect()
    }
    assert set(got) == {"hit", "miss"}
    assert got["hit"]["n_ranked"] == 2 and got["hit"]["precision"] > 0
    m = got["miss"]
    assert m["n_ranked"] == 0 and m["n_rel"] == 0
    assert m["mrr"] == 0.0 and m["precision"] == 0.0
    assert m["ndcg"] is None and m["recall"] is None

    with _p.raises(ValueError, match="at least one query"):
        bm25_search_eval(docs, "doc_id", "text", {}, k=3)


def test_readability_hand_computed_and_edge_docs(spark):
    from reddit_etl_spark.operators.text import readability_scores

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 18 chars, 2 sents
        (2, "word"),                        # fragment: 1 sentence floor
        (3, ""),                            # wordless
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           readability_scores(df, "doc_id", "text").collect()}

    r1 = got[1]
    assert (r1["n_chars"], r1["n_words"], r1["n_sentences"]) == (18, 6, 2)
    c, w, s = 18, 6, 2
    assert r1["ari"] == (471 * c * s + 50 * w * w - 2143 * w * s) / (100.0 * w * s)
    assert r1["coleman_liau"] == (588 * c - 2960 * s - 1580 * w) / (100.0 * w)
    # cross-check the exact-integer form against the textbook formula
    assert abs(r1["ari"] - (4.71 * c / w + 0.5 * w / s - 21.43)) < 1e-9

    assert got[2]["n_sentences"] == 1 and got[2]["ari"] is not None
    for d in (3, 4):
        assert got[d]["n_words"] == 0 and got[d]["n_sentences"] == 0
        assert got[d]["ari"] is None and got[d]["coleman_liau"] is None


def test_phrase_search_overlaps_positions_and_case(spark):
    import pytest as _p

    from reddit_etl_spark.operators.text import phrase_search

    rows = [
        (1, "a a a b"),            # 'a a' overlaps: positions 0 and 1
        (2, "x A a y"),            # case-folded match at 1
        (3, "a b a"),              # no consecutive 'a a'
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search(df, "doc_id", "text", ["a", "a"]).collect()}
    assert got == {1: (2, 0), 2: (1, 1)}

    # three-token phrase and single-token degenerate form
    tri = phrase_search(df, "doc_id", "text", ["a", "a", "a"]).collect()
    assert {(r["doc_id"], r["n_matches"]) for r in tri} == {(1, 1)}
    one = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(df, "doc_id", "text", ["a"]).collect()}
    assert one == {1: 3, 2: 2, 3: 2}

    with _p.raises(ValueError, match="at least one term"):
        phrase_search(df, "doc_id", "text", [])


def test_phrase_search_positions_index_trimmed_tokens(spark):
    from reddit_etl_spark.operators.text import phrase_search

    df = spark.createDataFrame(
        [(1, "   table hash x"), (2, "table hash")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["first_pos"]
           for r in phrase_search(df, "doc_id", "text",
                                  ["table", "hash"]).collect()}
    # leading whitespace must not shift positions off the trimmed
    # tokenization the rest of the text family uses
    assert got == {1: 0, 2: 0}
