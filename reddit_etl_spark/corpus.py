"""Corpus facade — the switch-over API for the training-data surface.

``Engine`` (engine.py) packages the reference's analytical surface;
``Corpus`` packages the LLM-data extension operators behind one fluent,
lazily-composed object, so the full sweep reads the way a pipeline
author thinks::

    c = (Corpus.from_parquet(spark, "/lake/documents")
         .quality_filter(min_tokens=20, max_punct_ratio=0.1)
         .dedup_exact()
         .dedup_near(threshold=0.5)
         .decontaminate(bench_df)
         .sample(0.5))
    c.df                              # the surviving documents
    c.token_budget()                  # (docs, tokens) summary row
    c.pack(budget=2048, group_col="source")  # training-shard bins
    c.write("/lake/clean")            # materialize

Every step returns a NEW Corpus over a narrower DataFrame — nothing
executes until an action (dedup_near's shared shingle projection uses
a LAZY checkpoint, so even that composes job-free). Catalyst optimizes
within each segment; the near-dup checkpoint intentionally truncates
lineage there so the shingle pass materializes once instead of once
per downstream consumer. The underlying operators are individually
oracle-verified in the harness; ``curation_pipeline_full`` pins this
exact composition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Corpus:
    def __init__(
        self,
        df: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self._df = df
        self.id_col = id_col
        self.text_col = text_col

    # -- construction -------------------------------------------------

    @classmethod
    def from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "Corpus":
        return cls(spark.read.parquet(path), id_col, text_col)

    def _with(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.id_col, self.text_col)

    @property
    def df(self) -> DataFrame:
        return self._df

    # -- filtering steps ----------------------------------------------

    def quality_filter(
        self,
        min_tokens: int = 20,
        max_punct_ratio: float = 0.1,
    ) -> "Corpus":
        """Gopher-style cheap gates: token count + punctuation density."""
        from .operators.text import punct_count_col, token_count_col

        t = F.col(self.text_col)
        return self._with(
            self._df.filter(
                (token_count_col(t) >= min_tokens)
                & (punct_count_col(t) / F.length(t) <= max_punct_ratio)
            )
        )

    def dedup_exact(self) -> "Corpus":
        """Keep one min-id survivor per distinct normalized content."""
        from .operators.dedup import exact_dedup

        survivors = exact_dedup(self._df, self.id_col, [self.text_col])
        return self._with(
            self._df.join(
                survivors.select(self.id_col), self.id_col, "left_semi"
            )
        )

    def dedup_near(self, threshold: float = 0.5, n: int = 3) -> "Corpus":
        """Drop near-duplicate clusters (word-n-gram Jaccard >=
        threshold), keeping the min-id representative + singletons."""
        from .operators.dedup import ngram_jaccard_pairs
        from .operators.graph import connected_components, dedup_survivors

        pairs = ngram_jaccard_pairs(
            self._df, self.id_col, self.text_col, n=n, threshold=threshold
        )
        comps = connected_components(pairs, "id_a", "id_b")
        return self._with(dedup_survivors(self._df, comps, self.id_col))

    def dedup_segments(
        self,
        sep: str = "\n",
        words_per_segment: int | None = None,
        keep: str = "first",
        min_docs: int = 2,
    ) -> "Corpus":
        """Rewrite every document with its corpus-wide duplicated
        segments removed (CCNet line dedup / boilerplate stripping) —
        unlike the document-level dedups, this EDITS texts in place
        and keeps every row. See ``operators.dedup.segment_dedup``
        for the keep='first'/'none' policies."""
        from .operators.dedup import segment_dedup

        rebuilt = segment_dedup(
            self._df,
            self.id_col,
            self.text_col,
            sep=sep,
            words_per_segment=words_per_segment,
            keep=keep,
            min_docs=min_docs,
        )
        return self._with(
            self._df.drop(self.text_col).join(
                rebuilt.select(
                    self.id_col,
                    F.col("text_deduped").alias(self.text_col),
                ),
                self.id_col,
            )
        )

    def decontaminate(
        self,
        benchmark: DataFrame,
        n: int = 5,
        method: str = "set",
    ) -> "Corpus":
        """Drop documents sharing any word-n-gram with the benchmark.
        ``method='bloom'`` uses the bit-array probe (superset of the
        exact flag set — see decontaminate_bloom) when the benchmark
        outgrows a broadcast hash set."""
        from .operators.curation import decontaminate, decontaminate_bloom

        if method not in ("set", "bloom"):
            raise ValueError("method must be 'set' or 'bloom'")
        fn = decontaminate if method == "set" else decontaminate_bloom
        flagged = fn(self._df, benchmark, self.id_col, self.text_col, n=n)
        return self._with(
            self._df.join(
                flagged.select(self.id_col), self.id_col, "left_anti"
            )
        )

    def sample(self, fraction: float) -> "Corpus":
        """Deterministic hash sample (retry/engine-stable)."""
        from .operators.curation import deterministic_sample

        return self._with(
            deterministic_sample(self._df, self.id_col, fraction)
        )

    def weighted_sample(
        self, k: int, weight_col: str, group_col: str | None = None,
        seed: int = 42,
    ) -> "Corpus":
        """Efraimidis-Spirakis top-k without replacement."""
        from .operators.curation import weighted_sample

        return self._with(
            weighted_sample(
                self._df, self.id_col, weight_col, k,
                group_col=group_col, seed=seed,
            )
        )

    def chunk(self, chunk_tokens: int = 512, overlap: int = 64) -> "Corpus":
        """Re-window the corpus into sliding chunks (zero-UDF,
        zero-shuffle — see ``chunk_documents``). The resulting Corpus
        is keyed by a composite ``chunk_uid`` (``<id>#<chunk_id>``)
        with ``chunk_text`` as its text column, so every downstream
        step (dedup, decontaminate, bm25, ...) composes over chunks
        exactly as it does over documents; the original ``<id>`` and
        ``chunk_id`` columns ride along for provenance."""
        from .operators.text import chunk_documents

        chunks = chunk_documents(
            self._df, self.id_col, self.text_col,
            chunk_tokens=chunk_tokens, overlap=overlap,
        ).withColumn(
            "chunk_uid",
            F.concat_ws("#", F.col(self.id_col).cast("string"), F.col("chunk_id")),
        )
        return Corpus(chunks, id_col="chunk_uid", text_col="chunk_text")

    def tokenize_bpe(
        self, merges: list[tuple[str, str]] | None = None,
        num_merges: int = 200,
    ) -> "Corpus":
        """Attach real-BPE token arrays + counts (``bpe_tokens`` /
        ``bpe_token_count`` columns). ``merges=None`` trains on THIS
        corpus first (one distributed word-frequency aggregate + a
        bounded driver merge loop — an eager action); pass a
        pre-trained merge list to stay fully lazy and to tokenize
        consistently across corpora."""
        from .operators.bpe import bpe_token_counts, train_bpe

        if merges is None:
            merges = train_bpe(self._df, self.text_col, num_merges=num_merges)
        return self._with(
            bpe_token_counts(self._df, self.text_col, merges)
        )

    def tokenize_unigram(
        self,
        model: dict[str, float] | None = None,
        vocab_size: int = 512,
        max_piece_len: int = 6,
    ) -> "Corpus":
        """Attach unigram-LM piece arrays (``unigram_pieces`` column,
        Viterbi segmentation). ``model=None`` trains on THIS corpus
        first (distributed EM over the word-frequency table — an
        eager action); pass a trained piece->log-prob dict to stay
        lazy and tokenize consistently across corpora."""
        from .operators.unigram import train_unigram, unigram_encode

        if model is None:
            model = train_unigram(
                self._df, self.text_col,
                vocab_size=vocab_size, max_piece_len=max_piece_len,
            )
        return self._with(
            unigram_encode(
                self._df, self.text_col, model,
                out_col="unigram_pieces", max_piece_len=max_piece_len,
            )
        )

    # -- retrieval actions --------------------------------------------

    def bm25(
        self, terms: list[str], k1: float = 1.2, b: float = 0.75
    ) -> DataFrame:
        """Okapi BM25 scores of the surviving corpus for one term bag:
        (id, bm25), no top-k cut. For repeated retrieval over a FROZEN
        corpus, persist :meth:`bm25_index` once instead."""
        from .operators.text import bm25_scores

        return bm25_scores(
            self._df, self.id_col, self.text_col, terms, k1=k1, b=b
        )

    def bm25_index(self) -> tuple[DataFrame, DataFrame]:
        """(postings, stats) index frames for this corpus — persist
        with ``postings.write.partitionBy('term')`` and score via
        ``bm25_from_index`` without rescanning text."""
        from .operators.text import build_bm25_index

        return build_bm25_index(self._df, self.id_col, self.text_col)

    def hybrid_search(
        self,
        emb: DataFrame,
        terms: list[str],
        query_vec_id,
        vec_id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 20,
        ann: str = "exact",
        **ann_kwargs,
    ) -> DataFrame:
        """BM25 + vector-ANN retrieval fused by RRF over the surviving
        corpus (``ann='lsh'``/``'ivf'`` for the bucketed legs).
        ``emb`` must share its id space with this corpus's id column;
        embeddings of documents filtered out earlier in the chain are
        dropped from the vector leg so both legs search the same
        survivors."""
        from .operators.retrieval import hybrid_search

        surviving = emb.join(
            self._df.select(F.col(self.id_col).alias(vec_id_col)),
            vec_id_col,
            "left_semi",
        )
        return hybrid_search(
            self._df, surviving, self.id_col, self.text_col, terms,
            vec_id_col, vec_col, query_vec_id, k=k, ann=ann, **ann_kwargs,
        )

    def search_eval(self, queries: dict, k: int = 10) -> DataFrame:
        """NDCG/MRR/precision/recall@k of this corpus's BM25 rankings
        for several term-bag queries, judged by term-coverage
        relevance — the regression gauge to run before and after any
        chain change that touches what the ranker sees (dedup,
        quality filters, chunking)."""
        from .operators.retrieval import bm25_search_eval

        return bm25_search_eval(
            self._df, self.id_col, self.text_col, queries, k=k
        )

    def zipf(self, top_n: int = 500) -> DataFrame:
        """One-row Zipf's-law fit (n, slope, intercept, r2) over the
        surviving corpus — slope near -1 is organic language; watch it
        drift as filters/dedup reshape the vocabulary."""
        from .operators.text import zipf_fit

        return zipf_fit(self._df, self.id_col, self.text_col, top_n=top_n)

    def leakage_safe_splits(
        self,
        threshold: float = 0.5,
        n: int = 3,
        train_fraction: float = 0.9,
    ) -> DataFrame:
        """Train/test tags where every near-dup cluster (n-gram
        Jaccard >= threshold components) lands wholly on one side —
        the split-time complement of decontaminate(): one prevents
        eval rows leaking INTO training data, this prevents the split
        itself from manufacturing the overlap."""
        from .operators.curation import leakage_safe_splits
        from .operators.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(
            self._df, self.id_col, self.text_col, n=n, threshold=threshold
        )
        return leakage_safe_splits(
            self._df, self.id_col, pairs, train_fraction=train_fraction
        )

    # -- terminal actions ---------------------------------------------

    def perplexity_filter(
        self,
        max_perplexity: float,
        vocab_size: int = 50_000,
    ) -> "Corpus":
        """Drop documents whose self-trained bigram-LM perplexity
        exceeds ``max_perplexity`` (the CCNet gate: gibberish and
        shuffled-word soup score high even when their unigram profile
        looks fluent). Documents with <2 tokens have no bigram score
        and are dropped too."""
        from .operators.text import bigram_logprob_score

        scored = bigram_logprob_score(
            self._df, self.id_col, self.text_col, vocab_size=vocab_size
        )
        keep = scored.filter(F.col("perplexity") <= max_perplexity)
        return self._with(
            self._df.join(keep.select(self.id_col), self.id_col, "left_semi")
        )

    def classify(
        self,
        label_col: str | None = None,
        alpha: float = 1.0,
    ) -> DataFrame:
        """Self-trained Naive Bayes classification of the corpus. With
        ``label_col`` given, trains on that column; otherwise uses the
        heuristic language ID as the teacher (see
        :func:`operators.classify.nb_self_train_language`)."""
        from .operators.classify import (
            nb_predict,
            nb_self_train_language,
            nb_train,
        )

        if label_col is None:
            return nb_self_train_language(
                self._df, self.id_col, self.text_col, alpha=alpha
            )
        stats, counts = nb_train(
            self._df, self.id_col, self.text_col, label_col
        )
        return nb_predict(
            self._df, self.id_col, self.text_col, stats, counts,
            label_col=label_col, alpha=alpha, keep_cols=[label_col],
        )

    def duplicate_spans(self, n: int = 8, k: int = 50) -> DataFrame:
        """Top-k exact n-token spans repeated across documents —
        boilerplate localization (see
        :func:`operators.text.duplicate_spans`)."""
        from .operators.text import duplicate_spans

        return duplicate_spans(
            self._df, self.id_col, self.text_col, n=n, k=k
        )

    def token_budget(self) -> DataFrame:
        """(docs, tokens) summary of the surviving corpus. Uses the
        real-BPE count column when :meth:`tokenize_bpe` ran earlier in
        the chain, else the zero-Python regex approximation."""
        from .operators.text import token_count_col

        tokens = (
            F.col("bpe_token_count")
            if "bpe_token_count" in self._df.columns
            else token_count_col(F.col(self.text_col))
        )
        return self._df.agg(
            F.count("*").alias("docs"),
            F.sum(tokens).cast("long").alias("tokens"),
        )

    def pack(self, budget: int, group_col: str) -> DataFrame:
        """Training-shard bin assignment (next-fit packing)."""
        from .operators.curation import pack_sequences
        from .operators.text import token_count_col

        with_tokens = self._df.withColumn(
            "__tokens", token_count_col(F.col(self.text_col))
        )
        return pack_sequences(
            with_tokens.select(self.id_col, group_col, "__tokens"),
            self.id_col, "__tokens", budget, group_col,
        )

    def write(self, path: str) -> None:
        self._df.write.mode("overwrite").parquet(path)
