"""Hybrid retrieval: BM25 lexical scoring fused with vector ANN by
reciprocal rank fusion (RRF).

Composes the lexical scorer (:func:`..operators.text.bm25_scores` or
its persisted-index form :func:`..operators.text.bm25_from_index`) with
any of the vector top-k operators (exact brute baseline, sign-LSH,
IVF). The fusion itself is bounded by construction: each leg is cut to
``k`` rows via ``orderBy().limit(k)`` (TakeOrderedAndProject — fully
distributed) BEFORE the unpartitioned rank window, so the window
touches ``k`` rows, not the corpus.

Single-query shape (one term bag + one query vector), the interactive-
retrieval unit of work: at 100 TB the corpus-sized effort lives in the
legs (postings scan / bucketed candidate join), both of which are the
operators' documented scale paths; the fusion is O(k).

RRF (Cormack et al.): score(d) = sum over legs of 1 / (rrf_k + rank_d),
with rrf_k=60 the standard damping constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ANN_CHOICES = ("exact", "lsh", "ivf")


def rrf_fuse(
    lex_scores: DataFrame,
    ann_topk: DataFrame,
    k: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """RRF-fuse a (doc_id, bm25) score frame with a (query_id,
    neighbor_id, cosine_sim) top-k frame.

    Ranks are computed over the ROUNDED scores with doc-id tie-breaks
    (both legs' producers already emit 6-decimal-rounded scores), so
    the rank integers are engine-deterministic. Docs appearing in only
    one leg get rank -1 for the other and contribute one reciprocal
    term. Returns (doc_id, rrf, lex_rank, ann_rank).
    """
    lex = (
        lex_scores.orderBy(F.desc("bm25"), F.col("doc_id"))
        .limit(k)
        .withColumn(
            "lex_rank",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.col("doc_id"))),
        )
        .select("doc_id", "lex_rank")
    )
    ann = (
        ann_topk.orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
        .limit(k)
        .withColumn(
            "ann_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
            ),
        )
        .select(F.col("neighbor_id").alias("doc_id"), "ann_rank")
    )
    one = F.lit(1.0)
    return lex.join(ann, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(one / (rrf_k + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(one / (rrf_k + F.col("ann_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
        F.coalesce(F.col("lex_rank"), F.lit(-1)).cast("long").alias("lex_rank"),
        F.coalesce(F.col("ann_rank"), F.lit(-1)).cast("long").alias("ann_rank"),
    )


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    doc_id_col: str,
    text_col: str,
    terms: list[str],
    vec_id_col: str,
    vec_col: str,
    query_vec_id,
    k: int = 20,
    rrf_k: int = 60,
    ann: str = "exact",
    **ann_kwargs,
) -> DataFrame:
    """BM25 top-k + vector-ANN top-k fused by RRF for one query.

    ``ann`` picks the vector leg: ``'exact'`` (brute cosine — the
    correctness baseline, O(|corpus| x 1) scored pairs), ``'lsh'``
    (sign-LSH bucket join) or ``'ivf'`` (inverted-file probe) — the
    bucketed 100 TB paths, candidates from equality joins instead of a
    corpus-wide product. ``ann_kwargs`` pass through to the chosen
    operator (bits/tables/multiprobe, n_centroids/n_probe, seed).

    The lexical leg's doc ids and the vector leg's vec ids must share
    an id space for the fusion join to be meaningful (as in the
    documents/embeddings testdata tables).
    """
    from .similarity import cosine_topk, ivf_topk, lsh_topk
    from .text import bm25_scores

    if ann not in _ANN_CHOICES:
        raise ValueError(f"ann must be one of {_ANN_CHOICES}, got {ann!r}")
    lex = bm25_scores(docs, doc_id_col, text_col, terms)
    if doc_id_col != "doc_id":
        lex = lex.withColumnRenamed(doc_id_col, "doc_id")
    queries = emb.filter(F.col(vec_id_col) == query_vec_id)
    topk_fn = {"exact": cosine_topk, "lsh": lsh_topk, "ivf": ivf_topk}[ann]
    topk = topk_fn(emb, queries, vec_id_col, vec_col, vec_id_col, k=k, **ann_kwargs)
    return rrf_fuse(lex, topk, k=k, rrf_k=rrf_k)


def topk_id_recall(exact: DataFrame, approx: DataFrame, min_hits: int) -> DataFrame:
    """One-row (recall_ok: boolean) frame: does ``approx`` recover at
    least ``min_hits`` of ``exact``'s (query_id, neighbor_id) pairs?
    Both frames are top-k outputs (|queries| x k rows), so the audit
    join is a few dozen rows — cross-joinable onto any result frame as
    an audit column without touching its plan."""
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    return hits.agg((F.count("*") >= min_hits).alias("recall_ok"))
