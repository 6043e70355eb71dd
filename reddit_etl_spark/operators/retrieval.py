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
from pyspark.sql import types as T

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


def ranking_metrics(
    ranked: DataFrame,
    qrels: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Offline search-quality evaluation: NDCG@k, MRR@k, precision@k
    and recall@k per query, from a ranked result list and a graded
    relevance-judgment table — the readout that says whether a
    retrieval change (BM25 tuning, a new ANN leg, fusion weights)
    actually helped before anything ships.

    Definitions (Jarvelin & Kekalainen 2002, linear gain):
    DCG@k = sum rel_i / log2(rank_i + 1) over the top k;
    IDCG@k = the same over the judged relevants ranked by rel desc
    (ties contribute identically, so IDCG is order-ambiguity-free);
    MRR@k = 1/rank of the first relevant hit (0 if none);
    recall@k's denominator is ALL judged relevants, so a perfect
    top-k still scores < 1 when more than k docs are relevant.

    Queries with no judged relevant doc return NULL ndcg/recall (an
    eval gap, not a zero-quality system). Unjudged ranked docs count
    rel=0 — the standard pessimistic convention. A query present only
    in ``qrels`` (its ranked list is empty) still emits a row —
    n_ranked 0, mrr/precision/recall 0, ndcg NULL — retrieving
    NOTHING is a zero-quality result, not a missing one. (A query
    absent from BOTH inputs cannot materialize here; seed it upstream
    — bm25_search_eval does.)

    Scale: the metrics join is (queries x k)-sized — corpus-scale
    cost lives upstream in the ranker. IDCG needs one window over
    each query's JUDGED set (judgment pools are thousands of rows,
    not the corpus). Floats round to 6 after the log2 sums (engines'
    libm ulps die at 6dp).

    Returns (query, n_ranked BIGINT, n_rel BIGINT, ndcg, mrr,
    precision, recall).
    """
    if k < 1:
        raise ValueError("ranking_metrics needs k >= 1")
    q, d = query_col, doc_col
    topk = ranked.filter(F.col(rank_col) <= k)
    j = topk.join(
        qrels.select(q, d, F.col(rel_col).alias("__rel")), [q, d], "left"
    ).withColumn("__rel", F.coalesce(F.col("__rel"), F.lit(0)))
    got = j.groupBy(q).agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.round(
            F.sum(
                F.col("__rel") / F.log2(F.col(rank_col).cast("double") + 1)
            ),
            6,
        ).alias("__dcg"),
        F.max(
            F.when(F.col("__rel") > 0, 1.0 / F.col(rank_col))
        ).alias("__mrr"),
        F.sum((F.col("__rel") > 0).cast("long")).alias("__hits"),
    )
    iw = Window.partitionBy(q).orderBy(F.desc(rel_col), F.asc(d))
    ideal = (
        qrels.filter(F.col(rel_col) > 0)
        .withColumn("__rn", F.row_number().over(iw))
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.round(
                F.sum(
                    F.when(
                        F.col("__rn") <= k,
                        F.col(rel_col)
                        / F.log2(F.col("__rn").cast("double") + 1),
                    )
                ),
                6,
            ).alias("__idcg"),
        )
    )
    out = got.join(ideal, q, "full")
    n_rel = F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    hits = F.coalesce(F.col("__hits"), F.lit(0))
    return out.select(
        q,
        F.coalesce(F.col("n_ranked"), F.lit(0)).cast("long").alias(
            "n_ranked"
        ),
        n_rel.alias("n_rel"),
        F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
        F.round(F.coalesce(F.col("__mrr"), F.lit(0.0)), 6).alias("mrr"),
        F.round(hits / F.lit(float(k)), 6).alias("precision"),
        F.when(n_rel > 0, F.round(hits / n_rel, 6)).alias("recall"),
    )


def bm25_search_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict,
    k: int = 10,
) -> DataFrame:
    """Rank-and-measure composition: BM25 top-``k`` per term-bag query
    over ``df``, judged by graded TERM-COVERAGE relevance (rel = how
    many of the query's distinct terms the document contains) through
    :func:`ranking_metrics`. Self-contained evaluation without human
    qrels — coverage is a crude judge, but a STABLE one, which is
    what regression-testing a ranker change needs.

    The corpus is tokenized ONCE: a build_bm25_index postings/stats
    pass (lazily checkpointed so the Q query branches share the
    materialization instead of re-scanning text ~3x per query), BM25
    scored per query via bm25_from_index, and qrels derived from the
    same postings (rel = count of the query's terms with a posting
    for the doc). Each query's top-k is cut by orderBy().limit(k)
    (TakeOrderedAndProject) before the k-row rank window. Every query
    id emits a metrics row, even when its terms match nothing (zeroed
    metrics, NULL ndcg/recall) — the seeded-query contract the
    evaluation report needs.
    """
    from .text import bm25_from_index, build_bm25_index

    if not queries:
        raise ValueError("bm25_search_eval needs at least one query")
    postings, stats = build_bm25_index(df, id_col, text_col)
    postings = postings.localCheckpoint(eager=False)
    stats = stats.localCheckpoint(eager=False)
    ranked = None
    rels = None
    for qid, terms in queries.items():
        tset = sorted({t.lower() for t in terms})
        sc = bm25_from_index(postings, stats, id_col, tset)
        w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
        r = (
            sc.orderBy(F.desc("bm25"), F.asc(id_col))
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("doc_id"),
                F.col("rank").cast("long").alias("rank"),
            )
        )
        qr = (
            postings.filter(F.col("term").isin(tset))
            .groupBy(id_col)
            .agg(F.count_distinct("term").cast("long").alias("rel"))
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("doc_id"),
                "rel",
            )
        )
        ranked = r if ranked is None else ranked.unionByName(r)
        rels = qr if rels is None else rels.unionByName(qr)
    metrics = ranking_metrics(ranked, rels, k=k)
    seed = df.sparkSession.createDataFrame(
        [(q,) for q in queries], ["query_id"]
    )
    return seed.join(metrics, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_ranked"), F.lit(0)).cast("long").alias(
            "n_ranked"
        ),
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "ndcg",
        F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
        F.coalesce(F.col("precision"), F.lit(0.0)).alias("precision"),
        "recall",
    )


def hard_negatives(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict,
    k: int = 20,
) -> DataFrame:
    """Training-pair construction for retrieval/embedding models: per
    query, the BM25 top-``k`` labeled into positives (documents
    containing EVERY query term) and HARD negatives (high-scoring
    documents missing at least one term) — the pairs that actually
    teach a ranker; random negatives are trivially separable and
    carry no gradient signal, which is why every dense-retriever
    recipe (DPR onward) mines negatives from a lexical ranker
    exactly like this.

    Labels derive from term coverage — the same deterministic
    pseudo-qrel :func:`bm25_search_eval` judges with, so the pair
    generator and the evaluator agree on what "relevant" means.

    Plan: corpus tokenized ONCE into the shared lazily-checkpointed
    build_bm25_index postings/stats (query branches reuse the
    materialization, never re-scan text); per query one |terms|-
    partition score + a TakeOrderedAndProject top-k cut, coverage
    from the same postings, everything after the cut is k-row-sized.

    Returns (query_id, doc_id, rank, bm25, n_covered, role), role in
    ('positive', 'hard_negative'), ordered (query_id, rank).
    """
    from .text import bm25_from_index, build_bm25_index  # noqa: PLC0415

    if not queries:
        raise ValueError("hard_negatives needs at least one query")
    postings, stats = build_bm25_index(df, id_col, text_col)
    postings = postings.localCheckpoint(eager=False)
    stats = stats.localCheckpoint(eager=False)
    out = None
    for qid, terms in queries.items():
        tset = sorted({t.lower() for t in terms})
        sc = bm25_from_index(postings, stats, id_col, tset)
        cov = (
            postings.filter(F.col("term").isin(tset))
            .groupBy(id_col)
            .agg(F.count_distinct("term").cast("long").alias("n_covered"))
        )
        w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
        r = (
            sc.orderBy(F.desc("bm25"), F.asc(id_col))
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .join(cov, id_col)  # every scored doc holds >= 1 term
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("doc_id"),
                F.col("rank").cast("long").alias("rank"),
                "bm25",
                "n_covered",
                F.when(
                    F.col("n_covered") == len(tset), F.lit("positive")
                )
                .otherwise(F.lit("hard_negative"))
                .alias("role"),
            )
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("query_id", "rank")


def mmr_rerank(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: "list[float]",
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) over an embedding column — the diversity rung the top-k
    family lacks: cosine top-k returns k near-copies of the best hit;
    MMR greedily picks

        argmax_i  lam * rel(i) - (1 - lam) * max_{s in selected} sim(i, s)

    trading relevance against redundancy — the standard re-rank
    between ANN candidate generation and a training-batch / RAG
    context that should not waste slots on duplicates.

    Distributed shape (the retrieval-family discipline): the
    corpus-sized work — cosine of every vector against the query and
    the top-``pool`` cut — runs as one scan + TakeOrderedAndProject;
    the candidate-PAIR similarities are one self-join of the
    ``pool``-row frame (<= C(pool,2) rows). Only those two bounded
    frames are collected (pool + pool^2/2 rows — the same k-bounded
    collect contract as rrf_fuse's limit(k) windows), and the O(k *
    pool) greedy runs driver-side on them. The greedy is inherently
    sequential (selection i depends on 1..i-1) — at any scale the
    right plan is "distribute the scan, not the 50-row loop".

    Cross-engine determinism: relevance and pair similarities are
    ROUNDED to 6 BEFORE any comparison (the similarity_topk
    convention — Spark's fold and another engine's dot can differ in
    final ulps); every argmax tie-breaks on ascending id; the
    combined score is the identical IEEE expression on identical
    round-6 inputs. Output: (rank, id, relevance, mmr_score) — rank
    1..k in selection order.
    """
    from .similarity import cosine_col

    if k > pool:
        raise ValueError(f"k ({k}) must be <= pool ({pool})")
    qv = F.lit(query_vec).cast("array<double>")
    cand = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .withColumn("__rel", F.round(cosine_col(F.col("__v"), qv), 6))
        .orderBy(F.desc("__rel"), "__id")
        .limit(pool)
        .localCheckpoint(eager=False)
    )
    pool_rows = cand.select("__id", "__rel").collect()
    sa = cand.select(F.col("__id").alias("__ia"), F.col("__v").alias("__va"))
    sb = cand.select(F.col("__id").alias("__ib"), F.col("__v").alias("__vb"))
    sim_rows = (
        sa.crossJoin(sb)
        .filter(F.col("__ia") < F.col("__ib"))
        .select(
            "__ia",
            "__ib",
            F.round(
                cosine_col(F.col("__va"), F.col("__vb")), 6
            ).alias("__s"),
        )
        .collect()
    )
    rel = {r["__id"]: r["__rel"] for r in pool_rows}
    sim: dict[tuple, float] = {}
    for r in sim_rows:
        sim[(r["__ia"], r["__ib"])] = r["__s"]
        sim[(r["__ib"], r["__ia"])] = r["__s"]
    selected: list = []
    remaining = sorted(rel)  # ascending id = the tie order
    out_rows = []
    for rank in range(1, k + 1):
        if not remaining:
            # corpus yielded fewer than k candidates (only k > pool was
            # validated, not the rows the pool scan actually returned) —
            # emit the ranks that exist instead of letting the greedy
            # unpack a None best (advisor r9 #1)
            break
        best = None
        for i in remaining:
            if selected:
                red = max(sim[(i, s)] for s in selected)
                score = lam * rel[i] - (1.0 - lam) * red
            else:
                score = lam * rel[i]
            # strict > keeps the smallest id on ties (remaining is
            # id-ascending)
            if best is None or score > best[1]:
                best = (i, score)
        sel_id, sel_score = best
        selected.append(sel_id)
        remaining.remove(sel_id)
        # RAW score here — the final rounding happens Spark-side via
        # round6_floor (floor(x*1e6+0.5)/1e6, IEEE-only ops), never
        # Python round() (HALF_EVEN) and no longer F.round either:
        # MMR scores land exactly ON .5e-6 boundaries by construction
        # (round-6 inputs composed with the 0.7/0.3 literals — the
        # round-13 boundary audit measured one at 1 ulp), where the
        # engines' ROUND implementations are the divergence channel
        # the floor form closes (tools/boundary_audit.py).
        out_rows.append((rank, sel_id, rel[sel_id], sel_score))
    spark = emb.sparkSession
    # explicit schema: out_rows can be EMPTY (empty corpus) and the
    # list-of-names form cannot infer types from zero rows
    out_schema = T.StructType(
        [
            T.StructField("rank", T.LongType()),
            T.StructField(id_col, cand.schema["__id"].dataType),
            T.StructField("relevance", T.DoubleType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    from .util import round6_floor

    res = spark.createDataFrame(out_rows, out_schema)
    return res.select(
        F.col("rank").cast("long"),
        F.col(id_col),
        F.col("relevance").cast("double"),
        round6_floor(F.col("mmr_score").cast("double")).alias("mmr_score"),
    ).orderBy("rank")


def rbo_suffix_weights(p: float, k: int) -> list[float]:
    """Suffix sums W[m] = sum_{d=m..k} p^(d-1)/d of the truncated RBO
    weight series, computed once driver-side and injected as literals
    into BOTH engines (the NORMAL_QUANTILES discipline — no pow() in
    either plan, so cross-engine pow ulps can't exist)."""
    w = [p ** (d - 1) / d for d in range(1, k + 1)]
    out = [0.0] * (k + 1)
    for m in range(k - 1, -1, -1):
        out[m] = out[m + 1] + w[m]
    return out[:k]  # out[m-1] = W[m] 1-indexed via element_at


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    group_cols: "Sequence[str]",
    id_col: str,
    rank_col: str,
    p: float = 0.9,
    k: int = 20,
) -> DataFrame:
    """Rank-Biased Overlap (Webber, Moffat & Zobel 2010) between two
    top-k rankings per group — the rank-similarity readout the
    retrieval-eval family lacks: search_eval's nDCG/recall judge a
    ranking against RELEVANCE labels; RBO compares two RANKINGS
    against each other (BM25 vs embedding retrieval, yesterday's vs
    today's index, two model versions) with top-weighted emphasis.

    Truncated (depth-k) base form:

        RBO = (1 - p) · Σ_{d=1..k} p^(d-1) · |A_d ∩ B_d| / d

    rewritten per SHARED item: an id at ranks (ra, rb) enters every
    prefix d >= m = max(ra, rb), so its total contribution is the
    suffix weight W[m] = Σ_{d=m..k} p^(d-1)/d — computed driver-side
    and injected as ≤k double literals into both engines (no pow in
    any plan; see ``rbo_suffix_weights``). This is the lower-bound
    (RBO_min-style) truncation: unseen tails contribute 0, so scores
    are conservative and engine-exact.

    Distributed shape: both inputs filter to rank <= k (k-row frames
    per group — the caller's rankings are top-k by construction), one
    equi-join on (group, id) finds shared items, one element_at
    against the literal weight array prices each, one rollup. Groups
    present in BOTH inputs but sharing nothing emit rbo = 0.0 (seated
    from the per-side totals, the jsd absence discipline). Exactness:
    ranks are integers; the only floats are the injected literals,
    summed then round-6.

    Returns (group..., n_a BIGINT, n_b BIGINT, overlap_k BIGINT, rbo).
    """
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0,1); got {p}")
    if k < 1:
        raise ValueError(f"k must be >= 1; got {k}")
    keys = list(group_cols)
    weights = F.array(*[F.lit(w) for w in rbo_suffix_weights(p, k)])
    fa = a.filter(F.col(rank_col) <= k).select(
        *keys, F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    )
    fb = b.filter(F.col(rank_col) <= k).select(
        *keys, F.col(id_col).alias("__id"), F.col(rank_col).alias("__rb")
    )
    shared = (
        fa.join(fb, [*keys, "__id"])
        .withColumn("__m", F.greatest("__ra", "__rb").cast("int"))
        .groupBy(*keys)
        .agg(
            F.count("*").cast("long").alias("overlap_k"),
            F.sum(F.element_at(weights, F.col("__m"))).alias("__s"),
        )
    )
    ta = fa.groupBy(*keys).agg(F.count("*").cast("long").alias("n_a"))
    tb = fb.groupBy(*keys).agg(F.count("*").cast("long").alias("n_b"))
    return (
        ta.join(tb, keys)
        .join(shared, keys, "left")
        .select(
            *keys,
            "n_a",
            "n_b",
            F.coalesce(F.col("overlap_k"), F.lit(0).cast("long")).alias(
                "overlap_k"
            ),
            F.round(
                F.lit(1.0 - p) * F.coalesce(F.col("__s"), F.lit(0.0)), 6
            ).alias("rbo"),
        )
        .orderBy(*keys)
    )
