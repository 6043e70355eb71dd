"""Similarity search over embedding columns (array<float>).

Two paths:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Broadcast the (small) query set against the corpus; per-pair cosine
  via zip_with/aggregate (sequential fold, JVM codegen — matches any
  sequential-fold oracle bit-for-bit in double precision); top-k via a
  per-query rank window.
- ``lsh_topk`` / ``cosine_neardup_lsh``: random-hyperplane (sign) LSH
  bucketing — the 100 TB path. Vectors land in 2^bits sign-pattern
  buckets (optionally multi-probe via several independent tables);
  candidate pairs come from a bucket-equality hash join, never a cross
  join. Recall is tunable with tables x bits; exact re-scoring runs
  only on candidates.

Hyperplanes are generated driver-side from a fixed seed (deterministic
across runs) and broadcast as literal arrays — a few KB regardless of
corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import round6_floor


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Plan shape: broadcast-hash join (queries are the small side by
    construction) -> narrow cosine projection -> per-query rank window.
    The only shuffle is the window partition on query_id; corpus is
    scanned once. Self-matches (same id) are excluded.

    The rank window (here and in every top-k sibling) orders on
    ROUND(cosine_sim, 6) with an id tie-break, NOT the raw double: a
    near-tie at the rank-k boundary whose two sims differ only past
    the 6th decimal would otherwise be cut differently by engines
    whose float summation order differs (advisor r4 #1) — rounding
    first makes the cut decision identical wherever the engines agree
    to 6 decimals, which is the repo-wide float-compare contract.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_col(F.col("__qv"), F.col("__cv")))
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(tables, bits, dim))


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimensionality from the first non-null vector; None when
    the frame is empty (callers return an empty result instead of
    crashing — the engine's P10 empty-input discipline)."""
    row = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return None if row is None else len(row[0])


def _empty_pairs(df: DataFrame, id_col: str, a: str, b: str, sim: str) -> DataFrame:
    from pyspark.sql.types import DoubleType, StructField, StructType

    t = df.schema[id_col].dataType
    return df.sparkSession.createDataFrame(
        [],
        StructType(
            [StructField(a, t), StructField(b, t), StructField(sim, DoubleType())]
        ),
    )


def sign_buckets_udf(bits: int, tables: int, seed: int):
    """Arrow-batched bucket assignment: one array<long> of per-table
    bucket ids per vector. The sign pattern of (batch x dim) @
    (dim x tables*bits) computed as a single NumPy matmul — collapsing
    what would otherwise be tables*bits expression-tree dot products
    per row (plan blow-up + no vectorization) into one kernel. Only
    the packed bucket ids cross back over Arrow.

    Round-13 optimization (guide §1.2): the hyperplanes are generated
    LAZILY inside the kernel from the first vector's length —
    ``_hyperplanes(dim, bits, tables, seed)`` is deterministic given
    (dim, seed), so every task materializes identical planes and the
    caller no longer needs a driver-side ``first()`` dim probe (one
    whole Spark job per DataFrame build). Construction happens once
    per task (guide §4.5) and is reused across batches."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.int64)
    state: dict = {}

    @pandas_udf(ArrayType(LongType()))
    def assign(vs: pd.Series) -> pd.Series:
        # NULL vectors yield NULL bucket arrays (explode/element_at of
        # NULL emits nothing downstream) instead of crashing the batch
        # — one NULL embedding must not kill the job
        rows = vs.tolist()
        mask = [r is not None for r in rows]
        if not any(mask):
            return pd.Series([None] * len(rows))
        m = np.array([r for r in rows if r is not None], dtype=np.float64)
        if "flat" not in state:
            planes = _hyperplanes(m.shape[1], bits, tables, seed)
            state["flat"] = (
                planes.reshape(tables * bits, m.shape[1]).T.copy()
            )  # (dim, T*B)
        signs = (
            (m @ state["flat"] >= 0)
            .astype(np.int64)
            .reshape(len(m), tables, bits)
        )
        ids = (signs * weights).sum(axis=2)  # (n_valid, tables)
        out: list = []
        it = iter(ids)
        for ok in mask:
            out.append(next(it).tolist() if ok else None)
        return pd.Series(out)

    return assign


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    bits: int = 6,
    tables: int = 8,
    multiprobe: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, exact cosine
    re-score on candidates only. At 1000-executor scale the bucket
    join replaces the O(|corpus| x |queries|) broadcast product with
    ~|corpus| x tables bucket rows.

    ``multiprobe=1`` additionally probes, per table, every bucket at
    Hamming distance 1 from the query's bucket (flip one sign bit) —
    QUERY-side only, so the corpus index stays tables x |corpus| rows
    while recall rises steeply for moderate-cosine neighbors. Defaults
    (6 bits x 8 tables x 1-probe) target ~0.85+ recall at cosine ~0.3;
    raise ``bits`` at larger corpus sizes to keep buckets small."""
    # no driver-side dim probe (round-13 opt): the kernel derives the
    # hyperplanes from the batch itself; an empty / all-NULL corpus
    # yields NULL buckets -> zero candidates -> the same empty result
    # the probe's early-return produced, without the extra job.
    assign = sign_buckets_udf(bits, tables, seed)

    def bucketize(df: DataFrame, idc: str, alias: str, probe: int) -> DataFrame:
        # ids only past this point: the explode would otherwise replicate
        # each vector x tables (x bits+1 with multiprobe), and the
        # candidate distinct would shuffle full arrays — vectors are
        # re-joined exactly once after the id-pair dedup.
        # Round-14: the probe-struct array is ONE generated SQL string
        # (a single py4j round-trip) instead of tables x (bits+1)
        # Column-API struct builds — the loop cost ~450 py4j calls
        # (~0.3 s of driver wall per build on this host); canonicalized
        # optimized plan verified identical to the Column form.
        probes_sql = []
        for t in range(tables):
            e = f"element_at(__bks, {t + 1})"
            probes_sql.append(f"named_struct('t', {t}, 'bk', {e})")
            if probe >= 1:
                probes_sql.extend(
                    f"named_struct('t', {t}, 'bk', ({e} ^ {1 << b}))"
                    for b in range(bits)
                )
        return (
            df.select(F.col(idc).alias(alias), _as_double(vec_col).alias("__v"))
            .withColumn("__bks", assign(F.col("__v")))
            .drop("__v")
            .select(
                alias,
                F.expr(
                    "explode(array(" + ", ".join(probes_sql) + ")) AS __b"
                ),
            )
            .select(alias, "__b.t", "__b.bk")
        )

    c = bucketize(corpus, id_col, "neighbor_id", probe=0)
    q = bucketize(queries, query_id_col, "query_id", probe=multiprobe)
    candidates = (
        c.join(q, ["t", "bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    scored = (
        candidates.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine_sim", cosine_col(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def _spherical_kmeans(
    sample: np.ndarray, k: int, seed: int, iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means on unit-normalized rows.
    Empty clusters are re-seeded from the points worst-served by their
    current centroid, so all k cells stay populated."""
    n = len(sample)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        sims = sample @ cents.T  # (n, k) cosine (rows unit-norm)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                if norm > 1e-12:
                    cents[c] = m / norm
            else:
                cents[c] = sample[int(np.argmin(best))]
    return cents


def _train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int,
) -> "np.ndarray | None":
    """Deterministic IVF centroid training: spherical k-means on a
    hash-ordered driver-side sample (bounded regardless of corpus
    size). Returns None for an empty corpus."""
    sample_rows = (
        corpus.select(F.col(id_col).alias("__cid"), _as_double(vec_col).alias("__cv"))
        .filter(F.col("__cv").isNotNull())
        .orderBy(F.xxhash64(F.col("__cid").cast("string"), F.lit(seed)))
        .limit(max(10_000, n_centroids))
        .collect()
    )
    if not sample_rows:
        return None
    sample = np.array([r["__cv"] for r in sample_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    return _spherical_kmeans(sample, n_centroids, seed)


def _cell_assigner(cents: np.ndarray, n_best: int):
    """Arrow-batched nearest-centroid assignment: (batch x dim) @
    (dim x C) matmul, top n_best cells per vector."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vs: pd.Series) -> pd.Series:
        # NULL vectors get NULL cell arrays (dropped by the downstream
        # explode/element_at + cell join) instead of crashing the batch
        rows = vs.tolist()
        mask = [r is not None for r in rows]
        if not any(mask):
            return pd.Series([None] * len(rows))
        m = np.array([r for r in rows if r is not None], dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cents.T
        idx = np.argsort(-sims, axis=1)[:, :n_best]
        out: list = []
        it = iter(idx)
        for ok in mask:
            out.append(next(it).tolist() if ok else None)
        return pd.Series(out)

    return assign


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 32,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """The persisted-index form of IVF — the shape a repeated-
    retrieval deployment actually uses (same reasoning as
    ``text.build_bm25_index``): pay centroid training + corpus
    assignment ONCE, store both tables, and serve every query from
    them without touching raw vectors again.

    Returns ``(centroids, assignments)``:

    - centroids: (cell INT, centroid ARRAY<DOUBLE>) — C rows, tiny.
    - assignments: (neighbor_id, cell INT, vector ARRAY<DOUBLE>) —
      one row per corpus vector. Persist with
      ``.write.partitionBy('cell')`` and every query's probe becomes a
      PARTITION-PRUNED scan of its n_probe cells — the 100 TB serving
      path reads ~n_probe/C of the index, not the corpus.

    Path-equality with the one-shot ``ivf_topk`` (same seed =>
    identical centroids => identical results) is pinned in tests.
    """
    cents = _train_ivf_centroids(corpus, id_col, vec_col, n_centroids, seed)
    spark = corpus.sparkSession
    if cents is None:
        centroids = spark.createDataFrame([], "cell int, centroid array<double>")
        assignments = spark.createDataFrame(
            [], f"neighbor_id {dict(corpus.dtypes)[id_col]}, cell int, vector array<double>"
        )
        return centroids, assignments
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    assignments = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vector")
        )
        .withColumn(
            "cell", F.element_at(_cell_assigner(cents, 1)(F.col("vector")), 1)
        )
        .select("neighbor_id", "cell", "vector")
    )
    return centroids, assignments


def ivf_topk_from_index(
    centroids: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    query_id_col: str,
    vec_col: str,
    k: int = 5,
    n_probe: int = 8,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (``build_ivf_index``)
    without re-training or re-assigning anything. The centroid table
    (C rows) collects to the driver for the Arrow probe UDF — bounded
    by C, never by the corpus; the probe is a join of n_probe
    (query, cell) rows against the cell-keyed assignments, which a
    cell-partitioned layout turns into a pruned scan.
    """
    cent_rows = sorted(
        centroids.collect(), key=lambda r: r["cell"]
    )
    if not cent_rows:
        return _empty_pairs(
            queries, query_id_col, "query_id", "neighbor_id", "cosine_sim"
        )
    cents = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("cell", F.explode(_cell_assigner(cents, n_probe)(F.col("__qv"))))
    scored = (
        assignments.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_col(F.col("__qv"), F.col("vector")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus into
    ``n_centroids`` cells, probe the ``n_probe`` nearest cells per
    query, exact-re-score only within probed cells.

    Centroids are trained with spherical k-means on a deterministic
    hash-ordered driver-side sample (standard IVF practice: train on a
    sample, assign the full corpus distributed — the sample stays
    bounded no matter the corpus size). Cell assignment runs in an
    Arrow-batched pandas UDF: a (batch x dim) @ (dim x C) matmul, the
    one place NumPy beats per-element SQL expressions. The corpus
    shuffles once on cell id; query fan-out is n_probe rows per query.
    For clustered embeddings this dominates sign-LSH on the
    recall/cost curve; at 100 TB scale n_centroids grows ~sqrt(N) and
    the per-cell lists stay executor-sized.
    """
    cents = _train_ivf_centroids(corpus, id_col, vec_col, n_centroids, seed)
    if cents is None:
        return _empty_pairs(corpus, id_col, "query_id", "neighbor_id", "cosine_sim")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("cell", F.element_at(_cell_assigner(cents, 1)(F.col("__cv")), 1))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).withColumn("cell", F.explode(_cell_assigner(cents, n_probe)(F.col("__qv"))))

    scored = (
        c.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine_col(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def _lloyd_kmeans(sample: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd's k-means (L2) for PQ sub-quantizer training.
    Empty clusters are re-seeded from the worst-served point so every
    codeword stays live."""
    n = len(sample)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        assign = np.argmin(d2, axis=1)
        best = d2[np.arange(n), assign]
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                cents[c] = sample[int(np.argmax(best))]
    return cents


def _pq_codebooks(
    sample: np.ndarray, m: int, ksub: int, seed: int
) -> np.ndarray:
    """Train one L2 k-means codebook per subspace on a unit-normalized
    sample. Returns (m, ksub, dim//m). ``dim`` must be divisible by
    ``m`` (callers validate)."""
    dim = sample.shape[1]
    sub = dim // m
    return np.stack(
        [
            _lloyd_kmeans(sample[:, j * sub : (j + 1) * sub], ksub, seed + j)
            for j in range(m)
        ]
    )


def pq_encode_udf(codebooks: np.ndarray):
    """Arrow-batched PQ encoder: unit-normalize each vector, then per
    subspace emit the index of the nearest codeword (L2). Output is an
    array<tinyint> of length m — at 64 float64 dims and m=8 that is a
    64x compression of what the ANN scan has to read, the lever that
    lets a 100 TB embedding table's codes fit in cluster page cache."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, ByteType

    m, ksub, sub = codebooks.shape

    @pandas_udf(ArrayType(ByteType()))
    def encode(vs: pd.Series) -> pd.Series:
        # NULL vectors encode to NULL code arrays (filtered downstream)
        rows = vs.tolist()
        mask = [r is not None for r in rows]
        if not any(mask):
            return pd.Series([None] * len(rows))
        x = np.array([r for r in rows if r is not None], dtype=np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int8)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]  # (n, sub)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
            d2 = (
                -2.0 * xs @ codebooks[j].T
                + (codebooks[j] ** 2).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d2, axis=1)
        out: list = []
        it = iter(codes)
        for ok in mask:
            out.append(next(it).tolist() if ok else None)
        return pd.Series(out)

    return encode


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Product-quantization ANN top-k with exact re-rank — the memory-
    bound 100 TB path. Codebooks (m sub-quantizers x ksub codewords)
    are trained driver-side on the same deterministic hash-ordered
    sample IVF uses; the corpus is encoded once into m-byte codes
    (64 float dims -> 8 bytes, 64x less scan/cache footprint than
    float64). Candidate scoring is asymmetric-distance (ADC): the
    query stays float, each corpus vector is reconstructed from its
    codeword centroids inside a NumPy kernel — one (n, dim) gather +
    matmul per Arrow batch, never a per-row Python loop.

    The ADC pass keeps ``rerank * k`` candidates per query (a rank
    window over the tiny per-query candidate frame), then the float
    vectors are re-joined ONCE for exact cosine on that bounded set —
    the standard PQ recipe (Jegou et al., TPAMI 2011): quantization
    error only has to preserve the top-(rerank*k) set, not the exact
    order, so small codebooks survive. Output schema matches
    ``cosine_topk`` (query_id, neighbor_id, cosine_sim rounded to 6).

    Plan shape: one codes scan x broadcast queries -> ADC window ->
    (query_id, neighbor_id) candidates -> one vector re-join -> rank
    window. The only full-corpus pass reads m-byte codes; float
    vectors are touched for |queries| x rerank x k rows."""
    dim = _probe_dim(corpus, vec_col)
    if dim is None:
        return _empty_pairs(corpus, id_col, "query_id", "neighbor_id", "cosine_sim")
    if dim % m:
        raise ValueError(f"pq_topk: dim {dim} not divisible by m={m}")
    sample_rows = (
        corpus.select(F.col(id_col).alias("__cid"), _as_double(vec_col).alias("__cv"))
        .filter(F.col("__cv").isNotNull())
        .orderBy(F.xxhash64(F.col("__cid").cast("string"), F.lit(seed)))
        .limit(10_000)
        .collect()
    )
    sample = np.array([r["__cv"] for r in sample_rows], dtype=np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    books = _pq_codebooks(sample, m, ksub, seed)
    encode = pq_encode_udf(books)
    sub = dim // m

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def adc_score(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        q = np.array(qvs.tolist(), dtype=np.float64)
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        c = np.array(codes.tolist(), dtype=np.int64)  # (n, m)
        # reconstruct each corpus vector from its codewords and dot it
        # with the (normalized) query — per-subspace gather, no loops
        # over rows
        s = np.zeros(len(q))
        for j in range(m):
            s += np.einsum(
                "nd,nd->n", q[:, j * sub : (j + 1) * sub], books[j][c[:, j]]
            )
        return pd.Series(s)

    codes = corpus.select(
        F.col(id_col).alias("neighbor_id"), encode(_as_double(vec_col)).alias("__code")
    ).filter(F.col("__code").isNotNull())
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(vec_col).alias("__qv")
    ).filter(F.col("__qv").isNotNull())
    adc = (
        codes.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("__adc", adc_score(F.col("__qv"), F.col("__code")))
        .select("query_id", "neighbor_id", "__adc")
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("__adc", 6)), F.asc("neighbor_id")
    )
    candidates = (
        adc.withColumn("__rn", F.row_number().over(wa))
        .filter(F.col("__rn") <= rerank * k)
        .select("query_id", "neighbor_id")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    scored = (
        candidates.join(F.broadcast(q), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine_sim", cosine_col(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via sign-LSH bucketing +
    exact re-score. Recall rises with ``tables``; precision is exact
    (threshold applied to true cosine). Emits (id_a, id_b, cosine_sim)
    with id_a < id_b."""
    # no driver-side dim probe (round-13 opt, see lsh_topk): lazy
    # in-kernel hyperplanes; empty input degenerates to empty output
    # through the same NULL-bucket path.
    assign = sign_buckets_udf(bits, tables, seed)
    # ids only through the banded self-join and distinct (see lsh_topk):
    # the explode would replicate vectors x tables and the candidate
    # distinct would shuffle arrays; instead dedup (id_a, id_b) longs
    # and re-join the vectors once for the exact re-score.
    banded = (
        df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
        .withColumn("__bks", assign(F.col("__v")))
        .drop("__v")
        .select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            F.element_at("__bks", t + 1).alias("bk"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("__b"),
        )
        .select(id_col, "__b.t", "__b.bk")
    )
    left = banded.select("t", "bk", F.col(id_col).alias("id_a"))
    right = banded.select("t", "bk", F.col(id_col).alias("id_b"))
    pair_ids = (
        left.join(right, ["t", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), _as_double(vec_col).alias("__va"))
    vb = df.select(F.col(id_col).alias("id_b"), _as_double(vec_col).alias("__vb"))
    return (
        pair_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_sim", cosine_col(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v|/127,
    q_i = round(v_i/scale) in [-127, 127] — 4x less memory/bandwidth
    than float32 (8x vs float64), the standard first lever when an
    embedding table outgrows the cluster's storage or a broadcast
    budget. Pure array expressions; no Python in the path.

    Zero vectors get scale 0 and an all-zero code (dequantizes to the
    zero vector). Dequantize: v_i ~ q_i * scale."""
    v = _as_double(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = (amax / F.lit(127.0)).alias(scale_col)
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.round(x / (amax / 127.0)).cast("tinyint")),
    ).otherwise(
        F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    )
    return df.withColumn(scale_col, scale).withColumn(qvec_col, q)


def cosine_topk_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact-shape brute top-k over int8-quantized vectors. Cosine is
    scale-invariant, so the per-vector scales cancel and scoring runs
    directly on the integer codes; quantization perturbs scores only
    by rounding error (~1e-2 at 64 dims) — rank quality is audited
    against the float path by the harness query.

    Same plan as ``cosine_topk`` (broadcast product + rank window);
    the win at 100 TB is the 4-8x smaller corpus scan and broadcast."""
    cq = quantize_embeddings(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        vec_col,
    ).select(
        "neighbor_id",
        F.col("qvec").alias("__cq"),
        F.col("qscale").alias("__cs"),
    )
    qq = quantize_embeddings(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col)),
        vec_col,
    ).select(
        "query_id", F.col("qvec").alias("__qq"), F.col("qscale").alias("__qs")
    )
    cast = lambda c: F.col(c).cast("array<double>")  # noqa: E731
    scored = (
        cq.join(F.broadcast(qq), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim",
            cosine_col(cast("__qq"), cast("__cq")),
        )
        .select("query_id", "neighbor_id", "cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cosine_sim", 6)), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
        )
    )


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None = None,
    n_clusters: int = 8,
) -> DataFrame:
    """Nearest-centroid assignment by cosine (the SemDeDup partition
    step). ``centroids`` is a (cid, vec) DataFrame — pass the output of
    a real k-means (e.g. the IVF trainer's centroids) in production;
    when omitted, the ``n_clusters`` lowest-id vectors serve as
    deterministic probe centroids (reproducible across engines and
    runs, which is what the cross-engine oracle needs).

    Shape: centroids are k rows — broadcast cross join, then a
    partial-aggregable per-vector argmax (max over (sim, -cid) structs,
    so ties go to the smallest centroid id). No window, no shuffle of
    the vector payload: the only exchange is the final groupBy on the
    vector id, which carries (id, sim, cid) — the vectors themselves
    stay in the map-side scan.
    """
    vecs = df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
    if centroids is None:
        cent = (
            df.orderBy(F.asc(id_col))
            .limit(n_clusters)
            .select(
                F.col(id_col).alias("__cid"), _as_double(vec_col).alias("__cv")
            )
        )
    else:
        cid, cvec = centroids.columns[:2]
        cent = centroids.select(
            F.col(cid).alias("__cid"), _as_double(cvec).alias("__cv")
        )
    # tie-break via a DENSE NUMERIC surrogate index over the (tiny,
    # ordered) centroid frame, not numeric negation of the id itself:
    # -cid on a string centroid id casts to NULL and every cluster
    # silently comes back NULL. The surrogate keeps the argmax
    # partial-aggregable and the original id type flows through.
    wc = Window.orderBy("__cid")
    cent = cent.withColumn("__ci", F.row_number().over(wc))
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        id_col,
        F.struct(
            F.round(cosine_col(F.col("__v"), F.col("__cv")), 6).alias("s"),
            (-F.col("__ci")).alias("negci"),
            F.col("__cid").alias("cid"),
        ).alias("__sc"),
    )
    return scored.groupBy(id_col).agg(
        F.max("__sc").getField("cid").alias("cluster")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    centroids: DataFrame | None = None,
    n_clusters: int = 8,
) -> DataFrame:
    """SemDeDup-style embedding deduplication: partition the corpus by
    nearest-centroid cosine assignment, then drop every vector that has
    a smaller-id neighbor in the SAME cluster with cosine >= threshold
    (rounded to 6, so the keep/drop boundary is engine-deterministic).
    Returns the survivors as (id, cluster).

    This is the cluster-bounded alternative to the all-pairs
    ``cosine_neardup_pairs`` / LSH path: the candidate stage costs
    sum-over-clusters C(|cluster|, 2) instead of C(N, 2) — with k grown
    ~sqrt(N) (SemDeDup uses tens of thousands of clusters at
    100M+ scale) each cluster stays small enough that the within-
    cluster self-join is a bucketed hash join, never a cross join.
    Skewed clusters are the known failure mode; AQE skew-join splits
    oversized cluster partitions at runtime, and a caller can always
    pass finer ``centroids``.

    The greedy keep-smallest-id rule is evaluated non-transitively
    (drop x iff exists y < x, same cluster, sim >= t) — the same
    contract as the reference curation recipes, and expressible as one
    anti-join.
    """
    assigned = assign_clusters(
        df, id_col, vec_col, centroids=centroids, n_clusters=n_clusters
    )
    vecs = df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
    withv = assigned.join(vecs, id_col)
    a = withv.select(
        F.col("cluster"), F.col(id_col).alias("__ida"), F.col("__v").alias("__va")
    )
    b = withv.select(
        F.col("cluster"), F.col(id_col).alias("__idb"), F.col("__v").alias("__vb")
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("__ida") < F.col("__idb"))
        .filter(F.round(cosine_col(F.col("__va"), F.col("__vb")), 6) >= threshold)
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    return assigned.join(dropped, id_col, "left_anti").select(id_col, "cluster")


def cluster_silhouette(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame | None = None,
    n_clusters: int = 8,
) -> DataFrame:
    """Simplified silhouette per cluster (Hruschka et al.): for each
    vector, a = cosine distance to its NEAREST centroid (= its own
    under nearest-centroid assignment), b = distance to the
    second-nearest; s = (b - a) / max(a, b). Mean s per cluster is
    the separation readout that says whether a clustering (IVF
    centroids, SemDeDup partitions, k-means) actually found
    structure — the evaluation rung of the clustering family, like
    ranking_metrics for search. Simplified (vs full silhouette's
    all-pairs a/b): centroid distances make it one pass and keep
    s >= 0; low mean s still exposes mush, near-1 means tight,
    well-separated clusters.

    Same centroid contract as assign_clusters: pass real k-means
    centroids in production; omitted, the n_clusters lowest-id
    vectors serve as deterministic probes (what the cross-engine
    oracle replays).

    Plan: k-row broadcast cross join; per vector the k (sim, id)
    pairs reduce through ONE groupBy whose payload is the k-element
    struct list (k is tens-to-thousands, never corpus-sized) sorted
    for best/second-best; then a map-side-combined per-cluster
    aggregate. Vectors never shuffle. Sims round 6 before ordering
    and s rounds 6 before the stable_avg (round-sum-then-divide)
    per-cluster mean.

    Returns (cluster, n BIGINT, mean_silhouette, mean_dist_own,
    mean_dist_next), ordered by cluster.
    """
    vecs = df.select(F.col(id_col), _as_double(vec_col).alias("__v"))
    if centroids is None:
        cent = (
            df.orderBy(F.asc(id_col))
            .limit(n_clusters)
            .select(
                F.col(id_col).alias("__cid"),
                _as_double(vec_col).alias("__cv"),
            )
        )
    else:
        cid, cvec = centroids.columns[:2]
        cent = centroids.select(
            F.col(cid).alias("__cid"), _as_double(cvec).alias("__cv")
        )
    wc = Window.orderBy("__cid")
    cent = cent.withColumn("__ci", F.row_number().over(wc))
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        id_col,
        F.struct(
            F.round(cosine_col(F.col("__v"), F.col("__cv")), 6).alias("s"),
            (-F.col("__ci")).alias("negci"),
            F.col("__cid").alias("cid"),
        ).alias("__sc"),
    )
    top2 = scored.groupBy(id_col).agg(
        F.slice(
            F.sort_array(F.collect_list("__sc"), asc=False), 1, 2
        ).alias("__t")
    )
    a = 1 - F.col("__t")[0]["s"]
    b = 1 - F.col("__t")[1]["s"]
    per_vec = top2.select(
        F.col("__t")[0]["cid"].alias("cluster"),
        a.alias("__a"),
        b.alias("__b"),
        F.when(F.greatest(a, b) > 0, F.round((b - a) / F.greatest(a, b), 6))
        .otherwise(F.lit(0.0))
        .alias("__s"),
    )
    return (
        per_vec.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.sum("__s"), 6) / F.count(F.lit(1))).alias("__ms"),
            (F.round(F.sum("__a"), 6) / F.count(F.lit(1))).alias("__ma"),
            (F.round(F.sum("__b"), 6) / F.count(F.lit(1))).alias("__mb"),
        )
        .select(
            "cluster",
            "n",
            # IEEE-only final rounding (round-13 boundary audit:
            # mean_silhouette measured 1 ulp off a .5e-6 boundary at
            # sf0.01 — round-6 sums divided by counts land near
            # boundaries by construction; tools/boundary_audit.py)
            round6_floor(F.col("__ms")).alias("mean_silhouette"),
            round6_floor(F.col("__ma")).alias("mean_dist_own"),
            round6_floor(F.col("__mb")).alias("mean_dist_next"),
        )
        .orderBy("cluster")
    )


def label_centroids(
    df: DataFrame,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Per-label embedding centroid profile: how coherent is each
    labeled group in embedding space, and how far does it sit from
    the corpus centroid — the GROUP-level readout next to
    cluster_silhouette (per-point cohesion/separation) and
    semantic_dedup (pairwise collapse): a label whose centroid norm
    is near zero is internally incoherent (vectors cancel), one
    whose cosine to the global centroid is low is the outlier
    domain — the drift/mixture signal a 100 TB curation pipeline
    monitors per source or per cluster.

    cos(label) is computed on the SUM vectors (Σ-form): the 1/n and
    1/N factors cancel in the cosine, so only the per-(label, dim)
    float sums enter — fewer divisions, fewer ulps. centroid_norm
    descales by n once at the end.

    Plan at scale: one posexplode to (label, dim, value) rows — n×d
    map-side rows feeding a map-side-combined (label, dim)
    aggregate (labels×d result frame); the global vector is a d-row
    rollup OF that frame (no second scan); dots are a labels×d
    broadcast join + fold. Payload vectors never shuffle — only
    their per-dim partial sums do.

    Returns (label, n BIGINT, centroid_norm, cos_global) ordered by
    label — cos NULL when either norm degenerates to zero.
    """
    base = df.filter(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("__lab"),
        _as_double(F.col(vec_col)).alias("__v"),
    )
    ex = base.select(
        "__lab", F.posexplode("__v").alias("__pos", "__val")
    )
    pl = ex.groupBy("__lab", "__pos").agg(F.sum("__val").alias("__s"))
    nl = base.groupBy("__lab").agg(F.count("*").cast("long").alias("n"))
    g = pl.groupBy("__pos").agg(F.sum("__s").alias("__sg"))
    dots = (
        pl.join(F.broadcast(g), "__pos")
        .groupBy("__lab")
        .agg(
            F.sum(F.col("__s") * F.col("__sg")).alias("__d"),
            F.sum(F.col("__s") * F.col("__s")).alias("__q"),
        )
    )
    qg = g.agg(F.sum(F.col("__sg") * F.col("__sg")).alias("__qq"))
    out = (
        dots.join(nl, "__lab")
        .crossJoin(F.broadcast(qg))
        .select(
            F.col("__lab").alias(label_col),
            "n",
            round6_floor(
                F.sqrt(F.col("__q")) / F.col("n").cast("double")
            ).alias("centroid_norm"),
            round6_floor(
                F.when(
                    (F.col("__q") > 0.0) & (F.col("__qq") > 0.0),
                    F.col("__d")
                    / (F.sqrt(F.col("__q")) * F.sqrt(F.col("__qq"))),
                )
            ).alias("cos_global"),
        )
        .orderBy(label_col)
    )
    return out
