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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
        F.desc("cosine_sim"), F.asc("neighbor_id")
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


def sign_bucket_cols(
    vec: Column, planes: np.ndarray
) -> list[Column]:
    """One bucket id per LSH table: the sign pattern of the vector
    against ``bits`` fixed hyperplanes, packed into a long."""
    tables, bits, _dim = planes.shape
    out = []
    for t in range(tables):
        acc = F.lit(0).cast("long")
        for b in range(bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[t, b]])
            bit = F.when(dot_col(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
            acc = acc * 2 + bit
        out.append(acc)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join, exact cosine
    re-score on candidates only. At 1000-executor scale the bucket
    join replaces the O(|corpus| x |queries|) broadcast product with
    ~|corpus| x tables bucket rows."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, tables, seed)

    def bucketize(df: DataFrame, idc: str, alias: str) -> DataFrame:
        v = _as_double(vec_col)
        buckets = sign_bucket_cols(v, planes)
        return df.select(
            F.col(idc).alias(alias),
            v.alias(f"__{alias}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("t"), buckets[t].alias("bk"))
                        for t in range(tables)
                    ]
                )
            ).alias("__b"),
        ).select(alias, f"__{alias}_v", "__b.t", "__b.bk")

    c = bucketize(corpus, id_col, "neighbor_id")
    q = bucketize(queries, query_id_col, "query_id")
    candidates = (
        c.join(q, ["t", "bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "__query_id_v", "neighbor_id", "__neighbor_id_v")
        .distinct()
    )
    scored = candidates.withColumn(
        "cosine_sim", cosine_col(F.col("__query_id_v"), F.col("__neighbor_id_v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
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
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, tables, seed)
    v = _as_double(vec_col)
    buckets = sign_bucket_cols(v, planes)
    banded = df.select(
        F.col(id_col),
        v.alias("__v"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), buckets[t].alias("bk"))
                    for t in range(tables)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__v", "__b.t", "__b.bk")
    left = banded.select(
        "t", "bk", F.col(id_col).alias("id_a"), F.col("__v").alias("__va")
    )
    right = banded.select(
        "t", "bk", F.col(id_col).alias("id_b"), F.col("__v").alias("__vb")
    )
    return (
        left.join(right, ["t", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb")
        .distinct()
        .withColumn("cosine_sim", cosine_col(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )
