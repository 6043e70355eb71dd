"""Deduplication operators for 100 TB-scale corpus curation.

Five strategies, all expressed as distributed DataFrame plans (no
driver-side loops, no row-at-a-time Python):

- exact:         hash-groupBy on (normalized) content; keep min id.
- ngram-Jaccard: word-shingle inverted index -> candidate pairs ->
                 exact Jaccard verify. Exact but O(shared-shingle pairs).
- MinHash+LSH:   shingle -> 2-universal minhash signature -> banded
                 bucket join -> candidates -> exact-Jaccard verify.
                 Near-linear; the scale path for near-dup text.
- SimHash:       64-bit weighted-bit signature (Arrow-batched pandas
                 UDF, the one place NumPy genuinely beats expressions)
                 -> 4x16-bit chunk banding (pigeonhole: hamming<=3
                 pairs share a chunk) -> XOR/bit_count verify.
- embedding:     cosine-threshold near-dup pairs over a vector column;
                 brute-force blocked join baseline + random-hyperplane
                 LSH bucketing as the scale path (see similarity.py).

Scale notes: every strategy shuffles only (key, id) pairs — never the
full document payload — and candidate generation is always a
key-equality join (hash join, AQE-skew-splittable), never a cross
join. Frequency capping (``max_df``) bounds the inverted-index blowup
from stop-shingles, the classic skew killer in web-scale dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .text import normalize_text_col

# Primes for 2-universal hashing (Carter–Wegman). Base hashes and
# coefficients are kept below 2^31 so a*x + b stays < 2^63 — exact in
# Spark's LongType (no silent overflow wrap, which would void the
# universality guarantee).
_MERSENNE61 = (1 << 61) - 1
_MERSENNE31 = (1 << 31) - 1


def shingles_col(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text.

    Pure array expressions: split -> sliding windows via
    transform(sequence(...)) -> concat_ws -> array_distinct. Documents
    shorter than n tokens yield their full token string as the single
    shingle (so they can still match exact copies of themselves).
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = F.split(normalize_text_col(t), " ")
    k = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(windows)


def exact_dedup(
    df: DataFrame,
    id_col: str,
    content_cols: list[str],
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup: one survivor (min id) per distinct content.

    Groups on xxhash64+md5 of the content rather than the raw payload,
    so the shuffle carries 24 bytes per row instead of the document —
    at 100 TB that is the difference between a feasible and an
    impossible shuffle. Collisions would need simultaneous 64-bit and
    128-bit collisions on the same pair (~2^-192): accepted.

    Returns (id_col, dup_count) — survivors with their group size.
    """
    content = [
        normalize_text_col(c) if normalize else F.col(c) for c in content_cols
    ]
    keyed = df.select(
        F.col(id_col),
        F.xxhash64(*content).alias("__h64"),
        F.md5(F.concat_ws("\x1f", *content)).alias("__h128"),
    )
    return (
        keyed.groupBy("__h64", "__h128")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )


def _candidate_verify_jaccard(
    shingled: DataFrame,
    candidates: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to shingle sets and
    compute exact Jaccard via array_intersect/array_union sizes."""
    a = shingled.select(
        F.col(id_col).alias("id_a"), F.col("__shingles").alias("__sh_a")
    )
    b = shingled.select(
        F.col(id_col).alias("id_b"), F.col("__shingles").alias("__sh_b")
    )
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("__sh_a", "__sh_b"))
            / F.size(F.array_union("__sh_a", "__sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT near-duplicate pairs by word-n-gram Jaccard similarity.

    Inverted index (shingle -> ids) generates candidates only for
    pairs sharing >=1 shingle; exact Jaccard then verifies. ``max_df``
    drops shingles occurring in more than that many documents
    (stop-shingles): at web scale a single hot shingle otherwise
    yields a quadratic candidate explosion on one key — the canonical
    skew failure. Candidates with every shingle capped can be missed;
    that is the documented trade (set max_df=None for exactness).
    """
    shingled = df.select(
        F.col(id_col), shingles_col(text_col, n).alias("__shingles")
    )
    posting = shingled.select(
        F.col(id_col), F.explode("__shingles").alias("__sh")
    )
    if max_df is not None:
        hot = (
            posting.groupBy("__sh").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("__sh")
        )
        posting = posting.join(F.broadcast(hot), "__sh", "left_anti")
    left = posting.select(F.col("__sh"), F.col(id_col).alias("id_a"))
    right = posting.select(F.col("__sh"), F.col(id_col).alias("id_b"))
    candidates = (
        left.join(right, "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _candidate_verify_jaccard(shingled, candidates, id_col, threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding,
    verified with exact Jaccard — the scale path for text near-dup.

    One xxhash64 per shingle, then ``num_hashes`` 2-universal
    transforms h_i(x) = (a_i*x + b_i) mod (2^61-1) (Carter–Wegman);
    this avoids hashing each shingle 128 times. Signatures band into
    ``bands`` groups of r = num_hashes/bands; same (band, r-slice
    hash) -> candidate. With r=4, b=32 the S-curve crosses ~0.42 —
    right for a 0.5 Jaccard threshold.

    Cost model at 100 TB: shuffle is (band_hash, id) — 32 rows x 16
    bytes per doc, independent of document size; the verify join pulls
    shingle arrays only for candidate ids.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE31, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE31, size=num_hashes, dtype=np.int64)

    shingled = df.select(
        F.col(id_col), shingles_col(text_col, n).alias("__shingles")
    )
    # base 64-bit hash per shingle, folded into [0, 2^31)
    base = F.transform(
        "__shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))
    )

    def _minhash(ai: int, bi: int):
        # single-arg lambda factory: a 2-arg lambda would make Spark
        # pass (element, index) and shadow the captured coefficient
        return F.array_min(
            F.transform(
                base,
                lambda h: F.pmod(
                    F.lit(ai) * h + F.lit(bi), F.lit(_MERSENNE61)
                ),
            )
        )

    sig_parts = [_minhash(int(a[i]), int(b[i])) for i in range(num_hashes)]
    with_sig = shingled.withColumn("__sig", F.array(*sig_parts))
    banded = with_sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice("__sig", bi * r + 1, r),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__b.band", "__b.bh")
    left = banded.select("band", "bh", F.col(id_col).alias("id_a"))
    right = banded.select("band", "bh", F.col(id_col).alias("id_b"))
    candidates = (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _candidate_verify_jaccard(shingled, candidates, id_col, threshold)


_SIMHASH_SCHEMA = StructType(
    [StructField("__sid", LongType()), StructField("simhash", LongType())]
)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """64-bit SimHash per document via an Arrow-batched pandas UDF.

    The bit-vote accumulation (64 weighted sums per doc) is the one
    dedup kernel where NumPy bit-unpacking genuinely beats nested SQL
    expressions, so this is a mapInPandas-style vectorized path:
    tokens are hashed JVM-side first (cheap, codegen), only the hash
    arrays cross the Arrow boundary — never the text itself.
    """
    hashed = df.select(
        F.col(id_col).alias("__sid"),
        F.transform(
            F.split(normalize_text_col(text_col), " "), lambda t: F.xxhash64(t)
        ).alias("__th"),
    )

    def _simhash(batches):
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, hs in enumerate(pdf["__th"]):
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                if h.size == 0:
                    continue
                bits = (
                    (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
                ).astype(np.int32)
                votes = (2 * bits - 1).sum(axis=0)
                out[row_i] = np.int64(
                    np.uint64(
                        sum(np.uint64(1) << np.uint64(j) for j in range(64) if votes[j] > 0)
                    )
                )
            yield pd.DataFrame({"__sid": pdf["__sid"], "simhash": out})

    return hashed.mapInPandas(_simhash, schema=_SIMHASH_SCHEMA).withColumnRenamed(
        "__sid", id_col
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with simhash hamming distance <= k, k<=3.

    Pigeonhole banding: split the 64-bit signature into 4 16-bit
    chunks; any pair within hamming distance 3 agrees on >=1 chunk, so
    a join on (chunk_idx, chunk_value) finds all of them. Verify with
    bit_count(xor). Same shuffle shape as MinHash banding: tiny keys.
    """
    sigs = simhash_signatures(df, id_col, text_col)
    chunks = sigs.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("__c"),
    ).select(id_col, "simhash", "__c.ci", "__c.cv")
    left = chunks.select(
        "ci", "cv", F.col(id_col).alias("id_a"), F.col("simhash").alias("__sa")
    )
    right = chunks.select(
        "ci", "cv", F.col(id_col).alias("id_b"), F.col("simhash").alias("__sb")
    )
    return (
        left.join(right, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
