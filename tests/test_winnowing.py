"""Winnowing fingerprint tests: structural guarantees + partial-copy
detection behavior the digest/Jaccard operators can't provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_etl_spark.operators.text import (
    partial_copy_pairs,
    winnowing_fingerprints_col,
)


def _fingerprints(spark, text: str, k=25, window=26) -> set[int]:
    df = spark.createDataFrame([(text,)], "text string").select(
        winnowing_fingerprints_col("text", k, window).alias("fp")
    )
    return set(df.first().fp)


def test_identical_texts_identical_fingerprints(spark):
    a = _fingerprints(spark, "the quick brown fox jumps over the lazy dog")
    b = _fingerprints(spark, "The  quick brown fox jumps over the lazy dog ")
    assert a == b  # normalization: case + whitespace runs


def test_shared_excerpt_shares_fingerprints(spark):
    excerpt = "a very distinctive shared passage of text that is long enough"
    a = _fingerprints(spark, f"intro words then {excerpt} and an ending")
    b = _fingerprints(spark, f"completely different opening. {excerpt}. other tail")
    c = _fingerprints(spark, "nothing in common with either document at all")
    assert len(a & b) >= 1  # 62-char shared span > 50-char guarantee
    assert not (a & c) and not (b & c)


def test_window_guarantee(spark):
    # any shared substring of length >= window + k - 1 (= 50) must
    # produce at least one shared fingerprint
    shared = "xqzjvwkpfyh0123456789abcdefghij9876543210qwertyuio"  # 50 chars
    assert len(shared) == 50
    a = _fingerprints(spark, f"aaa {shared} bbb")
    b = _fingerprints(spark, f"ccc {shared} ddd")
    assert a & b


def test_partial_copy_pairs_end_to_end(spark):
    excerpt = (
        "large language models are trained on deduplicated corpora "
        "because repeated passages distort the loss"
    )
    df = spark.createDataFrame(
        [
            (1, f"blog post intro. {excerpt} closing thoughts about tooling."),
            (2, f"a paper abstract: {excerpt} plus citations and methods."),
            (3, "an unrelated recipe for sourdough bread with rye flour."),
            (4, "another unrelated text about bicycle maintenance habits."),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b): r.shared_fingerprints
        for r in partial_copy_pairs(df, "doc_id", "text", min_shared=2).collect()
    }
    assert set(pairs) == {(1, 2)}
    # and the Jaccard dedup family MISSES this pair at its threshold —
    # the shared excerpt is too small a fraction of either doc
    from reddit_etl_spark.operators.dedup import ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert (1, 2) not in {(r.id_a, r.id_b) for r in jac}


def test_python_reference_parity(spark):
    """Cross-check the expression pipeline against a straightforward
    Python implementation of winnowing over the same normalization."""
    import re

    # xxhash64 isn't reimplementable in pure Python here; instead pull
    # Spark's own k-gram hashes and apply the winnowing selection
    # (window-min + dedup) in Python — pinning the selection logic.
    text = "some moderately long example text for structural checking!"
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    k, window = 8, 4
    n_grams = max(len(norm) - k + 1, 1)
    df = spark.createDataFrame([(text,)], "text string")
    grams = df.select(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_grams)),
            lambda i: F.xxhash64(
                F.substring(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), i, k
                )
            ),
        ).alias("g")
    ).first().g
    expected = set()
    for i in range(max(len(grams) - window + 1, 1)):
        expected.add(min(grams[i : i + window]))
    got = _fingerprints(spark, text, k=k, window=window)
    assert got == expected
