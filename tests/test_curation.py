"""Curation operators: deterministic sampling exactness/stability,
stratified rates, split composition, and PII redaction semantics."""

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.curation import (
    PII_PATTERNS,
    deterministic_sample,
    hash_threshold,
    redact_pii,
    split_col,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumn(
        "stratum", (F.col("id") % 2 == 0).cast("string")
    )


def test_hash_threshold_exact_fractions():
    assert hash_threshold(0.5) == "8000"
    assert hash_threshold(0.25) == "4000"
    assert hash_threshold(0.0) == "0000"
    with pytest.raises(ValueError):
        hash_threshold(1.5)


def test_sample_is_deterministic_and_near_rate(ids):
    a = {r["id"] for r in deterministic_sample(ids, "id", 0.5).collect()}
    b = {r["id"] for r in deterministic_sample(ids, "id", 0.5).collect()}
    assert a == b  # rerun-stable (no rand())
    assert 0.45 <= len(a) / 2000 <= 0.55


def test_sample_is_nested_by_fraction(ids):
    # a smaller fraction selects a subset of a larger one (same hash bits)
    small = {r["id"] for r in deterministic_sample(ids, "id", 0.2).collect()}
    big = {r["id"] for r in deterministic_sample(ids, "id", 0.6).collect()}
    assert small <= big


def test_stratified_rates(ids):
    got = deterministic_sample(
        ids, "id", 0.1, strata_col="stratum", fractions={"true": 0.8}
    )
    counts = {r["stratum"]: r["n"] for r in
              got.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert counts["true"] / 1000 > 0.7      # boosted stratum
    assert counts.get("false", 0) / 1000 < 0.2  # default rate


def test_split_partitions_everything(ids):
    tagged = ids.select("id", split_col("id", 0.9).alias("split"))
    counts = {r["split"]: r["n"] for r in
              tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["train"] + counts["test"] == 2000
    assert counts["train"] / 2000 > 0.85


def test_sample_plans_as_pure_filter(ids):
    plan = deterministic_sample(ids, "id", 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.org call +1-555-867-5309 ssn 123-45-6789 "
             "ip 10.0.0.255 clean tail")],
        "id long, t string",
    )
    row = redact_pii(df, "t").collect()[0]
    assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"]) == (
        1, 1, 1, 1,
    )
    red = row["redacted_text"]
    assert "[EMAIL]" in red and "[SSN]" in red and "[PHONE]" in red \
        and "[IP]" in red
    assert "@" not in red and "5309" not in red and "123-45" not in red
    assert red.endswith("clean tail")


def test_redact_pii_counts_on_original_text(spark):
    # SSN is also digit-shaped; counts must come from the original text,
    # not from post-replacement remnants
    df = spark.createDataFrame([(1, "x 123-45-6789 y")], "id long, t string")
    row = redact_pii(df, "t").collect()[0]
    assert row["n_ssn"] == 1 and row["n_phone"] == 0


def test_patterns_are_re2_safe():
    # no backreferences / lookaround (so the DuckDB RE2 oracle accepts them)
    for rx, _ in PII_PATTERNS.values():
        assert "(?=" not in rx and "(?<" not in rx and "\\1" not in rx
