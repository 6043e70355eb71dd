"""Bucketed-layout and skew-operator tests: correctness AND the plan
properties that justify them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.skew import salted_count_distinct, salted_join
from reddit_etl_spark.plans.inspect import count_exchanges
from reddit_etl_spark.sinks.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # the shared session already has a derby metastore; just use it
    return spark


def test_bucketed_join_has_no_exchange(warehouse, tmp_path_factory):
    spark = warehouse
    a = spark.range(0, 10_000).withColumn("k", F.col("id") % 500).withColumn(
        "va", F.col("id") * 2
    )
    b = spark.range(0, 5_000).withColumn("k", F.col("id") % 500).withColumn(
        "vb", F.col("id") * 3
    )
    write_bucketed(a.select("k", "va"), "bkt_a", ["k"], num_buckets=8)
    write_bucketed(b.select("k", "vb"), "bkt_b", ["k"], num_buckets=8)
    try:
        joined = bucketed_join(spark, "bkt_a", "bkt_b", ["k"])
        # co-located buckets: the join itself introduces NO shuffle
        assert count_exchanges(joined) == 0
        # and it's still correct
        plain = a.select("k", "va").join(b.select("k", "vb"), "k")
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a long tail
    skewed = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 101).select(
        F.when(F.col("id") == 100, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("k"),
        (F.col("id") * 7).alias("w"),
    )
    got = salted_join(skewed, dim, ["k"], salt=8)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    gsum = got.agg(F.sum(F.col("v") + F.col("w"))).first()[0]
    wsum = want.agg(F.sum(F.col("v") + F.col("w"))).first()[0]
    assert gsum == wsum


def test_salted_join_left_outer(spark):
    skewed = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )
    dim = spark.createDataFrame([("a", 10)], "k string, w long")
    rows = sorted(
        (r.k, r.v, r.w) for r in salted_join(skewed, dim, ["k"], salt=4, how="left").collect()
    )
    assert rows == [("a", 1, 10), ("a", 2, 10), ("b", 3, None)]


def test_salted_count_distinct_exact(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 321).alias("x")
    )
    got = {
        r.g: r.distinct_count
        for r in salted_count_distinct(df, ["g"], "x").collect()
    }
    want = {
        r.g: r.dc
        for r in df.groupBy("g").agg(F.countDistinct("x").alias("dc")).collect()
    }
    assert got == want
