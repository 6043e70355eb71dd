"""Skew stress evidence: plant one pathological hot key and prove the
three mitigation paths in SCALING.md actually bound the blowup —
salting spreads the hot key's rows across reducers, ``max_df`` caps
the hot-shingle candidate explosion, and AQE's skew-join split kicks
in under the documented confs."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.dedup import (
    ngram_jaccard_pairs,
    shingle_arrays,
)
from reddit_etl_spark.operators.skew import salted_join


@contextmanager
def _confs(spark, **kv):
    saved = {}
    for k, v in kv.items():
        k = k.replace("__", ".")
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_fact(spark, n, hot_share=0.9, tail_keys=1000):
    hot_mod = int(hot_share * 10)
    return spark.range(n).select(
        F.when(F.col("id") % 10 < hot_mod, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % tail_keys).cast("string")))
        .alias("k"),
        F.concat(F.lit("payload_padding_padding_"), F.col("id").cast("string")).alias(
            "v"
        ),
    )


def _dim(spark, tail_keys=1000):
    return spark.range(0, tail_keys + 1).select(
        F.when(F.col("id") == tail_keys, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("id").cast("string")))
        .alias("k"),
        (F.col("id") * 7).alias("w"),
    )


def test_salted_join_bounds_max_partition_share(spark):
    """90% of rows carry one key. A plain shuffle join funnels them
    through one reducer (max partition share ~0.9); the salted join
    spreads them across ``salt`` reducers — the direct mechanism that
    bounds task-time spread at 100 TB."""
    n = 50_000
    fact = _skewed_fact(spark, n)
    dim = _dim(spark)
    with _confs(
        spark,
        **{
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__adaptive__coalescePartitions__enabled": "false",
            "spark__sql__adaptive__skewJoin__enabled": "false",
            "spark__sql__shuffle__partitions": "32",
        },
    ):
        def max_share(df):
            parts = (
                df.withColumn("__p", F.spark_partition_id())
                .groupBy("__p")
                .count()
                .collect()
            )
            total = sum(r["count"] for r in parts)
            return max(r["count"] for r in parts) / total

        plain = max_share(fact.join(dim, "k"))
        salted = max_share(salted_join(fact, dim, ["k"], salt=64))
    assert plain > 0.85  # the pathology is real: one straggler reducer
    # 64-way salting spreads the hot 90% across reducers; allow for
    # salt-to-partition hash collisions (observed 0.088 at 32 parts)
    assert salted < 0.25


def test_salted_join_result_equals_plain_under_skew(spark):
    fact = _skewed_fact(spark, 20_000)
    dim = _dim(spark)
    got = salted_join(fact, dim, ["k"], salt=8)
    want = fact.join(dim, "k")
    assert got.count() == want.count()
    assert (
        got.agg(F.sum(F.length("v") + F.col("w"))).first()[0]
        == want.agg(F.sum(F.length("v") + F.col("w"))).first()[0]
    )


def test_max_df_caps_hot_shingle_candidate_explosion(spark):
    """Every document shares one boilerplate phrase (the planted hot
    shingle). Uncapped, the posting self-join emits C(n,2) pairs for
    that shingle alone; with ``max_df`` the stop-shingle drops out and
    the join touches only genuine near-dup candidates — while the
    true duplicate pairs (sharing RARE shingles) are still found."""
    n = 200
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            # planted boilerplate in every doc -> one hot 3-gram chain
            F.lit("lorem ipsum dolor sit amet "),
            # unique tail; ids 0/1 are exact dups of each other
            F.when(F.col("id") < 2, F.lit("alpha beta gamma delta")).otherwise(
                F.concat(
                    F.lit("tail"),
                    F.col("id").cast("string"),
                    F.lit(" unique"),
                    F.col("id").cast("string"),
                    F.lit(" words"),
                    F.col("id").cast("string"),
                )
            ),
        ).alias("text"),
    )

    def cooccurrence_rows(max_df):
        arrays = shingle_arrays(docs, "doc_id", "text", 3, materialize=False)
        posting = arrays.select(
            F.col("doc_id"), F.explode("__arr").alias("__sh")
        )
        if max_df is not None:
            hot = (
                posting.groupBy("__sh")
                .agg(F.count("*").alias("__df"))
                .filter(F.col("__df") > max_df)
                .select("__sh")
            )
            posting = posting.join(F.broadcast(hot), "__sh", "left_anti")
        a = posting.select("__sh", F.col("doc_id").alias("id_a"))
        b = posting.select("__sh", F.col("doc_id").alias("id_b"))
        return (
            a.join(b, "__sh").filter(F.col("id_a") < F.col("id_b")).count()
        )

    uncapped = cooccurrence_rows(None)
    capped = cooccurrence_rows(10)
    # hot boilerplate shingles each produce C(200,2)=19900 join rows
    assert uncapped > 19_900
    # capping removes them: only the planted dup pair's rare shingles
    # co-occur
    assert capped < 100
    # and the capped operator still finds the true duplicate pair
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=10
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_aqe_skew_join_split_engages(spark):
    """Under the SCALING.md skew confs, AQE splits the straggler
    partition at runtime: the final adaptive plan carries
    ``skew=true`` on the sort-merge join."""
    fact = _skewed_fact(spark, 400_000)
    dim = _dim(spark)
    with _confs(
        spark,
        **{
            "spark__sql__adaptive__enabled": "true",
            "spark__sql__adaptive__skewJoin__enabled": "true",
            "spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes": "65536",
            "spark__sql__adaptive__advisoryPartitionSizeInBytes": "16384",
            "spark__sql__adaptive__skewJoin__skewedPartitionFactor": "1",
            "spark__sql__autoBroadcastJoinThreshold": "-1",
            "spark__sql__shuffle__partitions": "16",
        },
    ):
        j = fact.join(dim, "k")
        assert len(j.collect()) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan


def test_join_key_profile_exact_and_detects_hot_key(spark):
    from reddit_etl_spark.operators.skew import join_key_profile

    left = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 3]], "k long"
    )
    right = spark.createDataFrame(
        [(k,) for k in [1, 1, 2, 4]], "k long"
    )
    r = join_key_profile(left, right, ["k"], top_k=2).collect()[0]
    assert (r["n_left"], r["n_right"]) == (5, 4)
    assert (r["distinct_left"], r["distinct_right"]) == (3, 3)
    assert r["common_keys"] == 2          # keys 1 and 2
    assert r["output_rows"] == 3 * 2 + 1  # exact inner-join size
    assert r["max_key_output"] == 6
    tops = [(t["rows"], t["key"]) for t in r["top_keys"]]
    assert tops == [(6, "1"), (1, "2")]
    # the profile is exact: run the join and compare
    assert left.join(right, "k").count() == r["output_rows"]


def test_join_key_profile_disjoint_keys(spark):
    from reddit_etl_spark.operators.skew import join_key_profile

    left = spark.createDataFrame([(1,)], "k long")
    right = spark.createDataFrame([(2,)], "k long")
    r = join_key_profile(left, right, ["k"]).collect()[0]
    assert r["common_keys"] == 0 and r["output_rows"] == 0
    assert r["max_key_output"] == 0 and r["top_keys"] == []


def test_join_key_profile_null_keys_and_short_topk(spark):
    from reddit_etl_spark.operators.skew import join_key_profile

    # NULL keys never match in an equi-join and must not be counted
    left = spark.createDataFrame([(1,), (None,), (None,)], "k long")
    right = spark.createDataFrame([(1,), (None,)], "k long")
    r = join_key_profile(left, right, ["k"], top_k=5).collect()[0]
    assert r["output_rows"] == left.join(right, "k").count() == 1
    assert r["distinct_left"] == 1  # NULL is not a key
    # fewer keys than top_k must still return them (not [])
    assert [(t["rows"], t["key"]) for t in r["top_keys"]] == [(1, "1")]


def test_join_key_profile_composite_keys_do_not_collide(spark):
    from reddit_etl_spark.operators.skew import join_key_profile

    # ("ab","c") vs ("a","bc"): naive "" concatenation would merge them
    left = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    right = spark.createDataFrame([("ab", "c")], "x string, y string")
    r = join_key_profile(left, right, ["x", "y"]).collect()[0]
    assert r["distinct_left"] == 2
    assert r["common_keys"] == 1
    assert r["output_rows"] == left.join(right, ["x", "y"]).count() == 1


def test_join_key_profile_separator_bytes_in_values_do_not_collide(spark):
    from reddit_etl_spark.operators.skew import join_key_profile

    # ("a\x1fb","c") vs ("a","b\x1fc"): any separator-encoded composite
    # key collides here; the struct group-by must keep them distinct
    left = spark.createDataFrame(
        [("a\x1fb", "c"), ("a", "b\x1fc")], "x string, y string"
    )
    right = spark.createDataFrame([("a\x1fb", "c")], "x string, y string")
    r = join_key_profile(left, right, ["x", "y"]).collect()[0]
    assert r["distinct_left"] == 2
    assert r["common_keys"] == 1
    assert r["output_rows"] == left.join(right, ["x", "y"]).count() == 1


def test_bloom_semi_join_exact_and_prunes(spark):
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.skew import bloom_semi_join

    small = spark.range(0, 300).select((F.col("id") * 7).alias("k"))
    big = spark.range(0, 50000).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("v")
    )
    exact = {tuple(r) for r in big.join(small, "k", "semi").collect()}
    got = {
        tuple(r)
        for r in bloom_semi_join(big, small, "k", bits=1 << 16, k=5).collect()
    }
    assert got == exact
    # no false negatives ever; FPs bounded at these parameters
    pruned = bloom_semi_join(
        big, small, "k", bits=1 << 16, k=5, verify=False
    ).count()
    assert len(exact) <= pruned <= len(exact) * 1.05 + 64
    # string keys and NULL-free behavior
    s2 = spark.createDataFrame([("a",), ("b",)], "k string")
    b2 = spark.createDataFrame(
        [("a", 1), ("c", 2), ("d", 3)], "k string, v int"
    )
    assert sorted(r["k"] for r in bloom_semi_join(b2, s2, "k", bits=1 << 10).collect()) == ["a"]
    import pytest as _pytest

    from reddit_etl_spark.operators.skew import build_bloom

    with _pytest.raises(ValueError, match="power of two"):
        build_bloom(s2, "k", bits=1000)
