"""Deterministic Poisson bootstrap (operators/resample.py): weight
distribution, partitioning invariance, and CI sanity."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from reddit_etl_spark.operators.resample import (
    poisson_bootstrap_ci,
    poisson_weight_col,
)


class TestPoissonWeights:
    def test_distribution_close_to_poisson1(self, spark):
        n = 20_000
        df = spark.range(n).select(
            poisson_weight_col(F.col("id"), F.lit(0)).alias("w")
        )
        freq = {r["w"]: r["c"] for r in
                df.groupBy("w").agg(F.count("*").alias("c")).collect()}
        p0 = freq.get(0, 0) / n
        p1 = freq.get(1, 0) / n
        mean_w = sum(k * c for k, c in freq.items()) / n
        assert abs(p0 - math.exp(-1)) < 0.02
        assert abs(p1 - math.exp(-1)) < 0.02
        assert abs(mean_w - 1.0) < 0.03
        assert max(freq) <= 5  # documented cap

    def test_weights_deterministic_across_partitionings(self, spark):
        df1 = spark.range(500)
        df8 = df1.repartition(8)
        w = lambda d: sorted(  # noqa: E731
            (r["id"], r["w"])
            for r in d.select(
                "id", poisson_weight_col(F.col("id"), F.lit(3)).alias("w")
            ).collect()
        )
        assert w(df1) == w(df8)


class TestPoissonBootstrapCI:
    def test_ci_brackets_point_mean_and_is_invariant(self, spark):
        rows = [("g", i, float(i % 97)) for i in range(2000)]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        a = poisson_bootstrap_ci(df, ["g"], "v", "id").collect()[0]
        b = poisson_bootstrap_ci(
            df.repartition(16), ["g"], "v", "id"
        ).collect()[0]
        assert a == b  # bit-identical across partitionings
        assert a["n_rows"] == 2000 and a["n_replicates"] == 64
        assert a["ci_lo"] <= a["point_mean"] <= a["ci_hi"]
        # a 2000-row mean of values in [0,96] is tight: the 90% CI
        # half-width should be ~ 1.64 * sd/sqrt(n) ~ 1.0, loosely < 3
        assert a["ci_hi"] - a["ci_lo"] < 3.0

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([("g", 1, 1.0)], "g string, id long, v double")
        with pytest.raises(ValueError):
            poisson_bootstrap_ci(df, ["g"], "v", "id", replicates=2)
        with pytest.raises(ValueError):
            poisson_bootstrap_ci(df, ["g"], "v", "id", alpha=1.5)
