"""Empty-input contracts for every round-13 wave-2/3/4 operator (the
round-11 discipline): an empty frame must yield a well-formed result —
one NULL-statistic row for the 1-row readouts, zero rows for per-group
frames — never an exception. Wave-1 operators carry the same checks in
test_round13_ops.py's degenerate cases."""

from __future__ import annotations

import pytest

from reddit_etl_spark.operators.classify import (
    cronbach_alpha,
    spiegelhalter_z,
)
from reddit_etl_spark.operators.curation import group_kfold_assign
from reddit_etl_spark.operators.relational import (
    bws_two_sample,
    dagostino_k2,
    fligner_killeen,
    g_test_independence,
    icc_oneway_paired,
    runs_two_sample,
    shapiro_francia,
    van_der_waerden,
    wilson_ci,
)
from reddit_etl_spark.operators.series import (
    bartels_rank,
    chow_test,
    cusum_squares,
    granger_lag1,
    newey_west_mean,
)
from reddit_etl_spark.operators.similarity import label_centroids


@pytest.fixture(scope="module")
def empty_vc(spark):
    return spark.createDataFrame([], "v double, c string")


@pytest.fixture(scope="module")
def empty_ty(spark):
    return spark.createDataFrame([], "t long, y long")


def _one_null_row(rows, stat_cols):
    assert len(rows) == 1
    for c in stat_cols:
        assert rows[0][c] is None, c


def test_empty_wilson(spark, empty_vc):
    df = spark.createDataFrame([], "g string, hit boolean")
    assert wilson_ci(df, ["g"], "hit").collect() == []


def test_empty_dagostino(spark):
    df = spark.createDataFrame([], "v double")
    _one_null_row(
        dagostino_k2(df, "v").collect(),
        ["skew", "kurt_excess", "z_skew", "z_kurt", "k2", "p_k2"],
    )


def test_empty_runs(empty_vc):
    _one_null_row(
        runs_two_sample(empty_vc, "v", "c", "a").collect(),
        ["runs", "mu", "z", "p"],
    )


def test_empty_bws(empty_vc):
    _one_null_row(
        bws_two_sample(empty_vc, "v", "c", "a").collect(),
        ["b_x", "b_y", "b"],
    )


def test_empty_granger(spark):
    df = spark.createDataFrame([], "t long, y long, x long")
    _one_null_row(
        granger_lag1(df, "t", "y", "x").collect(),
        ["beta_lag_y", "beta_lag_x", "ssr_r", "ssr_f", "f_stat"],
    )


def test_empty_chow(empty_ty):
    _one_null_row(
        chow_test(empty_ty, "t", "y", 5).collect(),
        ["slope_1", "slope_2", "slope_pooled", "f_stat"],
    )


def test_empty_label_centroids(spark):
    df = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert label_centroids(df, "embedding", "label").collect() == []


def test_empty_g_test(spark):
    df = spark.createDataFrame([], "a string, b string")
    rows = g_test_independence(df, "a", "b").collect()
    assert len(rows) == 1
    assert rows[0]["dof"] == 0 and rows[0]["g_stat"] is None


def test_empty_icc(spark):
    df = spark.createDataFrame([], "x double, y double")
    _one_null_row(
        icc_oneway_paired(df, "x", "y").collect(), ["msb", "msw", "icc"]
    )


def test_empty_cusum_squares(empty_ty):
    _one_null_row(
        cusum_squares(empty_ty, "t", "y").collect(), ["d_stat", "at_t"]
    )


def test_empty_spiegelhalter(spark):
    df = spark.createDataFrame([], "p double, y boolean")
    _one_null_row(
        spiegelhalter_z(df, "p", "y").collect(), ["brier", "z", "p"]
    )


def test_empty_cronbach(spark):
    df = spark.createDataFrame([], "a boolean, b boolean, c boolean")
    _one_null_row(
        cronbach_alpha(df, ["a", "b", "c"]).collect(),
        ["var_total", "sum_item_vars", "alpha"],
    )


def test_empty_group_kfold(spark):
    df = spark.createDataFrame([], "g long, v long")
    assert group_kfold_assign(df, "g", k=5).collect() == []


def test_empty_vdw(empty_vc):
    rows = van_der_waerden(empty_vc, "v", "c").collect()
    assert len(rows) == 1 and rows[0]["t_stat"] is None


def test_empty_fligner(empty_vc):
    rows = fligner_killeen(empty_vc, "v", "c").collect()
    assert len(rows) == 1 and rows[0]["x2"] is None


def test_empty_shapiro_francia(spark):
    df = spark.createDataFrame([], "v double")
    _one_null_row(shapiro_francia(df, "v").collect(), ["w_stat"])


def test_empty_bartels(empty_ty):
    _one_null_row(
        bartels_rank(empty_ty, "t", "y").collect(), ["rvn", "z", "p"]
    )


def test_empty_newey_west(empty_ty):
    _one_null_row(
        newey_west_mean(empty_ty, "t", "y").collect(),
        ["mean", "se_iid", "se_nw", "inflation"],
    )
