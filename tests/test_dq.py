"""Data-quality expectations (operators/dq.py): per-kind violation
semantics, single-scan fusion of row-level checks, and empty inputs."""

from __future__ import annotations

import pytest

from reddit_etl_spark.operators import dq


@pytest.fixture(scope="module")
def table(spark):
    rows = [
        (1, "O", 10.0, 100),
        (2, "F", -5.0, 100),     # range violation
        (3, None, 20.0, 200),    # null status
        (3, "X", 30.0, None),    # dup key + bad value + null fk
        (4, "O", 40.0, 999),     # fk orphan
    ]
    return spark.createDataFrame(rows, "k long, status string, price double, fk long")


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(100,), (200,)], "id long")


def _report(df, checks):
    return {r["check"]: (r["violations"], r["total"]) for r in dq.dq_report(df, checks).collect()}


def test_row_level_checks(table):
    got = _report(
        table,
        [
            dq.not_null("status"),
            dq.accepted_range("price", 0, 100),
            dq.accepted_values("status", ["O", "F"]),
        ],
    )
    assert got["not_null(status)"] == (1, 5)
    assert got["accepted_range(price, 0, 100)"] == (1, 5)
    # NULL status is a not_null concern, not an accepted_values one
    assert got["accepted_values(status, [O, F])"] == (1, 5)


def test_unique_counts_rows_beyond_first(table):
    got = _report(table, [dq.unique(["k"])])
    assert got["unique(k)"] == (1, 5)


def test_referential_ignores_null_fks(table, dim):
    got = _report(table, [dq.referential("fk", dim, "id")])
    # 999 is the only orphan; the NULL fk is not
    assert got["referential(fk -> id)"] == (1, 5)


def test_row_level_checks_fuse_into_one_aggregate(table):
    out = dq.dq_report(
        table,
        [
            dq.not_null("status"),
            dq.accepted_range("price", 0, 100),
            dq.accepted_values("status", ["O", "F"]),
        ],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over the table, not one per check
    assert plan.count("Aggregate") == 1


def test_clean_table_is_all_zero(spark, dim):
    clean = spark.createDataFrame([(1, "O", 5.0, 100)], "k long, status string, price double, fk long")
    got = _report(
        clean,
        [
            dq.not_null("status"),
            dq.accepted_range("price", 0, 100),
            dq.unique(["k"]),
            dq.referential("fk", dim, "id"),
        ],
    )
    assert all(v == 0 for v, _ in got.values())


def test_empty_table_and_no_checks(spark, dim):
    empty = spark.createDataFrame([], "k long, status string, price double, fk long")
    got = _report(
        empty,
        [dq.not_null("status"), dq.unique(["k"]), dq.referential("fk", dim, "id")],
    )
    assert all(v == (0, 0) for v in got.values())
    with pytest.raises(ValueError, match="at least one"):
        dq.dq_report(empty, [])


def test_k_anonymity_counts_rows_in_small_classes(spark):
    rows = [("a", 1)] * 3 + [("b", 1)] * 2 + [("c", 2)]
    df = spark.createDataFrame(rows, "qi string, x long")
    got = _report(df, [dq.k_anonymity(["qi"], k=3)])
    # class b (2 rows) and class c (1 row) are below k=3
    assert got["k_anonymity(qi, k=3)"] == (3, 6)
    with pytest.raises(ValueError, match="k >= 2"):
        dq.k_anonymity(["qi"], k=1)


def test_unknown_check_kind_rejected(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="unknown check kind"):
        dq.dq_report(df, [{"kind": "notnull", "col": "k"}])


def test_accepted_values_name_includes_value_set(spark):
    df = spark.createDataFrame([("A",), ("C",)], "status string")
    got = _report(
        df,
        [
            dq.accepted_values("status", ["A"]),
            dq.accepted_values("status", ["A", "B", "C", "D", "E", "F", "G"]),
        ],
    )
    assert got["accepted_values(status, [A])"] == (1, 2)
    assert got["accepted_values(status, [A, B, C, D, E, ...])"] == (0, 2)


def test_benford_digit_counts_and_chi2(spark):
    import math

    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.dq import benford_digit_test

    # 4x leading-1, 2x leading-2 (one negative), 1x leading-9; zeros
    # and NULLs drop out of n_total.
    vals = ["1.00", "12.50", "199.99", "0.10", "2.00", "-25.00",
            "9.99", "0.00", None]
    df = spark.createDataFrame(
        [(v,) for v in vals], "v string"
    ).select(F.col("v").cast("decimal(18,2)").alias("v"))
    rows = {r["digit"]: r for r in benford_digit_test(df, "v").collect()}
    assert sorted(rows) == list(range(1, 10))
    assert rows[1]["n_obs"] == 4 and rows[2]["n_obs"] == 2
    assert rows[9]["n_obs"] == 1
    assert all(rows[d]["n_obs"] == 0 for d in (3, 4, 5, 6, 7, 8))
    assert all(rows[d]["n_total"] == 7 for d in rows)
    assert rows[1]["obs_freq"] == round(4 / 7, 6)
    exp1 = round(math.log10(2.0), 6)
    assert rows[1]["exp_freq"] == exp1
    e = 7 * exp1
    assert rows[1]["chi2_part"] == round((4 - e) ** 2 / e, 6)
    # absent digit still contributes its full expectation to chi2
    e3 = 7 * round(math.log10(1 + 1 / 3), 6)
    assert rows[3]["chi2_part"] == round(e3, 6)
