"""Data-quality expectations (operators/dq.py): per-kind violation
semantics, single-scan fusion of row-level checks, and empty inputs."""

from __future__ import annotations

import math

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


def test_categorical_entropy_known_distributions(spark):
    # g1 uses a:2, b:2 (entropy exactly 1 bit); g2 uses a:4 (entropy
    # 0). Global: a:6, b:2 -> q = (0.75, 0.25).
    rows = [("g1", "a")] * 2 + [("g1", "b")] * 2 + [("g2", "a")] * 4
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r["g"]: r for r in dq.categorical_entropy(df, ["g"], "c").collect()}
    assert got["g1"]["n"] == 4 and got["g1"]["n_cats"] == 2
    assert got["g1"]["entropy_bits"] == 1.0
    kl1 = 0.5 * math.log2(0.5 / 0.75) + 0.5 * math.log2(0.5 / 0.25)
    assert got["g1"]["kl_vs_global_bits"] == round(kl1, 6)
    assert got["g2"]["entropy_bits"] == 0.0
    assert got["g2"]["kl_vs_global_bits"] == round(math.log2(1 / 0.75), 6)


def test_categorical_entropy_excludes_null_categories(spark):
    rows = [("g", "a"), ("g", None), ("g", "a")]
    df = spark.createDataFrame(rows, "g string, c string")
    got = dq.categorical_entropy(df, ["g"], "c").collect()
    assert len(got) == 1 and got[0]["n"] == 2 and got[0]["entropy_bits"] == 0.0


def test_fd_violations_held_violated_and_null_rhs(spark):
    rows = [
        ("k1", "x"), ("k1", "x"),          # holds
        ("k2", "x"), ("k2", "y"),          # violated: 2 values
        ("k3", None), ("k3", "z"),         # NULL rhs IS a distinct value
        ("k4", None), ("k4", None),        # single NULL value: holds
        (None, "q"),                       # NULL lhs excluded
    ]
    df = spark.createDataFrame(rows, "k string, v string")
    r = dq.fd_violations(df, ["k"], "v", "k->v").collect()[0]
    assert r["fd"] == "k->v"
    assert r["lhs_keys"] == 4
    assert r["violating_keys"] == 2          # k2 and k3
    assert r["violation_rate"] == 0.5
    assert r["max_rhs_values"] == 2
    assert r["holds"] is False


def test_fd_violations_holding_dependency_and_default_name(spark):
    rows = [(1, "a"), (1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "k long, v string")
    r = dq.fd_violations(df, ["k"], "v").collect()[0]
    assert r["fd"] == "k->v"
    assert r["holds"] is True and r["violating_keys"] == 0


def test_table_fingerprint_order_and_partitioning_invariant(spark):
    rows = [("g", i, f"v{i}") for i in range(50)]
    a = spark.createDataFrame(rows, "g string, k long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "g string, k long, v string").repartition(7)
    fa = dq.table_fingerprint(a, ["g"], ["k", "v"]).collect()[0]
    fb = dq.table_fingerprint(b, ["g"], ["k", "v"]).collect()[0]
    assert fa["fingerprint"] == fb["fingerprint"] and fa["n_rows"] == 50
    assert 0 <= fa["fingerprint"] < (1 << 60)
    # mergeable under modular addition: fp(A ∪ B) = (fp(A) + fp(B)) mod 2^60
    half1, half2 = rows[:25], rows[25:]
    f1 = dq.table_fingerprint(
        spark.createDataFrame(half1, "g string, k long, v string"), ["g"], ["k", "v"]
    ).collect()[0]["fingerprint"]
    f2 = dq.table_fingerprint(
        spark.createDataFrame(half2, "g string, k long, v string"), ["g"], ["k", "v"]
    ).collect()[0]["fingerprint"]
    assert (f1 + f2) % (1 << 60) == fa["fingerprint"]


def test_table_fingerprint_detects_single_cell_change_and_null_tag(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    b = spark.createDataFrame([(1, "x"), (2, "z")], "k long, v string")
    fa = dq.table_fingerprint(a, [], ["k", "v"]).collect()[0]["fingerprint"]
    fb = dq.table_fingerprint(b, [], ["k", "v"]).collect()[0]["fingerprint"]
    assert fa != fb
    # a NULL cannot be impersonated by any string
    c = spark.createDataFrame([(1, None)], "k long, v string")
    for spoof in ("", "\x00N", "N", "None", "null"):
        d = spark.createDataFrame([(1, spoof)], "k long, v string")
        fc = dq.table_fingerprint(c, [], ["k", "v"]).collect()[0]["fingerprint"]
        fd = dq.table_fingerprint(d, [], ["k", "v"]).collect()[0]["fingerprint"]
        assert fc != fd, spoof
