"""SCD type-2 apply: version chaining, duplicate collapse, late-update
drop, closed-history pass-through."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from reddit_etl_spark.operators.scd import scd2_apply

T0 = dt.datetime(2025, 1, 1)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2025, 1, day)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows,
        "k long, seg string, valid_from timestamp, valid_to timestamp, "
        "is_current boolean",
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, effective_ts timestamp")


def test_scd2_chains_versions_in_ts_order(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(1, "C", _ts(5)), (1, "B", _ts(3))])
    out = {
        (r.k, r.seg): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_apply(cur, upd, ["k"], ["seg"]).collect()
    }
    assert out == {
        (1, "A"): (T0, _ts(3), False),
        (1, "B"): (_ts(3), _ts(5), False),
        (1, "C"): (_ts(5), None, True),
    }


def test_scd2_no_change_update_creates_no_version(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(1, "A", _ts(3)), (1, "B", _ts(5)), (1, "B", _ts(7))])
    rows = scd2_apply(cur, upd, ["k"], ["seg"]).collect()
    assert len(rows) == 2  # A stays open until B; duplicate B collapsed
    by_seg = {r.seg: r for r in rows}
    assert by_seg["A"].valid_to == _ts(5) and not by_seg["A"].is_current
    assert by_seg["B"].valid_from == _ts(5) and by_seg["B"].is_current


def test_scd2_flip_back_keeps_both_versions(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(1, "B", _ts(2)), (1, "A", _ts(4))])
    rows = scd2_apply(cur, upd, ["k"], ["seg"]).collect()
    assert len(rows) == 3  # A -> B -> A is three versions, not collapsed


def test_scd2_new_key_and_untouched_key(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(2, "X", _ts(3))])
    rows = {r.k: r for r in scd2_apply(cur, upd, ["k"], ["seg"]).collect()}
    assert rows[1].seg == "A" and rows[1].is_current and rows[1].valid_to is None
    assert rows[2].seg == "X" and rows[2].is_current
    assert rows[2].valid_from == _ts(3)


def test_scd2_late_update_dropped_and_history_passthrough(spark):
    cur = _dim(
        spark,
        [
            (1, "OLD", dt.datetime(2024, 1, 1), T0, False),  # closed history
            (1, "A", T0, None, True),
        ],
    )
    upd = _upd(spark, [(1, "Z", dt.datetime(2024, 6, 1))])  # before open row
    rows = scd2_apply(cur, upd, ["k"], ["seg"]).collect()
    assert {(r.seg, r.is_current) for r in rows} == {("OLD", False), ("A", True)}


def test_scd2_same_instant_ties_resolve_to_min_struct(spark):
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(1, "Q", _ts(3)), (1, "B", _ts(3))])
    rows = {r.seg for r in scd2_apply(cur, upd, ["k"], ["seg"]).collect()}
    assert rows == {"A", "B"}  # min('B','Q') wins the (k, ts) tie


def test_scd2_null_attr_is_stable(spark):
    cur = _dim(spark, [(1, None, T0, None, True)])
    upd = _upd(spark, [(1, None, _ts(3)), (1, "B", _ts(5))])
    rows = scd2_apply(cur, upd, ["k"], ["seg"]).collect()
    # NULL -> NULL collapses (no new version); NULL -> B is a change
    assert len(rows) == 2
    segs = {r.seg for r in rows}
    assert segs == {None, "B"}


def test_scd2_idempotent_reapply(spark):
    """Re-applying the same batch to the produced snapshot is a no-op —
    the property that makes retries safe."""
    cur = _dim(spark, [(1, "A", T0, None, True)])
    upd = _upd(spark, [(1, "B", _ts(3))])
    once = scd2_apply(cur, upd, ["k"], ["seg"])
    twice = scd2_apply(once, upd, ["k"], ["seg"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_point_in_time_join_sees_version_at_event_time(spark):
    import datetime as dt

    from reddit_etl_spark.operators.scd import point_in_time_join

    d = dt.datetime
    dim = spark.createDataFrame(
        [
            (1, "bronze", d(2024, 1, 1), d(2024, 3, 1), False),
            (1, "gold", d(2024, 3, 1), None, True),
            (2, "silver", d(2024, 2, 1), None, True),
        ],
        "cust long, tier string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (1, d(2024, 2, 15), 100.0),  # bronze era
            (1, d(2024, 3, 1), 200.0),   # boundary: new version inclusive
            (2, d(2024, 1, 15), 50.0),   # before any version -> NULL
            (2, d(2024, 6, 1), 75.0),    # open current version
            (3, d(2024, 6, 1), 1.0),     # unknown key -> NULL
        ],
        "cust long, ts timestamp, amount double",
    )
    got = {
        (r["cust"], r["ts"]): r["tier"]
        for r in point_in_time_join(
            facts, dim, ["cust"], "ts", value_cols=["tier"]
        ).collect()
    }
    assert got[(1, d(2024, 2, 15))] == "bronze"
    assert got[(1, d(2024, 3, 1))] == "gold"
    assert got[(2, d(2024, 1, 15))] is None
    assert got[(2, d(2024, 6, 1))] == "silver"
    assert got[(3, d(2024, 6, 1))] is None


def test_apply_cdc_semantics_and_idempotence(spark):
    from reddit_etl_spark.operators.scd import apply_cdc

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            # key 1: update then delete (delete has higher seq -> wins)
            (1, "a", 11.0, "U", 5),
            (1, "a", 12.0, "D", 9),
            # key 2: two updates, highest seq wins
            (2, "b", 21.0, "U", 3),
            (2, "b", 22.0, "U", 7),
            # key 4: insert of a new key
            (4, "d", 40.0, "I", 1),
        ],
        "k long, name string, bal double, op string, seq long",
    )
    out = apply_cdc(base, changes, ["k"], "seq")
    got = {r["k"]: (r["name"], r["bal"]) for r in out.collect()}
    assert got == {2: ("b", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # idempotent replay: applying the same batch to the result is a
    # no-op (the state already reflects every change)
    again = apply_cdc(out, changes, ["k"], "seq")
    assert {r["k"]: (r["name"], r["bal"]) for r in again.collect()} == got


def test_apply_cdc_rejects_null_or_unknown_op(spark):
    import pytest as _pytest

    from reddit_etl_spark.operators.scd import apply_cdc

    base = spark.createDataFrame([(1, 10.0)], "k long, bal double")
    bad = spark.createDataFrame(
        [(1, 11.0, None, 5)], "k long, bal double, op string, seq long"
    )
    with _pytest.raises(Exception, match="apply_cdc"):
        apply_cdc(base, bad, ["k"], "seq").collect()
    worse = spark.createDataFrame(
        [(1, 11.0, "X", 5)], "k long, bal double, op string, seq long"
    )
    with _pytest.raises(Exception, match="apply_cdc"):
        apply_cdc(base, worse, ["k"], "seq").collect()


def test_snapshot_diff_classifies_and_skips_identical(spark):
    from reddit_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),       # identical -> no row
            (2, "b", 25.0),       # changed -> U
            (3, "c", None),       # identical incl. NULL -> no row
            (5, "e", 50.0),       # new -> I
        ],                        # 4 missing -> D
        "k long, name string, bal double",
    )
    got = {r["k"]: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == {2, 4, 5}
    assert got[2]["op"] == "U" and got[2]["bal"] == 25.0
    assert got[4]["op"] == "D" and got[4]["bal"] == 40.0
    assert got[5]["op"] == "I" and got[5]["name"] == "e"


def test_snapshot_diff_null_transitions_are_changes(spark):
    from reddit_etl_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "x"), (2, None)], "k long, v string"
    )
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "U", 2: "U"}


def test_snapshot_diff_apply_cdc_roundtrip(spark):
    from pyspark.sql import functions as F

    from reddit_etl_spark.operators.scd import apply_cdc, snapshot_diff

    old = spark.createDataFrame(
        [(i, f"n{i}", float(i * 10)) for i in range(1, 30)],
        "k long, name string, bal double",
    )
    new = (
        old.filter(F.col("k") % 5 != 0)
        .withColumn(
            "bal",
            F.when(F.col("k") % 3 == 0, F.col("bal") + 1).otherwise(
                F.col("bal")
            ),
        )
        .unionByName(
            spark.createDataFrame(
                [(100, "new", 1.0)], "k long, name string, bal double"
            )
        )
    )
    diff = snapshot_diff(old, new, ["k"]).withColumn("seq", F.lit(1))
    rebuilt = apply_cdc(old, diff, ["k"], "seq")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
    # diff of identical snapshots is empty
    assert snapshot_diff(new, new, ["k"]).count() == 0


def test_snapshot_diff_rejects_schema_mismatch(spark):
    import pytest as _pytest

    from reddit_etl_spark.operators.scd import snapshot_diff

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, 2.0)], "k long, w double")
    with _pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(a, b, ["k"])
