"""Round-11 scale-guard and advisor-fix tests.

Covers (judge r10 #1/#2, advisor r10):
- scale_lanes.guard_distinct_frame — the shared fail-fast for the
  exact distinct-value prefix-window lane (mann_whitney / lorenz /
  AD2 / dunn / yuen / hill / winsorized), wired through
  EXACT_RANK_MAX_ROWS;
- theil_sen's default-ON pair guard (asserted in test_round10_ops);
- friedman_test's duplicated-cell raise;
- srm_check's broadcastable two-join mismatch surface;
- imr_control_chart's n_breaches = 0 on single-point groups;
- theil_index / effective_sample_size NULL-vs-non-positive
  n_dropped separation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators import scale_lanes
from reddit_etl_spark.operators.scale_lanes import guard_distinct_frame


# ------------------------------------------------ guard_distinct_frame


def test_guard_passthrough_identity(spark):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(5)], "v long, t long"
    )
    out = guard_distinct_frame(df, "op_x")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, df.collect())
    )
    assert out.columns == df.columns  # guard column dropped


def test_guard_raises_over_limit(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "v long")
    out = guard_distinct_frame(df, "op_x", limit=2)
    with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
        out.collect()


def test_guard_partitioned_largest_group(spark):
    # group a: 3 rows, group b: 1 row -> largest group 3
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    ok = guard_distinct_frame(df, "op_x", partition_cols=("g",), limit=3)
    assert ok.count() == 4
    bad = guard_distinct_frame(df, "op_x", partition_cols=("g",), limit=2)
    with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
        bad.collect()


def test_guard_empty_frame_passes(spark):
    empty = spark.createDataFrame([], "v long")
    assert guard_distinct_frame(empty, "op_x", limit=1).count() == 0


def test_distinct_window_sites_fail_fast(spark, monkeypatch):
    """End-to-end: with the shared constant shrunk, every wired site
    refuses its single-task distinct-frame sort loudly; at the real
    constant the same inputs pass (their oracle rows stay green)."""
    from reddit_etl_spark.operators.relational import (
        anderson_darling_two_sample,
        ansari_bradley,
        cliffs_delta,
        dunn_test,
        hill_tail_index,
        jonckheere_terpstra,
        ks_exponential_fit,
        lorenz_deciles,
        mann_whitney_u,
        moods_median,
        wasserstein_distance,
        wilcoxon_signed_rank,
        winsorized_stats,
        yuen_trimmed_test,
    )

    monkeypatch.setattr(scale_lanes, "EXACT_RANK_MAX_ROWS", 3)
    vals = spark.createDataFrame(
        [(float(i), "a" if i % 2 else "b") for i in range(40)],
        "v double, c string",
    )
    pairs = spark.createDataFrame(
        [(float(i), float(i) * 1.5 + 1) for i in range(40)],
        "x double, y double",
    )
    for build in (
        lambda: mann_whitney_u(vals, "v", "c", "a", "b"),
        lambda: lorenz_deciles(vals, "v"),
        lambda: anderson_darling_two_sample(vals, "v", "c", "a"),
        lambda: dunn_test(vals, "v", "c"),
        lambda: yuen_trimmed_test(vals, "v", "c", "a", "b"),
        lambda: hill_tail_index(vals, ["c"], "v"),
        lambda: winsorized_stats(vals, ["c"], "v"),
        # round-11 wave sites ride the same shared guard
        lambda: wilcoxon_signed_rank(pairs, "x", "y"),
        lambda: moods_median(vals, "v", "c"),
        lambda: wasserstein_distance(vals, "v", "c", "a"),
        lambda: ansari_bradley(vals, "v", "c", "a"),
        lambda: cliffs_delta(vals, "v", "c", "a"),
        lambda: jonckheere_terpstra(vals, "v", "c", ["a", "b"]),
        lambda: ks_exponential_fit(vals.filter("v > 0"), [], "v"),
    ):
        with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
            build().collect()
    monkeypatch.setattr(scale_lanes, "EXACT_RANK_MAX_ROWS", 50_000_000)
    r = mann_whitney_u(vals, "v", "c", "a", "b").collect()[0]
    assert r["n_a"] == 20 and r["n_b"] == 20


# --------------------------------------------------- advisor r10 fixes


def test_friedman_duplicate_cell_raises(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    # block 1 holds treatment 'x' twice and misses 'y' — the input
    # contract violation a bare row-count==k completeness check would
    # silently pass (advisor r10)
    rows = [
        (1, "x", 1.0),
        (1, "x", 2.0),
        (2, "x", 1.0),
        (2, "y", 2.0),
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    with pytest.raises(Exception, match="duplicated"):
        friedman_test(df, "b", "t", "v").collect()


def test_friedman_complete_blocks_still_pass(spark):
    from reddit_etl_spark.operators.relational import friedman_test

    rows = [
        (b, t, float(b * 10 + ord(t)))
        for b in range(1, 5)
        for t in ("x", "y", "z")
    ]
    df = spark.createDataFrame(rows, "b long, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r["n_blocks"] == 4 and r["k_treatments"] == 3


def test_srm_no_broadcast_on_outer_join(spark):
    """The mismatch surface is two BROADCASTABLE joins (left +
    left-anti), not a full outer whose broadcast hint Spark silently
    drops (advisor r10): the physical plan must carry broadcast
    exchanges and no SortMergeJoin FullOuter."""
    from reddit_etl_spark.operators.relational import srm_check

    df = spark.createDataFrame([("0",)] * 6 + [("1",)] * 4, "arm string")
    out = srm_check(df, "arm", {"0": 0.5, "1": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = {r["arm"]: r for r in out.collect()}
    assert got["0"]["n_observed"] == 6 and got["1"]["n_observed"] == 4
    # both mismatch directions still raise
    with pytest.raises(Exception, match="arm mismatch"):
        srm_check(df, "arm", {"0": 0.5, "1": 0.25, "2": 0.25}).collect()
    with pytest.raises(Exception, match="arm mismatch"):
        srm_check(df, "arm", {"0": 1.0}).collect()


def test_imr_single_point_group_zero_breaches(spark):
    from reddit_etl_spark.operators.series import imr_control_chart

    rows = [("solo", 1, 5.0), ("pair", 1, 1.0), ("pair", 2, 2.0)]
    df = spark.createDataFrame(rows, "g string, o long, v double")
    got = {r["g"]: r for r in imr_control_chart(df, ["g"], "o", "v").collect()}
    solo = got["solo"]
    assert solo["n_breaches"] == 0  # 0, not NULL (advisor r10)
    assert solo["mr_mean"] is None and solo["lcl"] is None
    assert got["pair"]["n_breaches"] == 0 and got["pair"]["mr_mean"] == 1.0


def test_theil_index_null_not_in_n_dropped(spark):
    from reddit_etl_spark.operators.relational import theil_index

    rows = [("g", 1.0), ("g", 2.0), ("g", -1.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = theil_index(df, ["g"], "v").collect()[0]
    # NULL filtered out before counting: n_dropped reports ONLY the
    # excluded non-positive value (advisor r10)
    assert r["n"] == 2 and r["n_dropped"] == 1


def test_ess_null_not_in_n_dropped(spark):
    from reddit_etl_spark.operators.curation import effective_sample_size

    rows = [("g", 1.0), ("g", 1.0), ("g", 0.0), ("g", None)]
    df = spark.createDataFrame(rows, "g string, w double")
    r = effective_sample_size(df, ["g"], "w").collect()[0]
    assert r["n"] == 2 and r["n_dropped"] == 1
    assert r["ess"] == 2.0
