"""Range (interval) join — match points into [start, end] intervals.

Spark plans ``l.ts BETWEEN r.start AND r.end`` as a broadcast
nested-loop (small side) or a cartesian product — both die at scale.
The scalable decomposition is BUCKETING: chop time into fixed-width
buckets, explode each interval to the buckets it spans, map each
point to its single bucket, hash-join on (keys, bucket), then apply
the exact BETWEEN as a post-filter. A point falls in exactly one
bucket and an interval covers each of its buckets once, so no
dedup is needed. Cost: |points| + sum(interval_span/bucket) rows
through one equi-join — pick ``bucket`` near the typical interval
length so the explode factor stays O(1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _derived_bucket_seconds(
    intervals: DataFrame, start_ts: str, end_ts: str
) -> int:
    """Max interval length in whole seconds (>=1): the width that
    bounds the per-interval explode factor at 2 bucket rows. One
    driver-side aggregate over the interval side — which is the small
    side of the join by construction; intervals at 100 TB scale are
    session/campaign tables, orders of magnitude below the point
    stream being joined into them."""
    row = intervals.select(
        F.max(
            F.unix_timestamp(F.col(end_ts)) - F.unix_timestamp(F.col(start_ts))
        ).alias("w")
    ).first()
    if row is None or row["w"] is None:
        return 1  # empty interval side: width is irrelevant
    return max(1, int(row["w"]))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same keys) with
    ``start <= point <= end``. ``how='left'`` keeps unmatched points
    with NULL interval columns.

    ``bucket=None`` (default) derives the width from the data: the MAX
    interval length (one cheap aggregate over the small side), so EVERY
    interval — including a pathological 1000x-median one — explodes to
    at most 2 bucket rows: O(1) blowup per interval by construction.
    The trade is bucket selectivity: with one giant outlier interval,
    buckets get wide and each (key, bucket) cell holds more candidate
    pairs for the exact post-filter. When the length distribution is
    that skewed AND candidate volume matters more than explode factor,
    pass an explicit ``bucket`` near the typical interval length — rare
    long intervals then cost span/bucket rows each, which is fine while
    they are rare."""
    import pandas as pd  # noqa: PLC0415

    keys = list(on)
    if bucket is None:
        width_s = _derived_bucket_seconds(intervals, start_ts, end_ts)
    else:
        width_s = int(pd.Timedelta(bucket).total_seconds())
    if width_s <= 0:
        raise ValueError(f"bucket must be a positive duration, got {bucket!r}")
    # synthetic row id: the left-outer anti-join must identify matched
    # point ROWS, and equality over the natural columns both misfires
    # on NULLs (NULL = NULL is not true) and conflates duplicate rows.
    points = points.withColumn("__pid", F.monotonically_increasing_id())
    if how == "left":
        # the left path evaluates the points subtree TWICE (matched side
        # and anti-join side); monotonically_increasing_id is only
        # consistent across those evaluations if the ids are pinned
        # first — an upstream shuffle or AQE re-plan can otherwise
        # reorder rows between evaluations and drop/duplicate unmatched
        # points. localCheckpoint materializes the id assignment once;
        # the inner path never re-reads the ids and skips the cost.
        points = points.localCheckpoint(eager=True)
    p = points.withColumn(
        "__bk", F.floor(F.unix_timestamp(F.col(point_ts)) / width_s)
    )
    i = intervals.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / width_s),
                F.floor(F.unix_timestamp(F.col(end_ts)) / width_s),
            )
        ),
    )
    cond = [p[k] == i[k] for k in keys] + [p["__bk"] == i["__bk"]]
    joined = p.join(i, cond, "inner").where(
        (p[point_ts] >= i[start_ts]) & (p[point_ts] <= i[end_ts])
    )
    picked = joined.select(
        *[p[c] for c in points.columns],
        *[i[c] for c in intervals.columns if c not in (*keys, "__bk")],
    )
    if how == "inner":
        return picked.drop("__pid")
    if how == "left":
        matched = picked
        missing = points.join(
            picked.select("__pid").distinct(), "__pid", "left_anti"
        )
        for c in intervals.columns:
            if c not in (*keys, "__bk") and c not in points.columns:
                missing = missing.withColumn(
                    c, F.lit(None).cast(intervals.schema[c].dataType)
                )
        return matched.unionByName(missing).drop("__pid")
    raise ValueError("how must be 'inner' or 'left'")
