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


# ceiling on how many bucket rows ONE outlier interval may explode to:
# keeps a pathological interval (10^6 x the typical length) from
# generating an unbounded F.sequence() while still letting the bucket
# width track the TYPICAL interval, not the outlier
_MAX_OUTLIER_SPLIT = 256


def _derived_bucket_seconds(
    intervals: DataFrame, start_ts: str, end_ts: str
) -> int:
    """Bucket width in whole seconds (>=1), derived from the interval-
    length distribution: ``max(p95 + 1, ceil(max / _MAX_OUTLIER_SPLIT))``.

    - p95 (not max, the r3 foot-gun): one giant outlier no longer
      widens every bucket — typical intervals stay at <=2 bucket rows
      and each (key, bucket) cell holds O(points-in-width) candidates.
    - ``+1``: ``unix_timestamp`` truncates to whole seconds, so a
      fractional-second tail could otherwise push an interval of
      exactly-p95 true length across 3 buckets (advisor r3); adding one
      second restores the <=2-bucket invariant for the p95 mass.
    - the ``max/_MAX_OUTLIER_SPLIT`` floor: outlier intervals explode
      to ``length/width`` bucket rows each, so the width never drops
      below the value that caps that at ~_MAX_OUTLIER_SPLIT rows.

    EAGER (documented on :func:`interval_join`): this runs one
    aggregate job over the interval side at CALL time, and re-runs it
    on every call — pass an explicit ``bucket`` to stay fully lazy.
    The interval side is the small side of the join by construction
    (session/campaign tables, orders of magnitude below the point
    stream), so the scan is cheap."""
    length = F.unix_timestamp(F.col(end_ts)) - F.unix_timestamp(F.col(start_ts))
    row = intervals.select(
        F.max(length).alias("mx"),
        F.percentile_approx(length, F.lit(0.95)).alias("p95"),
    ).first()
    if row is None or row["mx"] is None:
        return 1  # empty interval side: width is irrelevant
    mx, p95 = int(row["mx"]), int(row["p95"])
    return max(1, p95 + 1, -(-mx // _MAX_OUTLIER_SPLIT))


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

    ``bucket=None`` (default) derives the width from the data: the p95
    interval length, floored so no single interval explodes past
    ~``_MAX_OUTLIER_SPLIT`` bucket rows (see
    :func:`_derived_bucket_seconds`). Typical intervals cost <=2 bucket
    rows AND buckets stay near the typical length, so each
    (key, bucket) cell holds a bounded candidate set even when one
    1000x-median outlier interval exists — that outlier alone pays
    ``length/width`` (capped) bucket rows. Pass an explicit ``bucket``
    to override the heuristic or to avoid the derivation's eager
    aggregate: ``bucket=None`` runs ONE aggregate job over the interval
    side at call time (re-run on every call) — the only eager action in
    this module."""
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
