"""As-of join — match each left row to the most recent right row at
or before its timestamp, per key. Spark has no native ASOF JOIN; the
naive `left.ts >= right.ts` theta-join explodes quadratically and
then needs an argmax. This implementation is the linear union trick:

1. tag both sides and UNION them (no join!),
2. one window per key ordered by (ts, right-before-left on ties):
   ``last(right_value, ignorenulls=True)`` carries the latest right
   row forward onto every subsequent left row,
3. keep the left rows.

Cost: ONE shuffle on the key (the window partition) over |L|+|R|
rows — the same shape as a sort-merge join, with no candidate
blowup. Skew on hot keys is AQE-invisible (windows don't split), so
pathological keys should be range-bucketed first; for time-bounded
matching use ``tolerance`` to refuse stale matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` (``direction='backward'``, the default) or
    the EARLIEST right row with ``right.ts >= left.ts``
    (``direction='forward'`` — next-event attribution). NULLs when no
    match (LEFT OUTER as-of), identical single-window plan either way
    (only the sort direction flips).

    ``value_cols`` selects which right columns to carry (default: all
    non-key, non-ts). ``tolerance`` (e.g. ``"15 minutes"``) NULLs out
    matches farther than ``tolerance`` from ``left_ts`` in the match
    direction, matching the pandas ``merge_asof(tolerance=...)``
    contract.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = list(on)
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (*keys, right_ts)
        ]
    out_cols = {c: f"{c}{suffix}" if c in left.columns else c for c in value_cols}

    lhs = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    for c in value_cols:
        lhs = lhs.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.select(
        *left.columns, "__is_left", "__ts", *[f"__v_{c}" for c in value_cols]
    ).unionByName(
        rhs.select(
            *left.columns, "__is_left", "__ts", *[f"__v_{c}" for c in value_cols]
        )
    )

    # right rows sort BEFORE left rows at equal ts, so ties match
    # (inclusive bound, the ASOF convention). forward flips the ts
    # sort: the running carry then holds the SMALLEST right ts that is
    # still >= the left ts.
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct holding the whole right row, not per-column
    # last() calls: independently-carried columns would mix values
    # from different right rows whenever the latest right row has a
    # NULL in one column (the emitted combination never existed).
    right_struct = F.struct(
        F.col("__ts").alias("__mts"),
        *[F.col(f"__v_{c}").alias(c) for c in value_cols],
    )
    carried = unioned.withColumn(
        "__m",
        F.last(
            F.when(F.col("__is_left") == 0, right_struct), ignorenulls=True
        ).over(w),
    )

    result = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("__m.__mts") >= F.col("__ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            fresh = F.col("__m.__mts") <= F.col("__ts") + F.expr(
                f"INTERVAL {tolerance}"
            )
        result = result.withColumn("__m", F.when(fresh, F.col("__m")))
    return result.select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(out_cols[c]) for c in value_cols],
    )
