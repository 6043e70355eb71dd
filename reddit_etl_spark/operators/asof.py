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
blowup. Skew on hot keys is AQE-invisible (windows don't split);
``split='auto'`` closes that gap by time-range-bucketing every key's
window partition (details on :func:`asof_join`). For time-bounded
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
    split: str = "none",
    split_buckets: int = 64,
    tie_cols: Sequence[str] | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` (``direction='backward'``, the default),
    the EARLIEST right row with ``right.ts >= left.ts``
    (``direction='forward'`` — next-event attribution), or the CLOSEST
    right row on either side (``direction='nearest'`` — sensor
    alignment; exact-distance ties go backward, the pandas
    merge_asof convention). NULLs when no match (LEFT OUTER as-of);
    backward/forward are one window over one shuffle, nearest runs
    both carries over the SAME partitioning (two sorts, still one
    shuffle).

    ``value_cols`` selects which right columns to carry (default: all
    non-key, non-ts). ``tie_cols`` (a subset of ``value_cols``, must
    be orderable) appends a deterministic tie-break to the carry
    order: when two right rows share a key and timestamp, the row
    with the GREATEST tie tuple wins on every engine, partitioning,
    and split mode (tie columns lead the carried struct, so the
    split path's bucket carry-in agrees with its in-bucket window);
    without it the winner is arbitrary. Right rows with NULL timestamps
    never match; left rows with NULL timestamps get NULL matches. ``tolerance`` (e.g. ``"15 minutes"``) NULLs out
    matches farther than ``tolerance`` from ``left_ts`` in the match
    direction, matching the pandas ``merge_asof(tolerance=...)``
    contract.

    ``split='auto'`` is the hot-key-skew escape hatch: windows don't
    AQE-split, so with ``split='none'`` one pathological key (a bot
    user, a default tenant) serializes its whole |L|+|R| slice into a
    single task. ``'auto'`` range-buckets every key's timeline into
    ``split_buckets`` equal time slices and runs the carry window per
    (key, bucket) — a hot key becomes up to ``split_buckets`` parallel
    tasks. Matches that cross a bucket boundary are preserved by
    injecting one synthetic carry-in row per (key, bucket): the latest
    (earliest, for forward) right row from all preceding (following)
    buckets, computed by a map-side-combined per-bucket aggregate plus
    a per-key window over the tiny bucket-summary frame (≤
    ``split_buckets`` rows per key). Results are identical to
    ``split='none'`` up to ties between right rows sharing an exact
    timestamp (both paths then pick an arbitrary winner).

    NOTE: ``split='auto'`` runs ONE eager min/max aggregate over both
    sides' timestamps at call time (a column-pruned scan) to derive the
    bucket width — the only eager action in this module.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    if direction == "nearest" and split != "none":
        # nearest needs both carries over one timeline; the bucketed
        # split would need carry-ins from BOTH sides of every boundary
        # — not implemented. Hot keys: pre-filter or use the two
        # single-direction split joins and combine.
        raise ValueError("direction='nearest' supports split='none' only")
    if split not in ("none", "auto"):
        raise ValueError(f"split must be none/auto, got {split!r}")
    if split_buckets < 2:
        raise ValueError(f"split_buckets must be >= 2, got {split_buckets}")
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
    # a right row with a NULL timestamp can never be a valid match,
    # but left in the union it SORTS (NULLS FIRST under ASC) ahead of
    # every real row and gets carried as a bogus match — drop them
    rhs = right.filter(F.col(right_ts).isNotNull()).select(
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
    backward = direction == "backward"
    ts_order = F.col("__ts") if backward else F.col("__ts").desc()
    # Carry ONE struct holding the whole right row, not per-column
    # last() calls: independently-carried columns would mix values
    # from different right rows whenever the latest right row has a
    # NULL in one column (the emitted combination never existed).
    # tie_cols lead the struct's value fields so the split path's
    # struct-max carry-in agrees with the windows' tie ordering
    _tc = [c for c in (tie_cols or []) if c in value_cols]
    _ordered_vals = [*_tc, *[c for c in value_cols if c not in _tc]]
    right_struct = F.struct(
        F.col("__ts").alias("__mts"),
        *[F.col(f"__v_{c}").alias(c) for c in _ordered_vals],
    )

    if direction == "nearest":
        # BOTH carries over the SAME key partitioning: two window
        # sorts, one shuffle (the second window reuses the exchange).
        # Per left row the nearer match wins; exact-distance ties go
        # backward (the pandas merge_asof convention).
        ties = [F.col(f"__v_{c}") for c in (tie_cols or [])]
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts"), F.col("__is_left"), *ties)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__is_left"), *ties)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        rmatch = F.when(F.col("__is_left") == 0, right_struct)
        carried = unioned.withColumn(
            "__mb", F.last(rmatch, ignorenulls=True).over(wb)
        ).withColumn("__mf", F.last(rmatch, ignorenulls=True).over(wf))
        # a left row with no timestamp has no defined distance: no match
        db = F.unix_micros(F.col("__ts")) - F.unix_micros(
            F.col("__mb.__mts")
        )
        df_ = F.unix_micros(F.col("__mf.__mts")) - F.unix_micros(
            F.col("__ts")
        )
        carried = carried.withColumn(
            "__m",
            F.when(F.col("__ts").isNull(), F.lit(None))
            .when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(df_ < db, F.col("__mf"))
            .otherwise(F.col("__mb")),
        ).drop("__mb", "__mf")
    elif split == "none":
        ties = [F.col(f"__v_{c}") for c in (tie_cols or [])]
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts_order, F.col("__is_left"), *ties)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "__m",
            F.last(
                F.when(F.col("__is_left") == 0, right_struct), ignorenulls=True
            ).over(w),
        )
    else:
        carried = _split_carry(
            unioned, keys, value_cols, right_struct, ts_order, backward,
            split_buckets,
            ties=[F.col(f"__v_{c}") for c in (tie_cols or [])],
        )
        if carried is None:  # degenerate time range: bucketing can't split
            return asof_join(
                left, right, on, left_ts, right_ts,
                value_cols=value_cols, tolerance=tolerance, suffix=suffix,
                direction=direction, split="none", tie_cols=tie_cols,
            )

    result = carried.filter(F.col("__is_left") == 1).withColumn(
        # a left row with no timestamp has no defined as-of position
        # (under DESC sorts its NULL lands where a real carry exists)
        "__m",
        F.when(F.col("__ts").isNotNull(), F.col("__m")),
    )
    if tolerance is not None:
        # all bounds in timestamp arithmetic on the actual rows —
        # never via an epoch-anchored literal, whose parse is
        # session-timezone dependent
        tol = F.expr(f"INTERVAL {tolerance}")
        if direction == "nearest":
            fresh = (F.col("__m.__mts") >= F.col("__ts") - tol) & (
                F.col("__m.__mts") <= F.col("__ts") + tol
            )
        elif direction == "backward":
            fresh = F.col("__m.__mts") >= F.col("__ts") - tol
        else:
            fresh = F.col("__m.__mts") <= F.col("__ts") + tol
        result = result.withColumn("__m", F.when(fresh, F.col("__m")))
    return result.select(
        *left.columns,
        *[F.col(f"__m.{c}").alias(out_cols[c]) for c in value_cols],
    )


def _split_carry(
    unioned: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    right_struct,
    ts_order,
    backward: bool,
    split_buckets: int,
    ties: list | None = None,
):
    """Skew-split carry: window per (key, time-bucket) with synthetic
    carry-in rows so cross-bucket matches survive. Returns the carried
    frame (same contract as the plain-window path: ``__m`` holds the
    match struct on every row), or None when the time range is
    degenerate (empty input / single instant) and bucketing cannot
    split anything.

    Plan shape (the 100 TB story): one map-side-combined aggregate of
    |L|+|R| rows down to ≤ keys×buckets summary structs, a window over
    that tiny frame (≤ ``split_buckets`` rows per key), a cheap union
    of the synthetic rows, and ONE full-width shuffle for the
    (key, bucket) window — same big-data shuffle count as the plain
    path, but a hot key now spans up to ``split_buckets`` tasks
    instead of one.
    """
    # EAGER (documented in asof_join): bucket width needs the global
    # time range. Column-pruned: only __ts survives to the aggregate.
    lo, hi = unioned.agg(
        F.min(F.col("__ts").cast("double")),
        F.max(F.col("__ts").cast("double")),
    ).first()
    if lo is None or hi is None or hi <= lo:
        return None
    width = (hi - lo) / split_buckets
    bucket = F.least(
        F.lit(split_buckets - 1),
        F.floor((F.col("__ts").cast("double") - F.lit(lo)) / F.lit(width)),
    ).cast("int")
    # NULL struct of the right type for real rows' carry-in slot
    null_match = F.when(F.lit(False), right_struct)
    tagged = unioned.withColumn("__b", bucket).withColumn("__sm", null_match)

    # Per-(key, bucket) summary: the right row a later (earlier, for
    # forward) bucket would carry in. max/min over structs compares by
    # leading field __mts, so this is argmax/argmin by match ts with a
    # deterministic value tie-break — the same tie class the plain
    # window leaves arbitrary.
    agg_fn = F.max if backward else F.min
    summaries = (
        tagged.withColumn("__r", F.when(F.col("__is_left") == 0, right_struct))
        .groupBy(*keys, "__b")
        .agg(agg_fn("__r").alias("__r"))
    )
    # Running carry across buckets per key: strictly-previous buckets
    # only (rowsBetween ..., -1). The frame is ≤ split_buckets rows per
    # key, so this window's single-task-per-key cost is trivial.
    bucket_order = F.col("__b") if backward else F.col("__b").desc()
    w_sum = (
        Window.partitionBy(*keys)
        .orderBy(bucket_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        summaries.withColumn("__sm", F.last("__r", ignorenulls=True).over(w_sum))
        .filter(F.col("__sm").isNotNull())
    )

    # Synthetic rows sort FIRST inside their bucket by construction:
    # their __ts is the true match ts, which lies strictly outside the
    # bucket's time slice on the preceding (following) side, and the
    # tolerance check reads __m.__mts so the true distance is kept.
    syn = carry_in.select(
        *keys,
        "__b",
        F.col("__sm.__mts").alias("__ts"),
        F.lit(-1).alias("__is_left"),
        "__sm",
    )
    for c in tagged.columns:
        if c not in syn.columns:
            syn = syn.withColumn(c, F.lit(None).cast(tagged.schema[c].dataType))

    all_rows = tagged.unionByName(syn.select(*tagged.columns))
    w_in = (
        Window.partitionBy(*keys, "__b")
        .orderBy(ts_order, F.col("__is_left"), *(ties or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    match_expr = F.when(F.col("__is_left") == 0, right_struct).when(
        F.col("__is_left") == -1, F.col("__sm")
    )
    return all_rows.withColumn(
        "__m", F.last(match_expr, ignorenulls=True).over(w_in)
    )
