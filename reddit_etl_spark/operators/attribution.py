"""Multi-touch marketing attribution.

The engine's as-of join family answers LAST-touch attribution (each
conversion credits the single nearest preceding touch —
``asof_join`` / harness ``asof_attribution``). Real attribution models
spread each conversion's credit across EVERY touch in a lookback
window; this module implements the four standard credit rules on top
of the repo's bucketed interval join, so the touch×conversion pairing
never degenerates into a per-key cross join:

- ``linear``      — 1/n to each of the n touches
- ``time_decay``  — w = 0.5^(age / half_life), normalized per
                    conversion (recent touches earn more)
- ``position``    — U-shaped 40/20/40: first 0.4, last 0.4, the
                    middle splits 0.2 evenly (n=1 -> 1.0, n=2 ->
                    0.5/0.5)
- ``first``/``last`` — all credit to the earliest / latest touch
                    (ties broken on the touch id)

Scale shape (100 TB): pairing is ``interval_join`` — conversions
expand to [ts - lookback, ts] intervals bucketed on
(key, time-bucket), touches bucket once, candidates join on equality
keys (no nested-loop range join, no per-user cross join). With the
bucket pinned to the lookback width every interval spans <= 2 bucket
rows. The per-conversion normalizations (count, weight sum, first-
last ranks) are windows PARTITIONED BY the conversion id — state per
group is the conversion's own touch set, bounded by touch frequency
within the lookback, never corpus-sized.

Cross-engine determinism: touch ages are exact integer seconds
(floor-epoch on both engines); decay weights are pure elementwise
pow; every normalized credit is rounded to 6 decimals (repo
convention) and orderings tie-break on the touch id column.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rangejoin import interval_join

_MODELS = ("linear", "time_decay", "position", "first", "last")


def multitouch_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    on: list[str],
    touch_ts: str,
    conv_ts: str,
    conv_id: str,
    touch_id: str,
    lookback: str = "7 days",
    model: str = "linear",
    half_life: str = "1 day",
) -> DataFrame:
    """Credit each conversion's value across its lookback touches.

    Returns one row per (conversion, touch) pair: all ``conversions``
    columns, the touch's ``touch_id``/``touch_ts`` columns, plus
    ``n_touches`` (BIGINT) and ``credit`` (DOUBLE in [0, 1], rounded
    to 6; credits of one conversion sum to ~1 minus rounding dust).
    Conversions with zero in-window touches are absent — callers
    wanting them keep a left join on ``conv_id`` afterwards.

    ``touch_ts``/``conv_ts`` must be timestamps; the window is the
    closed interval [conv_ts - lookback, conv_ts], so a touch at the
    conversion instant participates (age 0 — the highest-weight touch
    under time_decay).
    """
    if model not in _MODELS:
        raise ValueError(f"model must be one of {_MODELS}, got {model!r}")
    lb_s = int(pd.Timedelta(lookback).total_seconds())
    if lb_s <= 0:
        raise ValueError(f"lookback must be positive, got {lookback!r}")

    # exact timestamp arithmetic (micros preserved) so the window
    # boundary is literally conv_ts - lookback on both engines — a
    # floor-to-second subtraction would admit a sub-second sliver of
    # extra touches the oracle's INTERVAL arithmetic excludes
    iv = conversions.withColumn(
        "__start", F.col(conv_ts) - F.expr(f"INTERVAL {lb_s} SECONDS")
    )
    pairs = interval_join(
        touches,
        iv,
        on=on,
        point_ts=touch_ts,
        start_ts="__start",
        end_ts=conv_ts,
        bucket=f"{lb_s} seconds",
    ).drop("__start")

    byconv = Window.partitionBy(conv_id)
    # deterministic within-conversion order: time, then touch id
    fwd = byconv.orderBy(F.col(touch_ts).asc(), F.col(touch_id).asc())
    pairs = pairs.withColumn("n_touches", F.count("*").over(byconv))
    if model == "linear":
        credit = F.lit(1.0) / F.col("n_touches")
    elif model == "time_decay":
        age = F.unix_timestamp(F.col(conv_ts)) - F.unix_timestamp(
            F.col(touch_ts)
        )
        hl_s = int(pd.Timedelta(half_life).total_seconds())
        if hl_s <= 0:
            raise ValueError(f"half_life must be positive, got {half_life!r}")
        w = F.pow(F.lit(0.5), age / F.lit(float(hl_s)))
        pairs = pairs.withColumn("__w", w)
        credit = F.col("__w") / F.sum("__w").over(byconv)
    elif model in ("first", "last"):
        rn = F.row_number().over(
            fwd
            if model == "first"
            else byconv.orderBy(F.col(touch_ts).desc(), F.col(touch_id).desc())
        )
        credit = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    else:  # position (U-shaped 40/20/40)
        rn = F.row_number().over(fwd)
        n = F.col("n_touches")
        credit = (
            F.when(n == 1, F.lit(1.0))
            .when((rn == 1) | (rn == n), F.when(n == 2, 0.5).otherwise(0.4))
            .otherwise(F.lit(0.2) / (n - F.lit(2)))
        )
    return (
        pairs.withColumn("credit", F.round(credit, 6))
        .withColumn("n_touches", F.col("n_touches").cast("long"))
        .drop("__w", "__bk")
    )
