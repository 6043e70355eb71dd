"""Sketch operators — mergeable approximate aggregates.

Exact COUNT(DISTINCT) is a full shuffle of every distinct value; at
100 TB the scalable pattern is a mergeable sketch rolled up once and
re-aggregated forever after. Spark ships Apache DataSketches HLL
(``hll_sketch_agg``) — these operators wrap it into the two-level
pattern:

1. ``hll_rollup``: per fine-grained group (e.g. subreddit x day),
   store the BINARY sketch next to the estimate.
2. ``hll_merge_rollup``: re-aggregate stored sketches to any coarser
   grain (day -> week -> all-time) WITHOUT rescanning raw data —
   union the sketches, re-estimate.

``approx_count_distinct`` (HyperLogLog++) covers the one-shot case;
``approx_quantiles`` wraps percentile_approx (GK sketch) for grouped
distribution profiling at scan cost O(1) memory per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Per-group HLL sketch + estimate. lg_k=12 -> ~1.6% rel. error,
    4 KB per group regardless of cardinality."""
    sketch = F.hll_sketch_agg(F.col(value_col).cast("string"), lg_k)
    return df.groupBy(*group_cols).agg(
        sketch.alias(sketch_col),
    ).withColumn(estimate_col, F.hll_sketch_estimate(F.col(sketch_col)))


def hll_merge_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str = "hll_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Coarsen stored sketches to ``group_cols`` grain: union + re-
    estimate. No raw-data rescan — this is the entire point."""
    return (
        sketches.groupBy(*group_cols)
        .agg(F.hll_union_agg(F.col(sketch_col)).alias(sketch_col))
        .withColumn(estimate_col, F.hll_sketch_estimate(F.col(sketch_col)))
    )


def approx_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
    alias: str = "approx_distinct",
) -> Column | DataFrame:
    """One-shot HyperLogLog++ distinct count per group (A8's documented
    at-scale opt-in; exact countDistinct stays the default)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(alias)
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Grouped quantile profile via percentile_approx (GK sketch):
    one pass, bounded memory, mergeable across partitions."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    out = df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__q")
    )
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.col("__q")[i])
    return out.drop("__q")
