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

The same two-level pattern extends to the other DataSketches
families Spark 4 ships: ``kll_rollup``/``kll_merge_rollup`` for
MERGEABLE quantiles (store per-day sketches, answer week/all-time
percentiles without rescanning), and ``theta_rollup``/
``theta_overlap`` for distinct-count SET ALGEBRA (intersection /
difference between segments — the audience-overlap question HLL
cannot answer and exact COUNT(DISTINCT) answers only by co-locating
both segments' distinct sets).
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


def kll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 200,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Per-group KLL quantile sketch (DataSketches, double stream) —
    the STORABLE/mergeable counterpart to :func:`approx_quantiles`:
    percentile_approx answers once at scan time, a persisted KLL
    column answers at any later grain without rescanning raw data
    (day -> week -> all-time, same two-level pattern as
    :func:`hll_rollup`). k=200 -> ~1.65% one-sided rank error, a few
    KB per group regardless of row count."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(
            F.col(value_col).cast("double"), F.lit(k)
        ).alias(sketch_col)
    )


def kll_merge_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Coarsen stored KLL sketches to ``group_cols`` grain and read
    quantile estimates off the merged sketch — no raw-data rescan."""
    merged = sketches.groupBy(*group_cols).agg(
        F.expr(f"kll_merge_agg_double({sketch_col})").alias(sketch_col)
    )
    for p in probabilities:
        merged = merged.withColumn(
            f"p{int(p * 100)}_est",
            F.expr(
                f"kll_sketch_get_quantile_double({sketch_col}, {float(p)})"
            ),
        )
    return merged


def mg_partition_summaries(
    df: DataFrame,
    value_col: str,
    capacity: int,
    est_col: str = "est_count",
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (<= ``capacity``
    counters each) via one mapInPandas pass — the bounded-memory
    heavy-hitters primitive. Each partition's summary guarantees
    est <= true_partition_count <= est + N_p/(capacity+1); summaries
    are MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS 2012):
    sum shared counters, trim back to capacity by subtracting the
    (capacity+1)-th largest, and the global N/(capacity+1) error bound
    survives. At 100 TB this replaces the full distinct-key shuffle of
    an exact GROUP BY with P x capacity summary rows.

    Batch update inside a partition: add the batch's value_counts to
    the running counters, and whenever more than ``capacity`` counters
    are live, subtract the (capacity+1)-th largest count from all and
    drop the non-positive — the batched equivalent of MG's decrement
    step (total decrement per overflow <= one per surviving counter,
    which is what the error bound needs)."""
    import pandas as pd

    field = df.schema[value_col]
    out_schema = f"`{value_col}` {field.dataType.simpleString()}, `{est_col}` long"

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[value_col].dropna().value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    v: c - cut for v, c in counters.items() if c - cut > 0
                }
        if counters:
            yield pd.DataFrame(
                {
                    value_col: list(counters.keys()),
                    est_col: list(counters.values()),
                }
            )

    return df.select(value_col).mapInPandas(summarize, schema=out_schema)


def freq_items_mg(
    df: DataFrame,
    value_col: str,
    capacity: int,
    est_col: str = "est_count",
) -> DataFrame:
    """Global Misra-Gries heavy hitters: per-partition summaries merged
    by summing shared counters and trimming to ``capacity`` (subtract
    the (capacity+1)-th largest merged count, keep positive). Returns
    at most ``capacity`` rows (value, est) with the two-sided
    guarantee: est <= true count, and true - est <= N/(capacity+1) —
    so every value with true frequency above N/(capacity+1) is
    PRESENT in the output (the heavy-hitter guarantee the harness
    audit pins cross-engine).

    The merge's rank window is global but runs over the bounded
    summary table (<= partitions x capacity rows), never the data."""
    from pyspark.sql import Window

    summaries = mg_partition_summaries(df, value_col, capacity, est_col)
    merged = summaries.groupBy(value_col).agg(F.sum(est_col).alias(est_col))
    w = Window.orderBy(F.desc(est_col), F.asc(value_col))
    ranked = merged.withColumn("__rn", F.row_number().over(w))
    cut = ranked.filter(F.col("__rn") == capacity + 1).select(
        F.col(est_col).alias("__cut")
    )
    return (
        ranked.filter(F.col("__rn") <= capacity)
        .crossJoin(F.broadcast(cut.select(F.coalesce(F.max("__cut"), F.lit(0)).alias("__cut"))))
        .withColumn(est_col, F.col(est_col) - F.col("__cut"))
        .filter(F.col(est_col) > 0)
        .select(value_col, est_col)
    )


def theta_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "theta_sketch",
    estimate_col: str = "distinct_estimate",
) -> DataFrame:
    """Per-group Theta sketch of distinct ``value_col``. Unlike HLL,
    Theta sketches support INTERSECTION and DIFFERENCE — the
    segment-overlap questions (users who did A and B; A but never B)
    that exact COUNT(DISTINCT) answers only with a full join of both
    segments' distinct sets."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.theta_sketch_agg(F.col(value_col).cast("string"), lg_k).alias(
                sketch_col
            )
        )
        .withColumn(estimate_col, F.theta_sketch_estimate(F.col(sketch_col)))
    )


def theta_overlap(
    df: DataFrame,
    segment_col: str,
    value_col: str,
    seg_a,
    seg_b,
    lg_k: int = 12,
) -> DataFrame:
    """One-row set-algebra estimate between two segments: distinct
    |A|, |B|, |A ∩ B|, |A ∪ B|, |A \\ B| of ``value_col``. Shuffle
    carries two KB-sized sketches — the raw values never co-locate,
    which is the whole point at 100 TB (exact overlap needs a
    distinct-shuffle of BOTH segments onto the same keys)."""
    sk = theta_rollup(
        df.filter(F.col(segment_col).isin([seg_a, seg_b])),
        [segment_col],
        value_col,
        lg_k=lg_k,
    )
    a = sk.filter(F.col(segment_col) == seg_a).select(
        F.col("theta_sketch").alias("__a")
    )
    b = sk.filter(F.col(segment_col) == seg_b).select(
        F.col("theta_sketch").alias("__b")
    )
    return (
        a.crossJoin(b)  # 1x1: two single-sketch rows
        .select(
            F.theta_sketch_estimate(F.col("__a")).alias("a_est"),
            F.theta_sketch_estimate(F.col("__b")).alias("b_est"),
            F.theta_sketch_estimate(
                F.expr("theta_intersection(__a, __b)")
            ).alias("intersection_est"),
            F.theta_sketch_estimate(F.expr("theta_union(__a, __b)")).alias(
                "union_est"
            ),
            F.theta_sketch_estimate(
                F.expr("theta_difference(__a, __b)")
            ).alias("a_minus_b_est"),
        )
    )


def count_min_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan): a depth x width
    counter grid answering "how often did item x occur" in
    O(depth·width) space with one-sided error — estimates NEVER
    undercount, and overshoot ≤ (e/width)·N with probability
    1 - e^(-depth) per query. The frequency-ESTIMATE rung of the
    sketch family: Misra-Gries keeps only the top-k heavy hitters,
    CMS answers arbitrary point queries; like the HLL/KLL/Theta
    siblings it is MERGEABLE (grids add cell-wise), so per-partition
    or per-day sketches roll up to any grain.

    Hashes are the engine-portable md5_60 of (row-salted item), so
    the sketch — and every estimate — is bit-identical in any engine
    with md5 (fully oracle-checkable, not rows-only). NULL items are
    excluded.

    Plan: one map-side-combined groupBy; the shuffle payload is
    counter CELLS (≤ partitions·depth·width combiner rows), never
    items. Returns (r BIGINT, b BIGINT, cnt BIGINT) — only touched
    cells; absent cells are zero.
    """
    from .dedup import token_hash_col

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    base = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).cast("string").alias("__it"), rows
    )
    b = F.pmod(
        token_hash_col(
            F.concat_ws(
                "\x1f", F.lit("cms"), F.col("r").cast("string"),
                F.col("__it"),
            ),
            "md5_60",
        ),
        F.lit(width),
    )
    return (
        base.select(F.col("r").cast("long").alias("r"), b.alias("b"))
        .groupBy("r", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def count_min_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-query a :func:`count_min_sketch`: each item's estimate is
    the MIN over the ``depth`` counters its salted hashes land on
    (absent cell = 0). ``depth``/``width`` must match the build.
    Plan: items replicate ``depth`` ways and join the (≤ depth·width)-
    row sketch — broadcast-sized by construction. Returns
    (item, est BIGINT).
    """
    from .dedup import token_hash_col

    rows = F.explode(
        F.array(*[F.lit(r) for r in range(depth)])
    ).alias("r")
    q = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).alias("__item"), rows
    )
    b = F.pmod(
        token_hash_col(
            F.concat_ws(
                "\x1f", F.lit("cms"), F.col("r").cast("string"),
                F.col("__item").cast("string"),
            ),
            "md5_60",
        ),
        F.lit(width),
    )
    joined = q.select(
        "__item", F.col("r").cast("long").alias("r"), b.alias("b")
    ).join(F.broadcast(sketch), ["r", "b"], "left")
    return (
        joined.groupBy("__item")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
        .withColumnRenamed("__item", item_col)
    )
