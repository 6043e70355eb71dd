"""Data-layout operators: multi-dimensional clustering for scan
pruning.

At 100 TB the fastest scan is the one that never happens: engines
skip files/row-groups whose min/max column statistics exclude the
predicate. A single-column sort gives perfect pruning on that column
and none on any other; a Z-ORDER (Morton) layout interleaves the
bits of several columns so that files stay simultaneously narrow in
ALL of them — the standard multi-dimensional clustering technique
(Delta OPTIMIZE ZORDER BY, Iceberg sort orders, DB2 MDC).

This module computes the interleave key as a pure column expression
(JVM-side bit arithmetic — no UDF) and measures what a layout buys:
split the sorted table into equal file groups, collect per-group
min/max per dimension (exactly the stats a parquet footer would
carry), and evaluate which groups a box predicate could skip. The
measurement frame doubles as the oracle surface — exact integers
end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 8) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer
    columns, ``bits`` bits each (values are masked to that width —
    callers bucket/quantize first so the domain fits). Bit j of
    column i lands at position j*len(cols)+i, the classic
    round-robin interleave; the result fits comfortably in BIGINT
    for bits*len(cols) <= 62.

    Pure shift/and/or column expression — whole-stage-codegen'd,
    identical semantics in any SQL engine (the oracle twin is the
    same arithmetic), no UDF.

    Relationship to ``sinks.writers.zorder_value_col``: that twin is
    the WRITE-path form — 2 columns, full 32-bit domain, the O(log w)
    mask-spread sequence plus a sign-bit embedding, because a writer
    only needs the ORDER. This is the AUDIT-path form: N columns,
    parameterized width, one explicit term per bit — directly
    transcribable into the DuckDB oracle so the layout's pruning
    claim is value-checked cross-engine, not just asserted.
    """
    ncols = len(cols)
    if ncols < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * ncols > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    # NOTE: Column.__and__/__or__ are BOOLEAN operators in PySpark;
    # bit arithmetic must go through bitwiseAND/bitwiseOR
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (
            (F.col(c) if isinstance(c, str) else c)
            .cast("long")
            .bitwiseAND(F.lit((1 << bits) - 1).cast("long"))
        )
        for j in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, j).bitwiseAND(F.lit(1).cast("long")),
                    j * ncols + i,
                )
            )
    return key


def layout_pruning_stats(
    df: DataFrame,
    dim_cols: Sequence[str],
    order_by: Column,
    tiebreak_col: str,
    n_groups: int,
    box: dict[str, tuple[int, int]],
    layout_name: str,
) -> DataFrame:
    """Simulate writing ``df`` sorted by ``order_by`` into
    ``n_groups`` equal files and report, per file group, the min/max
    footer stats of each dimension plus whether a box predicate
    (``{dim: (lo, hi)}`` inclusive) could PRUNE the group (some
    dimension's [min,max] misses its box range entirely — exactly
    the skipping rule parquet/Iceberg readers apply).

    ntile over the total order (unique ``tiebreak_col`` makes it
    deterministic) stands in for the writer's file split. The
    ordered window is single-partition here — at scale the writer
    would repartitionByRange on the same key and this frame would be
    per-file metadata, n_groups rows total, so the measurement
    itself never outgrows the driver.

    Returns (layout, file_group, n_rows, min/max per dim, prunable
    BOOLEAN) — exact integers only.
    """
    w = Window.orderBy(order_by, F.col(tiebreak_col))
    g = df.withColumn("__fg", F.ntile(n_groups).over(w))
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for d in dim_cols:
        aggs.append(F.min(d).cast("long").alias(f"min_{d}"))
        aggs.append(F.max(d).cast("long").alias(f"max_{d}"))
    stats = g.groupBy(F.col("__fg").cast("long").alias("file_group")).agg(
        *aggs
    )
    prunable = F.lit(False)
    for d, (lo, hi) in box.items():
        prunable = prunable | (
            (F.col(f"max_{d}") < F.lit(lo)) | (F.col(f"min_{d}") > F.lit(hi))
        )
    return stats.select(
        F.lit(layout_name).alias("layout"),
        "file_group",
        "n_rows",
        *[c for d in dim_cols for c in (f"min_{d}", f"max_{d}")],
        prunable.alias("prunable"),
    )


def compaction_plan(
    files: DataFrame,
    size_col: str,
    order_col: str,
    target_size: int,
    plan_name: str = "compaction",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Plan small-file compaction: assign files (metadata rows — id,
    size) to output groups of ~``target_size`` by cumulative-sum
    binning in ``order_col`` order — the strategy Delta/Iceberg
    OPTIMIZE and Hive concatenation actually use (coalesce ADJACENT
    files so each rewrite group lands near the target and ordering/
    clustering is preserved; never global bin packing, which would
    destroy data locality).

    bin(file) = floor(running_total_before_file / target_size) —
    exact BIGINT arithmetic over integer sizes, so the plan is
    engine- and partitioning-exact PROVIDED the window's order is
    total: ``order_col`` must be unique, or pass ``tiebreak_col``
    (the z-order audit's rule) — duplicate keys with no tiebreak
    would make the running total partition-dependent. A file larger
    than the target gets its own group (it closes the bin it
    starts). Any group can come out under target (the tail always;
    mid-plan right after an oversized file); ``undersized`` flags
    every such group for the caller's leave-or-merge policy.

    Scale: the input is per-file METADATA (a listing, n_files rows),
    not data — the ordered cumulative window is the planner's whole
    cost, and n_files is bounded by the table's file count (what the
    plan exists to shrink). Output: one row per planned group
    (plan, group_id, n_files, total_size, first/last ``order_col``,
    undersized).
    """
    if target_size < 1:
        raise ValueError("target_size must be >= 1")
    order = ["__ord"] + (["__tie"] if tiebreak_col else [])
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cols = [
        F.col(order_col).alias("__ord"),
        F.col(size_col).cast("long").alias("__size"),
    ]
    if tiebreak_col:
        cols.append(F.col(tiebreak_col).alias("__tie"))
    binned = (
        files.select(*cols)
        .withColumn(
            "__cum", F.coalesce(F.sum("__size").over(w), F.lit(0).cast("long"))
        )
        # integer `div`, not double `/`: cumulative totals can pass
        # 2^53 where a double quotient truncates wrong
        .withColumn("__grp", F.expr(f"__cum div {int(target_size)}"))
    )
    total = F.sum("__size").cast("long")
    out = (
        binned.groupBy(F.col("__grp").cast("long").alias("group_id"))
        .agg(
            F.count("*").cast("long").alias("n_files"),
            total.alias("total_size"),
            F.min("__ord").alias("first_key"),
            F.max("__ord").alias("last_key"),
        )
        .withColumn("plan", F.lit(plan_name))
    )
    return out.select(
        "plan",
        "group_id",
        "n_files",
        "total_size",
        "first_key",
        "last_key",
        # ANY under-target group is flagged, not just the tail — a
        # tiny fragment group also forms right after an oversized
        # file closes its bin
        (F.col("total_size") < F.lit(int(target_size))).alias("undersized"),
    ).orderBy("group_id")
