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
