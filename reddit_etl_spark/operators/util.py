"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row stages use the full executor pool.

    A single-row-group parquet file scans as ONE task no matter how
    many cores exist; shingling/minhashing would then run serially.
    On a real multi-split 100 TB input this repartition collapses to
    a no-op (partitions already >= parallelism); locally it is one
    tiny shuffle of the raw rows that unlocks every core."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
