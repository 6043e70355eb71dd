"""Batch sinks (SURVEY §2.2 K1–K6).

The reference appends rows to SQLite tables (``to_sql(if_exists=
'append')``, script.py:233,251) and maintains ``subreddit_stats`` by
``INSERT OR REPLACE`` on the composite PK (subreddit, date)
(script.py:264-276). Spark-native equivalents:

- K1/K2 append   -> ``df.write.mode('append').parquet`` partitioned by
  the query-pruning keys.
- K3 keyed upsert-> dynamic partition overwrite: when the upsert key
  set equals the partition key set, overwriting ONLY the partitions
  present in the incoming batch reproduces INSERT-OR-REPLACE
  (last-writer-wins, whole row replaced) exactly — no Delta/iceberg
  dependency, works on plain Parquet, and at 100 TB touches only the
  (subreddit, date) partitions in the batch instead of rewriting the
  table.
- K5 CSV export  -> ``export_csv``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def append_parquet(
    df: DataFrame, path: str, partition_by: Sequence[str] = ()
) -> None:
    """Append rows (K1/K2). Partition columns choose the pruning axis:
    posts/comments partition by subreddit so per-subreddit analysis
    scans one directory subtree."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def upsert_partitioned(
    df: DataFrame, path: str, keys: Sequence[str]
) -> None:
    """Keyed upsert (K3): INSERT OR REPLACE semantics on ``keys``.

    Requires every key column to be a partition column. Dynamic
    partition overwrite replaces exactly the partitions present in
    ``df`` and leaves all others untouched — last-writer-wins per
    (subreddit, date), matching the reference's conflict behavior
    (script.py:265). Idempotent: re-writing the same batch leaves the
    table unchanged.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*keys)
        .parquet(path)
    )


def export_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV export with header (K5 — the example.csv path).
    coalesce(1) is a driver-side convenience for small results only."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
