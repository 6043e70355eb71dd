"""Bucketed-table sink — pre-shuffled layouts for co-located joins.

At 100 TB the expensive part of a recurring join (posts ⋈ comments on
post id, fact ⋈ fact on a key) is the shuffle. Writing both sides
bucketed by the join key with the same bucket count lets every future
join plan as a zero-exchange sort-merge over co-located buckets: the
shuffle is paid ONCE at write time and amortized over every read.

Bucketing requires the table catalog (``saveAsTable``): bucket
metadata lives in the metastore, not in parquet files.
tests/test_bucketed.py asserts the no-Exchange plan property.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` defaults to the bucket columns — sorted buckets let
    the sort-merge join skip its sort too, leaving pure merge."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str],
    how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables. With matching bucket counts and
    keys, Spark plans this with no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
