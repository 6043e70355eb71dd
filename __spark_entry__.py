"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All query definitions live in ``reddit_etl_spark.harness`` (Spark
builder + oracle SQL side by side); this file is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reddit_etl_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: join + filter +
    2-key aggregate + HAVING (the reference's golden-output q09 shape)."""
    return harness.q09_join_having(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: hq.builder for name, hq in harness.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: hq.oracle
        for name, hq in harness.registry().items()
        if hq.oracle is not None
    }
