"""Extension-surface SQL/DataFrame equivalence — the §2.11 three-ways
discipline applied to the SQL-expressible training-data queries."""

from __future__ import annotations

import pytest

from reddit_etl_spark.extension_sql import EXTENSION_SQL
from reddit_etl_spark.harness import load, load_events, registry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    load(spark, SF_DIR, "documents").createOrReplaceTempView("documents")
    load_events(spark, SF_DIR).createOrReplaceTempView("events")
    load(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    return spark


@pytest.mark.parametrize("name", sorted(EXTENSION_SQL))
def test_sql_twin_matches_dataframe_builder(views, name):
    spark = views
    df_result = registry()[name].builder(spark, SF_DIR)
    sql_result = spark.sql(EXTENSION_SQL[name])
    assert sorted(df_result.columns) == sorted(sql_result.columns)
    a = sorted(map(tuple, df_result.select(*sorted(df_result.columns)).collect()))
    b = sorted(map(tuple, sql_result.select(*sorted(df_result.columns)).collect()))
    assert a == b and (a or name == "cross_source_dups")
