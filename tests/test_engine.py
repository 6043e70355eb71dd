"""Engine facade tests: the reference user's switch-over surface
(pipeline write -> Engine over the lakehouse -> all three query
paths + the stats refresh), plus the partition-pruning property of
the written layout."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.engine import Engine
from reddit_etl_spark.plans.inspect import explain_str
from reddit_etl_spark.sinks.writers import append_parquet
from tests.conftest import AS_OF


@pytest.fixture(scope="module")
def lake(spark, posts, comments, tmp_path_factory):
    root = tmp_path_factory.mktemp("lake")
    append_parquet(posts, str(root / "posts"), partition_by=("subreddit",))
    append_parquet(comments, str(root / "comments"))
    return root


@pytest.fixture(scope="module")
def engine(spark, lake):
    return Engine(
        spark, posts_path=str(lake / "posts"), comments_path=str(lake / "comments")
    )


def test_engine_builders_and_sql_agree(engine):
    b = {r.subreddit: r.total_posts for r in engine.q01().collect()}
    s = {
        r.subreddit: r.total_posts
        for r in engine.analysis("q01").collect()
    }
    assert b == s and len(b) == 3


def test_engine_adhoc_sql_view(engine):
    top = engine.sql(
        "SELECT subreddit, COUNT(*) AS n FROM post_performance "
        "WHERE rank_in_subreddit = 1 GROUP BY subreddit"
    ).collect()
    assert len(top) == 3


def test_engine_q13_requires_as_of(engine):
    with pytest.raises(ValueError):
        engine.analysis("q13")
    assert engine.analysis("q13", as_of=AS_OF).count() > 0


def test_engine_stats_refresh(engine, tmp_path, spark):
    path = str(tmp_path / "stats")
    engine.refresh_stats(path)
    stats = spark.read.parquet(path)
    assert {"subreddit", "date", "total_posts"} <= set(stats.columns)
    assert stats.count() > 0


def test_partition_pruning_on_written_layout(engine):
    # subreddit is a partition column: the filter must prune partitions
    # at planning time, not scan-and-filter
    df = engine.posts.filter(F.col("subreddit") == "Python")
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    assert "subreddit" in plan.split("PartitionFilters")[1][:200]
    assert df.count() > 0


def test_engine_data_quality_clean_fixture(engine):
    report = {r["check"]: (r["violations"], r["total"]) for r in engine.data_quality().collect()}
    # the fixture tables satisfy every standing expectation
    assert all(v == 0 for v, _ in report.values()), report
    assert any(c.startswith("referential(post_id") for c in report)
    assert any(c.startswith("unique(id)") for c in report)
