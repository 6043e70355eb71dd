"""Python Data Source tests: format('reddit') scans partition per
subreddit and feeds the standard transform/query path."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.schemas import POSTS_RAW_SCHEMA
from reddit_etl_spark.sources.reddit_datasource import RedditDataSource
from reddit_etl_spark.transform import transform_posts


@pytest.fixture(scope="module")
def mock_path(tmp_path_factory):
    rows = []
    for sub in ("python", "datascience"):
        for i in range(5):
            rows.append(
                dict(
                    id=f"{sub[:2]}{i}",
                    title=f"Post {i}",
                    author=f"u{i}",
                    subreddit=sub,
                    score=i * 100,
                    upvote_ratio=0.9,
                    num_comments=i,
                    created_utc=f"2025-09-0{i + 1}T10:00:00",
                    selftext=None,
                    url="http://x",
                    is_video=False,
                    is_original_content=False,
                    over_18=False,
                    stickied=False,
                    locked=False,
                )
            )
    p = tmp_path_factory.mktemp("ds") / "posts.json"
    p.write_text(json.dumps(rows))
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(RedditDataSource)
    return spark


def test_datasource_reads_partitioned(registered, mock_path):
    df = (
        registered.read.format("reddit")
        .option("subreddits", "python,datascience")
        .option("mode", "mock")
        .option("mock_path", mock_path)
        .load()
    )
    assert df.schema == POSTS_RAW_SCHEMA
    assert df.count() == 10
    # one input partition per subreddit
    assert df.rdd.getNumPartitions() == 2
    assert df.filter(F.col("subreddit") == "python").count() == 5


def test_datasource_sort_and_limit(registered, mock_path):
    df = (
        registered.read.format("reddit")
        .option("subreddits", "python")
        .option("sort_type", "top")
        .option("limit", "2")
        .option("mode", "mock")
        .option("mock_path", mock_path)
        .load()
    )
    scores = sorted((r.score for r in df.collect()), reverse=True)
    assert scores == [400, 300]


def test_datasource_feeds_transform(registered, mock_path):
    df = (
        registered.read.format("reddit")
        .option("subreddits", "python")
        .option("mode", "mock")
        .option("mock_path", mock_path)
        .load()
    )
    out = transform_posts(df)
    assert out.filter(F.col("score_category").isNull()).count() == 0


def test_datasource_requires_subreddits(registered):
    with pytest.raises(Exception, match="subreddits"):
        registered.read.format("reddit").load().count()


def test_stream_reader_incremental(registered, mock_path, tmp_path):
    """readStream.format('reddit'): first batch emits everything newer
    than the initial offset; a second batch with an unchanged mock
    listing emits nothing (high-water-mark filtering)."""
    stream = (
        registered.readStream.format("reddit")
        .option("subreddits", "python,datascience")
        .option("mode", "mock")
        .option("mock_path", mock_path)
        .load()
    )
    out = str(tmp_path / "out")

    def drain():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return registered.read.parquet(out).count()

    assert drain() == 10
    # second drain resumes from checkpointed offsets: nothing new
    # behind the per-subreddit high-water marks
    assert drain() == 10
