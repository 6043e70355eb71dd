"""Daily subreddit stats — the reference's embedded-SQL aggregate +
upsert path (script.py:259-286) re-expressed as a DataFrame plan +
partition-overwrite upsert.

The reference SQL (script.py:264-276):

    INSERT OR REPLACE INTO subreddit_stats
    SELECT subreddit, DATE(created_utc), COUNT(*), AVG(score),
           AVG(num_comments), MAX(score)
    FROM posts
    WHERE subreddit = ? AND DATE(created_utc) = DATE('now')
    GROUP BY subreddit, DATE(created_utc)

``DATE('now')`` is nondeterministic; the engine takes an injectable
``as_of`` (SURVEY P13) and defaults to current_date() only when the
caller does not care about reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sinks.writers import upsert_partitioned

STATS_KEYS = ("subreddit", "date")


def daily_subreddit_stats(
    posts: DataFrame,
    as_of: Column | None = None,
    subreddit: str | None = None,
) -> DataFrame:
    """The stats aggregate (A15). ``as_of=None`` -> all dates (useful
    for backfill); a date Column restricts to that day, mirroring the
    reference's DATE('now') filter. ``subreddit=None`` computes every
    subreddit in one pass — the reference loops per subreddit
    (script.py:339-353), a driver-side loop Spark does not need."""
    df = posts
    if subreddit is not None:
        df = df.filter(F.col("subreddit") == subreddit)
    df = df.withColumn("date", F.to_date("created_utc"))
    if as_of is not None:
        df = df.filter(F.col("date") == as_of)
    return df.groupBy("subreddit", "date").agg(
        F.count("*").alias("total_posts"),
        F.avg("score").alias("avg_score"),
        F.avg("num_comments").alias("avg_comments"),
        F.max("score").alias("top_post_score"),
    )


def write_subreddit_stats(stats: DataFrame, path: str) -> None:
    """Upsert on the composite PK (subreddit, date) (K3)."""
    upsert_partitioned(stats, path, STATS_KEYS)
