"""The 15-query analytical surface (reference analysis.sql) as
DataFrame builders over (posts, comments) DataFrames.

Each builder is the idiomatic-Spark re-expression of the corresponding
SQLite query (file:line cited per function). Aggregate/computed columns
are aliased with stable names so results are comparable against any
SQL oracle. All queries are pure logical-plan declarations — Catalyst
handles pushdown, pruning, decorrelation and join strategy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.relational import argmax_per_group, rank_in_group, tier_col

DAY_NAMES = [
    (0, "Monday"),
    (1, "Tuesday"),
    (2, "Wednesday"),
    (3, "Thursday"),
    (4, "Friday"),
    (5, "Saturday"),
    (6, "Sunday"),
]


def day_name_col(day_of_week: str) -> Column:
    """CASE day_of_week decode, Monday=0 (reference analysis.sql:47-55)."""
    expr = F.when(F.col(day_of_week) == 0, "Monday")
    for n, name in DAY_NAMES[1:]:
        expr = expr.when(F.col(day_of_week) == n, name)
    return expr


def q01_subreddit_overview(posts: DataFrame) -> DataFrame:
    """Basic data overview (analysis.sql:5-15)."""
    return (
        posts.groupBy("subreddit")
        .agg(
            F.count("*").alias("total_posts"),
            F.avg("score").alias("avg_score"),
            F.avg("num_comments").alias("avg_comments"),
            F.max("score").alias("highest_score"),
            F.min("score").alias("lowest_score"),
        )
        .orderBy(F.desc("total_posts"))
    )


def q02_top_posts(posts: DataFrame) -> DataFrame:
    """Top post(s) per subreddit, ties kept (analysis.sql:17-32).

    The correlated IN-subquery is re-expressed as a window max —
    one shuffle instead of Catalyst's agg+rejoin decorrelation.
    """
    cols = [
        "subreddit", "title", "author", "score",
        "num_comments", "upvote_ratio", "created_utc",
    ]
    return (
        argmax_per_group(posts, ["subreddit"], "score")
        .select(*cols)
        .orderBy(F.desc("score"))
    )


def q03_posts_by_hour(posts: DataFrame) -> DataFrame:
    """Posting patterns by hour of day (analysis.sql:34-42)."""
    return (
        posts.groupBy("hour_posted")
        .agg(
            F.count("*").alias("post_count"),
            F.avg("score").alias("avg_score"),
            F.avg("num_comments").alias("avg_comments"),
        )
        .orderBy("hour_posted")
    )


def q04_posts_by_weekday(posts: DataFrame) -> DataFrame:
    """Posting patterns by day of week, Monday=0 (analysis.sql:44-60)."""
    return (
        posts.groupBy("day_of_week")
        .agg(
            F.count("*").alias("post_count"),
            F.avg("score").alias("avg_score"),
        )
        .withColumn("day_name", day_name_col("day_of_week"))
        .select("day_of_week", "day_name", "post_count", "avg_score")
        .orderBy("day_of_week")
    )


def q05_active_authors(posts: DataFrame, limit: int = 20) -> DataFrame:
    """Most active authors (analysis.sql:62-73 — commented out and
    syntactically broken in the reference; this implements the evident
    intent with a total tiebreak so the LIMIT is deterministic)."""
    return (
        posts.filter(F.col("author") != "[deleted]")
        .groupBy("author")
        .agg(
            F.count("*").alias("post_count"),
            F.avg("score").alias("avg_score"),
            F.sum("num_comments").alias("total_comments_received"),
        )
        .filter(F.col("post_count") > 1)
        .orderBy(F.desc("post_count"), F.desc("avg_score"), F.asc("author"))
        .limit(limit)
    )


def q06_content_types(posts: DataFrame) -> DataFrame:
    """Content type analysis — conditional counts (analysis.sql:75-84)."""

    def flag_count(col: str, alias: str) -> Column:
        return F.sum(F.when(F.col(col), 1).otherwise(0)).alias(alias)

    return posts.groupBy("subreddit").agg(
        flag_count("is_video", "video_posts"),
        flag_count("has_selftext", "text_posts"),
        flag_count("is_original_content", "oc_posts"),
        flag_count("over_18", "nsfw_posts"),
        F.count("*").alias("total_posts"),
    )


def q07_engagement(posts: DataFrame) -> DataFrame:
    """Engagement by score category (analysis.sql:86-95)."""
    return (
        posts.groupBy("subreddit", "score_category")
        .agg(
            F.count("*").alias("post_count"),
            F.avg("engagement_rate").alias("avg_engagement_rate"),
            F.avg("upvote_ratio").alias("avg_upvote_ratio"),
        )
        .orderBy("subreddit", "score_category")
    )


def q08_comment_rollup(posts: DataFrame, comments: DataFrame) -> DataFrame:
    """Comment analysis per subreddit — LEFT JOIN keeps subreddits with
    zero comments; COUNT(c.id) counts non-null only (analysis.sql:97-105).
    """
    joined = posts.alias("p").join(
        comments.alias("c"),
        F.col("p.id") == F.col("c.post_id"),
        "left",
    )
    return joined.groupBy("p.subreddit").agg(
        F.count("c.id").alias("total_comments"),
        F.avg("c.score").alias("avg_comment_score"),
        F.countDistinct("c.author").alias("unique_commenters"),
    )


def q09_top_commenters(posts: DataFrame, comments: DataFrame) -> DataFrame:
    """Top commenters by subreddit — golden output = reference
    example.csv (analysis.sql:107-118)."""
    joined = posts.alias("p").join(
        comments.alias("c"), F.col("p.id") == F.col("c.post_id"), "inner"
    )
    return (
        joined.filter(F.col("c.author") != "[deleted]")
        .groupBy("p.subreddit", "c.author")
        .agg(
            F.count("c.id").alias("comment_count"),
            F.avg("c.score").alias("avg_comment_score"),
        )
        .filter(F.col("comment_count") >= 3)
        .orderBy("subreddit", F.desc("comment_count"))
    )


def q10_daily_trends(posts: DataFrame) -> DataFrame:
    """Time-based trends (analysis.sql:120-129)."""
    return (
        posts.withColumn("date", F.to_date("created_utc"))
        .groupBy("date", "subreddit")
        .agg(
            F.count("*").alias("daily_posts"),
            F.avg("score").alias("avg_daily_score"),
            F.max("score").alias("max_daily_score"),
        )
        .orderBy(F.desc("date"), "subreddit")
    )


def q11_title_insights(posts: DataFrame) -> DataFrame:
    """Title insights: avg length + question/caps rates (analysis.sql:131-138)."""
    return posts.groupBy("subreddit").agg(
        F.avg("title_length").alias("avg_title_length"),
        F.avg(F.when(F.col("title").contains("?"), 1).otherwise(0)).alias(
            "question_rate"
        ),
        F.avg(F.when(F.upper("title") == F.col("title"), 1).otherwise(0)).alias(
            "all_caps_rate"
        ),
    )


def q12_correlations(posts: DataFrame) -> DataFrame:
    """Characteristic <-> score correlations, score>0 (analysis.sql:140-148)."""
    return (
        posts.filter(F.col("score") > 0)
        .groupBy("subreddit")
        .agg(
            F.corr("title_length", "score").alias("title_length_score_corr"),
            F.corr("selftext_length", "score").alias("selftext_length_score_corr"),
            F.corr("hour_posted", "score").alias("hour_score_corr"),
        )
    )


def q13_weekly_summary(posts: DataFrame, as_of: Column | None = None) -> DataFrame:
    """Weekly performance summary (analysis.sql:150-161).

    The reference uses nondeterministic DATE('now','-7 days'); the
    engine takes an injectable ``as_of`` (SURVEY P16). Defaults to
    current_date() to match reference behavior.
    """
    anchor = as_of if as_of is not None else F.current_date()
    return (
        posts.filter(F.col("created_utc") >= F.date_sub(anchor, 7))
        .groupBy("subreddit")
        .agg(
            F.count("*").alias("posts_this_week"),
            F.avg("score").alias("avg_score"),
            F.stddev("score").alias("score_std_dev"),
            F.avg("num_comments").alias("avg_comments"),
            F.countDistinct("author").alias("unique_authors"),
        )
        .orderBy(F.desc("avg_score"))
    )


def q14_oc_quality(posts: DataFrame) -> DataFrame:
    """Content quality indicators — conditional AVGs exclude NULLs,
    matching SQL AVG(CASE ... ELSE NULL END) (analysis.sql:163-170)."""
    oc = F.col("is_original_content")
    return posts.groupBy("subreddit").agg(
        F.avg(F.when(oc, F.col("score"))).alias("avg_oc_score"),
        F.avg(F.when(~oc, F.col("score"))).alias("avg_non_oc_score"),
        (F.sum(oc.cast("int")) * 100.0 / F.count("*")).alias("oc_percentage"),
    )


def q15_post_performance(posts: DataFrame) -> DataFrame:
    """post_performance view: left-closed performance tier + rank
    window (analysis.sql:172-183). Tier ladder is deliberately distinct
    from the transform's score_category bins."""
    tiered = posts.withColumn(
        "performance_tier",
        tier_col("score", [(1000, "Viral"), (100, "Popular"), (10, "Good")], "Low"),
    )
    return rank_in_group(
        tiered, ["subreddit"], "score", rank_col="rank_in_subreddit"
    )


def register_views(posts: DataFrame, comments: DataFrame) -> None:
    """Register temp views so the surface is also reachable via
    ``spark.sql`` — the reference's ad-hoc analysis path (SURVEY §3.3)."""
    posts.createOrReplaceTempView("posts")
    comments.createOrReplaceTempView("comments")
    q15_post_performance(posts).createOrReplaceTempView("post_performance")
