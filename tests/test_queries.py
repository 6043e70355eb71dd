"""q01–q15 DataFrame builders vs a DuckDB oracle over the SAME
transformed reddit fixture — the §5.2 golden-output strategy applied to
the reference's own domain schema (tools/check_oracle.py covers the
TPC-H-shaped instantiations; this covers the reddit-shaped ones)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_etl_spark import queries as q
from tests.conftest import AS_OF, assert_df_matches_sql


def test_q01_overview(posts, oracle):
    assert_df_matches_sql(
        q.q01_subreddit_overview(posts),
        oracle,
        """
        SELECT subreddit, COUNT(*) AS total_posts, AVG(score) AS avg_score,
               AVG(num_comments) AS avg_comments, MAX(score) AS highest_score,
               MIN(score) AS lowest_score
        FROM posts GROUP BY subreddit
        """,
    )


def test_q02_top_posts_keeps_ties(posts, oracle):
    assert_df_matches_sql(
        q.q02_top_posts(posts),
        oracle,
        """
        SELECT subreddit, title, author, score, num_comments, upvote_ratio,
               created_utc
        FROM posts
        WHERE score IN (SELECT MAX(score) FROM posts p2
                        WHERE p2.subreddit = posts.subreddit)
        """,
    )
    # the fixture plants a 3-way tie at 1001 per subreddit
    counts = (
        q.q02_top_posts(posts).groupBy("subreddit").count().collect()
    )
    assert all(r["count"] >= 2 for r in counts)


def test_q03_posts_by_hour(posts, oracle):
    assert_df_matches_sql(
        q.q03_posts_by_hour(posts),
        oracle,
        """
        SELECT hour_posted, COUNT(*) AS post_count, AVG(score) AS avg_score,
               AVG(num_comments) AS avg_comments
        FROM posts GROUP BY hour_posted
        """,
    )


def test_q04_posts_by_weekday(posts, oracle):
    assert_df_matches_sql(
        q.q04_posts_by_weekday(posts),
        oracle,
        """
        SELECT day_of_week,
               CASE day_of_week WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday'
                    WHEN 2 THEN 'Wednesday' WHEN 3 THEN 'Thursday'
                    WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
                    WHEN 6 THEN 'Sunday' END AS day_name,
               COUNT(*) AS post_count, AVG(score) AS avg_score
        FROM posts GROUP BY 1, 2
        """,
    )


def test_q05_active_authors(posts, oracle):
    assert_df_matches_sql(
        q.q05_active_authors(posts),
        oracle,
        """
        SELECT author, COUNT(*) AS post_count, AVG(score) AS avg_score,
               CAST(SUM(num_comments) AS BIGINT) AS total_comments_received
        FROM posts WHERE author <> '[deleted]'
        GROUP BY author HAVING COUNT(*) > 1
        ORDER BY post_count DESC, avg_score DESC, author LIMIT 20
        """,
        ordered=True,
    )


def test_q06_content_types(posts, oracle):
    assert_df_matches_sql(
        q.q06_content_types(posts),
        oracle,
        """
        SELECT subreddit,
               CAST(SUM(CASE WHEN is_video THEN 1 ELSE 0 END) AS BIGINT) AS video_posts,
               CAST(SUM(CASE WHEN has_selftext THEN 1 ELSE 0 END) AS BIGINT) AS text_posts,
               CAST(SUM(CASE WHEN is_original_content THEN 1 ELSE 0 END) AS BIGINT) AS oc_posts,
               CAST(SUM(CASE WHEN over_18 THEN 1 ELSE 0 END) AS BIGINT) AS nsfw_posts,
               COUNT(*) AS total_posts
        FROM posts GROUP BY subreddit
        """,
    )


def test_q07_engagement(posts, oracle):
    assert_df_matches_sql(
        q.q07_engagement(posts),
        oracle,
        """
        SELECT subreddit, score_category, COUNT(*) AS post_count,
               AVG(engagement_rate) AS avg_engagement_rate,
               AVG(upvote_ratio) AS avg_upvote_ratio
        FROM posts GROUP BY subreddit, score_category
        """,
    )


def test_q08_comment_rollup(posts, comments, oracle):
    assert_df_matches_sql(
        q.q08_comment_rollup(posts, comments),
        oracle,
        """
        SELECT p.subreddit, COUNT(c.id) AS total_comments,
               AVG(c.score) AS avg_comment_score,
               COUNT(DISTINCT c.author) AS unique_commenters
        FROM posts p LEFT JOIN comments c ON p.id = c.post_id
        GROUP BY p.subreddit
        """,
    )


def test_q09_top_commenters(posts, comments, oracle):
    # the golden example.csv query (reference analysis.sql:107-118)
    assert_df_matches_sql(
        q.q09_top_commenters(posts, comments),
        oracle,
        """
        SELECT p.subreddit, c.author, COUNT(c.id) AS comment_count,
               AVG(c.score) AS avg_comment_score
        FROM posts p JOIN comments c ON p.id = c.post_id
        WHERE c.author <> '[deleted]'
        GROUP BY p.subreddit, c.author
        HAVING COUNT(c.id) >= 3
        """,
    )
    # fixture straddles the HAVING boundary: some (sub, author) pairs
    # with < 3 comments must have been filtered
    all_pairs = (
        comments.filter(F.col("author") != "[deleted]")
        .join(posts, comments.post_id == posts.id)
        .groupBy("subreddit", comments.author)
        .count()
    )
    assert all_pairs.filter("count < 3").count() > 0


def test_q10_daily_trends(posts, oracle):
    assert_df_matches_sql(
        q.q10_daily_trends(posts),
        oracle,
        """
        SELECT CAST(created_utc AS DATE) AS date, subreddit,
               COUNT(*) AS daily_posts, AVG(score) AS avg_daily_score,
               MAX(score) AS max_daily_score
        FROM posts GROUP BY 1, 2
        """,
    )


def test_q11_title_insights(posts, oracle):
    assert_df_matches_sql(
        q.q11_title_insights(posts),
        oracle,
        """
        SELECT subreddit, AVG(title_length) AS avg_title_length,
               AVG(CASE WHEN title LIKE '%?%' THEN 1 ELSE 0 END) AS question_rate,
               AVG(CASE WHEN upper(title) = title THEN 1 ELSE 0 END) AS all_caps_rate
        FROM posts GROUP BY subreddit
        """,
    )


def test_q11_question_rate_is_zero_post_clean(posts):
    # Faithful reference quirk: analysis.sql runs over STORED titles,
    # which transform already stripped of punctuation — so the '?' LIKE
    # can never match (SURVEY P8 ordering).
    rows = q.q11_title_insights(posts).collect()
    assert all(r.question_rate == 0.0 for r in rows)


def test_q12_correlations(posts, oracle):
    assert_df_matches_sql(
        q.q12_correlations(posts),
        oracle,
        """
        SELECT subreddit,
               corr(title_length, score) AS title_length_score_corr,
               corr(selftext_length, score) AS selftext_length_score_corr,
               corr(hour_posted, score) AS hour_score_corr
        FROM posts WHERE score > 0 GROUP BY subreddit
        """,
    )


def test_q13_weekly_summary(posts, oracle):
    assert_df_matches_sql(
        q.q13_weekly_summary(posts, as_of=F.lit(AS_OF)),
        oracle,
        f"""
        SELECT subreddit, COUNT(*) AS posts_this_week,
               AVG(score) AS avg_score, stddev_samp(score) AS score_std_dev,
               AVG(num_comments) AS avg_comments,
               COUNT(DISTINCT author) AS unique_authors
        FROM posts
        WHERE created_utc >= CAST(DATE '{AS_OF}' - 7 AS TIMESTAMP)
        GROUP BY subreddit
        """,
    )
    # the filter must actually cut something (14-day fixture span)
    total = posts.count()
    kept = q.q13_weekly_summary(posts, as_of=F.lit(AS_OF)).agg(
        F.sum("posts_this_week")
    ).first()[0]
    assert 0 < kept < total


def test_q14_oc_quality(posts, oracle):
    assert_df_matches_sql(
        q.q14_oc_quality(posts),
        oracle,
        """
        SELECT subreddit,
               AVG(CASE WHEN is_original_content THEN score ELSE NULL END) AS avg_oc_score,
               AVG(CASE WHEN NOT is_original_content THEN score ELSE NULL END) AS avg_non_oc_score,
               SUM(CASE WHEN is_original_content THEN 1 ELSE 0 END) * 100.0
                   / COUNT(*) AS oc_percentage
        FROM posts GROUP BY subreddit
        """,
    )


def test_q15_post_performance(posts, oracle):
    assert_df_matches_sql(
        q.q15_post_performance(posts),
        oracle,
        """
        SELECT *,
               CASE WHEN score >= 1000 THEN 'Viral'
                    WHEN score >= 100 THEN 'Popular'
                    WHEN score >= 10 THEN 'Good'
                    ELSE 'Low' END AS performance_tier,
               CAST(RANK() OVER (PARTITION BY subreddit ORDER BY score DESC)
                    AS BIGINT) AS rank_in_subreddit
        FROM posts
        """,
    )


def test_register_views_sql_path(spark, posts, comments):
    # the spark.sql ad-hoc path (SURVEY §3.3) resolves the views
    q.register_views(posts, comments)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM post_performance WHERE rank_in_subreddit = 1"
    ).first().n
    assert n >= 3  # >=1 per subreddit (ties kept by RANK)
