"""Engine facade — the switch-over API for a reference user.

The reference exposes three entry points (SURVEY §3): the ETL
pipeline, the embedded stats SQL, and the ad-hoc ``analysis.sql``
corpus. ``Engine`` packages the Spark-native equivalents behind one
object::

    eng = Engine(spark, posts_path="/lake/posts", comments_path="/lake/comments")
    eng.q09().show()                      # DataFrame builder path
    eng.analysis("q09").show()            # the analysis.sql port
    eng.sql("SELECT * FROM post_performance WHERE rank_in_subreddit = 1")
    eng.refresh_stats(stats_path, as_of)  # the keyed upsert

Tables load lazily from the lakehouse paths and register as the views
(posts, comments, post_performance) the SQL surface resolves against.
"""

from __future__ import annotations

import datetime as _dt
import functools

from pyspark.sql import Column, DataFrame, SparkSession

from . import queries as q
from .analysis_sql import ANALYSIS_QUERIES
from .schemas import COMMENTS_SCHEMA
from .stats import daily_subreddit_stats, write_subreddit_stats


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        posts_path: str,
        comments_path: str | None = None,
    ):
        self.spark = spark
        self._posts_path = posts_path
        self._comments_path = comments_path
        self._registered = False

    @functools.cached_property
    def posts(self) -> DataFrame:
        return self.spark.read.parquet(self._posts_path)

    @functools.cached_property
    def comments(self) -> DataFrame:
        if self._comments_path is None:
            raise ValueError("Engine built without a comments_path")
        return self.spark.read.parquet(self._comments_path)

    def _ensure_views(self) -> None:
        if not self._registered:
            comments = (
                self.comments
                if self._comments_path is not None
                else self.spark.createDataFrame([], COMMENTS_SCHEMA)
            )
            q.register_views(self.posts, comments)
            self._registered = True

    # --- the ad-hoc SQL path (SURVEY §3.3) ----------------------------
    def sql(self, statement: str) -> DataFrame:
        self._ensure_views()
        return self.spark.sql(statement)

    def analysis(self, name: str, as_of=None) -> DataFrame:
        """Run one of the ported analysis.sql queries (q01..q15).
        ``as_of`` is validated as a calendar date before it is spliced
        into the DATE literal — arbitrary strings never reach the SQL
        text."""
        self._ensure_views()
        stmt = ANALYSIS_QUERIES[name]
        if "{as_of}" in stmt:
            if as_of is None:
                raise ValueError(f"{name} needs an explicit as_of date")
            as_of_date = (
                as_of
                if isinstance(as_of, _dt.date)
                else _dt.date.fromisoformat(str(as_of))
            )
            stmt = stmt.format(as_of=as_of_date.isoformat())
        return self.spark.sql(stmt)

    # --- the stats path (SURVEY §3.2) ---------------------------------
    def refresh_stats(
        self, stats_path: str, as_of: Column | None = None,
        subreddit: str | None = None,
    ) -> None:
        stats = daily_subreddit_stats(self.posts, as_of=as_of, subreddit=subreddit)
        write_subreddit_stats(stats, stats_path)

    # --- DataFrame builders (SURVEY §2.11) ----------------------------
    def q01(self):
        return q.q01_subreddit_overview(self.posts)

    def q02(self):
        return q.q02_top_posts(self.posts)

    def q03(self):
        return q.q03_posts_by_hour(self.posts)

    def q04(self):
        return q.q04_posts_by_weekday(self.posts)

    def q05(self, limit: int = 20):
        return q.q05_active_authors(self.posts, limit)

    def q06(self):
        return q.q06_content_types(self.posts)

    def q07(self):
        return q.q07_engagement(self.posts)

    def q08(self):
        return q.q08_comment_rollup(self.posts, self.comments)

    def q09(self):
        return q.q09_top_commenters(self.posts, self.comments)

    def q10(self):
        return q.q10_daily_trends(self.posts)

    def q11(self):
        return q.q11_title_insights(self.posts)

    def q12(self):
        return q.q12_correlations(self.posts)

    def q13(self, as_of: Column | None = None):
        return q.q13_weekly_summary(self.posts, as_of)

    def q14(self):
        return q.q14_oc_quality(self.posts)

    def q15(self):
        return q.q15_post_performance(self.posts)

    # --- data quality (operators/dq.py over the reddit tables) --------
    def data_quality(self) -> DataFrame:
        """The standing expectations a production run of this pipeline
        asserts before publishing: key integrity on both tables, the
        transform's own invariants (upvote_ratio is a ratio, sentinel
        authors notwithstanding non-null), and the posts<-comments FK.
        Row-level checks fuse into one scan per table (dq.dq_report);
        returns the combined (check, violations, total) report."""
        from .operators import dq

        posts_report = dq.dq_report(
            self.posts,
            [
                dq.not_null("id"),
                dq.not_null("subreddit"),
                dq.unique(["id"]),
                dq.accepted_range("upvote_ratio", 0.0, 1.0),
            ],
        )
        comments_report = dq.dq_report(
            self.comments,
            [
                dq.not_null("id"),
                dq.unique(["id"]),
                dq.referential("post_id", self.posts, "id"),
            ],
        )
        return posts_report.unionByName(comments_report)
