"""Pipeline orchestrator — the reference's ``run_pipeline`` control
flow (script.py:288-326) on Spark storage.

Stage order, empty-input short-circuits, the top-10-posts comment
fetch, and per-stage error containment all mirror the reference
(SURVEY §3.1):

    extract -> [empty guard] -> transform -> load posts
    -> top-10 by score -> fetch+load comments -> stats upsert

Divergences (documented): the per-subreddit driver loop collapses into
one call over many subreddits (their frames union before a single
write — one Spark job instead of N), and the stats upsert uses dynamic
partition overwrite instead of SQLite INSERT OR REPLACE (same
last-writer-wins semantics, sinks/writers.py).
"""

from __future__ import annotations

import logging
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks.writers import append_parquet
from .sources.reddit import RedditSource, comments_df, posts_df
from .stats import daily_subreddit_stats, write_subreddit_stats
from .transform import transform_posts

log = logging.getLogger(__name__)


@dataclass
class PipelineResult:
    subreddit: str
    posts_loaded: int = 0
    comments_loaded: int = 0
    stats_rows: int = 0
    errors: list[str] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    source: RedditSource,
    subreddits: Sequence[str],
    posts_path: str,
    comments_path: str,
    stats_path: str,
    posts_limit: int = 50,
    sort_type: str = "hot",
    top_n_for_comments: int = 10,
    comments_limit: int = 20,
    as_of: Column | None = None,
) -> list[PipelineResult]:
    """E→T→L for each subreddit + comments for its top posts + daily
    stats upsert. Errors are contained per subreddit (the reference's
    main() logs and moves on, script.py:351-353)."""
    results = []
    for sub in subreddits:
        res = PipelineResult(subreddit=sub)
        results.append(res)
        try:
            _run_one(
                spark, source, sub, res,
                posts_path, comments_path, stats_path,
                posts_limit, sort_type, top_n_for_comments, comments_limit,
                as_of,
            )
        except Exception as e:  # noqa: BLE001 - reference behavior
            log.exception("pipeline failed for r/%s", sub)
            res.errors.append(str(e))
    return results


def _run_one(
    spark: SparkSession,
    source: RedditSource,
    sub: str,
    res: PipelineResult,
    posts_path: str,
    comments_path: str,
    stats_path: str,
    posts_limit: int,
    sort_type: str,
    top_n: int,
    comments_limit: int,
    as_of: Column | None,
) -> None:
    records = source.fetch_posts(sub, limit=posts_limit, sort_type=sort_type)
    if not records:  # empty guard (script.py:296-298)
        log.warning("no posts extracted for r/%s", sub)
        return

    raw = posts_df(spark, records)
    transformed = transform_posts(raw)
    if transformed.isEmpty():  # empty guard (script.py:303-305)
        return
    transformed.persist()
    try:
        append_parquet(transformed, posts_path, partition_by=("subreddit",))
        res.posts_loaded = transformed.count()

        # comments for the top-N posts by score (script.py:311-315);
        # TakeOrderedAndProject, the nlargest analogue
        top_ids = [
            r.id
            for r in transformed.select("id", "score")
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(top_n)
            .collect()
        ]
        comment_records = []
        for pid in top_ids:
            comment_records.extend(
                source.fetch_comments(pid, limit=comments_limit)
            )
        if comment_records:
            cdf = comments_df(spark, comment_records)
            append_parquet(cdf, comments_path, partition_by=())
            res.comments_loaded = len(comment_records)

        # daily stats upsert (script.py:320, :259-286)
        stats = daily_subreddit_stats(transformed, as_of=as_of, subreddit=sub)
        write_subreddit_stats(stats, stats_path)
        res.stats_rows = stats.count()
    finally:
        transformed.unpersist()
