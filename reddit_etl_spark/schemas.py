"""Explicit schemas — the engine never infers.

The reference declares fixed DDL up front (script.py:40-110,
``CREATE TABLE IF NOT EXISTS``) and appends by column-name match; the
Spark-native equivalent is explicit ``StructType`` constants used for
every ``createDataFrame`` / read.

Type mapping (SURVEY §1.2): TEXT->String, INTEGER->Long, REAL->Double,
BOOLEAN->Boolean, TIMESTAMP->Timestamp, DATE->Date.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dt, nullable: bool = True) -> StructField:
    return StructField(name, dt, nullable)


#: Shape of extraction output (reference script.py:131-147) BEFORE the
#: transform stage adds derived columns.
POSTS_RAW_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("title", StringType()),
        _f("author", StringType()),          # '[deleted]' sentinel, never NULL
        _f("subreddit", StringType()),
        _f("score", LongType()),
        _f("upvote_ratio", DoubleType()),
        _f("num_comments", LongType()),
        _f("created_utc", TimestampType()),  # epoch->ts at extraction (P11)
        _f("selftext", StringType()),        # may be NULL before transform
        _f("url", StringType()),
        _f("is_video", BooleanType()),
        _f("is_original_content", BooleanType()),
        _f("over_18", BooleanType()),
        _f("stickied", BooleanType()),
        _f("locked", BooleanType()),
    ]
)

#: posts table after transform — reference DDL script.py:47-73 (23 cols).
POSTS_SCHEMA = StructType(
    list(POSTS_RAW_SCHEMA.fields)
    + [
        _f("title_length", LongType()),
        _f("selftext_length", LongType()),   # NULL when selftext was NULL (P2)
        _f("has_selftext", BooleanType()),
        _f("hour_posted", LongType()),
        _f("day_of_week", LongType()),       # Monday=0 .. Sunday=6 (P5)
        _f("engagement_rate", DoubleType()),
        _f("score_category", StringType()),
        _f("extracted_at", TimestampType()),
    ]
)

#: comments table — reference DDL script.py:76-89 (9 cols, FK post_id).
COMMENTS_SCHEMA = StructType(
    [
        _f("id", StringType(), False),
        _f("post_id", StringType()),
        _f("author", StringType()),
        _f("body", StringType()),
        _f("score", LongType()),
        _f("created_utc", TimestampType()),
        _f("parent_id", StringType()),
        _f("is_submitter", BooleanType()),
        _f("extracted_at", TimestampType()),
    ]
)

#: subreddit_stats — reference DDL script.py:92-102, composite PK
#: (subreddit, date) maintained by INSERT OR REPLACE (script.py:265).
SUBREDDIT_STATS_SCHEMA = StructType(
    [
        _f("subreddit", StringType(), False),
        _f("date", DateType(), False),
        _f("total_posts", LongType()),
        _f("avg_score", DoubleType()),
        _f("avg_comments", DoubleType()),
        _f("top_post_score", LongType()),
    ]
)

#: Multimodal asset table (engine extension, no reference analogue):
#: opaque binary payload + typed metadata. Decode runs in mapInPandas.
MEDIA_SCHEMA = StructType(
    [
        _f("asset_id", StringType(), False),
        _f("media_type", StringType()),      # 'image' | 'audio' | 'video'
        _f("payload", BinaryType()),
        _f("mime", StringType()),
        _f("width", LongType()),
        _f("height", LongType()),
        _f("duration_ms", LongType()),
    ]
)
