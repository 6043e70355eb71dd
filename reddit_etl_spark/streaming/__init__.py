"""Structured Streaming extensions (SURVEY §2.9 — optional in the
reference, first-class here)."""

from .stats_stream import (  # noqa: F401
    stream_daily_subreddit_stats,
    windowed_event_rollup,
)
