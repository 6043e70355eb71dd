"""Sources: the Reddit ingestion connector surface (SURVEY §2.1) plus
the raw-corpus landing formats (JSONL with dead-letter split)."""

from .jsonl import read_jsonl, write_jsonl  # noqa: F401
from .reddit import (  # noqa: F401
    MockRedditSource,
    PrawRedditSource,
    RateLimiter,
    RedditSource,
    comments_df,
    posts_df,
)
