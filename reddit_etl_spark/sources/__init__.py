"""Sources: the Reddit ingestion connector surface (SURVEY §2.1)."""

from .reddit import (  # noqa: F401
    MockRedditSource,
    PrawRedditSource,
    RateLimiter,
    RedditSource,
    comments_df,
    posts_df,
)
