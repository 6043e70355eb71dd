"""Golden-output test (FIXTURES §A4): q09 over the committed fixture
must byte-match tests/golden_q09.csv — the engine's analogue of the
reference's committed example.csv (its only input->output pair).

Pins cross-version determinism: any change to the fixture generator,
the transform, or q09 semantics shows up as a diff here."""

from __future__ import annotations

import csv
from pathlib import Path

from pyspark.sql import functions as F

from reddit_etl_spark import queries as q

GOLDEN = Path(__file__).parent / "golden_q09.csv"


def test_q09_matches_golden_csv(posts, comments):
    df = q.q09_top_commenters(posts, comments).orderBy(
        "subreddit", F.desc("comment_count"), "author"
    )
    got = [
        (r.subreddit, r.author, str(r.comment_count), f"{r.avg_comment_score:.9g}")
        for r in df.collect()
    ]
    with open(GOLDEN, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        want = [tuple(row) for row in reader]
    assert header == [
        "subreddit", "author", "comment_count", "avg_comment_score"
    ]
    assert got == want
    # shape parity with the reference's example.csv: heavy commenters
    # above the HAVING floor, sorted subreddit asc then count desc
    assert all(int(r[2]) >= 3 for r in got)
