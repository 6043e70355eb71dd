"""Transform-vs-pandas parity: the reference's transform engine IS
pandas (script.py:187-224), so the strongest possible oracle for the
Spark transform is the same pandas program run on the same input.

A dense grid (every score from -1500..1500, every hour, every weekday,
punctuation/unicode/NULL edge strings) beats sampling here — the bins
and conventions are exact small-domain functions."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from reddit_etl_spark.schemas import POSTS_RAW_SCHEMA
from reddit_etl_spark.transform import transform_posts

TITLES = [
    "plain title",
    "Hello, World! [2024]?",
    "ALL CAPS TITLE!!!",
    "  spaces  around  ",
    "unicode café naïve 日本語 title",
    "symbols @#$%^&*() everywhere",
    "tabs\tand\nnewlines",
    "",
    "?",
    "a_b_c_123",
]


def _grid_rows():
    rows = []
    i = 0
    for score in range(-1500, 1501, 7):  # hits every bin + edges
        i += 1
        created = dt.datetime(2025, 8, 1) + dt.timedelta(
            hours=i % (24 * 14)  # all hours x all weekdays
        )
        rows.append(
            (
                f"id{i}",
                TITLES[i % len(TITLES)],
                "u",
                "s",
                score,
                0.5,
                abs(score) % 37,
                created,
                None if i % 3 == 0 else ("" if i % 3 == 1 else "body"),
                "http://x",
                False, False, False, False, False,
            )
        )
    # pin the exact bin edges regardless of grid stride
    for j, score in enumerate([-1, 0, 1, 10, 11, 100, 101, 1000, 1001]):
        rows.append(
            (
                f"edge{j}", "t", "u", "s", score, 0.5, 5,
                dt.datetime(2025, 9, 1, 12), "x", "http://x",
                False, False, False, False, False,
            )
        )
    return rows


def _pandas_reference(rows) -> pd.DataFrame:
    """Verbatim re-execution of reference script.py:196-217 semantics."""
    cols = [f.name for f in POSTS_RAW_SCHEMA.fields]
    df = pd.DataFrame(rows, columns=cols)
    df["title_length"] = df["title"].str.len()
    df["selftext_length"] = df["selftext"].str.len()
    df["has_selftext"] = df["selftext_length"] > 0
    df["created_utc"] = pd.to_datetime(df["created_utc"])
    df["hour_posted"] = df["created_utc"].dt.hour
    df["day_of_week"] = df["created_utc"].dt.dayofweek
    df["engagement_rate"] = df["num_comments"] / (df["score"] + 1)
    df["score_category"] = pd.cut(
        df["score"],
        bins=[-float("inf"), 0, 10, 100, 1000, float("inf")],
        labels=["Negative", "Low", "Medium", "High", "Viral"],
    )
    df["title"] = df["title"].str.replace(r"[^\w\s]", "", regex=True).str.strip()
    df["selftext"] = df["selftext"].fillna("")
    return df


def test_transform_matches_pandas_reference(spark):
    rows = _grid_rows()
    got = (
        transform_posts(spark.createDataFrame(rows, POSTS_RAW_SCHEMA))
        .orderBy("id")
        .toPandas()
        .set_index("id")
    )
    want = _pandas_reference(rows).set_index("id")

    assert got["score_category"].fillna("∅").to_dict() == {
        k: (v if isinstance(v, str) else "∅")
        for k, v in want["score_category"].astype(object).to_dict().items()
    }
    for col in ("title_length", "hour_posted", "day_of_week", "has_selftext"):
        assert got[col].astype("int64").to_dict() == want[col].astype("int64").to_dict(), col
    # selftext_length: NULL stays NULL (pandas NaN)
    assert (
        got["selftext_length"].isna().to_dict()
        == want["selftext_length"].isna().to_dict()
    )
    # engagement: equal except score=-1, where pandas=inf and the
    # engine's documented semantic is NULL (SURVEY P6)
    minus1 = want["score"] == -1
    assert np.isinf(want.loc[minus1, "engagement_rate"]).all()
    assert got.loc[minus1.index[minus1], "engagement_rate"].isna().all()
    ok = ~minus1
    assert np.allclose(
        got.loc[ok.index[ok], "engagement_rate"].astype(float),
        want.loc[ok.index[ok], "engagement_rate"].astype(float),
    )
    # title cleaning incl. unicode \w fidelity
    assert got["title"].to_dict() == want["title"].to_dict()
    assert got["selftext"].to_dict() == want["selftext"].to_dict()


def test_weekday_matches_python_convention(spark):
    # every calendar day for 4 weeks: weekday() == F.weekday
    rows = [
        (f"d{i}", "t", "u", "s", 1, 0.5, 1,
         dt.datetime(2025, 8, 1) + dt.timedelta(days=i), "x", "u",
         False, False, False, False, False)
        for i in range(28)
    ]
    got = {
        r.id: r.day_of_week
        for r in transform_posts(
            spark.createDataFrame(rows, POSTS_RAW_SCHEMA)
        ).collect()
    }
    for i in range(28):
        assert got[f"d{i}"] == (dt.date(2025, 8, 1) + dt.timedelta(days=i)).weekday()
