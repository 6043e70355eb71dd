"""Jaro-Winkler record-linkage tests (dedup.jw_blocked_pairs).

The kernel's contract is bit-parity with DuckDB's
``jaro_winkler_similarity`` (the harness oracle): asserted on
randomized cross-checks including empty strings, plus the classic
textbook values. The blocked join's recall contract (only same-block
pairs compared) is asserted structurally.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from reddit_etl_spark.operators.dedup import _jaro_winkler, jw_blocked_pairs


def test_jw_matches_duckdb_randomized():
    rng = random.Random(0)
    cases = [("", ""), ("", "a"), ("abc", ""), ("abc", "abc")]
    cases += [
        (
            "".join(rng.choice("abcde") for _ in range(rng.randrange(0, 12))),
            "".join(rng.choice("abcde") for _ in range(rng.randrange(0, 12))),
        )
        for _ in range(2000)
    ]
    con = duckdb.connect()
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(_jaro_winkler(a, b) - want) < 1e-12, (a, b)


def test_jw_textbook_values():
    # MARTHA/MARHTA: jaro 0.944..., jw 0.961... (Winkler's own example)
    assert _jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert _jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-2)
    # empty strings are 0 even when equal (DuckDB semantics)
    assert _jaro_winkler("", "") == 0.0


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, name string")


def test_blocked_pairs_finds_same_block_matches(spark):
    rows = [
        ("1", "small ring"),
        ("2", "small rings"),
        ("3", "small plate"),
        ("4", "large ring"),
    ]
    got = {
        (r["id_a"], r["id_b"]): r["jw"]
        for r in jw_blocked_pairs(
            _df(spark, rows), "id", "name", threshold=0.9
        ).collect()
    }
    assert ("1", "2") in got and got[("1", "2")] >= 0.9
    # cross-block pair (small/large) never compared even though similar
    assert not any("4" in k for k in got)


def test_blocked_pairs_threshold_cut_uses_rounded_value(spark):
    rows = [("1", "small ring"), ("2", "small rod")]
    jw = round(_jaro_winkler("small ring", "small rod"), 6)
    at = jw_blocked_pairs(
        _df(spark, rows), "id", "name", threshold=jw
    ).collect()
    above = jw_blocked_pairs(
        _df(spark, rows), "id", "name", threshold=jw + 1e-6
    ).collect()
    assert len(at) == 1 and len(above) == 0


def test_blocked_pairs_custom_block_col(spark):
    rows = [("1", "alpha beta"), ("2", "alphq beta")]
    # first-token blocking separates them; a length-based block joins
    got = jw_blocked_pairs(
        _df(spark, rows), "id", "name", threshold=0.8
    ).collect()
    assert got == []
    got2 = jw_blocked_pairs(
        _df(spark, rows),
        "id",
        "name",
        threshold=0.8,
        block_col=F.length("name"),
    ).collect()
    assert len(got2) == 1
