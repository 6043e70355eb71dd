"""Unit tests for tools/boundary_audit.py's SQL-stripping and
distance logic — the parsing is load-bearing: a mis-stripped
intermediate ROUND would make the audit measure a different pipeline
than the one the driver hashes."""

from __future__ import annotations

import importlib.util
import math
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "boundary_audit",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "boundary_audit.py",
    ),
)
ba = importlib.util.module_from_spec(_spec)
sys.modules["boundary_audit"] = ba
_spec.loader.exec_module(ba)


def test_strips_only_final_select_rounds():
    sql = """
    WITH unit AS (
      SELECT k, ROUND(SUM(x), 6) AS y FROM t GROUP BY k)
    SELECT k, ROUND(y / 2.0, 6) AS half FROM unit
    """
    out, n = ba.strip_final_round6(sql)
    assert n == 1
    # the CTE's ROUND (query semantics) survives
    assert "ROUND(SUM(x), 6)" in out
    # the final projection's ROUND is gone, expression kept
    assert "(y / 2.0) AS half" in out


def test_strips_nested_and_case_rounds():
    sql = "SELECT ROUND(CASE WHEN ok THEN ROUND(a, 6) / b END, 6) AS v FROM t"
    out, n = ba.strip_final_round6(sql)
    assert n == 2  # outer and the nested one are both in the final SELECT
    assert "ROUND" not in out


def test_leaves_other_digit_rounds():
    sql = "SELECT ROUND(a, 2) AS v, ROUND(b, 6) AS w FROM t"
    out, n = ba.strip_final_round6(sql)
    assert n == 1
    assert "ROUND(a, 2)" in out and "(b) AS w" in out


def test_subquery_in_final_from_is_fair_game():
    # ROUNDs after the last depth-0 SELECT are stripped even inside a
    # FROM subquery — documented audit-tool behavior (reviewed by hand)
    sql = "SELECT v FROM (SELECT ROUND(x, 6) AS v FROM t)"
    out, n = ba.strip_final_round6(sql)
    assert n == 1 and "(x) AS v" in out


def test_boundary_dist_exact_and_near():
    # exactly on a k+.5 micro boundary
    dv, du = ba.boundary_dist(40.0546875)
    assert dv == 0.0
    # far from any boundary
    dv2, du2 = ba.boundary_dist(0.1)
    assert dv2 > 1e-8 and du2 > 1e6
    # magnitude cutoff: grid below double resolution
    assert ba.boundary_dist(1e12) is None


def test_boundary_dist_ulps_scale():
    v = math.nextafter(0.1623655, math.inf)  # 1 ulp past an exact .5
    dv, du = ba.boundary_dist(v)
    assert 0 < du < 4
