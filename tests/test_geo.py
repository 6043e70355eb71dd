"""grid_knn_join: brute-force equality (completeness + exactness of
the grid prune), the ±180 seam, the degenerate wide-radius tilings,
NULL handling, and the polar guard."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from reddit_etl_spark.operators.geo import (
    EARTH_RADIUS_KM,
    grid_knn_join,
    haversine_km,
)


def _points(n, seed, lat_lo=-60.0, lat_hi=60.0):
    rng = random.Random(seed)
    return [
        (i, rng.uniform(lat_lo, lat_hi), rng.uniform(-180.0, 180.0))
        for i in range(n)
    ]


def _brute(spark, left, right, radius_km, k):
    """The same result by exhaustive cross join — same engine, so the
    comparison is exact (no float-tolerance fudge)."""
    L = spark.createDataFrame(left, ["lid", "lat", "lon"])
    R = spark.createDataFrame(right, ["rid", "lat", "lon"])
    d = F.round(
        haversine_km(
            F.col("llat"), F.col("llon"), F.col("rlat"), F.col("rlon")
        ),
        6,
    )
    pairs = (
        L.select("lid", F.col("lat").alias("llat"), F.col("lon").alias("llon"))
        .crossJoin(
            R.select(
                "rid", F.col("lat").alias("rlat"), F.col("lon").alias("rlon")
            )
        )
        .select("lid", "rid", d.alias("distance_km"))
        .filter(F.col("distance_km") <= radius_km)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lid").orderBy("distance_km", "rid")
    out = pairs.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        out = out.filter(F.col("rank") <= k)
    return out


def _run(spark, left, right, radius_km, k, **kw):
    L = spark.createDataFrame(left, ["lid", "lat", "lon"])
    R = spark.createDataFrame(right, ["rid", "lat", "lon"])
    return grid_knn_join(
        L, R, "lid", "rid", radius_km=radius_km, k=k, **kw
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("radius,k", [(800.0, 3), (2500.0, None)])
def test_matches_brute_force(spark, radius, k):
    left = _points(60, seed=1)
    right = _points(80, seed=2)
    got = _rows(_run(spark, left, right, radius, k))
    want = _rows(_brute(spark, left, right, radius, k))
    assert got == want
    assert len(want) > 0  # non-vacuous


def test_seam_pair_found(spark):
    # two points 0.4 degrees of longitude apart ACROSS the ±180 seam
    left = [(1, 10.0, 179.8)]
    right = [(7, 10.0, -179.8), (8, 10.0, 170.0)]
    rows = _rows(_run(spark, left, right, 200.0, None))
    assert [r[:2] for r in rows] == [(1, 7)]
    # ~0.4 deg lon at lat 10: ~43.8 km
    assert rows[0][2] == pytest.approx(43.8, abs=1.0)


def test_wide_radius_degenerate_tilings(spark):
    # radius so large the lon tiling collapses to 1-2 cells: probe
    # offsets must deduplicate (no duplicate candidate pairs)
    left = _points(10, seed=3)
    right = _points(15, seed=4)
    out = _run(spark, left, right, 15000.0, None)
    pairs = [r[:2] for r in _rows(out)]
    assert len(pairs) == len(set(pairs))
    assert _rows(out) == _rows(_brute(spark, left, right, 15000.0, None))


def test_rank_orders_by_distance_then_id(spark):
    left = [(1, 0.0, 0.0)]
    # two right points at the SAME rounded distance (mirror images)
    right = [(9, 0.0, 1.0), (4, 0.0, -1.0), (5, 0.0, 2.0)]
    rows = _run(spark, left, right, 500.0, 3).orderBy("rank").collect()
    assert [r["rid"] for r in rows] == [4, 9, 5]
    assert rows[0]["distance_km"] == rows[1]["distance_km"]


def test_null_coordinates_excluded(spark):
    left = [(1, 0.0, 0.0), (2, None, 0.0)]
    right = [(7, 0.1, 0.1), (8, 0.2, None)]
    rows = _rows(_run(spark, left, right, 500.0, None))
    assert [r[:2] for r in rows] == [(1, 7)]


def test_polar_guard(spark):
    left = [(1, 89.9, 0.0)]
    right = [(7, 89.8, 10.0)]
    with pytest.raises(ValueError, match="polar"):
        _run(spark, left, right, 100.0, 1)


def test_haversine_known_value(spark):
    # quarter circumference: (0,0) to (0,90)
    df = spark.range(1).select(
        haversine_km(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0)).alias(
            "d"
        )
    )
    want = math.pi * EARTH_RADIUS_KM / 2
    assert df.collect()[0]["d"] == pytest.approx(want, rel=1e-12)


class TestPointInPolygonJoin:
    def _pts(self, spark, rows):
        return spark.createDataFrame(rows, "pid long, x long, y long")

    def test_square_inside_outside_boundary(self, spark):
        from reddit_etl_spark.operators.geo import point_in_polygon_join

        square = [("sq", [(0, 0), (10, 0), (10, 10), (0, 10)])]
        pts = self._pts(
            spark,
            [
                (1, 5, 5),     # inside
                (2, 15, 5),    # outside (right)
                (3, -1, 5),    # outside (left)
                (4, 10, 5),    # ON the right edge -> outside under the
                               # half-open crossing rule (deterministic)
                (5, 0, 5),     # ON the left edge -> inside (ray crosses
                               # the right edge only)
            ],
        )
        got = {
            r["pid"]
            for r in point_in_polygon_join(pts, "pid", "x", "y", square).collect()
        }
        assert got == {1, 5}

    def test_concave_polygon_notch(self, spark):
        from reddit_etl_spark.operators.geo import point_in_polygon_join

        # L-shape: the full 20x10 base plus the right 10x10 tower;
        # the (0..10)x(10..20) notch is OUTSIDE
        ell = [
            (
                "ell",
                [(0, 0), (20, 0), (20, 20), (10, 20), (10, 10), (0, 10)],
            )
        ]
        pts = self._pts(spark, [(1, 15, 15), (2, 5, 15), (3, 5, 5)])
        got = {
            r["pid"]
            for r in point_in_polygon_join(pts, "pid", "x", "y", ell).collect()
        }
        assert got == {1, 3}

    def test_multiple_polygons_and_validation(self, spark):
        import pytest as _p

        from reddit_etl_spark.operators.geo import point_in_polygon_join

        polys = [
            ("a", [(0, 0), (10, 0), (10, 10), (0, 10)]),
            ("b", [(5, 5), (15, 5), (15, 15), (5, 15)]),
        ]
        pts = self._pts(spark, [(1, 7, 7)])  # inside BOTH
        got = {
            (r["pid"], r["poly_id"])
            for r in point_in_polygon_join(pts, "pid", "x", "y", polys).collect()
        }
        assert got == {(1, "a"), (1, "b")}
        with _p.raises(ValueError):
            point_in_polygon_join(pts, "pid", "x", "y", [])
        with _p.raises(ValueError):
            point_in_polygon_join(pts, "pid", "x", "y", [("bad", [(0, 0)])])
