"""Geospatial: WKT parsing, point-in-polygon (holes, multi), areas, zonal
stats math, fragmentation metrics."""

import math

import numpy as np
import pandas as pd
import pytest

from niamoto_spark.operators import geospatial as geo


def test_parse_polygon_with_hole():
    rings = geo.parse_polygon_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert len(rings) == 2 and rings[0].shape == (5, 2)


def test_points_in_polygons_with_hole(spark):
    shapes = spark.createDataFrame(
        [("sq", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")],
        "shape_id string, wkt string")
    pts = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 2, 3],
        "geo_pt": ["POINT (3 3)",       # inside
                   "POINT (1.5 1.5)",   # in the hole -> outside
                   "POINT (9 9)"],      # far outside
    }))
    out = geo.points_in_polygons(pts, "geo_pt", shapes, "shape_id", "wkt")
    assert [r["pid"] for r in out.collect()] == [1]


def test_points_in_multipolygon(spark):
    shapes = spark.createDataFrame(
        [("mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
                "((10 10, 11 10, 11 11, 10 11, 10 10)))")],
        "shape_id string, wkt string")
    pts = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 2, 3],
         "geo_pt": ["POINT (0.5 0.5)", "POINT (10.5 10.5)", "POINT (5 5)"]}))
    out = geo.points_in_polygons(pts, "geo_pt", shapes, "shape_id", "wkt")
    assert {r["pid"] for r in out.collect()} == {1, 2}


def test_ring_area_one_degree_box():
    # 1x1 degree box at the equator ~ (111.19 km)^2
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    area = geo.ring_area_m2(ring)
    expect = (math.radians(1) * 6371008.8) ** 2 * math.cos(math.radians(0.5))
    assert area == pytest.approx(expect, rel=0.01)


def test_polygon_area_subtracts_holes(spark):
    shapes = spark.createDataFrame(
        [("a", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
         ("b", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
               "(0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))")],
        "shape_id string, wkt string")
    out = {r["shape_id"]: r["area_m2"]
           for r in geo.polygon_area(shapes, "wkt").collect()}
    assert out["b"] == pytest.approx(out["a"] * 0.75, rel=1e-6)


def test_zonal_stats_from_arrays(spark):
    vals = list(range(1, 11)) + [5, 5]  # majority 5, minority others
    df = spark.createDataFrame(pd.DataFrame(
        {"zone": ["z"] * len(vals), "value": [float(v) for v in vals]}))
    r = geo.zonal_stats_from_arrays(df, ["zone"]).collect()[0]
    assert r["min"] == 1.0 and r["max"] == 10.0 and r["count"] == 12
    assert r["majority"] == 5.0 and r["range"] == 9.0
    assert r["unique"] == 10
    # population semantics, matching raster_stats' np.std (ddof=0) so the
    # two zonal paths agree (ADVICE r2)
    arr = np.array(vals, dtype=float)
    assert r["std"] == round(float(arr.std()), 2)
    assert r["variance"] == round(float(arr.var()), 2)


def test_fragmentation_meff(spark):
    patches = spark.createDataFrame(pd.DataFrame(
        {"zone": ["z", "z", "z"], "area_m2": [100.0, 200.0, 700.0]}))
    r = geo.fragmentation_analysis(patches, ["zone"]).collect()[0]
    assert r["patch_count"] == 3
    assert r["total_area"] == 1000.0
    assert r["meff"] == round((100**2 + 200**2 + 700**2) / 1000.0, 2)
    assert r["largest_patch_index"] == 70.0


def test_raster_stats_rejects_unknown_stats(spark):
    # raster_stats is real since round 2 (tests/test_raster.py covers the
    # numeric parity); config validation still fails fast
    df = spark.createDataFrame([(1, "POLYGON ((0 0, 0 1, 1 1, 0 0))")],
                               "zone_id int, geom string")
    with pytest.raises(ValueError, match="unknown raster stats"):
        geo.raster_stats(df, "zone_id", "geom", "/nonexistent.tif",
                         stats=["min", "bogus"])
    with pytest.raises(ValueError, match="area_unit"):
        geo.raster_stats(df, "zone_id", "geom", "/nonexistent.tif",
                         area_unit="acres")
