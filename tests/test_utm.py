"""UTM auto-zone projection (operators/utm.py) — VERDICT r2 missing #4.

Validation strategy without pyproj: the Snyder series is pinned by
(a) forward∘inverse round-trip at millimeter level across latitudes,
(b) the defining k0=0.9996 scale at the central meridian, and
(c) small-patch areas matching the local ellipsoidal curvature product
    times k0² — three independent properties a formula typo would break."""

import numpy as np
import pandas as pd
import pytest

from niamoto_spark.operators import utm

_A, _E2 = 6378137.0, 0.00669437999014


def test_roundtrip_millimeter_accuracy():
    rng = np.random.RandomState(1)
    lons = rng.uniform(-179, 179, 300)
    lats = rng.uniform(-80, 80, 300)
    for lon, lat in zip(lons, lats):
        z, _ = utm.utm_zone(lon, lat)
        x, y = utm.utm_forward(lon, lat, z)
        lon2, lat2 = utm.utm_inverse(x, y, z)
        assert abs(float(lon2) - lon) < 1e-7
        assert abs(float(lat2) - lat) < 1e-7


def test_central_meridian_scale_is_k0():
    lat = -21.5
    x1, y1 = utm.utm_forward(165.0, lat, 58)        # zone 58 CM = 165E
    x2, y2 = utm.utm_forward(165.0, lat + 0.001, 58)
    rm = _A * (1 - _E2) / (1 - _E2 * np.sin(np.radians(lat)) ** 2) ** 1.5
    scale = float(y2 - y1) / (rm * np.radians(0.001))
    assert scale == pytest.approx(0.9996, abs=1e-6)
    assert float(x1) == pytest.approx(500000.0, abs=1e-6)  # false easting


def test_zone_selection_matches_reference_formula():
    assert utm.utm_zone(165.5, -21.5) == (58, True)   # New Caledonia
    assert utm.utm_zone(-0.1, 51.5) == (30, False)    # London
    assert utm.utm_zone(2.3, 48.8) == (31, False)     # Paris


def test_small_patch_area_matches_ellipsoidal_curvature():
    lon0, lat0, d = 165.5, -21.5, 0.1
    ring = np.array([[lon0, lat0], [lon0 + d, lat0], [lon0 + d, lat0 + d],
                     [lon0, lat0 + d], [lon0, lat0]])
    a_utm = utm.ring_area_utm(ring)
    latm = np.radians(lat0 + d / 2)
    rn = _A / np.sqrt(1 - _E2 * np.sin(latm) ** 2)
    rm = _A * (1 - _E2) / (1 - _E2 * np.sin(latm) ** 2) ** 1.5
    a_ell = (rm * np.radians(d)) * (rn * np.cos(latm) * np.radians(d))
    # conformal scale ~k0 near CM -> area ratio ~k0^2 = 0.99920
    assert a_utm / a_ell == pytest.approx(0.9996 ** 2, abs=5e-4)


def test_polygon_area_utm_operator(spark):
    shapes = spark.createDataFrame(
        [("nc", "POLYGON ((165.0 -22.0, 165.5 -22.0, 165.5 -21.5, "
                 "165.0 -21.5, 165.0 -22.0))"),
         ("hole", "POLYGON ((165.0 -22.0, 165.4 -22.0, 165.4 -21.6, "
                  "165.0 -21.6, 165.0 -22.0), "
                  "(165.1 -21.9, 165.2 -21.9, 165.2 -21.8, 165.1 -21.8, "
                  "165.1 -21.9))")],
        "shape_id string, wkt string")
    out = {r["shape_id"]: r["area_m2"] for r in
           utm.polygon_area_utm(shapes, "wkt").collect()}
    # 0.5 deg lon x 0.5 deg lat at -21.75: ~51.7km x ~55.3km
    assert out["nc"] == pytest.approx(2.86e9, rel=0.01)
    # vs the equirectangular path: same order, <1% apart at NC latitude
    from niamoto_spark.operators.geospatial import polygon_area

    eq = {r["shape_id"]: r["area_m2"] for r in
          polygon_area(shapes, "wkt").collect()}
    assert out["nc"] == pytest.approx(eq["nc"], rel=0.01)
    # hole subtracted in the same zone
    assert out["hole"] < out["nc"]


def test_adaptive_tolerance_reference_formula():
    assert utm._adaptive_tolerance_m(999e6) == 5.0
    assert utm._adaptive_tolerance_m(1000e6) == 5.0
    assert utm._adaptive_tolerance_m(4000e6) == pytest.approx(14.142, abs=0.01)
    assert utm._adaptive_tolerance_m(16000e6) == pytest.approx(20.0, abs=0.01)


def test_simplify_wkt_utm_metric_tolerance(spark):
    # a 0.2-deg square with 50 collinear points per edge; 100 m tolerance
    # must collapse it to the 4 corners (+closure) with sub-meter drift
    t = np.linspace(0, 0.2, 51)
    edge = [(165.0 + v, -22.0) for v in t[:-1]] \
        + [(165.2, -22.0 + v) for v in t[:-1]] \
        + [(165.2 - v, -21.8) for v in t[:-1]] \
        + [(165.0, -21.8 - v + 0.0) for v in t[:-1]] + [(165.0, -22.0)]
    wkt = "POLYGON ((" + ", ".join(f"{x:.10f} {y:.10f}" for x, y in edge) + "))"
    df = spark.createDataFrame([("s", wkt)], "shape_id string, location string")
    r = utm.simplify_wkt_utm(df, "location", tolerance_m=100.0).collect()[0]
    assert r["n_points_before"] == 201
    assert r["n_points_after"] <= 6
    assert r["tolerance_m"] == 100.0
    # round-tripped corners stay within ~1e-6 deg of the originals
    from niamoto_spark.operators.geospatial import parse_polygon_wkt

    ring = parse_polygon_wkt(r["simplified_wkt"])[0]
    assert np.min(np.abs(ring[:, 0] - 165.0)) < 1e-6
    assert np.min(np.abs(ring[:, 1] + 22.0)) < 1e-6


def test_simplify_wkt_utm_adaptive_default(spark):
    # big shape (>1000 km^2) gets the adaptive tolerance, not the 5 m floor
    df = spark.createDataFrame(
        [("big", "POLYGON ((164.0 -22.0, 165.0 -22.0, 165.0 -21.0, "
                 "164.0 -21.0, 164.0 -22.0))")],
        "shape_id string, location string")
    r = utm.simplify_wkt_utm(df, "location").collect()[0]
    assert r["tolerance_m"] > 5.0
