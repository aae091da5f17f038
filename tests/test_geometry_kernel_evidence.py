"""Independent evidence for the shared geometry kernels (VERDICT r13
next-#3).

The refdiff geography differential routes the reference's
shapely/pyproj/topojson calls through THIS engine's kernels
(tools/refdiff/shims.py), so a kernel bug would make both engines wrong
identically and stay invisible to the grid.  These tests pin the
kernels against their public mathematical DEFINITIONS instead of
against themselves:

- the transverse-Mercator meridian northing against a numerical
  quadrature of the ellipsoidal meridian-radius integral (the quantity
  the Snyder M-series approximates);
- conformality (the defining property of any Mercator projection):
  the numerically-differentiated Jacobian must be a scaled rotation
  everywhere in the zone;
- quad areas against the closed-form ellipsoidal (authalic) area
  integral, with the k0 area scale;
- Douglas-Peucker against its defining property: every DROPPED vertex
  lies within tolerance of the simplified chain;
- the TopoJSON encoding against the published spec's decode semantics,
  re-derived inline (translate + scale * cumulative deltas), not the
  repo's own decoder.

A typo in any series coefficient, an x/y asymmetry, or a wrong
quantization/delta step breaks one of these without any reference
output to compare against.
"""

import json

import numpy as np
import pytest

from niamoto_spark.operators import utm

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_K0 = 0.9996


def _meridian_radius(phi):
    return _A * (1 - _E2) / (1 - _E2 * np.sin(phi) ** 2) ** 1.5


def _meridian_arc_quadrature(lat_deg, n=200_001):
    """Arc length of the meridian from the equator to ``lat_deg`` by
    composite Simpson over M(phi) — no series, just the definition."""
    phi = np.linspace(0.0, np.radians(lat_deg), n)
    m = _meridian_radius(phi)
    h = phi[1] - phi[0]
    return float(h / 3 * (m[0] + m[-1] + 4 * m[1:-1:2].sum()
                          + 2 * m[2:-2:2].sum()))


@pytest.mark.parametrize("lat", [-70.0, -45.0, -22.2, -1.0, 3.0, 37.5,
                                 60.0, 78.0])
def test_meridian_northing_equals_k0_times_arc_integral(lat):
    """On the central meridian the TM northing IS k0 times the meridian
    arc from the equator — the definition the M-series approximates.
    Quadrature is independent of every series coefficient; agreement to
    sub-millimeter across latitudes pins all four M terms."""
    x, y = utm.utm_forward(165.0, lat, 58)  # zone 58 CM = 165E
    arc = _meridian_arc_quadrature(lat)
    assert float(x) == pytest.approx(500000.0, abs=1e-6)
    assert float(y) == pytest.approx(_K0 * arc, abs=1e-3)


def test_forward_is_conformal_everywhere_in_zone():
    """Transverse Mercator is CONFORMAL by definition: the differential
    of (lon, lat) -> (x, y), expressed over locally-metric geographic
    displacements (N cos(phi) dlam, M dphi — closed-form ellipsoid
    radii, no projection math), must be a scaled ROTATION: orthogonal
    columns of equal norm.  An error in any x-series term that is not
    mirrored in the y-series (or vice versa) shears the Jacobian."""
    rng = np.random.RandomState(7)
    lons = rng.uniform(162.1, 167.9, 60)   # across zone 58
    lats = rng.uniform(-75, 75, 60)
    h = 1e-6  # degrees
    for lon, lat in zip(lons, lats):
        x0, y0 = utm.utm_forward(lon, lat, 58)
        xe, ye = utm.utm_forward(lon + h, lat, 58)
        xn, yn = utm.utm_forward(lon, lat + h, 58)
        phi = np.radians(lat)
        n_rad = _A / np.sqrt(1 - _E2 * np.sin(phi) ** 2)
        de = n_rad * np.cos(phi) * np.radians(h)  # true east meters
        dn = _meridian_radius(phi) * np.radians(h)  # true north meters
        # Jacobian columns over metric displacements
        j = np.array([[(xe - x0) / de, (xn - x0) / dn],
                      [(ye - y0) / de, (yn - y0) / dn]], dtype=float)
        ja, jb = j[:, 0], j[:, 1]
        na, nb = np.linalg.norm(ja), np.linalg.norm(jb)
        # equal singular values (isotropic scale) and orthogonality
        assert na == pytest.approx(nb, rel=1e-5), (lon, lat)
        assert abs(float(np.dot(ja, jb))) < 1e-5 * na * nb, (lon, lat)
        # scale near k0 (grows slowly off-meridian, < ~1.001 in-zone)
        assert 0.9994 < na < 1.0012, (lon, lat)


def _authalic_quad_area(lon0, lon1, lat0, lat1):
    """EXACT ellipsoidal area of a lon/lat quadrangle — the standard
    closed-form integral of the area element
    M(phi) N(phi) cos(phi) dphi dlam (public formula; antiderivative
    via the authalic-latitude q-function)."""
    e = np.sqrt(_E2)

    def q(lat):
        s = np.sin(np.radians(lat))
        return (s / (1 - _E2 * s ** 2)
                + np.log((1 + e * s) / (1 - e * s)) / (2 * e))

    return (_A ** 2 * (1 - _E2) / 2 * np.radians(lon1 - lon0)
            * (q(lat1) - q(lat0)))


@pytest.mark.parametrize("lat0,d", [(-22.3, 0.1), (-45.0, 0.2),
                                    (3.0, 0.15), (55.0, 0.1)])
def test_quad_area_matches_closed_form_ellipsoidal_area(lat0, d):
    """ring_area_utm of a small lon/lat box on the central meridian
    must equal the closed-form ellipsoidal area times k0^2 (conformal
    area scale at the meridian).  Unlike the curvature-product check in
    test_utm.py this uses the EXACT integral, so it also covers the
    latitude variation of the area element across the box."""
    lon0 = 165.0 - d / 2  # centered on zone 58's CM
    ring = np.array([[lon0, lat0], [lon0 + d, lat0],
                     [lon0 + d, lat0 + d], [lon0, lat0 + d],
                     [lon0, lat0]])
    a_utm = utm.ring_area_utm(ring, zone=58)
    a_ell = _authalic_quad_area(lon0, lon0 + d, lat0, lat0 + d)
    assert a_utm / a_ell == pytest.approx(_K0 ** 2, rel=2e-6)


def _point_segment_dist(p, a, b):
    ab = b - a
    t = np.clip(np.dot(p - a, ab) / max(np.dot(ab, ab), 1e-300), 0, 1)
    return float(np.linalg.norm(p - (a + t * ab)))


def test_douglas_peucker_defining_property():
    """Every vertex the simplifier DROPS must lie within tolerance of
    the simplified chain, endpoints are preserved, and kept vertices
    are a subsequence of the input — the algorithm's definition, so no
    reference output is needed.  Random wiggly rings, many tolerances."""
    from niamoto_spark.operators.overlay import douglas_peucker

    rng = np.random.RandomState(11)
    for trial in range(20):
        n = int(rng.randint(12, 80))
        theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
        r = 1000.0 + rng.uniform(-60, 60, n)
        ring = np.c_[r * np.cos(theta), r * np.sin(theta)]
        ring = np.vstack([ring, ring[:1]])
        for tol in (5.0, 25.0, 80.0):
            simp = douglas_peucker(ring, tol)
            # endpoints preserved
            assert np.allclose(simp[0], ring[0])
            assert np.allclose(simp[-1], ring[-1])
            # kept points are input points, in order
            idx, last = [], -1
            for p in simp:
                matches = np.where((ring == p).all(axis=1))[0]
                matches = matches[matches > last]
                assert len(matches), "simplified point not in input"
                last = int(matches[0])
                idx.append(last)
            # the defining guarantee: dropped points within tolerance
            # of the simplified chain segment that replaced them
            for s_i, (i0, i1) in enumerate(zip(idx, idx[1:])):
                a, b = simp[s_i], simp[s_i + 1]
                for j in range(i0 + 1, i1):
                    assert _point_segment_dist(ring[j], a, b) <= tol + 1e-9


def test_topojson_encoding_decodes_per_public_spec():
    """Decode nested_to_topojson's output with the PUBLISHED spec
    semantics re-derived inline — position k of an arc is
    translate + scale * (sum of deltas[0..k]) — and require the result
    to reproduce the input within quantization resolution.  Uses no
    repo decode helper, so an encoder that deviated from the spec (but
    round-tripped against its own decoder) fails here."""
    from niamoto_spark.operators.overlay import nested_to_topojson

    ring = [(166.402, -22.201), (166.471, -22.198), (166.455, -22.143),
            (166.413, -22.157), (166.402, -22.201)]
    hole = [(166.43, -22.19), (166.44, -22.19), (166.44, -22.18),
            (166.43, -22.18), (166.43, -22.19)]
    topo = nested_to_topojson("Polygon", [[ring, hole]],
                              quantization=10_000)
    topo = json.loads(json.dumps(topo))  # must be JSON-serializable

    assert topo["type"] == "Topology"
    sx, sy = topo["transform"]["scale"]
    tx, ty = topo["transform"]["translate"]
    obj = topo["objects"]["shape"]
    assert obj["type"] == "Polygon"

    def decode_arc(arc):
        pts, x, y = [], 0, 0
        for dx, dy in arc:  # spec: delta-encoded, first is absolute
            x += dx
            y += dy
            pts.append((tx + sx * x, ty + sy * y))
        return pts

    arcs = [decode_arc(topo["arcs"][i]) for i in obj["arcs"]]
    # quantization resolution = one grid step in either axis
    res = max(sx, sy) + 1e-15
    for got, want in zip(arcs, ([ring, hole])):
        assert len(got) == len(want)
        for (gx, gy), (wx, wy) in zip(got, want):
            assert abs(gx - wx) <= res and abs(gy - wy) <= res
    # bbox per spec: [minx, miny, maxx, maxy] of the input
    allpts = ring + hole
    assert topo["bbox"] == [min(p[0] for p in allpts),
                            min(p[1] for p in allpts),
                            max(p[0] for p in allpts),
                            max(p[1] for p in allpts)]
