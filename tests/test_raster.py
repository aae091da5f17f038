"""Pure-numpy GeoTIFF IO + real zonal statistics (reference
raster_stats.py parity: 16-stat list incl histogram + area)."""

import struct
import zlib

import numpy as np
import pytest

from niamoto_spark.operators import geospatial
from niamoto_spark.sources.raster import (Raster, read_geotiff,
                                          write_geotiff)


def _demo_grid(h=30, w=40):
    r, c = np.mgrid[0:h, 0:w]
    return ((c * 7 + r * 13) % 97).astype(np.int32)


@pytest.mark.parametrize("dtype,compress", [
    (np.int32, False), (np.int32, True),
    (np.float64, False), (np.float32, True), (np.uint8, False),
])
def test_geotiff_roundtrip(tmp_path, dtype, compress):
    data = _demo_grid().astype(dtype)
    path = str(tmp_path / "r.tif")
    write_geotiff(path, data, x0=100.0, y0=50.0, dx=0.5, dy=-0.5,
                  nodata=-1.0, compress=compress)
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.data, data)
    assert (r.x0, r.y0, r.dx, r.dy) == (100.0, 50.0, 0.5, -0.5)
    assert r.nodata == -1.0


def test_geotiff_big_endian_strip(tmp_path):
    """Hand-built big-endian TIFF exercises the MM byte-order path."""
    data = np.arange(6, dtype=">i2").reshape(2, 3)
    payload = data.tobytes()
    entries = [
        (256, 3, 1, struct.pack(">H", 3) + b"\x00\x00"),
        (257, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
        (258, 3, 1, struct.pack(">H", 16) + b"\x00\x00"),
        (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (273, 4, 1, None),  # patched
        (277, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (278, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
        (279, 4, 1, struct.pack(">I", len(payload))),
        (339, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = b"MM" + struct.pack(">HI", 42, ifd_off)
    out += struct.pack(">H", len(entries))
    for tag, ttype, count, raw in entries:
        if raw is None:
            raw = struct.pack(">I", data_off)
        out += struct.pack(">HHI", tag, ttype, count) + raw
    out += struct.pack(">I", 0) + payload
    path = str(tmp_path / "be.tif")
    with open(path, "wb") as f:
        f.write(out)
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.data, np.arange(6).reshape(2, 3))


def test_geotiff_tiled_deflate(tmp_path):
    """Hand-built 4x4-tiled deflate TIFF exercises the tile assembly path."""
    data = np.arange(64, dtype="<i4").reshape(8, 8)
    tiles = [data[r:r + 4, c:c + 4] for r in (0, 4) for c in (0, 4)]
    blobs = [zlib.compress(t.tobytes()) for t in tiles]
    entries = [
        (256, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        (257, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        (258, 3, 1, struct.pack("<H", 32) + b"\x00\x00"),
        (259, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        (277, 3, 1, struct.pack("<H", 1) + b"\x00\x00"),
        (322, 3, 1, struct.pack("<H", 4) + b"\x00\x00"),
        (323, 3, 1, struct.pack("<H", 4) + b"\x00\x00"),
        (324, 4, 4, None),   # offsets blob
        (325, 4, 4, None),   # counts blob
        (339, 3, 1, struct.pack("<H", 2) + b"\x00\x00"),
    ]
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * len(entries) + 4
    offsets_blob_off = after_ifd
    counts_blob_off = offsets_blob_off + 16
    tile_start = counts_blob_off + 16
    offs, cur = [], tile_start
    for b in blobs:
        offs.append(cur)
        cur += len(b)
    out = b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(entries))
    for tag, ttype, count, raw in entries:
        if tag == 324:
            raw = struct.pack("<I", offsets_blob_off)
        elif tag == 325:
            raw = struct.pack("<I", counts_blob_off)
        out += struct.pack("<HHI", tag, ttype, count) + raw
    out += struct.pack("<I", 0)
    out += struct.pack("<4I", *offs)
    out += struct.pack("<4I", *[len(b) for b in blobs])
    out += b"".join(blobs)
    path = str(tmp_path / "tiled.tif")
    with open(path, "wb") as f:
        f.write(out)
    r = read_geotiff(path)
    np.testing.assert_array_equal(r.data, data)


def test_window_and_centers():
    r = Raster(_demo_grid(), 100.0, 50.0, 0.5, -0.5)
    r0, r1, c0, c1 = r.window_for_bounds(101.0, 43.0, 104.0, 48.0)
    assert c0 == 2 and c1 == 8          # x 101..104 -> cols 2..8
    assert r0 == 4 and r1 == 14         # y 48..43 -> rows 4..14
    xs, ys = r.pixel_centers(r0, r1, c0, c1)
    assert xs[0, 0] == 101.25 and ys[0, 0] == 47.75


def test_raster_stats_matches_numpy(tmp_path, spark):
    import pandas as pd

    data = _demo_grid()
    path = str(tmp_path / "z.tif")
    write_geotiff(path, data, 100.0, 50.0, 0.5, -0.5)
    wkt = "POLYGON ((101.0 43.0, 101.0 48.0, 104.0 48.0, 104.0 43.0, 101.0 43.0))"
    zones = spark.createDataFrame(pd.DataFrame({"zone_id": [1], "geom": [wkt]}))
    (row,) = geospatial.raster_stats(zones, "zone_id", "geom", path,
                                     bins=5, area_unit="km2").collect()
    v = data[4:14, 2:8].astype(float).ravel()
    assert row["count"] == len(v) == 60
    assert row["min"] == v.min() and row["max"] == v.max()
    assert row["mean"] == pytest.approx(v.mean(), abs=1e-6)
    assert row["std"] == pytest.approx(v.std(), abs=1e-6)       # population std, ref parity
    assert row["median"] == np.median(v)
    assert row["unique"] == len(np.unique(v))
    hist, edges = np.histogram(v, bins=5)
    assert row["hist_counts"] == hist.tolist()
    assert row["hist_edges"] == pytest.approx(edges.tolist(), abs=1e-6)
    # 3 deg lon x 5 deg lat at ~45.5N is ~ 3*111.3*cos(45.5) * 5*111.1 km2
    assert row["area"] == pytest.approx(3 * 111.19 * np.cos(np.radians(45.5))
                                        * 5 * 111.19, rel=0.02)


def test_raster_stats_nodata_filtered(tmp_path, spark):
    import pandas as pd

    data = _demo_grid()
    data[5, :] = -9
    path = str(tmp_path / "nd.tif")
    write_geotiff(path, data, 100.0, 50.0, 0.5, -0.5, nodata=-9)
    wkt = "POLYGON ((101.0 43.0, 101.0 48.0, 104.0 48.0, 104.0 43.0, 101.0 43.0))"
    zones = spark.createDataFrame(pd.DataFrame({"zone_id": [1], "geom": [wkt]}))
    (row,) = geospatial.raster_stats(zones, "zone_id", "geom", path,
                                     stats=["count", "min"]).collect()
    assert row["count"] == 54           # row 5 (6 pixels in window) dropped
    assert row["min"] >= 0


def test_raster_zone_values_explode(tmp_path, spark):
    import pandas as pd

    data = _demo_grid()
    path = str(tmp_path / "e.tif")
    write_geotiff(path, data, 100.0, 50.0, 0.5, -0.5)
    wkt = "POLYGON ((101.0 43.0, 101.0 48.0, 104.0 48.0, 104.0 43.0, 101.0 43.0))"
    zones = spark.createDataFrame(pd.DataFrame({"zone_id": [1], "geom": [wkt]}))
    vals = geospatial.raster_zone_values(zones, "geom", path) \
        .groupBy("zone_id").count().collect()
    assert vals[0]["count"] == 60
