"""Pure-python vector-file ingestion: Shapefile (.shp/.dbf) and GeoPackage
(.gpkg), no geopandas/pyogrio dependency.

The reference imports vector layers driver-side with ``gpd.read_file``
(engine.py:371-520: read features, convert geometry to WKT, write rows).
Both formats are simple public binary layouts, so the same behavior is a
few hundred lines of ``struct``:

- Shapefile: ESRI whitepaper layout — 100-byte header then (record header,
  shape) pairs; attributes ride in the sibling dBase-III ``.dbf``.
- GeoPackage: a SQLite database (stdlib ``sqlite3``) whose feature tables
  store geometry as a "GP" header + standard WKB.

Vector layers are small by nature (admin boundaries, plot polygons — the
reference loops features in a Python list); parsing happens on the driver
and lands in a Spark DataFrame with a ``geometry_wkt`` column, the repo's
WKT-first convention (SURVEY §7.2).  The distributed work — spatial joins,
overlays, zonal stats — happens downstream on that DataFrame.
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# WKB -> WKT
# ---------------------------------------------------------------------------

_WKB_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
              5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION"}


class _Cursor:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read(self, fmt: str) -> tuple:
        size = struct.calcsize(fmt)
        out = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += size
        return out


def _fmt_coord(x: float, y: float) -> str:
    return f"{x} {y}"


def _parse_wkb_geom(cur: _Cursor) -> str:
    (order,) = cur.read("B")
    e = "<" if order == 1 else ">"
    (raw_type,) = cur.read(e + "I")
    has_srid = bool(raw_type & 0x20000000)          # EWKB SRID flag
    base = raw_type & 0x0FFFFFFF
    has_z = bool(raw_type & 0x80000000) or (base // 1000) in (1, 3)
    has_m = bool(raw_type & 0x40000000) or (base // 1000) in (2, 3)
    base = base % 1000
    if has_srid:
        cur.read(e + "I")
    ndim = 2 + int(has_z) + int(has_m)

    def point() -> str:
        vals = cur.read(e + "d" * ndim)
        return _fmt_coord(vals[0], vals[1])

    def ring() -> str:
        (n,) = cur.read(e + "I")
        return "(" + ", ".join(point() for _ in range(n)) + ")"

    name = _WKB_NAMES.get(base)
    if name is None:
        raise ValueError(f"unsupported WKB geometry type {raw_type}")
    if base == 1:
        return f"POINT ({point()})"
    if base == 2:
        return "LINESTRING " + ring()
    if base == 3:
        (n,) = cur.read(e + "I")
        return "POLYGON (" + ", ".join(ring() for _ in range(n)) + ")"
    # multi-geometries embed full WKB children (each with its own order byte)
    (n,) = cur.read(e + "I")
    parts = [_parse_wkb_geom(cur) for _ in range(n)]
    if base == 7:
        return "GEOMETRYCOLLECTION (" + ", ".join(parts) + ")"
    inner = ", ".join(p.split(" ", 1)[1] if base in (5, 6) else
                      "(" + p[p.index("(") + 1:p.rindex(")")] + ")"
                      for p in parts)
    return f"{name} ({inner})"


def wkb_to_wkt(buf: bytes) -> str:
    """Standard/ISO/EWKB well-known-binary -> WKT (XY output; Z/M parsed
    and dropped, matching the engine's 2D WKT convention)."""
    return _parse_wkb_geom(_Cursor(bytes(buf)))


# ---------------------------------------------------------------------------
# dBase III (.dbf)
# ---------------------------------------------------------------------------

def read_dbf(path: str, encoding: str = "latin-1") -> list[dict[str, Any]]:
    """Attribute records from a dBase .dbf file (the shapefile sidecar).
    Field types: C text, N/F numeric, L logical, D date (kept as
    YYYY-MM-DD string), I 32-bit int."""
    with open(path, "rb") as f:
        data = f.read()
    n_records, header_size, record_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    pos = 32
    while pos < header_size - 1 and data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00")[0].decode(encoding)
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows: list[dict[str, Any]] = []
    pos = header_size
    for _ in range(n_records):
        if pos + record_size > len(data):
            break
        if data[pos:pos + 1] == b"*":        # deleted record
            pos += record_size
            continue
        off = pos + 1
        row: dict[str, Any] = {}
        for name, ftype, flen, fdec in fields:
            raw = data[off:off + flen]
            off += flen
            txt = raw.decode(encoding, errors="replace").strip()
            if ftype in ("N", "F"):
                if not txt or txt == "*" * len(txt):
                    row[name] = None
                elif ftype == "N" and fdec == 0 and "." not in txt:
                    row[name] = int(txt)
                else:
                    row[name] = float(txt)
            elif ftype == "L":
                row[name] = (True if txt in "YyTt" else
                             False if txt in "NnFf" else None)
            elif ftype == "D" and len(txt) == 8:
                row[name] = f"{txt[:4]}-{txt[4:6]}-{txt[6:]}"
            elif ftype == "I":
                row[name] = struct.unpack("<i", raw)[0]
            else:
                row[name] = txt or None
        rows.append(row)
        pos += record_size
    return rows


# ---------------------------------------------------------------------------
# Shapefile (.shp)
# ---------------------------------------------------------------------------

_SHP_POINT = {1, 11, 21}
_SHP_POLYLINE = {3, 13, 23}
_SHP_POLYGON = {5, 15, 25}
_SHP_MULTIPOINT = {8, 18, 28}


def _ring_signed_area(pts: list[tuple[float, float]]) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _rings_to_wkt(rings: list[list[tuple[float, float]]]) -> str:
    """Shapefile polygon record -> POLYGON/MULTIPOLYGON WKT.  Outer rings
    are clockwise (negative shoelace area) per the ESRI spec; holes follow
    their outer ring in file order, so each CCW ring attaches to the most
    recent outer."""
    def fmt(r):
        return "(" + ", ".join(_fmt_coord(x, y) for x, y in r) + ")"

    outers: list[list[str]] = []
    for r in rings:
        if _ring_signed_area(r) <= 0 or not outers:
            outers.append([fmt(r)])
        else:
            outers[-1].append(fmt(r))
    if len(outers) == 1:
        return "POLYGON (" + ", ".join(outers[0]) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(o) + ")" for o in outers) + ")"


def iter_shp_geometries(path: str) -> Iterator[str | None]:
    """WKT per record from a .shp main file (Point/PolyLine/Polygon/
    MultiPoint incl. Z/M variants — Z/M values skipped, XY kept)."""
    with open(path, "rb") as f:
        data = f.read()
    (file_code,) = struct.unpack_from(">i", data, 0)
    if file_code != 9994:
        raise ValueError(f"{path!r} is not a shapefile (bad magic)")
    (file_len_words,) = struct.unpack_from(">i", data, 24)
    end = min(len(data), file_len_words * 2)
    pos = 100
    while pos + 8 <= end:
        _, content_words = struct.unpack_from(">ii", data, pos)
        pos += 8
        rec_end = pos + content_words * 2
        (stype,) = struct.unpack_from("<i", data, pos)
        if stype == 0:
            yield None
        elif stype in _SHP_POINT:
            x, y = struct.unpack_from("<2d", data, pos + 4)
            yield f"POINT ({_fmt_coord(x, y)})"
        elif stype in _SHP_MULTIPOINT:
            (n,) = struct.unpack_from("<i", data, pos + 36)
            pts = struct.unpack_from(f"<{2 * n}d", data, pos + 40)
            coords = ", ".join(f"({_fmt_coord(pts[2*i], pts[2*i+1])})"
                               for i in range(n))
            yield f"MULTIPOINT ({coords})"
        elif stype in _SHP_POLYLINE or stype in _SHP_POLYGON:
            n_parts, n_pts = struct.unpack_from("<2i", data, pos + 36)
            parts = struct.unpack_from(f"<{n_parts}i", data, pos + 44)
            coords_off = pos + 44 + 4 * n_parts
            flat = struct.unpack_from(f"<{2 * n_pts}d", data, coords_off)
            pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_pts)]
            bounds = list(parts) + [n_pts]
            rings = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
            if stype in _SHP_POLYGON:
                yield _rings_to_wkt(rings)
            elif n_parts == 1:
                yield "LINESTRING (" + ", ".join(
                    _fmt_coord(x, y) for x, y in rings[0]) + ")"
            else:
                yield "MULTILINESTRING (" + ", ".join(
                    "(" + ", ".join(_fmt_coord(x, y) for x, y in r) + ")"
                    for r in rings) + ")"
        else:
            raise ValueError(f"unsupported shapefile shape type {stype}")
        pos = rec_end


def read_shp(spark: SparkSession, path: str) -> DataFrame:
    """Shapefile -> DataFrame: .dbf attributes + ``geometry_wkt``.
    Mirrors the reference's gpd.read_file row shape (engine.py:456-476)."""
    import pandas as pd

    geoms = list(iter_shp_geometries(path))
    dbf_path = os.path.splitext(path)[0] + ".dbf"
    attrs = read_dbf(dbf_path) if os.path.exists(dbf_path) else None
    if attrs is None:
        attrs = [{} for _ in geoms]
    if len(attrs) != len(geoms):
        raise ValueError(
            f"shapefile record mismatch: {len(geoms)} shapes vs "
            f"{len(attrs)} dbf rows in {path!r}")
    rows = [dict(a, geometry_wkt=g) for a, g in zip(attrs, geoms)]
    return spark.createDataFrame(pd.DataFrame(rows))


# ---------------------------------------------------------------------------
# GeoPackage (.gpkg)
# ---------------------------------------------------------------------------

def gpkg_blob_to_wkt(blob: bytes) -> str | None:
    """GeoPackage geometry blob (GP header + WKB) -> WKT."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        # some writers store raw WKB
        return wkb_to_wkt(blob)
    flags = blob[3]
    if flags & 0x10:                 # empty-geometry flag
        return None
    env_indicator = (flags >> 1) & 0x07
    env_doubles = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_indicator)
    if env_doubles is None:
        raise ValueError(f"invalid gpkg envelope indicator {env_indicator}")
    return wkb_to_wkt(blob[8 + 8 * env_doubles:])


def list_gpkg_layers(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents "
            "WHERE data_type = 'features' ORDER BY table_name").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_gpkg_records(path: str, layer: str | None = None) -> list[dict]:
    """Driver-side GeoPackage read -> list of row dicts with
    ``geometry_wkt`` (row order = table order, gpd.read_file-like).
    Shared by the Spark reader below and the refdiff geometry shim's
    ``gpd.read_file``."""
    con = sqlite3.connect(path)
    try:
        if layer is None:
            layers = list_gpkg_layers(path)
            if not layers:
                raise ValueError(f"no feature layers in {path!r}")
            layer = layers[0]
        row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,)).fetchone()
        geom_col = row[0] if row else None
        cur = con.execute(f'SELECT * FROM "{layer}"')
        cols = [d[0] for d in cur.description]
        out = []
        for rec in cur.fetchall():
            d = dict(zip(cols, rec))
            if geom_col is not None:
                d["geometry_wkt"] = gpkg_blob_to_wkt(d.pop(geom_col))
            out.append(d)
    finally:
        con.close()
    return out


def read_gpkg(spark: SparkSession, path: str,
              layer: str | None = None) -> DataFrame:
    """GeoPackage feature table -> DataFrame with ``geometry_wkt``.
    Defaults to the first (alphabetical) feature layer, like
    gpd.read_file's default layer pick."""
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(read_gpkg_records(
        path, layer)))


# ---------------------------------------------------------------------------
# Minimal shapefile writer (testing / round-trip fixtures)
# ---------------------------------------------------------------------------

def write_shp(path: str, records: list[dict[str, Any]],
              geometries: list[str]) -> None:
    """Write a minimal 2D shapefile (.shp + .dbf) from WKT POINT/POLYGON
    geometries.  Exists so fixtures and round-trip tests don't need any GIS
    dependency; not a production exporter."""
    shapes = []
    all_pts: list[tuple[float, float]] = []
    for wkt in geometries:
        wkt = wkt.strip()
        if wkt.upper().startswith("POINT"):
            body = wkt[wkt.index("(") + 1:wkt.rindex(")")]
            x, y = (float(v) for v in body.split())
            shapes.append((1, [(x, y)]))
            all_pts.append((x, y))
        elif wkt.upper().startswith("POLYGON"):
            body = wkt[wkt.index("(") + 1:wkt.rindex(")")]
            rings = []
            depth, start = 0, None
            for i, ch in enumerate(body):
                if ch == "(":
                    if depth == 0:
                        start = i + 1
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        pts = [tuple(float(v) for v in p.split())
                               for p in body[start:i].split(",")]
                        rings.append(pts)
            shapes.append((5, rings))
            for r in rings:
                all_pts.extend(r)
        else:
            raise ValueError("write_shp supports POINT/POLYGON WKT only")

    xs = [p[0] for p in all_pts] or [0.0]
    ys = [p[1] for p in all_pts] or [0.0]
    bbox = (min(xs), min(ys), max(xs), max(ys))

    recs = []
    for i, (stype, geom) in enumerate(shapes, 1):
        if stype == 1:
            content = struct.pack("<i2d", 1, *geom[0])
        else:
            pts = [p for r in geom for p in r]
            gx = [p[0] for p in pts]
            gy = [p[1] for p in pts]
            parts, off = [], 0
            for r in geom:
                parts.append(off)
                off += len(r)
            content = struct.pack("<i4d", 5, min(gx), min(gy), max(gx), max(gy))
            content += struct.pack("<2i", len(geom), len(pts))
            content += struct.pack(f"<{len(parts)}i", *parts)
            content += b"".join(struct.pack("<2d", x, y) for x, y in pts)
        recs.append(struct.pack(">2i", i, len(content) // 2) + content)

    total_words = (100 + sum(len(r) for r in recs)) // 2
    # 100-byte header: magic, 20 reserved, length(words, BE), version+shape
    # type (LE), bbox, z/m ranges
    header = (struct.pack(">i", 9994) + b"\x00" * 20
              + struct.pack(">i", total_words)
              + struct.pack("<2i", 1000, shapes[0][0] if shapes else 1)
              + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))
    with open(path, "wb") as f:
        f.write(header + b"".join(recs))

    # .dbf sidecar
    field_names = sorted({k for r in records for k in r}) or ["FID"]
    if not records:
        records = [{"FID": i + 1} for i in range(len(shapes))]
    specs = []
    for name in field_names:
        vals = [r.get(name) for r in records]
        if all(isinstance(v, (int, type(None))) and not isinstance(v, bool)
               for v in vals):
            specs.append((name, "N", 18, 0))
        elif all(isinstance(v, (int, float, type(None))) and
                 not isinstance(v, bool) for v in vals):
            specs.append((name, "N", 18, 6))
        else:
            width = max([len(str(v)) for v in vals if v is not None] + [1])
            specs.append((name, "C", min(width, 254), 0))
    record_size = 1 + sum(s[2] for s in specs)
    header_size = 32 + 32 * len(specs) + 1
    dbf = bytearray()
    dbf += struct.pack("<B3BIHH20x", 3, 26, 8, 13, len(records),
                       header_size, record_size)
    for name, ftype, flen, fdec in specs:
        dbf += name.encode("ascii")[:11].ljust(11, b"\x00")
        dbf += ftype.encode("ascii") + b"\x00" * 4
        dbf += struct.pack("<BB", flen, fdec) + b"\x00" * 14
    dbf += b"\x0d"
    for r in records:
        dbf += b" "
        for name, ftype, flen, fdec in specs:
            v = r.get(name)
            if v is None:
                dbf += b" " * flen
            elif ftype == "N" and fdec == 0:
                dbf += str(int(v)).rjust(flen).encode("ascii")[:flen]
            elif ftype == "N":
                dbf += f"{float(v):.{fdec}f}".rjust(flen).encode("ascii")[:flen]
            else:
                dbf += str(v).encode("latin-1")[:flen].ljust(flen, b" ")
    dbf += b"\x1a"
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as f:
        f.write(bytes(dbf))


def write_gpkg(path: str, layer: str, records: list[dict[str, Any]],
               geometries: list[str | None]) -> None:
    """Write a minimal GeoPackage feature table (testing fixture writer):
    gpkg_contents + gpkg_geometry_columns + one feature table whose geom
    blobs are GP headers + little-endian WKB built from simple WKT."""
    con = sqlite3.connect(path)
    try:
        con.executescript(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            " table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT,"
            " srs_id INTEGER);"
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            " table_name TEXT, column_name TEXT, geometry_type_name TEXT,"
            " srs_id INTEGER, z TINYINT, m TINYINT);")
        field_names = sorted({k for r in records for k in r})
        cols = ", ".join(f'"{c}"' for c in field_names)
        con.execute(f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY'
                    + (f", {cols}" if field_names else "") + ", geom BLOB)")
        con.execute("INSERT OR REPLACE INTO gpkg_contents VALUES (?, 'features', ?, 4326)",
                    (layer, layer))
        con.execute("INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'GEOMETRY', 4326, 0, 0)",
                    (layer,))
        for i, (rec, wkt) in enumerate(zip(records, geometries), 1):
            blob = None
            if wkt is not None:
                wkb = _wkt_to_wkb_simple(wkt)
                blob = b"GP" + bytes([0, 0x01]) + struct.pack("<i", 4326) + wkb
            vals = [rec.get(c) for c in field_names]
            ph = ", ".join("?" for _ in range(len(field_names) + 2))
            con.execute(f'INSERT INTO "{layer}" VALUES ({ph})',
                        [i] + vals + [blob])
        con.commit()
    finally:
        con.close()


def parse_wkt_nested(wkt: str) -> tuple[str, Any]:
    """WKT -> (TYPE, nested coordinate lists): POINT -> (x, y), LINESTRING
    -> [(x, y), ...], POLYGON -> [ring, ...], MULTIPOLYGON -> [[ring, ...],
    ...].  Shared by the WKB fixture writer and the TopoJSON encoder."""
    wkt = wkt.strip()
    name = wkt.split("(", 1)[0].strip().upper()
    body = wkt[wkt.index("("):]

    def parse_group(s: str):
        s = s.strip()
        assert s[0] == "(" and s[-1] == ")"
        inner = s[1:-1].strip()
        if "(" not in inner:
            if "," in inner:
                return [tuple(float(v) for v in p.split()) for p in inner.split(",")]
            return tuple(float(v) for v in inner.split())
        groups, depth, start = [], 0, None
        for i, ch in enumerate(inner):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    groups.append(parse_group(inner[start:i + 1]))
        return groups

    return name, parse_group(body)


def _wkt_to_wkb_simple(wkt: str) -> bytes:
    """POINT/LINESTRING/POLYGON/MULTIPOLYGON WKT -> little-endian WKB
    (fixture writer's inverse of wkb_to_wkt)."""
    name, g = parse_wkt_nested(wkt)
    if name == "POINT":
        return struct.pack("<BI2d", 1, 1, *g)
    if name == "LINESTRING":
        out = struct.pack("<BII", 1, 2, len(g))
        return out + b"".join(struct.pack("<2d", *p) for p in g)
    if name == "POLYGON":
        out = struct.pack("<BII", 1, 3, len(g))
        for ring in g:
            out += struct.pack("<I", len(ring))
            out += b"".join(struct.pack("<2d", *p) for p in ring)
        return out
    if name == "MULTIPOLYGON":
        out = struct.pack("<BII", 1, 6, len(g))
        for poly in g:
            out += struct.pack("<BII", 1, 3, len(poly))
            for ring in poly:
                out += struct.pack("<I", len(ring))
                out += b"".join(struct.pack("<2d", *p) for p in ring)
        return out
    raise ValueError(f"unsupported WKT type {name}")


def import_multi_feature(spark: SparkSession,
                         sources: list[tuple[str, str]],
                         id_field: str = "id",
                         name_field: str = "name",
                         name_fields: list[str] | None = None) -> DataFrame:
    """Multiple spatial files -> ONE entity table with the reference's
    2-level type/shape hierarchy + nested sets
    (engine.py:371-520: per source a level-0 'type' row with no geometry,
    then level-1 'shape' rows parented to it; HierarchyBuilder adds
    lft/rght afterwards).

    ``sources``: [(source_name, path)] — .shp/.gpkg/.geojson all accepted.
    Output columns: id, shape_id, name, location (WKT), entity_type,
    shape_type, type, level, parent_id, lft, rght.
    """
    import pandas as pd

    from niamoto_spark.hierarchy import add_nested_sets
    from niamoto_spark.sources.files import read_vector

    rows: list[dict[str, Any]] = []
    feature_id = 1
    for src_idx, (source_name, path) in enumerate(sources):
        src_name_field = (name_fields[src_idx] if name_fields
                          else name_field)
        if not os.path.exists(path):
            continue
        feats = read_vector(spark, path).collect()
        if not feats:
            continue
        type_id = feature_id
        rows.append({id_field: type_id, "shape_id": None,
                     "name": source_name, "location": None,
                     "entity_type": "type", "shape_type": "type",
                     "type": source_name, "level": 0, "parent_id": None})
        feature_id += 1
        slug = source_name.lower().replace(" ", "_")
        for idx, feat in enumerate(feats, 1):
            d = feat.asDict()
            rows.append({
                id_field: feature_id,
                "shape_id": f"{slug}_{idx}",
                "name": d.get(src_name_field, f"Feature {feature_id}"),
                "location": d.get("geometry_wkt"),
                "entity_type": "shape", "shape_type": "shape",
                "type": source_name, "level": 1, "parent_id": type_id,
            })
            feature_id += 1
    if not rows:
        return spark.createDataFrame(
            [], f"{id_field} bigint, shape_id string, name string, "
                "location string, entity_type string, shape_type string, "
                "type string, level int, parent_id bigint, lft int, rght int")
    df = spark.createDataFrame(pd.DataFrame(rows))
    return add_nested_sets(df, id_col=id_field)
