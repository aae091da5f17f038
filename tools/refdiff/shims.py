"""Module shims that let the reference engine import in this container.

The reference (/root/reference) hard-imports three things this
container does not ship: ``rich`` (console output), ``sqlalchemy``
(its Database layer), and via the latter its ``niamoto.common.database``
module.  None of these carry transform SEMANTICS — the transform math
lives in the plugin classes and TransformerService, which are pure
pandas/numpy/pydantic — so we preempt exactly these three:

- ``rich``: no-op Console / escape / handlers.
- ``sqlalchemy``: ``text`` (identity), ``quoted_name`` (identity — the
  real one is a str subclass whose str() is the raw name; quoting
  happens at dialect compile, which the reference never invokes because
  it interpolates str(quoted_name(...)) into f-string SQL itself,
  transformer.py:886-893), ``inspect(engine)`` (exposes the dialect
  identifier_preparer), exceptions, and inert orm/pool/event names.
- ``niamoto.common.database``: a sqlite3-backed ``Database`` exposing
  the exact method surface the transform path calls (execute_sql,
  fetch_all, fetch_one, execute_select, connection(), engine,
  get_table_columns, has_table, ... — reference database.py:704-1134).
  SQLite is the reference's DEFAULT backend (database.py:101-103), so
  the SQL the service and loaders emit is native to it.

install() must run BEFORE the first ``import niamoto``.
"""

from __future__ import annotations

import contextlib
import logging
import sqlite3
import sys
import types


# ---------------------------------------------------------------------------
# rich
# ---------------------------------------------------------------------------

def _install_rich() -> None:
    if "rich" in sys.modules:
        return

    rich = types.ModuleType("rich")

    console_mod = types.ModuleType("rich.console")

    class Console:
        def __init__(self, *a, **k):
            pass

        def print(self, *a, **k):
            pass

        def rule(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        @contextlib.contextmanager
        def status(self, *a, **k):
            yield self

    console_mod.Console = Console

    markup_mod = types.ModuleType("rich.markup")
    markup_mod.escape = lambda s: s

    logging_mod = types.ModuleType("rich.logging")

    class RichHandler(logging.StreamHandler):
        def __init__(self, *a, **k):
            super().__init__()

    logging_mod.RichHandler = RichHandler

    progress_mod = types.ModuleType("rich.progress")

    class _Column:
        def __init__(self, *a, **k):
            pass

    class Progress:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def add_task(self, *a, **k):
            return 0

        def update(self, *a, **k):
            pass

        def advance(self, *a, **k):
            pass

    for name in ("SpinnerColumn", "BarColumn", "TextColumn",
                 "TimeElapsedColumn", "TimeRemainingColumn",
                 "MofNCompleteColumn", "TaskProgressColumn"):
        setattr(progress_mod, name, type(name, (_Column,), {}))
    progress_mod.Progress = Progress

    traceback_mod = types.ModuleType("rich.traceback")
    traceback_mod.install = lambda *a, **k: None

    table_mod = types.ModuleType("rich.table")

    class Table:
        def __init__(self, *a, **k):
            pass

        def add_column(self, *a, **k):
            pass

        def add_row(self, *a, **k):
            pass

    table_mod.Table = Table

    panel_mod = types.ModuleType("rich.panel")
    panel_mod.Panel = type("Panel", (), {"__init__": lambda self, *a, **k: None,
                                         "fit": classmethod(lambda cls, *a, **k: cls())})

    rich.console = console_mod
    rich.markup = markup_mod
    rich.print = lambda *a, **k: None
    sys.modules["rich"] = rich
    sys.modules["rich.console"] = console_mod
    sys.modules["rich.markup"] = markup_mod
    sys.modules["rich.logging"] = logging_mod
    sys.modules["rich.progress"] = progress_mod
    sys.modules["rich.traceback"] = traceback_mod
    sys.modules["rich.table"] = table_mod
    sys.modules["rich.panel"] = panel_mod


# ---------------------------------------------------------------------------
# sqlalchemy
# ---------------------------------------------------------------------------

class SQLAlchemyError(Exception):
    pass


class OperationalError(SQLAlchemyError):
    pass


class IntegrityError(SQLAlchemyError):
    pass


class _IdentifierPreparer:
    @staticmethod
    def quote(name: str) -> str:
        escaped = str(name).replace('"', '""')
        return f'"{escaped}"'


class _Dialect:
    identifier_preparer = _IdentifierPreparer()
    name = "sqlite"


class _Inspector:
    """inspect(engine) — only .dialect and table-name listing are used."""

    def __init__(self, engine):
        self._engine = engine
        self.dialect = _Dialect()

    def get_table_names(self):
        cur = self._engine.cursor()
        cur.execute("SELECT name FROM sqlite_master WHERE type='table'")
        return [r[0] for r in cur.fetchall()]

    def has_table(self, name):
        return name in self.get_table_names()


def _sa_inspect(obj):
    return _Inspector(obj)


def _install_sqlalchemy() -> None:
    if "sqlalchemy" in sys.modules:
        return

    sa = types.ModuleType("sqlalchemy")
    # pandas probes sqlalchemy's version, then isinstance-checks cons
    # against Connectable/URL; our Database objects are neither, so
    # pandas falls back to its DBAPI (sqlite3) path — which is exactly
    # what the ShimDatabase engine is.
    sa.__version__ = "2.0.36"

    class _TextClause(str):
        """str subclass so str(text(s)) round-trips; bindparams is a
        no-op marker — expanding IN-list parameters are handled
        generically in _Connection.execute."""

        def bindparams(self, *a, **k):
            return self

    sa.text = _TextClause
    sa.bindparam = lambda name, **k: name
    sa.inspect = _sa_inspect
    sa.create_engine = _unsupported("create_engine")

    event_mod = types.ModuleType("sqlalchemy.event")
    event_mod.listen = lambda *a, **k: None
    sa.event = event_mod

    exc_mod = types.ModuleType("sqlalchemy.exc")
    exc_mod.SQLAlchemyError = SQLAlchemyError
    exc_mod.OperationalError = OperationalError
    exc_mod.IntegrityError = IntegrityError
    sa.exc = exc_mod

    pool_mod = types.ModuleType("sqlalchemy.pool")
    pool_mod.NullPool = type("NullPool", (), {})
    sa.pool = pool_mod

    engine_mod = types.ModuleType("sqlalchemy.engine")
    engine_mod.Connection = type("Connection", (), {})
    engine_mod.Engine = type("Engine", (), {})
    engine_mod.Connectable = type("Connectable", (), {})
    engine_mod.URL = type("URL", (), {})
    sa.engine = engine_mod

    orm_mod = types.ModuleType("sqlalchemy.orm")
    orm_mod.Session = type("Session", (), {})
    orm_mod.sessionmaker = lambda **k: (lambda: None)
    orm_mod.scoped_session = lambda factory: None
    sa.orm = orm_mod

    sql_mod = types.ModuleType("sqlalchemy.sql")
    # Real quoted_name is a str subclass: str(quoted_name(x, quote=True))
    # returns x unchanged.  The reference relies on that (it embeds the
    # result in f-string SQL against already-validated identifiers).
    sql_mod.quoted_name = lambda name, quote=False: str(name)
    sql_mod.text = sa.text
    sa.sql = sql_mod

    sys.modules["sqlalchemy"] = sa
    sys.modules["sqlalchemy.event"] = event_mod
    sys.modules["sqlalchemy.exc"] = exc_mod
    sys.modules["sqlalchemy.pool"] = pool_mod
    sys.modules["sqlalchemy.engine"] = engine_mod
    sys.modules["sqlalchemy.orm"] = orm_mod
    sys.modules["sqlalchemy.sql"] = sql_mod


def _unsupported(name):
    def _raise(*a, **k):
        raise NotImplementedError(f"refdiff sqlalchemy shim: {name} not supported")
    return _raise


# ---------------------------------------------------------------------------
# niamoto.common.database — sqlite3-backed Database
# ---------------------------------------------------------------------------

class _Row(tuple):
    """Tuple with SQLAlchemy-Row affordances: row[i], row._mapping, row.col."""

    def __new__(cls, keys, values):
        obj = super().__new__(cls, values)
        obj._keys = keys
        return obj

    @property
    def _mapping(self):
        return dict(zip(self._keys, self))

    def __getattr__(self, name):
        try:
            return self._mapping[name]
        except KeyError:
            raise AttributeError(name) from None


class _Mappings:
    def __init__(self, rows):
        self._rows = rows

    def all(self):
        return [r._mapping for r in self._rows]

    def first(self):
        return self._rows[0]._mapping if self._rows else None


class _Result:
    """Eagerly-fetched result (SELECT) or rowcount holder (DML/DDL)."""

    def __init__(self, cursor):
        self.rowcount = cursor.rowcount
        if cursor.description:
            keys = [d[0] for d in cursor.description]
            self._rows = [_Row(keys, r) for r in cursor.fetchall()]
            self._keys = keys
        else:
            self._rows = []
            self._keys = []

    def fetchone(self):
        return self._rows[0] if self._rows else None

    def first(self):
        return self.fetchone()

    def fetchall(self):
        return list(self._rows)

    def mappings(self):
        return _Mappings(self._rows)

    def keys(self):
        return list(self._keys)

    def __iter__(self):
        return iter(self._rows)


class _Connection:
    """SQLAlchemy-Connection-alike over sqlite3, DBAPI-compatible enough
    for pandas' fallback read_sql/to_sql path (needs .cursor/.commit)."""

    def __init__(self, raw: sqlite3.Connection):
        self._raw = raw

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self._raw.commit()
        return False

    def execute(self, sql, params=None):
        s = str(sql)
        p = dict(params) if params else {}
        # expanding IN-list parameters (sqlalchemy bindparam
        # expanding=True): :name bound to a sequence becomes
        # (:name__0, :name__1, ...) — sqlite3 has no native list bind
        for k, v in list(p.items()):
            if isinstance(v, (list, tuple, set)):
                vals = list(v)
                del p[k]
                if not vals:
                    s = s.replace(f":{k}", "(NULL)")
                    continue
                names = [f"{k}__{i}" for i in range(len(vals))]
                s = s.replace(
                    f":{k}", "(" + ", ".join(f":{n}" for n in names) + ")")
                p.update(dict(zip(names, vals)))
        # SQLite dialect shim: "INSERT .. SELECT .. FROM t ON CONFLICT"
        # is a documented SQLite parsing ambiguity (upsert vs the
        # legacy INSERT OR clause) that requires a WHERE on the SELECT
        # — "even if simply WHERE true" per the SQLite upsert docs.
        # DuckDB (the reference's engine) parses it bare, so the
        # reference's ON CONFLICT flush SQL (transformer.py:1302-1310)
        # needs the disambiguator injected here.
        import re as _re
        if "ON CONFLICT" in s and _re.search(
                r"FROM\s+\S+\s+ON\s+CONFLICT", s, _re.IGNORECASE):
            s = _re.sub(r"(\s)(ON\s+CONFLICT)", r"\1WHERE true \2", s,
                        count=1, flags=_re.IGNORECASE)
        cur = self._raw.cursor()
        try:
            cur.execute(s, p)
        except sqlite3.Error as e:
            raise SQLAlchemyError(str(e)) from e
        return _Result(cur)

    def cursor(self):
        return self._raw.cursor()

    def commit(self):
        self._raw.commit()

    def rollback(self):
        self._raw.rollback()

    def close(self):
        pass


class _Engine:
    """db.engine — pandas uses .cursor()/.commit() (DBAPI fallback);
    table_resolver uses .dialect.identifier_preparer."""

    def __init__(self, raw: sqlite3.Connection):
        self._raw = raw
        self.dialect = _Dialect()

    def cursor(self):
        return self._raw.cursor()

    def commit(self):
        self._raw.commit()

    def rollback(self):
        self._raw.rollback()

    def connect(self):
        return _Connection(self._raw)

    def dispose(self):
        pass


class ShimDatabase:
    """The reference Database's transform-path surface over sqlite3.

    Methods mirror /root/reference/src/niamoto/common/database.py:
    execute_sql (733), execute_select (704), fetch_all (1037),
    fetch_one (1068), execute_query (1125), get_table_columns (898),
    has_table (634), connection (332), plus the maintenance no-ops the
    service calls around the transform loop.
    """

    def __init__(self, db_path: str, *a, **k):
        self.db_path = db_path
        self._raw = sqlite3.connect(db_path, check_same_thread=False)
        self._raw.execute("PRAGMA foreign_keys = ON")
        self.engine = _Engine(self._raw)
        self.is_duckdb = False
        self.is_sqlite = True
        self.read_only = False

    # -- core query surface -------------------------------------------------
    @contextlib.contextmanager
    def connection(self):
        conn = _Connection(self._raw)
        try:
            yield conn
            self._raw.commit()
        except Exception:
            self._raw.rollback()
            raise

    def execute_sql(self, sql, params=None, fetch=False, *, fetch_all=False):
        with self.connection() as conn:
            result = conn.execute(sql, params or {})
            if fetch_all:
                return result.fetchall()
            if fetch:
                return result.fetchone()
            return result

    def execute_select(self, sql):
        with self.connection() as conn:
            return conn.execute(sql)

    def execute_query(self, query, params=None):
        with self.connection() as conn:
            return conn.execute(query, params or {}).fetchall()

    def fetch_all(self, query, params=None):
        with self.connection() as conn:
            return conn.execute(query, params or {}).mappings().all()

    def fetch_one(self, query, params=None):
        with self.connection() as conn:
            return conn.execute(query, params or {}).mappings().first()

    # -- metadata ------------------------------------------------------------
    def get_table_columns(self, table_name):
        cur = self._raw.cursor()
        try:
            cur.execute(f'PRAGMA table_info("{table_name}")')
        except sqlite3.Error:
            return []
        return [r[1] for r in cur.fetchall()]

    def has_table(self, table_name):
        cur = self._raw.cursor()
        cur.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (table_name,))
        return cur.fetchone() is not None

    def get_table_names(self):
        cur = self._raw.cursor()
        cur.execute("SELECT name FROM sqlite_master WHERE type='table'")
        return [r[0] for r in cur.fetchall()]

    # -- lifecycle / maintenance no-ops ---------------------------------------
    def enable_connection_reuse(self):
        pass

    def disable_connection_reuse(self):
        pass

    def create_indexes_for_table(self, table_name):
        pass

    def optimize_database(self):
        pass

    def invalidate_table_names_cache(self):
        pass

    def close(self):
        self._raw.commit()
        self._raw.close()

    def close_db_session(self):
        pass

    def commit_session(self):
        self._raw.commit()

    def rollback_session(self):
        self._raw.rollback()


def _install_database_preempt() -> None:
    if "niamoto.common.database" in sys.modules:
        return
    mod = types.ModuleType("niamoto.common.database")
    mod.Database = ShimDatabase
    mod.get_database_path = lambda *a, **k: None
    sys.modules["niamoto.common.database"] = mod


# ---------------------------------------------------------------------------
# shapely / geopandas — import-level shims with a REAL pure-python core
# ---------------------------------------------------------------------------
# transformers/__init__.py imports every plugin module eagerly, and two of
# them (transform_chain, geospatial_extractor) import geopandas/shapely at
# module level — without these shims NO reference transformer loads.  The
# geometry core delegates to this repo's pure-python WKT/WKB helpers
# (niamoto_spark/sources/vector.py), so the Point paths the example
# transform.yml exercises (geo_pt extraction) genuinely work; anything
# deeper (overlay, CRS ops) raises and the widget is gated from the diff.

class ShimBaseGeometry:
    geom_type = "Geometry"

    def __init__(self, coords):
        self._coords = coords

    @property
    def is_empty(self):
        return not self._coords

    @property
    def __geo_interface__(self):
        def listify(c):
            if isinstance(c, tuple):
                return list(c)
            return [listify(x) for x in c]
        return {"type": self.geom_type, "coordinates": listify(self._coords)}


class ShimPoint(ShimBaseGeometry):
    geom_type = "Point"

    def __init__(self, x, y=None):
        if y is None:
            x, y = x
        super().__init__((float(x), float(y)))
        self.x = float(x)
        self.y = float(y)

    @property
    def coords(self):
        return [(self.x, self.y)]


class ShimPolygonal(ShimBaseGeometry):
    """Rich polygonal geometry (r13 geography differential): the
    reference's shape_processor runs end-to-end against these, with
    every kernel (centroid, metric area, Douglas-Peucker, UTM
    transform) delegating to niamoto_spark.operators.utm — the SAME
    functions the engine widget uses, so the differential isolates the
    plugin LOGIC (tolerance formula, clip order, double-simplify,
    union order) rather than re-testing the geometry kernels."""

    @property
    def is_valid(self):
        return True

    def _nested(self):
        raise NotImplementedError

    @classmethod
    def _from_nested(cls, polys):
        if len(polys) == 1:
            return ShimPolygon(polys[0][0], polys[0][1:])
        return ShimMultiPolygon(polys)

    @property
    def centroid(self):
        from niamoto_spark.operators.utm import nested_centroid
        return ShimPoint(*nested_centroid(self._nested()))

    @property
    def area(self):
        from niamoto_spark.operators.utm import nested_area
        return nested_area(self._nested())

    def simplify(self, tolerance, preserve_topology=False):
        from niamoto_spark.operators.utm import nested_simplify
        return type(self)._rebuild(
            nested_simplify(self._nested(), float(tolerance)))

    def transformed(self, fn):
        from niamoto_spark.operators.utm import nested_transform
        return type(self)._rebuild(nested_transform(self._nested(), fn))


class ShimPolygon(ShimPolygonal):
    geom_type = "Polygon"

    def __init__(self, shell, holes=None):
        rings = [list(map(tuple, shell))]
        for h in (holes or []):
            rings.append(list(map(tuple, h)))
        super().__init__(rings)

    def _nested(self):
        return [self._coords]

    @classmethod
    def _rebuild(cls, polys):
        assert len(polys) == 1
        return cls(polys[0][0], polys[0][1:])


class ShimMultiPolygon(ShimPolygonal):
    geom_type = "MultiPolygon"

    def __init__(self, polygons):
        polys = []
        for p in polygons:
            if isinstance(p, ShimPolygon):
                polys.append([list(map(tuple, r)) for r in p._coords])
            else:   # raw nested coords
                polys.append([list(map(tuple, r)) for r in p])
        super().__init__(polys)

    def _nested(self):
        return self._coords

    @classmethod
    def _rebuild(cls, polys):
        return cls(polys)

    @property
    def geoms(self):
        return [ShimPolygon(p[0], p[1:]) for p in self._coords]


class ShimGeometryCollection(ShimBaseGeometry):
    geom_type = "GeometryCollection"

    def __init__(self, geoms=None):
        self.geoms = list(geoms or [])
        super().__init__(self.geoms)

    @property
    def is_valid(self):
        return True


def _shim_unary_union(geoms):
    """Union of DISJOINT polygonal geometries: flatten parts in input
    order (1 part -> Polygon, else MultiPolygon).  The refdiff synth
    layers are constructed disjoint, so no dissolve is needed; callers
    feeding overlapping polygons would diverge from real shapely and
    the differential would catch it."""
    polys = []
    for g in geoms:
        if isinstance(g, ShimMultiPolygon):
            polys.extend(g._nested())
        elif isinstance(g, ShimPolygon):
            polys.extend(g._nested())
        else:
            raise NotImplementedError(
                f"unary_union over {type(g).__name__}")
    if not polys:
        return ShimGeometryCollection([])
    return ShimPolygonal._from_nested(polys)


def _shim_ops_transform(fn, geom):
    """shapely.ops.transform for the shim types (Point + polygonal)."""
    import numpy as _np
    if isinstance(geom, ShimPoint):
        x, y = fn(_np.array([geom.x]), _np.array([geom.y]))
        return ShimPoint(float(x[0]), float(y[0]))
    if isinstance(geom, ShimPolygonal):
        return geom.transformed(fn)
    raise NotImplementedError(
        f"shapely.ops.transform over {type(geom).__name__}")


_GEOM_TYPES = {
    "POINT": ("Point", ShimPoint),
    "LINESTRING": ("LineString", None),
    "POLYGON": ("Polygon", ShimPolygon),
    "MULTIPOINT": ("MultiPoint", None),
    "MULTILINESTRING": ("MultiLineString", None),
    "MULTIPOLYGON": ("MultiPolygon", ShimMultiPolygon),
}


def _shim_load_wkt(s: str):
    from niamoto_spark.sources.vector import parse_wkt_nested
    name, coords = parse_wkt_nested(str(s))
    if name not in _GEOM_TYPES:
        raise ValueError(f"unsupported WKT type {name}")
    geo_name, cls = _GEOM_TYPES[name]
    if cls is ShimPoint:
        return ShimPoint(*coords)
    if cls is ShimPolygon:
        return ShimPolygon(coords[0], coords[1:])
    if cls is ShimMultiPolygon:
        return ShimMultiPolygon(coords)
    geom = ShimBaseGeometry(coords)
    geom.geom_type = geo_name
    return geom


def _shim_load_wkb(b: bytes):
    from niamoto_spark.sources.vector import wkb_to_wkt
    return _shim_load_wkt(wkb_to_wkt(bytes(b)))


class _InertModule(types.ModuleType):
    """Module stub whose attributes are use-time-failing callables, so
    ``from rasterio.mask import mask`` succeeds but calling raises."""

    def __getattr__(self, attr):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        name = f"{self.__name__}.{attr}"

        class _Inert:
            def __init__(self, *a, **k):
                raise NotImplementedError(f"refdiff geo stub: {name}")

            def __call__(self, *a, **k):
                raise NotImplementedError(f"refdiff geo stub: {name}")

        _Inert.__name__ = attr
        return _Inert


def _install_geo() -> None:
    import pandas as pd

    if "shapely" not in sys.modules:
        shapely = types.ModuleType("shapely")
        geometry_mod = types.ModuleType("shapely.geometry")
        base_mod = types.ModuleType("shapely.geometry.base")
        base_mod.BaseGeometry = ShimBaseGeometry
        geometry_mod.Point = ShimPoint
        geometry_mod.base = base_mod
        geometry_mod.shape = lambda d: _shim_load_wkt_from_geojson(d)
        geometry_mod.mapping = lambda g: g.__geo_interface__
        wkt_mod = types.ModuleType("shapely.wkt")
        wkt_mod.loads = _shim_load_wkt
        wkb_mod = types.ModuleType("shapely.wkb")
        wkb_mod.loads = _shim_load_wkb
        ops_mod = types.ModuleType("shapely.ops")
        ops_mod.transform = _shim_ops_transform
        ops_mod.unary_union = _shim_unary_union
        geometry_mod.Polygon = ShimPolygon
        geometry_mod.MultiPolygon = ShimMultiPolygon
        geometry_mod.GeometryCollection = ShimGeometryCollection
        for gname in ("MultiPoint", "LineString", "MultiLineString"):
            cls = type(gname, (ShimBaseGeometry,), {"geom_type": gname})
            setattr(geometry_mod, gname, cls)
        shapely.geometry = geometry_mod
        shapely.wkt = wkt_mod
        shapely.wkb = wkb_mod
        shapely.ops = ops_mod
        # shim geometries are valid by construction; identity matches
        # shapely's no-op on already-valid input
        shapely.make_valid = lambda g: g
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry_mod
        sys.modules["shapely.geometry.base"] = base_mod
        sys.modules["shapely.wkt"] = wkt_mod
        sys.modules["shapely.wkb"] = wkb_mod
        sys.modules["shapely.ops"] = ops_mod

    # Inert stubs for geo libraries only referenced at module scope by
    # plugins the example transform.yml may not reach: any ATTRIBUTE the
    # importing module binds resolves to a callable that raises at use.
    # pyproj: CRS + Transformer over the repo's pure-python UTM kernel
    # (shape_processor._simplify_with_utm only builds WGS84<->UTM pairs)
    if "pyproj" not in sys.modules or isinstance(sys.modules["pyproj"],
                                                 _InertModule):
        pyproj = types.ModuleType("pyproj")

        class _ShimCRS:
            def __init__(self, spec):
                self.spec = str(spec)
                self.is_utm = "+proj=utm" in self.spec
                self.zone = None
                if self.is_utm:
                    for tok in self.spec.split():
                        if tok.startswith("+zone="):
                            self.zone = int(tok.split("=", 1)[1])

        class _ShimTransformer:
            def __init__(self, src, dst):
                from niamoto_spark.operators.utm import (utm_forward,
                                                         utm_inverse)
                if dst.is_utm:
                    self.transform = (
                        lambda x, y, _z=dst.zone: utm_forward(x, y, _z))
                elif src.is_utm:
                    self.transform = (
                        lambda x, y, _z=src.zone: utm_inverse(x, y, _z))
                else:
                    raise NotImplementedError(
                        f"refdiff pyproj shim: {src.spec} -> {dst.spec}")

            @classmethod
            def from_crs(cls, src, dst, always_xy=False):
                return cls(src, dst)

        pyproj.CRS = _ShimCRS
        pyproj.Transformer = _ShimTransformer
        pyproj.__spec__ = __import__("importlib.machinery", fromlist=[
            "ModuleSpec"]).ModuleSpec("pyproj", None)
        sys.modules["pyproj"] = pyproj

    # topojson: Topology over the repo's encoder — the SAME encoder the
    # engine widget uses, so the geography differential certifies the
    # reference's plugin logic with the encoder held common
    if "topojson" not in sys.modules or isinstance(sys.modules["topojson"],
                                                   _InertModule):
        tp = types.ModuleType("topojson")

        class _ShimTopology:
            def __init__(self, geojson, prequantize=True, **_kw):
                self._geojson = geojson

            def to_dict(self):
                from niamoto_spark.operators.overlay import \
                    nested_to_topojson
                feats = self._geojson.get("features") or []
                if len(feats) != 1:
                    raise NotImplementedError(
                        "refdiff topojson shim: expected exactly one "
                        f"feature, got {len(feats)}")
                geom = feats[0]["geometry"]
                gtype = geom["type"]
                coords = geom["coordinates"]
                polys = [coords] if gtype == "Polygon" else coords
                return nested_to_topojson(gtype, polys)

        tp.Topology = _ShimTopology
        tp.__spec__ = __import__("importlib.machinery", fromlist=[
            "ModuleSpec"]).ModuleSpec("topojson", None)
        sys.modules["topojson"] = tp

    for name in ("rasterio", "rasterio.mask", "rasterio.features",
                 "rasterio.warp", "rasterio.transform", "rasterio.enums",
                 "fiona", "pyogrio",
                 "scipy", "scipy.stats", "scipy.spatial",
                 "scipy.spatial.distance", "sklearn", "sklearn.cluster",
                 "sklearn.ensemble", "sklearn.feature_extraction",
                 "sklearn.feature_extraction.text", "sklearn.linear_model",
                 "sklearn.metrics", "sklearn.model_selection",
                 "sklearn.pipeline", "sklearn.preprocessing",
                 "joblib", "markdown_it", "mdit_py_plugins", "httpx"):
        if name not in sys.modules:
            import importlib.machinery
            mod = _InertModule(name)
            # a live __spec__ keeps importlib.util.find_spec (e.g.
            # pyspark.testing's have_package probe) working
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod

    if "geopandas" not in sys.modules:
        gpd = types.ModuleType("geopandas")

        class GeoDataFrame(pd.DataFrame):
            """pd.DataFrame + a named active-geometry column.

            Covers what geospatial_extractor uses: construction with a
            geometry Series, .geometry.name, column selection keeping
            the subclass, iterrows (rows are plain Series so
            row.geometry resolves to the column), and to_json
            (GeoJSON FeatureCollection, geopandas' documented shape).
            """

            _metadata = ["_geometry_name"]

            def __init__(self, data=None, *args, geometry=None, crs=None,
                         **kwargs):
                super().__init__(data, *args, **kwargs)
                object.__setattr__(self, "_geometry_name", "geometry")
                if geometry is not None:
                    name = getattr(geometry, "name", None) or "geometry"
                    self[name] = geometry
                    object.__setattr__(self, "_geometry_name", name)

            @property
            def _constructor(self):
                return GeoDataFrame

            @property
            def geometry(self):
                return self[getattr(self, "_geometry_name", "geometry")]

            @geometry.setter
            def geometry(self, values):
                self[getattr(self, "_geometry_name", "geometry")] = values

            def to_json(self, **kwargs):
                import json as _json
                gname = getattr(self, "_geometry_name", "geometry")
                feats = []
                for idx, row in self.iterrows():
                    props = {}
                    for col in self.columns:
                        if col == gname:
                            continue
                        v = row[col]
                        if hasattr(v, "item"):
                            v = v.item()
                        if isinstance(v, float) and v != v:
                            v = None
                        props[col] = v
                    geom = row[gname]
                    feats.append({
                        "id": str(idx),
                        "type": "Feature",
                        "properties": props,
                        "geometry": (geom.__geo_interface__
                                     if geom is not None else None),
                    })
                return _json.dumps(
                    {"type": "FeatureCollection", "features": feats})

        gpd.GeoDataFrame = GeoDataFrame
        gpd.GeoSeries = pd.Series

        def _read_file(path, engine=None, **_kw):
            """Vector read via the repo's pure-python GeoPackage/SHP
            readers; geometry parsed into the shim classes."""
            from niamoto_spark.sources.vector import read_gpkg_records
            if str(path).lower().endswith((".gpkg",)):
                records = read_gpkg_records(str(path))
            else:
                raise NotImplementedError(
                    f"refdiff gpd.read_file: {path}")
            geoms = [(_shim_load_wkt(r.pop("geometry_wkt"))
                      if r.get("geometry_wkt") else r.pop("geometry_wkt"))
                     for r in records]
            gdf = GeoDataFrame(pd.DataFrame(records),
                               geometry=pd.Series(geoms, name="geometry"))
            return gdf

        def _clip(gdf, mask_gdf):
            """Row-wise polygon clip against the union of the mask's
            geometries (outer rings; the repo's Sutherland-Hodgman /
            general clipper) — row order preserved, empty results
            dropped, like gpd.clip."""
            from niamoto_spark.operators.utm import clip_nested
            mask_polys = []
            for g in mask_gdf.geometry:
                if g is not None:
                    mask_polys.extend(g._nested())
            keep_idx, new_geoms = [], []
            for idx, row in gdf.iterrows():
                g = row[getattr(gdf, "_geometry_name", "geometry")]
                if g is None or not isinstance(g, ShimPolygonal):
                    continue
                pieces = clip_nested(g._nested(), mask_polys)
                if not pieces:
                    continue
                keep_idx.append(idx)
                new_geoms.append(ShimPolygonal._from_nested(pieces))
            out = gdf.loc[keep_idx].copy()
            out[getattr(gdf, "_geometry_name", "geometry")] = new_geoms
            return out

        gpd.read_file = _read_file
        gpd.clip = _clip
        sys.modules["geopandas"] = gpd


def _shim_load_wkt_from_geojson(d):
    t = d.get("type", "").upper()
    coords = d.get("coordinates")
    if t == "POINT":
        return ShimPoint(*coords)
    geo_name = _GEOM_TYPES.get(t, (d.get("type"), None))[0]
    def tupleify(c):
        if c and isinstance(c[0], (int, float)):
            return tuple(c)
        return [tupleify(x) for x in c]
    geom = ShimBaseGeometry(tupleify(coords))
    geom.geom_type = geo_name
    return geom


# ---------------------------------------------------------------------------

def _install_unidecode() -> None:
    if "unidecode" in sys.modules:
        return
    import unicodedata
    mod = types.ModuleType("unidecode")
    mod.unidecode = lambda s: unicodedata.normalize(
        "NFKD", str(s)).encode("ascii", "ignore").decode("ascii")
    sys.modules["unidecode"] = mod


def patch_custom_formula_dict() -> None:
    """Whitelist ast.Dict in the reference's custom_formula safe-eval —
    shim-side only, AFTER ``import niamoto`` (so it cannot run from
    install(), which precedes the first reference import).

    The reference's own example phenology chain ends in a dict-literal
    merge formula ("{'raw': phenology_raw, ...}",
    docs/examples/config/transform.yml:170) that its evaluator rejects
    ("Unsupported formula expression: Dict",
    custom_calculator.py:1544-1601 — ast.Dict is not in the node
    allowlist) even though the config's intent is plainly the merge.
    Accepting literal dicts with constant STRING keys (values still go
    through the untouched allowlist) lets the reference execute its
    verbatim config, so the grid diffs the phenology chain on every
    variant instead of excluding it."""
    import ast as _ast

    from niamoto.core.plugins.transformers.ecological import \
        custom_calculator as _cc

    cls = _cc.CustomCalculator
    orig = cls._evaluate_custom_formula_node
    if getattr(orig, "_dict_whitelisted", False):
        return

    def _node_eval(self, node, names):
        if isinstance(node, _ast.Dict):
            out = {}
            for k, v in zip(node.keys, node.values):
                if not (isinstance(k, _ast.Constant)
                        and isinstance(k.value, str)):
                    raise ValueError(
                        "Dict keys must be string constants")
                out[k.value] = _node_eval(self, v, names)
            return out
        return orig(self, node, names)

    _node_eval._dict_whitelisted = True
    cls._evaluate_custom_formula_node = _node_eval


def install(reference_src: str = "/root/reference/src") -> None:
    """Install all shims and put the reference on sys.path."""
    _install_rich()
    _install_sqlalchemy()
    _install_database_preempt()
    _install_geo()
    _install_unidecode()
    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)
