"""Darwin Core mapping DSL (reference:
transformers/formats/niamoto_to_dwc_occurrence.py:100-1010).

The reference maps occurrence dicts to DwC terms per-row through a
declarative DSL — ``@source.field`` / ``@taxon.field`` references, static
literals, and named generators (``unique_occurrence_id``,
``extract_specific_epithet``, ``format_event_date``, ...).  Here the SAME
mapping dialect compiles to one Spark ``select`` projection: every
reference becomes a Column expression, every generator a Column builder,
so the whole mapping is a narrow codegen transform — no per-row Python,
and the taxon side joins once (broadcast) instead of the reference's
per-taxon occurrence fetch (niamoto_to_dwc_occurrence.py:183-225).

Nested references resolve through struct fields when the column is a
struct and through ``get_json_object`` when it is a JSON string — the two
ways the reference's dict paths land in a DataFrame.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from niamoto_spark.registry import PluginType, register

_EPITHET_CLEAN = r"\s+\([^)]+\)"
_INFRA_RE = r"(?:subsp\.|subvar\.|var\.|forma|f\.|race)\s+(\S+)"


class _Ctx:
    """Compilation context: occurrence schema, optional taxon columns
    (prefixed ``__tx_``), taxon id + per-taxon occurrence index for the
    generator fallbacks."""

    def __init__(self, df: DataFrame, taxon_cols: set[str],
                 taxon_id: Column, occ_index: Column):
        self.df = df
        self.taxon_cols = taxon_cols
        self.taxon_id = taxon_id
        self.occ_index = occ_index

    def _nested(self, root_type, root_col: Column, segs: list[str]) -> Column:
        if not segs:
            return root_col
        if isinstance(root_type, T.StringType):
            return F.get_json_object(root_col, "$." + ".".join(segs))
        col = root_col
        for s in segs:
            col = col.getField(s) if isinstance(root_type, T.StructType) else col[s]
            root_type = (root_type[s].dataType
                         if isinstance(root_type, T.StructType) else None)
        return col

    def ref(self, reference: str) -> Column:
        """``@source.a.b`` / ``@taxon.x`` / bare column name -> Column
        (reference _resolve_reference, :599-640)."""
        path = reference
        side = "source"
        if path.startswith("@"):
            body = path[1:]
            if body.startswith("source."):
                side, path = "source", body[len("source."):]
            elif body.startswith("taxon."):
                side, path = "taxon", body[len("taxon."):]
            else:
                return F.lit(None)
        segs = path.split(".")
        if side == "taxon":
            root = "__tx_" + segs[0]
            if root not in self.taxon_cols:
                return F.lit(None)
            dt = self.df.schema[root].dataType
            return self._nested(dt, F.col(root), segs[1:])
        if segs[0] not in self.df.columns:
            # dotted shorthand may target a struct column's field
            return F.lit(None)
        dt = self.df.schema[segs[0]].dataType
        return self._nested(dt, F.col(segs[0]), segs[1:])


def _occ_id_pattern(ctx: _Ctx, params: Mapping[str, Any],
                    default_prefix: str) -> Column:
    """prefix + source value, falling back to prefix + taxonId_index —
    reference _generate_unique_occurrence_id (:741-765)."""
    prefix = F.lit(params.get("prefix", default_prefix))
    # occurrences with no matching taxon row (left-join null) still need a
    # usable unique id -- the reference always generates one; a plain
    # concat would propagate the NULL into the whole id (ADVICE r2)
    fallback = F.concat(prefix,
                        F.coalesce(ctx.taxon_id.cast("string"),
                                   F.lit("unknown")),
                        F.lit("_"), ctx.occ_index.cast("string"))
    sf = params.get("source_field")
    if sf:
        val = ctx.ref(sf).cast("string")
        return F.when(val.isNotNull() & (val != ""),
                      F.concat(prefix, val)).otherwise(fallback)
    return fallback


def _event_date(ctx: _Ctx, params: Mapping[str, Any]) -> Column:
    """ISO 8601 event date (reference _format_event_date :888-932):
    date/timestamp -> yyyy-MM-dd, DD/MM/YYYY string -> reformat, bare
    numeric (a month value) -> null, other strings pass through."""
    src = params.get("source_field", "@source.date")
    col = ctx.ref(src)
    s = col.cast("string")
    parts = F.split(s, "/")
    reformatted = F.concat(F.element_at(parts, 3), F.lit("-"),
                           F.lpad(F.element_at(parts, 2), 2, "0"), F.lit("-"),
                           F.lpad(F.element_at(parts, 1), 2, "0"))
    # try_cast through the STRING form: try_cast on the typed column fails
    # at analysis time for impossible pairs (e.g. timestamp -> double)
    return (F.when(s.try_cast("double").isNotNull()
                   & ~s.rlike(r"[-/]"), F.lit(None).cast("string"))
             .when(s.try_cast("timestamp").isNotNull()
                   & s.rlike(r"^\d{4}-"), F.substring(s, 1, 10))
             .when(F.size(parts) == 3, reformatted)
             .otherwise(s))


def _coordinates(ctx: _Ctx, params: Mapping[str, Any]) -> Column:
    """POINT-WKT or numeric coordinate with range validation (reference
    _format_coordinates :939-976)."""
    from niamoto_spark.operators.geospatial import point_lat, point_lon

    which = params.get("type", params.get("axis", "latitude"))
    lat = which in ("latitude", "lat")
    col = ctx.ref(params["source_field"])
    s = col.cast("string")
    from_wkt = (point_lat if lat else point_lon)(s)
    direct = s.try_cast("double")
    val = F.when(s.startswith("POINT"), from_wkt).otherwise(direct)
    lo, hi = (-90.0, 90.0) if lat else (-180.0, 180.0)
    return F.when((val >= lo) & (val <= hi), val)


def _generator(name: str, params: Mapping[str, Any], ctx: _Ctx) -> Column:
    """Named generator -> Column builder (reference registry :58-82)."""
    clean = lambda c: F.regexp_replace(c.cast("string"), _EPITHET_CLEAN, "")  # noqa: E731
    if name == "unique_occurrence_id":
        return _occ_id_pattern(ctx, params, "niaocc_")
    if name == "unique_event_id":
        return _occ_id_pattern(ctx, params, "niaevt_")
    if name == "unique_identification_id":
        return _occ_id_pattern(ctx, params, "niaid_")
    if name == "extract_specific_epithet":
        nm = clean(ctx.ref(params.get("source_field", "@taxon.full_name")))
        parts = F.split(F.trim(nm), r"\s+")
        return F.when(F.size(parts) >= 2, F.element_at(parts, 2))
    if name == "extract_infraspecific_epithet":
        nm = clean(ctx.ref(params.get("source_field", "@taxon.full_name")))
        hit = F.regexp_extract(nm, _INFRA_RE, 1)
        return F.when(hit != "", hit)
    if name == "format_event_date":
        return _event_date(ctx, params)
    if name == "extract_year":
        d = _event_date(ctx, params)
        return F.substring(d, 1, 4).try_cast("int")
    if name == "extract_month":
        src = params.get("source_field", "@source.month_obs")
        m = ctx.ref(src).cast("string").try_cast("double").cast("int")
        from_date = F.substring(_event_date(ctx, dict(params, source_field=params.get(
            "date_field", "@source.date"))), 6, 2).try_cast("int")
        return F.when((m >= 1) & (m <= 12), m).otherwise(from_date)
    if name == "extract_day":
        d = _event_date(ctx, params)
        return F.when(F.length(d) >= 10, F.substring(d, 9, 2).try_cast("int"))
    if name == "format_coordinates":
        return _coordinates(ctx, params)
    if name == "map_establishment_means":
        e = ctx.ref(params.get("endemic_field", "@taxon.metadata.endemic"))
        s = F.lower(e.cast("string"))
        return (F.when(s == "true", F.lit("native"))
                 .when(s == "false", F.lit("introduced")))
    if name == "map_occurrence_status":
        sf = params.get("status_field")
        if sf:
            st = ctx.ref(sf).cast("string")
            return F.coalesce(F.when(st != "", st), F.lit("present"))
        return F.lit("present")
    if name == "format_media_urls":
        src = params.get("source_list", "@taxon.metadata.images")
        url_key = params.get("url_key", "url")
        col = ctx.ref(src)
        try:
            dt = ctx.df.select(col).schema[0].dataType
        except Exception:
            return F.lit(None).cast("string")
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            return F.array_join(F.transform(col, lambda x: x[url_key]), " | ")
        if isinstance(dt, T.ArrayType):
            return F.array_join(col.cast("array<string>"), " | ")
        return F.lit(None).cast("string")
    if name == "count_occurrences":
        return F.count(F.lit(1)).over(Window.partitionBy(ctx.taxon_id))
    if name == "current_date":
        return F.date_format(F.current_date(), "yyyy-MM-dd")
    raise ValueError(f"unknown DwC generator {name!r}")


def _compile_term(spec: Any, ctx: _Ctx) -> Column:
    if isinstance(spec, str):
        if spec.startswith("@"):
            return ctx.ref(spec)
        return F.lit(spec)
    if isinstance(spec, Mapping):
        if "generator" in spec:
            return _generator(spec["generator"], spec.get("params", {}), ctx)
        if "source" in spec:
            return ctx.ref(spec["source"])
        return F.lit(str(dict(spec)))
    return F.lit(spec)


@register("niamoto_to_dwc_occurrence", PluginType.TRANSFORMER)
def to_dwc_occurrence(df: DataFrame, mapping: Mapping[str, Any],
                      taxon: DataFrame | None = None,
                      occ_taxon_col: str | None = None,
                      taxon_id_col: str = "id",
                      order_col: str | None = None) -> DataFrame:
    """Project occurrence rows to Darwin Core terms per the mapping DSL.

    ``taxon`` (a dimension) joins once via broadcast on
    ``occ_taxon_col == taxon_id_col`` and exposes ``@taxon.x`` references;
    the reference instead re-fetches occurrences per taxon
    (niamoto_to_dwc_occurrence.py:183-225) — same output, set-oriented.
    ``order_col`` fixes the per-taxon occurrence index used by the
    unique_*_id fallbacks (default: first column) so ids are deterministic
    under any partitioning."""
    base = df
    taxon_cols: set[str] = set()
    if taxon is not None:
        if occ_taxon_col is None:
            raise ValueError("occ_taxon_col is required when taxon is given")
        tx = taxon.select([F.col(c).alias("__tx_" + c) for c in taxon.columns])
        base = df.join(F.broadcast(tx),
                       df[occ_taxon_col] == tx["__tx_" + taxon_id_col], "left")
        taxon_cols = {"__tx_" + c for c in taxon.columns}
        taxon_id = F.col("__tx_" + taxon_id_col)
    elif occ_taxon_col is not None:
        taxon_id = F.col(occ_taxon_col)
    else:
        taxon_id = F.lit("unknown")
    order = order_col or df.columns[0]
    if taxon is None and occ_taxon_col is None:
        # no taxon key: a row_number window over the constant taxon id
        # would serialize everything through one task — use a partition-
        # local index instead (ids stay unique, not globally dense)
        occ_index = F.monotonically_increasing_id()
    else:
        occ_index = F.row_number().over(
            Window.partitionBy(taxon_id).orderBy(F.col(order))) - 1
    ctx = _Ctx(base, taxon_cols, taxon_id, occ_index)
    cols = [_compile_term(spec, ctx).alias(term)
            for term, spec in mapping.items() if term != "error_handling"]
    return base.select(*cols)
