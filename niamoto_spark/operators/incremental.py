"""Incremental (materialized-view style) aggregate maintenance over
manifest tables.

At 100 TB you cannot re-aggregate the whole fact table every time new
data lands; the standard fix is a maintained materialization: keep the
aggregate STATE as its own (tiny, key-sized) table and fold in only the
CHANGES since the last maintenance run.  For append-only sources every
algebraic aggregate (sum / count / min / max, and avg = sum/count)
maintains exactly: new_state = combine(old_state, agg(delta)).

This composes two existing pieces of the engine:
- ``sources/manifest.table_changes`` supplies the delta (the files added
  between two committed versions — CDC for the append-only format);
- the state lives in its own manifest table whose commit document
  carries the SOURCE VERSION WATERMARK, so maintenance is idempotent
  and crash-safe: the state snapshot and the "maintained through
  version N" record are one atomic commit.  Re-running after a crash
  re-reads the same delta and overwrites to the same result.

Cost model per maintenance run: one scan of the DELTA (not the source),
one shuffle of (delta-aggregate ∪ old state) keyed by the group-by key
— both sized by the delta and the key cardinality, never by the
accumulated fact history.

Reference parity: the reference recomputes every widget aggregate from
SQLite on each run (transformer.py:488-541, the O(entities × widgets)
loop); maintained state is the scale-path this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register
from niamoto_spark.sources import manifest as M

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,   # partial counts combine by addition
    "min": F.min,
    "max": F.max,
}

_FIRST = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}


def _out_col(fn: str, col: str) -> str:
    return f"{fn}_{col}"


def _delta_agg(delta: DataFrame, key_cols: list[str],
               aggs: list[tuple[str, str]]) -> DataFrame:
    return delta.groupBy(*key_cols).agg(*[
        _FIRST[fn](col).alias(_out_col(fn, col)) for fn, col in aggs])


def _combine(state: DataFrame, delta_agg: DataFrame, key_cols: list[str],
             aggs: list[tuple[str, str]]) -> DataFrame:
    both = state.unionByName(delta_agg)
    return both.groupBy(*key_cols).agg(*[
        _COMBINE[fn](_out_col(fn, col)).alias(_out_col(fn, col))
        for fn, col in aggs])


@register("maintain_aggregate", PluginType.TRANSFORMER)
def maintain_aggregate(spark: SparkSession, source_path: str,
                       state_path: str, key_cols: list[str],
                       aggs: list[tuple[str, str]]) -> int:
    """Fold the source table's changes since the last maintenance into
    the aggregate state table.  ``aggs`` is [(fn, col), ...] with fn in
    {sum, count, min, max}; output columns are named ``fn_col``.

    Returns the new state version (or the current one when the source
    has no new commits — maintenance is a no-op then, no empty version
    is written).  The source must be append-only (its manifest never
    rewrites files): min/max and count are only incrementally correct
    without deletions, so a source whose latest version DROPPED files
    raises instead of silently corrupting the state."""
    for fn, _ in aggs:
        if fn not in _FIRST:
            raise ValueError(f"unsupported aggregate {fn!r}; "
                             f"algebraic only: {sorted(_FIRST)}")
    src_v = M.current_version(source_path)
    if src_v < 0:
        raise FileNotFoundError(f"no committed snapshot at {source_path}")

    state_v = M.current_version(state_path)
    if state_v >= 0:
        doc = M._read_manifest(state_path, state_v)
        last_v = int(doc.get("source_version", -1))
    else:
        last_v = -1
    if src_v <= last_v:
        return state_v  # already maintained through src_v

    if last_v >= 0:
        old_files = set(M._read_manifest(source_path, last_v)["files"])
        new_files = set(M._read_manifest(source_path, src_v)["files"])
        if old_files - new_files:
            raise ValueError(
                "maintain_aggregate: source dropped files between "
                f"versions {last_v} and {src_v} (overwrite/compaction); "
                "incremental maintenance is append-only — rebuild the "
                "state from scratch instead")

    delta = M.table_changes(spark, source_path, last_v, src_v)
    d_agg = _delta_agg(delta, key_cols, aggs)
    if state_v >= 0:
        new_state = _combine(M.read_table(spark, state_path), d_agg,
                             key_cols, aggs)
    else:
        new_state = d_agg
    return M.overwrite(new_state, state_path,
                       extra_meta={"source_version": src_v})


def read_aggregate(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained aggregate (current snapshot of the state table)."""
    return M.read_table(spark, state_path)
