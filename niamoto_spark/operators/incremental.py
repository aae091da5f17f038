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
    # committed_version, not current_version: a pending/aborted
    # multi-table claim at the source head is not visible data — folding
    # its files into the state would corrupt the aggregate.
    src_v = M.committed_version(source_path)
    if src_v < 0:
        raise FileNotFoundError(f"no committed snapshot at {source_path}")

    state_v = M.committed_version(state_path)
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


@register("maintain_join", PluginType.TRANSFORMER)
def maintain_join(spark: SparkSession, left_path: str, right_path: str,
                  state_path: str, on: "list[str] | str") -> int:
    """Incremental INNER-join view maintenance over two append-only
    manifest tables — the delta algebra

        Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB

    (the ΔA ⋈ ΔB cross term is inside the first factor because B_new
    already contains ΔB).  Only delta-sized joins run; the accumulated
    join result is APPENDED to, never recomputed — at 100 TB the fact
    history is touched zero times per maintenance run.

    Both source watermarks ride in the state commit document, so a
    crash between runs re-reads the same deltas into the same result
    (idempotent, same contract as ``maintain_aggregate``).  Sources
    that dropped files since the watermark (overwrite / compaction /
    DML) raise — append-only is what makes the algebra exact.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lv = M.committed_version(left_path)
    rv = M.committed_version(right_path)
    if lv < 0 or rv < 0:
        raise FileNotFoundError("maintain_join: both sources must have "
                                "a committed snapshot")
    state_v = M.committed_version(state_path)
    if state_v >= 0:
        doc = M._read_manifest(state_path, state_v)
        last_lv = int(doc.get("left_version", -1))
        last_rv = int(doc.get("right_version", -1))
    else:
        last_lv = last_rv = -1
    if lv <= last_lv and rv <= last_rv:
        return state_v
    for path, last in ((left_path, last_lv), (right_path, last_rv)):
        if last >= 0:
            old = set(M._read_manifest(path, last)["files"])
            new = set(M._read_manifest(
                path, M.committed_version(path))["files"])
            if old - new:
                raise ValueError(
                    f"maintain_join: {path} dropped files since "
                    f"version {last}; append-only sources required — "
                    "rebuild the state from scratch")

    b_new = M.read_table(spark, right_path)
    parts = []
    if lv > last_lv:
        parts.append(M.table_changes(spark, left_path, last_lv, lv)
                     .join(b_new, keys))
    if rv > last_rv:
        a_old = (M.read_table(spark, left_path, version=last_lv)
                 if last_lv >= 0 else None)
        db = M.table_changes(spark, right_path, last_rv, rv)
        if a_old is not None:
            parts.append(a_old.join(db, keys))
    if not parts:
        return state_v
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    return M.append(delta, state_path,
                    extra_meta={"left_version": lv,
                                "right_version": rv})
