"""TransformerService — the set-oriented equivalent of the reference's
per-entity transform pipeline (reference:
src/niamoto/core/services/transformer.py:359-428, loop :488-541).

The reference runs, for each group entity id, each loader query and each
widget transform — O(entities x widgets) SQL round trips.  Here:

1. the loader runs ONCE per (group, source): a single join tagging every
   fact row with its group id (operators/loaders.py);
2. every widget is computed for ALL entities in one DataFrame job;
3. widget results are packed to one JSON column each (``to_json`` of a
   struct / collected struct array — the reference's group table stores one
   JSON column per widget, transformer.py:1142-1186);
4. the per-widget frames are joined into ONE wide result table keyed by
   ``<group>_id`` and written with mode=overwrite (the reference's staging
   -table swap, engine.py:58-168) or merged for incremental runs.

Config shape mirrors transform.yml (SURVEY §3.1): ``group_by``, ``sources``
with a relation plugin, ``widgets`` mapping name -> {plugin, params}.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, get_plugin


@dataclass
class WidgetSpec:
    name: str
    plugin: str
    params: dict = field(default_factory=dict)
    # callable overrides plugin lookup (for tests / lambdas)
    func: Callable[..., DataFrame] | None = None
    # None -> derived from the plugin kind (see pipeline.SINGLE_ROW_WIDGETS)
    single_row: bool | None = None


@dataclass
class GroupConfig:
    group_by: str                 # group entity name (e.g. "plots")
    group_id_col: str             # id column tagging fact rows
    widgets: list[WidgetSpec] = field(default_factory=list)


class TransformerService:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    def transform_group(self, cfg: GroupConfig, loaded: DataFrame,
                        group_ids: DataFrame | None = None) -> DataFrame:
        """Compute all widgets over the loaded (group-tagged) fact frame and
        return the wide per-entity result table:
        columns = [<group_id_col>, <widget name (JSON string)> ...].
        """
        gid = cfg.group_id_col
        if group_ids is None:
            group_ids = loaded.select(gid).distinct()
        result = group_ids
        for w in cfg.widgets:
            func = w.func or get_plugin(w.plugin, PluginType.TRANSFORMER)
            wdf = func(loaded, [gid], **w.params)
            from niamoto_spark.pipeline import SINGLE_ROW_WIDGETS

            single = w.single_row if w.single_row is not None \
                else w.plugin in SINGLE_ROW_WIDGETS
            packed = self._pack_json(wdf, gid, w.name, single_row=single)
            result = result.join(packed, gid, "left")
        return result

    def _pack_json(self, wdf: DataFrame, gid: str, name: str,
                   single_row: bool = False) -> DataFrame:
        """One JSON column per widget: object for single-row widget kinds,
        array otherwise — the shape is a property of the widget KIND, never
        the per-entity row count, so each column has one stable schema
        (the reference's output_structure contract, SURVEY §2.5)."""
        others = [c for c in wdf.columns if c != gid]
        # order struct fields so the array's deterministic sort is also the
        # presentation order (rank/bin/month leading)
        lead = [c for c in ("rank", "bin_index", "month", "class_name",
                            "category", "out_group", "label")
                if c in others]
        others = lead + [c for c in others if c not in lead]
        packed = (wdf.groupBy(gid)
                  .agg(F.sort_array(F.collect_list(F.struct(*others))).alias("__rows")))
        json_col = F.to_json(F.col("__rows")[0]) if single_row \
            else F.to_json(F.col("__rows"))
        return packed.select(F.col(gid), json_col.alias(name))

    def transform_single_widget(self, loaded: DataFrame, gid: str,
                                plugin: str, params: dict) -> DataFrame:
        """One-widget preview (the GUI preview endpoint's service method,
        reference transformer.py:149-185): run a single transformer over the
        loaded frame without building the group table."""
        func = get_plugin(plugin, PluginType.TRANSFORMER)
        return func(loaded, [gid], **params)

    def write_results(self, result: DataFrame, path: str,
                      mode: str = "overwrite") -> None:
        """Persist the group table.  Parquet overwrite is the staging-swap
        equivalent; with a Delta-enabled session this becomes MERGE for
        incremental runs (reference transformer.py:1287-1321)."""
        result.write.mode(mode).parquet(path)
