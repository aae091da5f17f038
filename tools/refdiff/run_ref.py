"""Run the reference's TransformerService over the synthesized project.

Builds the post-import SQLite database the reference transform stage
expects — using the reference's OWN HierarchyBuilder for the derived
taxonomy and nested sets (hierarchy_builder.py:43-114,532-640) and the
reference's documented multi-feature row shape for shapes
(engine.py:371-520; the spatial importer itself needs geopandas, which
this container lacks) — then executes transform_data() and reads the
per-group result tables back as {group: {entity_id: {widget: value}}}.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pandas as pd

from tools.refdiff import shims
from tools.refdiff.synth import SHAPE_SOURCES, _box_wkt


def _ensure_reference_loaded():
    shims.install()
    # Pre-import the plugin packages so every module is COMPLETE in
    # sys.modules before the loader's file-based discovery runs —
    # otherwise the package __init__ (which imports each plugin module
    # eagerly) can observe a half-executed module and skip it.
    import niamoto.core.plugins.transformers  # noqa: F401
    import niamoto.core.plugins.loaders  # noqa: F401
    # post-import patch: let the reference run its own example phenology
    # chain (dict-literal custom_formula) — see the docstring there
    shims.patch_custom_formula_dict()


def _derive_taxonomy(db, proj: dict, occ: pd.DataFrame) -> pd.DataFrame:
    """Derive entity_taxons with the reference's own HierarchyBuilder,
    driven by the PROJECT's import.yml (r13 import axis: the variant
    grid mutates levels / incomplete_rows / id_strategy — both engines
    must consume the same written config).  REPLACES any existing
    entity_taxons, and regenerates the join_table bridge when the
    (possibly mutated) transform.yml links occurrences through one
    (r14 loader axis: SQLite table for the reference,
    imports/<name>.csv for the Spark pipeline — same rows, one
    artifact doctrine)."""
    from niamoto.core.imports.config_models import (ExtractionConfig,
                                                    HierarchyLevel)
    from niamoto.core.imports.hierarchy_builder import HierarchyBuilder

    import yaml as _yaml
    with open(os.path.join(proj["config_dir"], "import.yml")) as fh:
        _imp = _yaml.safe_load(fh)
    _ex = (_imp["entities"]["references"]["taxons"]["connector"]
           ["extraction"])
    builder = HierarchyBuilder(db)
    extraction = ExtractionConfig(
        levels=[HierarchyLevel(name=lv["name"], column=lv["column"])
                for lv in _ex["levels"]],
        id_column=_ex.get("id_column"),
        name_column=_ex.get("name_column"),
        incomplete_rows=_ex.get("incomplete_rows", "skip"),
        id_strategy=_ex.get("id_strategy", "hash"))
    taxons = builder.build_from_dataset(
        "dataset_occurrences", extraction, "taxons")
    taxons = builder.add_nested_sets(taxons)
    if "extra_data" not in taxons.columns:
        taxons["extra_data"] = None
    taxons.to_sql("entity_taxons", db.engine, index=False,
                  if_exists="replace")

    with open(os.path.join(proj["config_dir"], "transform.yml")) as fh:
        _tcfg = _yaml.safe_load(fh) or []
    for _g in _tcfg:
        if not isinstance(_g, dict) or _g.get("group_by") != "taxons":
            continue
        for _src in _g.get("sources") or []:
            _rel = (_src or {}).get("relation") or {}
            if _rel.get("plugin") == "join_table" and \
                    _rel.get("join_table"):
                from tools.refdiff.synth import make_occurrence_links
                links = make_occurrence_links(taxons, occ)
                links.to_sql(_rel["join_table"], db.engine, index=False,
                             if_exists="replace")
                links.to_csv(
                    os.path.join(proj["imports_dir"],
                                 f"{_rel['join_table']}.csv"),
                    index=False)
    return taxons


def rebuild_reference_taxonomy(proj: dict, occ: pd.DataFrame) -> None:
    """Partial RE-IMPORT against the EXISTING reference db: replace
    dataset_occurrences with ``occ`` and re-derive entity_taxons (same
    import.yml extraction, hash ids stable for unchanged names) while
    leaving every group RESULT table untouched.  This is the real user
    loop behind ``transform_data(recreate_table=False)`` after the
    source data changed its entity set — the reference's upsert flush
    (transformer.py:1287-1318) then inserts new entities and leaves
    vanished entities' rows STALE in the group table."""
    _ensure_reference_loaded()
    from niamoto.common.database import Database  # ShimDatabase

    db_path = os.path.join(proj["root"], "db", "niamoto.db")
    db = Database(db_path)
    occ.to_sql("dataset_occurrences", db.engine, index=False,
               if_exists="replace")
    _derive_taxonomy(db, proj, occ)
    db.close()


def build_reference_db(proj: dict) -> str:
    """Create <root>/db/niamoto.db with entity tables + registry rows."""
    _ensure_reference_loaded()

    from niamoto.common.database import Database  # ShimDatabase
    from niamoto.core.imports.registry import EntityKind, EntityRegistry

    db_path = os.path.join(proj["root"], "db", "niamoto.db")
    if os.path.exists(db_path):
        os.remove(db_path)
    db = Database(db_path)
    registry = EntityRegistry(db)

    occ: pd.DataFrame = proj["occurrences"]
    occ.to_sql("dataset_occurrences", db.engine, index=False)
    proj["plots"].to_sql("entity_plots", db.engine, index=False)

    _derive_taxonomy(db, proj, occ)

    # --- shapes: documented multi-feature shape (engine.py:371-520) -----
    rows, fid = [], 1
    for source_name, _fname, _name_field, feats in SHAPE_SOURCES:
        type_id = fid
        rows.append({"id": fid, "shape_id": None, "name": source_name,
                     "location": None, "entity_type": "type",
                     "shape_type": "type", "type": source_name,
                     "level": 0, "parent_id": None})
        fid += 1
        slug = source_name.lower().replace(" ", "_")
        for idx, (feat_name, bbox) in enumerate(feats, 1):
            rows.append({"id": fid, "shape_id": f"{slug}_{idx}",
                         "name": feat_name, "location": _box_wkt(bbox),
                         "entity_type": "shape", "shape_type": "shape",
                         "type": source_name, "level": 1,
                         "parent_id": type_id})
            fid += 1
    from niamoto.core.imports.hierarchy_builder import HierarchyBuilder
    shapes = HierarchyBuilder(db).add_nested_sets(pd.DataFrame(rows))
    shapes["extra_data"] = None
    shapes.to_sql("entity_shapes", db.engine, index=False)

    registry.register_entity(
        name="occurrences", kind=EntityKind.DATASET,
        table_name="dataset_occurrences",
        config={"schema": {"id_field": "id"}})
    registry.register_entity(
        name="taxons", kind=EntityKind.REFERENCE,
        table_name="entity_taxons", config={"schema": {"id_field": "id"}})
    registry.register_entity(
        name="plots", kind=EntityKind.REFERENCE, table_name="entity_plots",
        config={"schema": {"id_field": "id_plot"}})
    registry.register_entity(
        name="shapes", kind=EntityKind.REFERENCE,
        table_name="entity_shapes", config={"schema": {"id_field": "id"}})
    db.close()
    return db_path


def run_reference_transform(proj: dict, group_by: str | None = None,
                            recreate_table: bool = True) -> dict:
    """transform_data() through the reference service; returns results
    as {group: {entity_id: {widget: parsed_json_or_scalar}}}.

    ``group_by``/``recreate_table`` expose the reference's PARTIAL
    re-run surface (transformer.py:360-366): recreate_table=False takes
    the INSERT..ON CONFLICT upsert flush (:1287-1318) into the existing
    group table instead of replacing it — the r14 incremental
    differential drives this against the engine's mode='incremental'
    upsert."""
    _ensure_reference_loaded()
    os.environ["NIAMOTO_HOME"] = proj["root"]

    from niamoto.common.config import Config
    from niamoto.core.services.transformer import TransformerService

    Config.clear_cache()
    config = Config(proj["config_dir"], create_default=False)
    db_path = os.path.join(proj["root"], "db", "niamoto.db")
    svc = TransformerService(db_path, config, enable_cli_integration=False)
    svc.transform_data(group_by=group_by, recreate_table=recreate_table)
    return read_reference_tables(db_path)


def read_reference_tables(db_path: str) -> dict:
    """Read the per-group result tables back (no transform run)."""
    out: dict = {}
    con = sqlite3.connect(db_path)
    try:
        for group in ("taxons", "plots", "shapes"):
            cur = con.cursor()
            try:
                cur.execute(f'SELECT * FROM "{group}"')
            except sqlite3.OperationalError:
                out[group] = {}
                continue
            cols = [d[0] for d in cur.description]
            id_col = f"{group}_id"
            gmap: dict = {}
            for row in cur.fetchall():
                rec = dict(zip(cols, row))
                eid = rec.pop(id_col)
                widgets = {}
                for k, v in rec.items():
                    if v is None:
                        continue
                    if isinstance(v, str):
                        try:
                            v = json.loads(v)
                        except (ValueError, TypeError):
                            pass
                    widgets[k] = v
                gmap[eid] = widgets
            out[group] = gmap
    finally:
        con.close()
    return out


def run_reference_export(proj: dict,
                         target: str | tuple = ("json_api",
                                                "dwc_occurrence_json"),
                         group_filter: str | None = None) -> str:
    """Run the reference ExporterService for the diffable targets;
    returns the exports root.  ``group_filter`` is the CLI's
    partial-export surface (exporter.py:run_export)."""
    _ensure_reference_loaded()
    import niamoto.core.plugins.exporters  # noqa: F401  (register them)
    os.environ["NIAMOTO_HOME"] = proj["root"]

    from niamoto.common.config import Config
    from niamoto.core.services.exporter import ExporterService

    Config.clear_cache()
    config = Config(proj["config_dir"], create_default=False)
    db_path = os.path.join(proj["root"], "db", "niamoto.db")
    svc = ExporterService(db_path, config)
    # output_dir in export.yml is project-relative; the reference CLI
    # runs from the project root (json_api_exporter.py:325 Path(...))
    targets = [target] if isinstance(target, str) else list(target)
    cwd = os.getcwd()
    os.chdir(proj["root"])
    try:
        for t in targets:
            results = svc.run_export(target_name=t,
                                     group_filter=group_filter)
            status = results.get(t, {})
            if status.get("status") != "success":
                raise RuntimeError(f"reference export failed: {status}")
    finally:
        os.chdir(cwd)
    return os.path.join(proj["root"], "exports")


def main() -> int:
    import tempfile

    from tools.refdiff.synth import build_project

    root = os.environ.get("REFDIFF_ROOT") or tempfile.mkdtemp(
        prefix="refdiff_")
    proj = build_project(root)
    build_reference_db(proj)
    results = run_reference_transform(proj)
    for group, gmap in results.items():
        n_widgets = sum(len(w) for w in gmap.values())
        print(f"{group}: {len(gmap)} entities, {n_widgets} widget values")
    out_path = os.path.join(root, "reference_results.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, ensure_ascii=False, indent=1, default=str)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
