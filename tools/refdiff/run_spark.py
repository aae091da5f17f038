"""Run THIS engine's Pipeline over the same synthesized project."""

from __future__ import annotations

import json
import os

import yaml


def run_spark_pipeline(spark, proj: dict) -> dict:
    """import + transform through niamoto_spark.Pipeline; returns
    {group: {entity_id: {widget: parsed_json}}} like run_ref."""
    from niamoto_spark.pipeline import Pipeline

    warehouse = os.path.join(proj["root"], "warehouse")
    p = Pipeline(spark, warehouse)
    with open(os.path.join(proj["config_dir"], "import.yml")) as fh:
        import_cfg = yaml.safe_load(fh)
    p.run_import(import_cfg, base_dir=proj["root"])
    with open(os.path.join(proj["config_dir"], "transform.yml")) as fh:
        transform_cfg = yaml.safe_load(fh)
    results = p.run_transform(transform_cfg, base_dir=proj["root"])
    for w in p.warnings:
        print("WARN", w)

    out: dict = {}
    for group, df in results.items():
        gid = p.registry.get(group).id_field
        gmap: dict = {}
        for row in df.collect():
            rec = row.asDict()
            eid = rec.pop(gid)
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
    return out


def read_spark_results(spark, proj: dict,
                       groups=("taxons", "plots", "shapes")) -> dict:
    """Read the warehouse's persisted {group}_results.parquet tables
    back as {group: {entity_id: {widget: parsed_json}}} — the
    incremental differential compares PERSISTED state (what a re-run
    upserted), not the returned frames."""
    from niamoto_spark.catalog import EntityRegistry

    warehouse = os.path.join(proj["root"], "warehouse")
    reg = EntityRegistry.open(os.path.join(warehouse, "registry.json"))
    out: dict = {}
    for group in groups:
        path = os.path.join(warehouse, f"{group}_results.parquet")
        if not os.path.exists(path):
            out[group] = {}
            continue
        gid = reg.get(group).id_field
        gmap: dict = {}
        for row in spark.read.parquet(path).collect():
            rec = row.asDict()
            eid = rec.pop(gid)
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
    return out


def run_spark_export(spark, proj: dict,
                     group_filter: str | None = None,
                     target_name: str | None = None) -> str:
    """Reference export.yml json_api target through our Pipeline;
    returns the output dir.  Requires run_spark_pipeline to have run
    (the Pipeline rebuilds its registry from the warehouse).
    ``group_filter`` / ``target_name`` mirror the reference CLI's two
    partial-export filters."""
    from niamoto_spark.pipeline import Pipeline

    warehouse = os.path.join(proj["root"], "warehouse")
    p = Pipeline(spark, warehouse)
    with open(os.path.join(proj["config_dir"], "import.yml")) as fh:
        import_cfg = yaml.safe_load(fh)
    # re-register entities (id fields) without re-importing
    from niamoto_spark.catalog import EntityRegistry
    reg_path = os.path.join(warehouse, "registry.json")
    if os.path.exists(reg_path):
        p.registry = EntityRegistry.open(reg_path)
    if not p.registry.names():
        p.run_import(import_cfg, base_dir=proj["root"])
    with open(os.path.join(proj["config_dir"], "export.yml")) as fh:
        export_cfg = yaml.safe_load(fh)
    out_root = os.path.join(proj["root"], "spark_exports")
    manifests = p.run_export(export_cfg, out_root,
                             group_filter=group_filter,
                             target_name=target_name)
    expected = (target_name,) if target_name \
        else ("json_api", "dwc_occurrence_json")
    for tgt in expected:
        if manifests.get(tgt, {}).get("status") != "success":
            raise RuntimeError(f"spark export failed: {manifests}")
    return os.path.join(out_root, "exports")


def main() -> int:
    import tempfile

    from niamoto_spark.session import get_spark
    from tools.refdiff.synth import build_project

    root = os.environ.get("REFDIFF_ROOT") or tempfile.mkdtemp(
        prefix="refdiff_")
    proj = build_project(root)
    spark = get_spark("refdiff")
    results = run_spark_pipeline(spark, proj)
    for group, gmap in results.items():
        n_widgets = sum(len(w) for w in gmap.values())
        print(f"{group}: {len(gmap)} entities, {n_widgets} widget values")
    out_path = os.path.join(root, "spark_results.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, ensure_ascii=False, indent=1, default=str)
    print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
