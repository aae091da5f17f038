"""Drop-in compatibility: the REFERENCE's own example YAML configs
(docs/examples/config) must parse through this engine's validators and
every plugin they name must resolve in the registry — the 'a user of the
reference could switch' contract."""

import os

import pytest
import yaml

BASE = "/root/reference/docs/examples/config"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference tree not mounted")


def test_reference_import_yml_parses():
    from niamoto_spark.config import validate_import_config

    cfg = validate_import_config(yaml.safe_load(open(f"{BASE}/import.yml")))
    names = {n for section in cfg.entities.values() for n in section}
    assert {"taxons", "occurrences", "plots", "shapes"} <= names


def test_reference_transform_yml_parses_and_plugins_resolve():
    from niamoto_spark.config import validate_transform_config
    from niamoto_spark.registry import PluginType, get_plugin

    groups = validate_transform_config(
        yaml.safe_load(open(f"{BASE}/transform.yml")))
    assert {g.group_by for g in groups} == {"taxons", "plots", "shapes"}
    loader_names, transformer_names = set(), set()
    for g in groups:
        for s in g.sources or []:
            if s.relation is not None:
                loader_names.add(s.relation.plugin)
        for w in (g.widgets_data or {}).values():
            transformer_names.add(
                w.plugin if hasattr(w, "plugin") else w["plugin"])
    assert loader_names and transformer_names
    for name in loader_names:
        assert get_plugin(name, PluginType.LOADER) is not None, name
    for name in transformer_names:
        assert get_plugin(name, PluginType.TRANSFORMER) is not None, name


def test_reference_export_yml_exporters_resolve():
    from niamoto_spark.registry import PluginType, get_plugin

    cfg = yaml.safe_load(open(f"{BASE}/export.yml"))
    exporters = set()

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("exporter", "plugin") and isinstance(v, str):
                    exporters.add(v)
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(cfg)
    known = {e for e in exporters
             if e in ("json_api_exporter", "html_page_exporter",
                      "index_generator", "dwc_archive_exporter")}
    assert known, f"no recognizable exporters in {exporters}"
    for name in known:
        assert get_plugin(name, PluginType.EXPORTER) is not None, name
