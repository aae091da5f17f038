"""strict_parity escape hatch (VERDICT r12 next-#7): the default True
reproduces the reference's own bugs where drop-in parity requires them
(certified by tools/ref_pipeline_diff.py); False gives new users the
sane behavior at each site."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from niamoto_spark import refshapes as RS
from niamoto_spark.exporters.json_api import _ref_map_fields


@pytest.fixture()
def tagged(spark):
    pdf = pd.DataFrame({
        "plot_id": [1, 1, 1, 2],
        "geo_pt": ["POINT (166.5 -22.1)", "POINT (166.5 -22.1)",
                   "POINT (166.9 -22.3)", "POINT (166.2 -22.0)"],
        "species": ["a", "b", "c", "d"],
    })
    df = spark.createDataFrame(pdf).withColumn(
        RS.SRC_ORDER, F.monotonically_increasing_id())
    entities = spark.createDataFrame(pd.DataFrame({"plot_id": [1, 2]}))
    return df, entities


def test_geospatial_group_by_coords_strict_empty(tagged, spark):
    """Strict: any field name other than 'geometry' reproduces the
    reference's swallowed AttributeError -> empty FeatureCollection
    (geospatial_extractor.py:612-686)."""
    df, entities = tagged
    out = RS.geospatial_extractor(
        df, "plot_id", {"field": "geo_pt", "group_by_coordinates": True},
        entities, strict_parity=True)
    docs = {r["plot_id"]: json.loads(r["__json"]) for r in out.collect()}
    assert docs[1] == {"type": "FeatureCollection", "features": []}


def test_geospatial_group_by_coords_sane(tagged, spark):
    """Non-strict: coordinates actually group — unique coords in
    first-occurrence order, first-row properties, per-coord count."""
    df, entities = tagged
    out = RS.geospatial_extractor(
        df, "plot_id",
        {"field": "geo_pt", "group_by_coordinates": True,
         "properties": ["species"]},
        entities, strict_parity=False)
    docs = {r["plot_id"]: json.loads(r["__json"]) for r in out.collect()}
    feats = docs[1]["features"]
    assert [f["geometry"]["coordinates"] for f in feats] == \
        [[166.5, -22.1], [166.9, -22.3]]
    assert feats[0]["properties"] == {"species": "a", "count": 2}
    assert feats[1]["properties"] == {"species": "c", "count": 1}
    assert docs[2]["features"][0]["properties"]["count"] == 1


def test_index_dsl_missing_source_strict_null():
    """Strict: the reference maps a misspelled source (id: taxon_id when
    the column is taxons_id) to null silently (ROUND12_NOTES quirk)."""
    item = {"taxons_id": 7, "full_name": "x"}
    out = _ref_map_fields(item, ["id: taxon_id"], group="taxons",
                          pattern="{group}/{id}.json", base_id=7,
                          strict_parity=True)
    assert out == {"id": None}


def test_index_dsl_missing_source_sane_raises():
    item = {"taxons_id": 7, "full_name": "x"}
    with pytest.raises(KeyError, match="taxons_id"):
        _ref_map_fields(item, ["id: taxon_id"], group="taxons",
                        pattern="{group}/{id}.json", base_id=7,
                        strict_parity=False)
    # a PRESENT key maps normally in either mode
    ok = _ref_map_fields(item, ["id: taxons_id"], group="taxons",
                         pattern="{group}/{id}.json", base_id=7,
                         strict_parity=False)
    assert ok == {"id": 7}
