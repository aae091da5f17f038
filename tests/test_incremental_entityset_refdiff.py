"""Entity-set incremental differential (r14, second phase): the
reference's upsert flush (transformer.py:1287-1318) is INSERT..ON
CONFLICT — it INSERTS rows for entities that appeared since the full
run and leaves rows for entities that VANISHED from the re-imported
taxonomy STALE in the group table (no DELETE anywhere in the flush).
The engine's ``mode='incremental'`` parquet upsert
(sources/sinks.py:upsert_table) must reproduce both halves of that
contract, entity-for-entity.

Scenario (the real user loop): full transform -> the source gains a
brand-new species and loses every row of an existing one -> taxonomy
re-import (hash ids keep unchanged names stable) -> incremental
re-transform of taxons only."""

# Slow tier (r15, verdict item 1): this long refdiff/e2e/fuzz suite is
# opt-in so the DEFAULT `pytest tests/` finishes inside the driver's
# verify window (the r14 driver run was cut off at 95% after ~30 min).
# Run it with NIAMOTO_SLOW_TESTS=1 — the round's closing records include
# a full slow-tier pass.
import os as _os  # noqa: E402

import pytest as _pytest  # noqa: E402

pytestmark = _pytest.mark.skipif(
    not _os.environ.get("NIAMOTO_SLOW_TESTS"),
    reason="slow tier: set NIAMOTO_SLOW_TESTS=1")

import json
import os
import sqlite3

import pandas as pd


def _shift_entity_set(occ: pd.DataFrame) -> tuple:
    """Remove every row of one terminal species; add rows for a NEW
    species under an existing genus.  Returns (occ2, removed_species,
    added_species)."""
    occ2 = occ.copy()
    full = occ2[occ2["species"].notna() & occ2["infra"].isna()]
    # removal target: the least-observed complete species (keeps the
    # bulk of the data untouched)
    by_sp = full.groupby(["family", "genus", "species"]).size().sort_values()
    rm_fam, rm_gen, rm_sp = by_sp.index[0]
    removed = f"{rm_fam}|{rm_gen}|{rm_sp}"
    occ2 = occ2[~((occ2["genus"] == rm_gen)
                  & (occ2["species"] == rm_sp))].copy()

    # addition: clone a handful of rows of the most-observed species
    # into a species name the taxonomy has never seen
    ad_fam, ad_gen, ad_sp = by_sp.index[-1]
    donor = occ2[(occ2["genus"] == ad_gen) & (occ2["species"] == ad_sp)
                 & occ2["infra"].isna()].head(5).copy()
    assert len(donor) >= 3
    new_sp = "novaexemplum"
    donor["species"] = new_sp
    donor["taxaname"] = f"{ad_gen} {new_sp}"
    donor["id_taxonref"] = 99901
    if "section" in donor.columns:
        donor["section"] = (f"sect. {ad_gen[:4]}"
                            f"{'A' if len(new_sp) % 2 == 0 else 'B'}")
    donor["id"] = range(int(occ2["id"].max()) + 1,
                        int(occ2["id"].max()) + 1 + len(donor))
    occ2 = pd.concat([occ2, donor], ignore_index=True)
    return occ2, removed, f"{ad_fam}|{ad_gen}|{new_sp}"


def test_incremental_entityset_differential(spark, tmp_path):
    from tools.refdiff.diff import diff_results
    from tools.refdiff.run_ref import (build_reference_db,
                                       read_reference_tables,
                                       rebuild_reference_taxonomy,
                                       run_reference_transform)
    from tools.refdiff.run_spark import read_spark_results, run_spark_pipeline
    from tools.refdiff.synth import build_project

    root = str(tmp_path / "entityset")
    proj = build_project(root, n_occurrences=240)

    # --- phase 1: full transform, both engines --------------------------
    build_reference_db(proj)
    ref_full = run_reference_transform(proj)
    run_spark_pipeline(spark, proj)
    sp_full = read_spark_results(spark, proj)
    assert diff_results(ref_full, sp_full)["ok"], \
        "full-run baseline must be clean"

    db_path = os.path.join(root, "db", "niamoto.db")

    def _path_to_id():
        con = sqlite3.connect(db_path)
        try:
            return dict(con.execute(
                "SELECT full_path, id FROM entity_taxons").fetchall())
        finally:
            con.close()

    ids_before = _path_to_id()

    # --- phase 2: the SOURCE entity set changes --------------------------
    occ2, removed, added = _shift_entity_set(proj["occurrences"])
    assert removed in ids_before and added not in ids_before
    rebuild_reference_taxonomy(proj, occ2)      # partial re-import
    occ2.to_csv(os.path.join(proj["imports_dir"], "occurrences.csv"),
                index=False)

    ids_after = _path_to_id()
    rm_id, new_id = ids_before[removed], ids_after[added]
    assert removed not in ids_after, "vanished species left the taxonomy"
    # only the removed species' subtree — and any ancestor that lost its
    # every descendant row — may vanish on re-import
    vanished = {p for p in ids_before if p not in ids_after}
    assert all(p.startswith(removed) or removed.startswith(p)
               for p in vanished), vanished
    # hash id_strategy: every SURVIVING path keeps its id across re-import
    assert all(ids_after[p] == ids_before[p]
               for p in ids_before if p in ids_after)

    # --- phase 3: incremental re-transform of taxons only ----------------
    ref_incr = run_reference_transform(proj, group_by="taxons",
                                       recreate_table=False)

    import yaml

    from niamoto_spark.pipeline import Pipeline
    p = Pipeline(spark, os.path.join(root, "warehouse"))
    with open(os.path.join(proj["config_dir"], "import.yml")) as fh:
        p.run_import(yaml.safe_load(fh), base_dir=root)
    with open(os.path.join(proj["config_dir"], "transform.yml")) as fh:
        p.run_transform(yaml.safe_load(fh), group_by="taxons",
                        mode="incremental", base_dir=root)
    sp_incr = read_spark_results(spark, proj)

    # --- assertions -------------------------------------------------------
    # (a) cross-engine parity of the ENTIRE persisted state — including
    # the stale row and the new row
    rep = diff_results(ref_incr, sp_incr)
    assert rep["ok"], json.dumps(
        {g: {w: s for w, s in gs["widgets"].items()
             if s["diff"] or s["missing"]}
         for g, gs in rep["groups"].items()}, default=str)[:2000]

    # (b) the NEW entity materialized in both engines
    assert new_id in ref_incr["taxons"], "reference missed the new taxon"
    assert new_id in sp_incr["taxons"], "engine missed the new taxon"
    assert ref_incr["taxons"][new_id].get("general_info"), \
        "new taxon's widgets are empty"

    # (c) the VANISHED entity's row is STALE-RETAINED in both engines,
    # byte-equal to what the full run wrote (upsert never deletes)
    assert ref_incr["taxons"].get(rm_id) == ref_full["taxons"][rm_id], \
        "reference deleted or mutated the vanished taxon's row"
    assert sp_incr["taxons"].get(rm_id) == sp_full["taxons"][rm_id], \
        "engine deleted or mutated the vanished taxon's row"

    # (d) read-back sanity: read_reference_tables sees the same state the
    # transform returned (the upsert actually persisted)
    assert read_reference_tables(db_path)["taxons"].keys() \
        == ref_incr["taxons"].keys()
