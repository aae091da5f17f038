"""Synthesize a niamoto project for the whole-pipeline differential.

Builds a project directory shaped exactly like the reference's example
project (docs/examples/config/import.yml:1-205): occurrences + plots
CSVs, EAV stats CSVs (raw_plot_stats / raw_shape_stats), multi-feature
shape GeoPackages, and the config/ directory with the reference's
transform.yml copied VERBATIM.

The data is deterministic (fixed-seed RNG) and sized so the reference's
per-entity x per-widget pandas loop stays fast (~60 taxa, 6 plots,
4 shape features) while every widget has non-trivial input: phenology
months, dbh/elevation/rainfall spreads, substrate booleans, EAV class
objects for every class_object the transform.yml references.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

REFERENCE_CONFIG = "/root/reference/docs/examples/config"
SEED = 20260816

FAMILIES = {
    "Araucariaceae": {"Araucaria": ["columnaris", "montana", "luxurians"],
                      "Agathis": ["ovata", "lanceolata"]},
    "Myrtaceae": {"Syzygium": ["acre", "aggregatum"],
                  "Metrosideros": ["operculata"],
                  "Arillastrum": ["gummiferum"]},
    "Cunoniaceae": {"Cunonia": ["macrophylla", "atrorubens"],
                    "Geissois": ["racemosa"]},
    "Sapotaceae": {"Planchonella": ["wakere"],
                   "Pycnandra": ["acuminata", "controversa"]},
}

PLOTS = [
    # (id_plot, plot, lon, lat, locality, elevation, rainfall, holdridge,
    #  in_um)
    (101, "Foret Nord", 166.42, -22.20, "Foret Nord", 220, 1800,
     "Humide", 1),
    (102, "Foret Plate", 166.51, -22.10, "Foret Plate", 480, 2600,
     "Humide", 0),
    (103, "Pic du Grand Kaori", 166.88, -22.28, "Grand Kaori", 310, 3100,
     "Très Humide", 1),
    (104, "Riviere Bleue", 166.65, -22.09, "Riviere Bleue", 160, 2400,
     "Humide", 0),
    (105, "Monts Koghis", 166.50, -22.18, "Koghis", 520, 2900,
     "Très Humide", 1),
    (106, "Plaine des Lacs", 166.92, -22.26, "Plaine des Lacs", 250, 3300,
     "Sec", 0),
]

SHAPE_SOURCES = [
    # (source_name in import.yml, gpkg filename, name_field, features)
    ("Provinces", "provinces.gpkg", "nom",
     [("Province Sud", (166.0, -22.6, 167.0, -21.9)),
      ("Province Nord", (164.5, -21.5, 165.8, -20.4))]),
    ("Communes", "communes.gpkg", "nom",
     [("Yate", (166.8, -22.4, 167.05, -22.05)),
      ("Dumbea", (166.35, -22.25, 166.6, -22.0))]),
]


def _box_wkt(b):
    x0, y0, x1, y1 = b
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


def make_occurrences(n: int = 800, seed: int = SEED) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    species = []
    for fam, genera in FAMILIES.items():
        for gen, sps in genera.items():
            for sp in sps:
                species.append((fam, gen, sp))
    rows = []
    for i in range(n):
        fam, gen, sp = species[int(rng.randint(len(species)))]
        # a slice of rows is genus-only (incomplete -> skipped at species
        # depth by both engines' incomplete_rows=skip semantics)
        incomplete = rng.rand() < 0.06
        infra = None
        if not incomplete and rng.rand() < 0.08:
            infra = f"var. {sp[:4]}ensis"
        taxaname = (f"{gen} {sp}" + (f" {infra}" if infra else "")
                    if not incomplete else gen)
        # external id: one per distinct terminal taxon
        sp_idx = species.index((fam, gen, sp))
        id_taxonref = 1000 + sp_idx * 10 + (7 if infra else 0)
        plot = PLOTS[int(rng.randint(len(PLOTS)))]
        lon = round(plot[2] + rng.uniform(-0.02, 0.02), 4)
        lat = round(plot[3] + rng.uniform(-0.02, 0.02), 4)
        rows.append({
            "id": i + 1,
            "id_taxonref": None if incomplete else id_taxonref,
            "taxaname": taxaname,
            "family": fam,
            "genus": gen,
            # depth/fan-out axis carrier (r14): a deterministic section
            # rank between genus and species — 2 sections per genus,
            # split by species-name parity.  INERT until the import
            # mutator inserts it into extraction.levels; incomplete
            # rows keep the NULL-prefix shape (genus-only stays
            # genus-only at every depth).
            "section": None if incomplete
            else f"sect. {gen[:4]}{'A' if len(sp) % 2 == 0 else 'B'}",
            "species": None if incomplete else sp,
            "infra": infra,
            "geo_pt": f"POINT ({lon} {lat})",
            "plot_name": plot[1],
            "month_obs": int(rng.randint(1, 13)),
            "flower": int(rng.rand() < 0.25),
            "fruit": int(rng.rand() < 0.2),
            "dbh": round(float(rng.gamma(3.0, 18.0)) + 10.0, 1),
            "height": round(float(rng.uniform(2, 35)), 1),
            "elevation": int(plot[5] + rng.randint(-60, 220)),
            "rainfall": int(plot[6] + rng.randint(-300, 900)),
            "holdridge": int(rng.choice([1, 2, 3], p=[0.25, 0.5, 0.25])),
            "strata": int(rng.choice([1, 2, 3, 4])),
            "in_um": int(plot[8]),
            "wood_density": round(float(rng.uniform(0.3, 1.1)), 3),
            "bark_thickness": round(float(rng.uniform(2, 60)), 1),
            "leaf_sla": round(float(rng.uniform(4, 45)), 2),
            "leaf_area": round(float(rng.uniform(5, 900)), 1),
            "leaf_thickness": round(float(rng.uniform(80, 700)), 1),
        })
    return pd.DataFrame(rows)


def make_plots() -> pd.DataFrame:
    rng = np.random.RandomState(SEED + 1)
    rows = []
    for pid, name, lon, lat, locality, elev, rain, hold, in_um in PLOTS:
        total = int(rng.randint(400, 1800))
        dead = int(rng.randint(2, 40))
        under, undercan, can = (int(rng.randint(40, 400)),
                                int(rng.randint(40, 400)),
                                int(rng.randint(40, 400)))
        emergent = max(total - dead - under - undercan - can, 5)
        nb_species = int(rng.randint(25, 120))
        rows.append({
            "id_plot": pid, "plot": name,
            "geo_pt": f"POINT ({lon} {lat})",
            "locality": locality, "plot_name": name,
            "elevation": elev, "rainfall": rain, "holdridge": hold,
            "in_um": in_um,
            "nb_families": int(rng.randint(8, 30)),
            "nb_species": nb_species,
            "living_stems": total - dead, "total_stems": total,
            "understorey": under, "undercanopy": undercan,
            "canopy": can, "emergent": emergent,
            "pteridophytes": int(rng.randint(0, 90)),
            "gymnospermae": int(rng.randint(0, 60)),
            "monocotyledonae": int(rng.randint(10, 200)),
            "dicotyledonae": int(rng.randint(200, 1300)),
            "species_level": round(float(rng.uniform(0.5, 0.98)), 4),
            "h_mean": round(float(rng.uniform(8, 28)), 1),
            "wood_density_mean": round(float(rng.uniform(0.4, 0.9)), 3),
            "basal_area": round(float(rng.uniform(10, 70)), 2),
            "shannon": round(float(rng.uniform(1.5, 4.5)), 3),
            "pielou": round(float(rng.uniform(0.3, 0.95)), 3),
            "simpson": round(float(rng.uniform(0.3, 0.95)), 3),
            "biomass": round(float(rng.uniform(80, 600)), 1),
        })
    return pd.DataFrame(rows)


def make_raw_plot_stats() -> pd.DataFrame:
    """EAV stats: one (plot_id, class_object, class_name, class_value) row."""
    rng = np.random.RandomState(SEED + 2)
    fams = ["Araucariaceae", "Myrtaceae", "Cunoniaceae", "Sapotaceae",
            "Rubiaceae", "Lauraceae", "Euphorbiaceae", "Apocynaceae",
            "Clusiaceae", "Moraceae"]
    sps = ["Araucaria columnaris", "Agathis ovata", "Syzygium acre",
           "Cunonia macrophylla", "Geissois racemosa", "Planchonella wakere",
           "Pycnandra acuminata", "Metrosideros operculata",
           "Arillastrum gummiferum", "Syzygium aggregatum"]
    dbh_bins = [10, 20, 30, 40, 50, 75, 100, 200, 300, 400, 500]
    rows = []
    rid = 1
    for pid, *_ in PLOTS:
        for co, names in (("top10_family", fams), ("top10_species", sps)):
            for name in names:
                rows.append({"id": rid, "plot_id": pid, "class_object": co,
                             "class_name": name,
                             "class_value": int(rng.randint(1, 400))})
                rid += 1
        for b in dbh_bins:
            rows.append({"id": rid, "plot_id": pid, "class_object": "dbh",
                         "class_name": b,
                         "class_value": int(rng.randint(0, 250))})
            rid += 1
    return pd.DataFrame(rows)


def make_raw_shape_stats(shape_names) -> pd.DataFrame:
    """EAV stats for shapes, keyed by label == shapes.name."""
    rng = np.random.RandomState(SEED + 3)
    elev_classes = [0, 200, 400, 600, 800, 1000]
    rows = []
    rid = 1

    def add(label, co, cname, cval):
        nonlocal rid
        rows.append({"id": rid, "label": label, "class_object": co,
                     "class_name": cname, "class_value": cval})
        rid += 1

    for label in shape_names:
        land = round(float(rng.uniform(50_000, 900_000)), 2)
        forest = round(land * float(rng.uniform(0.2, 0.5)), 2)
        add(label, "land_area_ha", "land_area_ha", land)
        add(label, "forest_area_ha", "forest_area_ha", forest)
        add(label, "forest_mining_ha", "forest_mining_ha",
            round(forest * 0.06, 2))
        add(label, "forest_reserve_ha", "forest_reserve_ha",
            round(forest * 0.04, 2))
        add(label, "forest_ppe_ha", "forest_ppe_ha", round(forest * 0.15, 2))
        add(label, "rainfall_min", "rainfall_min", int(rng.randint(400, 900)))
        add(label, "rainfall_max", "rainfall_max",
            int(rng.randint(3000, 5000)))
        add(label, "elevation_median", "elevation_median",
            int(rng.randint(100, 500)))
        add(label, "elevation_max", "elevation_max",
            int(rng.randint(900, 1700)))
        fr = round(float(rng.uniform(0.2, 0.5)), 3)
        for co in ("cover_forest", "cover_forestum", "cover_forestnum"):
            f = round(min(max(fr + float(rng.uniform(-0.1, 0.1)), 0.01),
                          0.99), 3)
            add(label, co, "Forêt", f)
            add(label, co, "Hors-forêt", round(1 - f, 3))
        for cat in ("NUM", "UM", "Sec", "Humide", "Très Humide", "Réserve",
                    "PPE", "Concessions", "Forêt"):
            add(label, "land_use", cat,
                round(float(rng.uniform(5_000, 700_000)), 2))
        for c in elev_classes:
            tot = round(float(rng.uniform(2_000, 90_000)), 1)
            add(label, "land_elevation", c, tot)
            add(label, "forest_elevation", c,
                round(tot * float(rng.uniform(0.1, 0.6)), 1))
        for co in ("holdridge_forest", "holdridge_forest_out"):
            vals = rng.dirichlet([2, 5, 2]) * float(rng.uniform(0.2, 0.5))
            for cname, v in zip(("Sec", "Humide", "Très Humide"), vals):
                add(label, co, cname, round(float(v), 4))
        for cname in ("Forêt coeur", "Forêt mature", "Forêt secondaire"):
            add(label, "cover_foresttype", cname,
                round(float(rng.uniform(0.05, 0.6)), 3))
        for co in ("ratio_forest_um_elevation", "ratio_forest_num_elevation",
                   "forest_secondary_elevation", "forest_mature_elevation",
                   "forest_core_elevation"):
            for c in elev_classes:
                add(label, co, c, round(float(rng.uniform(0.02, 0.8)), 4))
        add(label, "fragment_meff_cbc", "fragment_meff_cbc",
            round(float(rng.uniform(0.05, 4.0)), 6))
        for size in (10, 20, 30, 40, 50):
            add(label, "forest_fragmentation", size,
                int(rng.randint(5, 60)))
    return pd.DataFrame(rows)


# forest-cover layer patches (imports/layers/... — the VERBATIM path the
# example import.yml's metadata.layers names).  Strictly DISJOINT boxes,
# each strictly inside / strictly overlapping a shape (never edge-
# touching): the pure-python unary_union both engines share is a
# disjoint flatten, and edge-touch clips would be degenerate.
FOREST_PATCHES = [
    ("Foret du Sud-Ouest", (166.05, -22.55, 166.35, -22.30)),
    ("Foret de Dumbea", (166.45, -22.20, 166.55, -22.05)),
    ("Foret de Yate", (166.85, -22.35, 166.98, -22.12)),
    ("Foret du Nord", (164.8, -21.2, 165.3, -20.8)),
    ("Foret du Cap", (165.5, -20.7, 165.75, -20.5)),
]


def write_forest_cover(root: str) -> str:
    """Write the forest_cover vector layer at the path the example
    import.yml metadata declares (r13: feeds the geography widget's
    shape_processor differential)."""
    from niamoto_spark.sources.vector import write_gpkg

    path = os.path.join(root, "imports", "layers",
                        "amap_carto_3k_20240715.gpkg")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    records = [{"nom": n, "type_foret": "dense"} for n, _ in FOREST_PATCHES]
    geoms = [_box_wkt(b) for _, b in FOREST_PATCHES]
    write_gpkg(path, "forest_cover", records, geoms)
    return path


def write_shape_gpkgs(shapes_dir: str) -> list[str]:
    """Write the multi-feature GeoPackages and return feature names."""
    from niamoto_spark.sources.vector import write_gpkg

    os.makedirs(shapes_dir, exist_ok=True)
    names = []
    for source_name, fname, name_field, feats in SHAPE_SOURCES:
        records, geoms = [], []
        for feat_name, bbox in feats:
            records.append({name_field: feat_name})
            geoms.append(_box_wkt(bbox))
            names.append(feat_name)
        write_gpkg(os.path.join(shapes_dir, fname),
                   os.path.splitext(fname)[0], records, geoms)
    return names


# Float measurement fields where real-world occurrence data has holes;
# NULL injection stays off the id/taxonomy columns (make_occurrences
# already synthesizes incomplete taxonomy rows) and off int columns
# (pandas would silently promote them to float and change the CSV dtype
# both engines infer — a dtype_probe axis, not this one).
NULLABLE_MEASUREMENTS = ("dbh", "height", "wood_density", "bark_thickness",
                         "leaf_sla", "leaf_area", "leaf_thickness")


def mutate_occurrences(occ: pd.DataFrame, null_rate: float = 0.0,
                       null_geo_rate: float = 0.0,
                       shuffle_seed: int | None = None,
                       blackout_taxa: int = 0,
                       seed: int = SEED) -> pd.DataFrame:
    """Composed-probe style data mutations: NULL holes + row shuffle.

    ``blackout_taxa``: NULL every float measurement of K seeded
    terminal taxa (the taxa keep their occurrence rows, so they still
    derive into the taxonomy) — this is the only data shape that
    drives the reference plugins' EMPTY-SERIES branches cross-engine
    (stat summary's params-echo early return, binned/categorical
    zero-count fills and their [0]-int vs [0.0]-float zero-total
    percentage literals, r13).

    Both engines receive the SAME mutated frame (the reference via
    ``to_sql``, this engine via the written CSV), so the differential
    still has a single oracle: each other."""
    rng = np.random.RandomState(seed + 7)
    occ = occ.copy()
    if blackout_taxa:
        terms = sorted(occ.loc[occ["id_taxonref"].notna(),
                               "id_taxonref"].unique())
        chosen = rng.choice(terms, size=min(blackout_taxa, len(terms)),
                            replace=False)
        mask = occ["id_taxonref"].isin(chosen)
        for col in NULLABLE_MEASUREMENTS:
            occ.loc[mask, col] = np.nan
    if null_rate > 0:
        for col in NULLABLE_MEASUREMENTS:
            mask = rng.rand(len(occ)) < null_rate
            occ.loc[mask, col] = np.nan
    if null_geo_rate > 0:
        mask = rng.rand(len(occ)) < null_geo_rate
        occ.loc[mask, "geo_pt"] = None
    if shuffle_seed is not None:
        occ = occ.sample(frac=1.0,
                         random_state=shuffle_seed).reset_index(drop=True)
        occ["id"] = np.arange(1, len(occ) + 1)
    return occ


def make_occurrence_links(taxons: pd.DataFrame,
                          occ: pd.DataFrame) -> pd.DataFrame:
    """Subtree-expanded occurrence->taxon bridge for the join_table
    relation variant (r14 loader axis).

    The reference's join_table loader returns ONLY rows directly linked
    to the queried node (join_table.py:167-176 — no hierarchy
    traversal), so subtree semantics must be ENCODED in the table: one
    (id_occurrence, id_taxon) row per occurrence per ancestor-or-self
    of its terminal taxon.  Built from the derived taxonomy's nested
    sets (ancestors = nodes whose [lft, rght] encloses the terminal's),
    which both engines already certify node-for-node
    (tablediff.diff_taxonomy_tables), so the artifact is engine-neutral
    shared input."""
    terms = taxons[taxons["taxons_id"].notna()][
        ["id", "lft", "rght", "taxons_id"]]
    rows = []
    for t in terms.itertuples(index=False):
        anc_ids = taxons.loc[(taxons["lft"] <= t.lft)
                             & (taxons["rght"] >= t.rght), "id"]
        occ_ids = occ.loc[occ["id_taxonref"] == t.taxons_id, "id"]
        for o in occ_ids:
            for a in anc_ids:
                rows.append({"id_occurrence": int(o), "id_taxon": int(a)})
    return pd.DataFrame(rows, columns=["id_occurrence", "id_taxon"])


def build_project(root: str, reference_config: str = REFERENCE_CONFIG,
                  n_occurrences: int = 800, data_seed: int = SEED,
                  null_rate: float = 0.0, null_geo_rate: float = 0.0,
                  shuffle_seed: int | None = None,
                  blackout_taxa: int = 0,
                  transform_mutator=None,
                  export_mutator=None,
                  import_mutator=None) -> dict:
    """Create the project dir; returns paths + the synthesized frames.

    ``transform_mutator`` (optional) is called with the loaded
    transform.yml list and may mutate it in place before it is written —
    the variant harness (tools/refdiff/variants.py) threads seeded
    config permutations through it.  Data knobs mirror the composed
    probe's axes on the occurrence table."""
    imports_dir = os.path.join(root, "imports")
    config_dir = os.path.join(root, "config")
    os.makedirs(imports_dir, exist_ok=True)
    os.makedirs(config_dir, exist_ok=True)

    occ = make_occurrences(n_occurrences, seed=data_seed)
    if null_rate or null_geo_rate or shuffle_seed is not None \
            or blackout_taxa:
        occ = mutate_occurrences(occ, null_rate, null_geo_rate,
                                 shuffle_seed, blackout_taxa,
                                 seed=data_seed)
    plots = make_plots()
    plot_stats = make_raw_plot_stats()
    occ.to_csv(os.path.join(imports_dir, "occurrences.csv"), index=False)
    plots.to_csv(os.path.join(imports_dir, "plots.csv"), index=False)
    plot_stats.to_csv(os.path.join(imports_dir, "raw_plot_stats.csv"),
                      index=False)

    shape_names = write_shape_gpkgs(os.path.join(imports_dir, "shapes"))
    write_forest_cover(root)
    shape_stats = make_raw_shape_stats(shape_names)
    shape_stats.to_csv(os.path.join(imports_dir, "raw_shape_stats.csv"),
                       index=False)

    # transform.yml is the artifact under differential test: VERBATIM
    # copy (clean baseline), or the seeded config-variant mutation —
    # written identically for both engines either way.
    import yaml as _yaml
    if transform_mutator is None:
        shutil.copy(os.path.join(reference_config, "transform.yml"),
                    os.path.join(config_dir, "transform.yml"))
    else:
        with open(os.path.join(reference_config, "transform.yml")) as fh:
            tcfg = _yaml.safe_load(fh)
        transform_mutator(tcfg)
        with open(os.path.join(config_dir, "transform.yml"), "w") as fh:
            _yaml.safe_dump(tcfg, fh, allow_unicode=True, sort_keys=False)
    # import.yml: verbatim except the 7-source shape list is trimmed to the
    # two sources synthesized above (the example's other gpkg files were
    # never shipped with the reference).
    import yaml
    with open(os.path.join(reference_config, "import.yml")) as fh:
        imp = yaml.safe_load(fh)
    spatial = imp["entities"]["references"]["shapes"]
    spatial["connector"]["sources"] = [
        {"name": source_name, "path": f"imports/shapes/{fname}",
         "name_field": name_field}
        for source_name, fname, name_field, _ in SHAPE_SOURCES
    ]
    if import_mutator is not None:
        import_mutator(imp)
    with open(os.path.join(config_dir, "import.yml"), "w") as fh:
        yaml.safe_dump(imp, fh, allow_unicode=True, sort_keys=False)

    with open(os.path.join(config_dir, "config.yml"), "w") as fh:
        fh.write("database:\n  path: db/niamoto.db\n"
                 "logs:\n  path: logs\n"
                 "exports:\n  web_api: exports/api\n"
                 "  web_static: exports\n")
    # export.yml — verbatim (clean baseline) or the seeded export-axis
    # mutation (r13: JsonOptions/index_structure/field-DSL branch
    # space); written once, consumed by BOTH engines either way
    if export_mutator is None:
        shutil.copy(os.path.join(reference_config, "export.yml"),
                    os.path.join(config_dir, "export.yml"))
    else:
        with open(os.path.join(reference_config, "export.yml")) as fh:
            ecfg = _yaml.safe_load(fh)
        export_mutator(ecfg)
        with open(os.path.join(config_dir, "export.yml"), "w") as fh:
            _yaml.safe_dump(ecfg, fh, allow_unicode=True,
                            sort_keys=False)
    os.makedirs(os.path.join(root, "db"), exist_ok=True)

    return {"root": root, "config_dir": config_dir,
            "imports_dir": imports_dir, "occurrences": occ, "plots": plots,
            "plot_stats": plot_stats, "shape_stats": shape_stats,
            "shape_names": shape_names}
