"""Seeded variants for the whole-pipeline differential.

The r12 differential certified ONE clean synthetic project under ONE
parameterization per widget — a single point in config x data space.
This module turns that point into a grid:

  - config axis: seeded permutations of the example transform.yml's
    parameter branch space (bin edges, ``sort`` flags, label maps,
    units, ``max_value``, top_ranking ``count``, ``complement_mode``,
    ``include_percentages`` — the branches of
    ``niamoto_spark/refshapes.py``).  The mutated YAML is written into
    the project and consumed VERBATIM by BOTH engines, so parity stays
    the only oracle; no per-variant expected values exist anywhere.
  - data axis: composed-probe style mutations of the synthesized data
    (NULL-injected measurements and geometries, shuffled row order,
    alternate RNG seed and row count) — the r12 composed probe found
    four real bugs clean data could not reach, so the refdiff gets the
    same treatment.

Variant 0 is always the clean r12 baseline (byte-identical project).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# config-axis mutations


def _mutate_bins(params, rng, notes, where):
    bins = params.get("bins")
    if not isinstance(bins, list) or len(bins) < 4:
        return
    mode = rng.choice(["thin", "midpoint", "stretch"])
    if mode == "thin":
        new = [bins[0]] + bins[1:-1][::2] + [bins[-1]]
    elif mode == "midpoint":
        mid = (bins[0] + bins[1]) / 2
        mid = int(mid) if float(mid).is_integer() else round(mid, 1)
        new = [bins[0], mid] + bins[1:]
    else:  # stretch: widen the last edge
        last = bins[-1] * 2
        new = bins[:-1] + [int(last) if isinstance(bins[-1], int) else last]
    params["bins"] = new
    notes.append(f"{where}: bins {mode} -> {new}")


def _scale_max_value(params, rng, notes, where):
    mv = params.get("max_value")
    if mv is None:
        return
    factor = float(rng.choice([0.5, 2.0]))
    new = mv * factor
    if isinstance(mv, int) and float(new).is_integer():
        new = int(new)
    params["max_value"] = new
    notes.append(f"{where}: max_value {mv} -> {new}")


def _rename_units(params, rng, notes, where):
    u = params.get("units")
    if isinstance(u, str) and u:
        params["units"] = u + "*"
        notes.append(f"{where}: units -> {u}*")


def _upper_labels(params, rng, notes, where):
    labels = params.get("labels")
    if isinstance(labels, list) and labels and \
            all(isinstance(x, str) for x in labels):
        params["labels"] = [x.upper() for x in labels]
        notes.append(f"{where}: labels uppercased")


MUTATORS = {}


def _rule(plugin):
    def reg(fn):
        MUTATORS.setdefault(plugin, []).append(fn)
        return fn
    return reg


@_rule("binned_distribution")
def _m_binned(params, rng, notes, where):
    if rng.rand() < 0.75:
        _mutate_bins(params, rng, notes, where)
    if rng.rand() < 0.4 and "include_percentages" in params:
        params["include_percentages"] = not params["include_percentages"]
        notes.append(f"{where}: include_percentages flipped")


@_rule("statistical_summary")
def _m_stats(params, rng, notes, where):
    if rng.rand() < 0.6:
        _scale_max_value(params, rng, notes, where)
    if rng.rand() < 0.5:
        _rename_units(params, rng, notes, where)


@_rule("direct_attribute")
def _m_direct(params, rng, notes, where):
    if rng.rand() < 0.5:
        _scale_max_value(params, rng, notes, where)
    if rng.rand() < 0.4:
        _rename_units(params, rng, notes, where)


@_rule("top_ranking")
def _m_top(params, rng, notes, where):
    if rng.rand() < 0.7:
        new = int(rng.choice([3, 5, 12]))
        notes.append(f"{where}: count {params.get('count')} -> {new}")
        params["count"] = new


@_rule("binary_counter")
def _m_binary(params, rng, notes, where):
    if rng.rand() < 0.5 and "true_label" in params and \
            "false_label" in params:
        params["true_label"], params["false_label"] = \
            params["false_label"], params["true_label"]
        notes.append(f"{where}: true/false labels swapped")
    if rng.rand() < 0.5 and "include_percentages" in params:
        params["include_percentages"] = not params["include_percentages"]
        notes.append(f"{where}: include_percentages flipped")


@_rule("categorical_distribution")
def _m_categorical(params, rng, notes, where):
    if rng.rand() < 0.5:
        _upper_labels(params, rng, notes, where)
    if rng.rand() < 0.4 and "include_percentages" in params:
        params["include_percentages"] = not params["include_percentages"]
        notes.append(f"{where}: include_percentages flipped")


@_rule("time_series_analysis")
def _m_timeseries(params, rng, notes, where):
    if rng.rand() < 0.5:
        _upper_labels(params, rng, notes, where)


@_rule("multi_column_extractor")
def _m_multicol(params, rng, notes, where):
    if rng.rand() < 0.5:
        labels = params.get("labels")
        if isinstance(labels, list) and labels:
            params["labels"] = [f"{x} v2" for x in labels]
            notes.append(f"{where}: labels suffixed")
    if rng.rand() < 0.4 and "include_percentages" in params:
        params["include_percentages"] = not params["include_percentages"]
        notes.append(f"{where}: include_percentages flipped")


@_rule("class_object_series_extractor")
def _m_series(params, rng, notes, where):
    sf = params.get("size_field")
    if isinstance(sf, dict) and "sort" in sf and rng.rand() < 0.6:
        sf["sort"] = not sf["sort"]
        notes.append(f"{where}: size_field.sort -> {sf['sort']}")


@_rule("class_object_series_ratio_aggregator")
def _m_ratio(params, rng, notes, where):
    dists = params.get("distributions")
    if not isinstance(dists, dict):
        return
    for dname, dcfg in dists.items():
        if not isinstance(dcfg, dict):
            continue
        if dcfg.get("complement_mode") == "difference":
            if rng.rand() < 0.5:
                del dcfg["complement_mode"]
                notes.append(f"{where}.{dname}: complement_mode -> ratio")
        elif rng.rand() < 0.3:
            dcfg["complement_mode"] = "difference"
            notes.append(f"{where}.{dname}: complement_mode -> difference")


@_rule("transform_chain")
def _m_chain(params, rng, notes, where):
    """Chain-shape permutations.  (r14: the dict-literal merge step is
    no longer an exclusion — the shim whitelists ast.Dict, so even the
    VERBATIM chain runs reference-side; the drop/truncate arms remain
    as SHAPE variation.)  The r14 append arms add a pure
    custom_calculator analysis step over the ts month_data, and the
    shannon arm can chain pielou_evenness onto the appended step's
    scalar output — all reference-runnable, so the reference executes
    every appended op itself."""
    steps = params.get("steps")
    if not isinstance(steps, list) or len(steps) < 3:
        return
    lp = steps[-1].get("params") or {}
    if lp.get("operation") != "custom_formula" or \
            "{" not in str(lp.get("formula", "")):
        return
    r = rng.rand()
    if r < 0.4:
        del steps[-1]
        notes.append(f"{where}: dict-merge step dropped — chain ends at "
                     f"'{steps[-1].get('output_key')}' "
                     "(reference-runnable)")
    elif r < 0.65:
        del steps[-2:]
        notes.append(f"{where}: chain truncated to peak_detection "
                     "(reference-runnable)")
    # r14: APPEND a pure custom_calculator analysis step over the ts
    # step's month_data — the first cross-engine coverage for the
    # params-only operation family (shannon_entropy / sum_array_slice /
    # normalize_array; reference custom_calculator.py:712/808/535,
    # engine ecological.cc_pure_op).  The reference resolves the
    # "@<ts>.month_data.<series>" ref through its ReferenceResolver and
    # runs the op per entity; the engine runs the same kernel in
    # mapInPandas over the resolved docs.
    if rng.rand() < 0.55 and steps \
            and steps[0].get("plugin") == "time_series_analysis":
        base_key = steps[0].get("output_key")
        series = list((steps[0].get("params") or {}).get("fields") or {})
        if base_key and series:
            sname = series[int(rng.randint(len(series)))]
            ref = f"@{base_key}.month_data.{sname}"
            c = rng.rand()
            if c < 0.4:
                steps.append({
                    "plugin": "custom_calculator",
                    "output_key": "phenology_entropy",
                    "params": {"operation": "shannon_entropy",
                               "probabilities": ref}})
                notes.append(f"{where}: shannon_entropy step appended "
                             f"over {ref}")
                if rng.rand() < 0.8:
                    # chained pure op: pielou consumes the SCALAR
                    # "@...entropy.value" ref — exercises dotted
                    # resolution into a prior pure-op result on both
                    # engines (reference_resolver nested grammar)
                    steps.append({
                        "plugin": "custom_calculator",
                        "output_key": "phenology_evenness",
                        "params": {"operation": "pielou_evenness",
                                   "shannon_entropy":
                                       "@phenology_entropy.value",
                                   "max_bins": 12}})
                    notes.append(f"{where}: pielou_evenness chained "
                                 "onto @phenology_entropy.value")
            elif c < 0.7:
                steps.append({
                    "plugin": "custom_calculator",
                    "output_key": "phenology_h1",
                    "params": {"operation": "sum_array_slice",
                               "array": ref, "start_index": 0,
                               "end_index": 6}})
                notes.append(f"{where}: sum_array_slice step appended "
                             f"over {ref}")
            else:
                steps.append({
                    "plugin": "custom_calculator",
                    "output_key": "phenology_norm",
                    "params": {"operation": "normalize_array",
                               "input": ref, "method": "percentage"}})
                notes.append(f"{where}: normalize_array step appended "
                             f"over {ref}")


@_rule("shape_processor")
def _m_shape(params, rng, notes, where):
    """Geography-widget branch space (r13: the widget joined the
    differential with ONE clean parameterization — flip every flag the
    reference's ShapeProcessorConfig exposes: top-level ``simplify``
    gates BOTH shape_coords and the clip target
    (load_shape_geometry/get_simplified_coordinates), per-layer
    ``clip``/``simplify`` gate _process_layer, and ``format: geojson``
    takes the raw-coordinate _convert_to_geojson branch)."""
    if rng.rand() < 0.4:
        params["simplify"] = not params.get("simplify", True)
        notes.append(f"{where}: simplify -> {params['simplify']}")
    for lc in params.get("layers") or []:
        if not isinstance(lc, dict):
            continue
        lname = lc.get("name", "?")
        if rng.rand() < 0.4:
            lc["clip"] = not lc.get("clip", True)
            notes.append(f"{where}.{lname}: clip -> {lc['clip']}")
        if rng.rand() < 0.4:
            lc["simplify"] = not lc.get("simplify", True)
            notes.append(f"{where}.{lname}: simplify -> {lc['simplify']}")
    if rng.rand() < 0.35 and params.get("format") != "geojson":
        params["format"] = "geojson"
        notes.append(f"{where}: format -> geojson")


def mutate_transform(cfg: list, seed: int) -> list:
    """Apply seeded mutations to a loaded transform.yml list IN PLACE;
    returns human-readable notes of what changed."""
    rng = np.random.RandomState(seed)
    notes: list = []
    for group in cfg:
        if not isinstance(group, dict):
            continue
        gname = group.get("group_by", "?")
        for wname, wcfg in (group.get("widgets_data") or {}).items():
            if not isinstance(wcfg, dict):
                continue
            plugin = wcfg.get("plugin")
            params = wcfg.get("params")
            if not isinstance(params, dict):
                continue
            for fn in MUTATORS.get(plugin, ()):
                fn(params, rng, notes, f"{gname}.{wname}")
    return notes


# ---------------------------------------------------------------------------
# export-config axis (r13: the export phase ran under ONE clean
# parameterization — permute the json_api_exporter branch space:
# JsonOptions flags, index_structure keys, the index/detail field DSL)

_DETAIL_FIELDS_TAXONS = [
    # the commented-out "alternative" DSL in the example export.yml
    # (docs/examples/config/export.yml:1316-1327): rename, dotted
    # access, sub-structure selection, and a second source key
    {"id": "id"},
    {"scientific_name": "general_info.name.value"},
    {"taxon_metadata": {"source": "general_info",
                        "fields": ["rank", "endemic",
                                   "occurrences_count"]}},
    {"distribution": {"source": "distribution_map",
                      "fields": ["coordinates"]}},
]


def _m_json_options(params, rng, notes, where):
    jo = params.setdefault("json_options", {})
    r = rng.rand()
    if r < 0.3:
        jo["indent"], jo["minify"] = 2, False
        notes.append(f"{where}: json indent -> 2")
    elif r < 0.55:
        jo["indent"], jo["minify"] = None, True
        notes.append(f"{where}: json minify")
    if rng.rand() < 0.35:
        jo["ensure_ascii"] = not jo.get("ensure_ascii", False)
        notes.append(f"{where}: ensure_ascii -> {jo['ensure_ascii']}")
    if rng.rand() < 0.3:
        jo["exclude_null"] = not jo.get("exclude_null", False)
        notes.append(f"{where}: exclude_null -> {jo['exclude_null']}")
    if rng.rand() < 0.3:
        jo["geometry_precision"] = 4
        notes.append(f"{where}: geometry_precision -> 4")
    if rng.rand() < 0.25:
        jo["max_array_length"] = 8
        notes.append(f"{where}: max_array_length -> 8")
    if rng.rand() < 0.25:
        jo["compress"] = True
        notes.append(f"{where}: compress -> gzip")


def mutate_export(cfg: dict, seed: int) -> list:
    """Seeded permutations of the loaded export.yml (both json_api
    targets), IN PLACE; returns notes.  Same doctrine as
    mutate_transform: the mutated YAML is written once and consumed
    verbatim by BOTH engines, so parity stays the only oracle."""
    rng = np.random.RandomState(seed)
    notes: list = []
    for target in cfg.get("exports") or []:
        if target.get("exporter") != "json_api_exporter":
            continue
        tname = target.get("name", "?")
        params = target.get("params") or {}
        _m_json_options(params, rng, notes, tname)
        st = params.get("index_structure")
        if isinstance(st, dict):
            if rng.rand() < 0.4:
                st["include_total"] = not st.get("include_total", True)
                notes.append(f"{tname}: include_total -> "
                             f"{st['include_total']}")
            if rng.rand() < 0.3:
                st["total_key"] = "count"
                notes.append(f"{tname}: total_key -> count")
        for g in target.get("groups") or []:
            gname = f"{tname}.{g.get('group_by', '?')}"
            gjo = g.get("json_options")
            if isinstance(gjo, dict) and \
                    gjo.get("geometry_precision") and rng.rand() < 0.4:
                gjo["geometry_precision"] = 3
                notes.append(f"{gname}: geometry_precision -> 3")
            det = g.get("detail")
            if isinstance(det, dict) and det.get("pass_through", True) \
                    and g.get("group_by") == "taxons" \
                    and tname == "json_api" and rng.rand() < 0.45:
                g["detail"] = {"pass_through": False,
                               "fields": [dict(f) for f
                                          in _DETAIL_FIELDS_TAXONS]}
                notes.append(f"{gname}: detail pass_through -> "
                             "field-selection DSL")
            idx = g.get("index")
            if isinstance(idx, dict) and isinstance(idx.get("fields"),
                                                    list):
                fields = idx["fields"]
                droppable = [
                    i for i, f in enumerate(fields)
                    if isinstance(f, dict) and len(f) == 1
                    and isinstance(next(iter(f.values())), str)
                    and next(iter(f)) not in ("id", "endpoint",
                                              "file_path", "name")
                ]
                if droppable and rng.rand() < 0.4:
                    i = int(rng.choice(droppable))
                    dropped = next(iter(fields[i]))
                    del fields[i]
                    notes.append(f"{gname}: index field dropped "
                                 f"({dropped})")

    # r14 session-2 arm — independent stream (+137) so the draws above
    # are bit-identical to the canonical grid's: flip ONE group's
    # ``enabled`` off.  The reference drops disabled groups before
    # exporting (json_api_exporter.py:328); the engine must too, or its
    # tree grows files the reference never writes.
    rng2 = np.random.RandomState(seed + 137)
    if rng2.rand() < 0.35:
        cands = [(t, g) for t in (cfg.get("exports") or [])
                 if t.get("exporter") == "json_api_exporter"
                 for g in (t.get("groups") or [])
                 if g.get("enabled", True)]
        if len(cands) > 1:      # keep at least one group exporting
            t, g = cands[int(rng2.randint(len(cands)))]
            g["enabled"] = False
            notes.append(f"{t.get('name', '?')}."
                         f"{g.get('group_by', '?')}: group disabled")

    # r14 session-2 arm — independent stream (+211): output path
    # templates.  Both engines expand detail_output_pattern /
    # index_output_pattern via str.format(group=, id=)
    # (json_api_exporter.py:631,697); the tree diff compares RELATIVE
    # paths, so any divergence in template expansion or parent-dir
    # creation shows up as missing files.
    rng3 = np.random.RandomState(seed + 211)
    for target in cfg.get("exports") or []:
        if target.get("exporter") != "json_api_exporter":
            continue
        tname = target.get("name", "?")
        params = target.get("params") or {}
        dp = params.get("detail_output_pattern")
        if isinstance(dp, str) and rng3.rand() < 0.35:
            params["detail_output_pattern"] = "details/" + dp
            notes.append(f"{tname}: detail_output_pattern -> details/ "
                         "prefixed")
        ip = params.get("index_output_pattern")
        if isinstance(ip, str) and "{group}" in ip and rng3.rand() < 0.35:
            params["index_output_pattern"] = "{group}_index.json"
            notes.append(f"{tname}: index_output_pattern -> "
                         "{group}_index.json")
    return notes


# ---------------------------------------------------------------------------
# relation/topology axis (r14: the taxons group's hierarchy loader ran
# under ONE plugin — nested_set — across every previous grid.  Permute
# it against the same derived hierarchy: adjacency_list traverses
# parent pointers with a recursive CTE matching the EXTERNAL id
# (adjacency_list.py:180-205), join_table reads a physical
# subtree-expanded bridge (join_table.py:167-176, synthesized by
# run_ref from the derived taxonomy).  All three must tag identical
# per-entity frames, so every widget adjudicates the loader.)

def mutate_relation(cfg: list, seed: int) -> list:
    """Seeded rewrite of the taxons group's occurrences relation,
    IN PLACE; returns notes.  The mutated YAML is consumed VERBATIM by
    both engines — reference loaders execute their own SQL dialect,
    this engine its Spark joins, and parity stays the only oracle."""
    rng = np.random.RandomState(seed)
    notes: list = []
    for group in cfg:
        if not isinstance(group, dict) or group.get("group_by") != "taxons":
            continue
        for src in group.get("sources") or []:
            rel = (src or {}).get("relation") or {}
            if rel.get("plugin") != "nested_set":
                continue
            r = rng.rand()
            if r < 0.35:
                src["relation"] = {
                    "plugin": "adjacency_list",
                    "key": rel.get("key", "id_taxonref"),
                    "parent_field": (rel.get("fields") or {}).get(
                        "parent", "parent_id"),
                    "hierarchy_id_field": rel.get("ref_key", "id"),
                    "include_children": True,
                }
                notes.append(f"{src.get('name')}: relation nested_set -> "
                             "adjacency_list (recursive-CTE subtree)")
            elif r < 0.6:
                src["relation"] = {
                    "plugin": "join_table",
                    "key": "id",
                    "join_table": "occurrence_links",
                    "keys": {"source": "id_occurrence",
                             "reference": "id_taxon"},
                }
                notes.append(f"{src.get('name')}: relation nested_set -> "
                             "join_table (physical subtree bridge)")
    return notes


# ---------------------------------------------------------------------------
# import-config axis (r13: the taxonomy derivation ran under ONE
# parameterization — permute the ExtractionConfig branch space:
# incomplete_rows skip|fill_unknown|error, the levels list, id_strategy)

def mutate_import(cfg: dict, seed: int) -> list:
    """Seeded permutations of the loaded import.yml's derived-taxonomy
    extraction, IN PLACE; returns notes.  Node-for-node taxonomy-table
    parity (tablediff.diff_taxonomy_tables) plus every downstream
    widget adjudicate."""
    rng = np.random.RandomState(seed)
    notes: list = []
    refs = ((cfg.get("entities") or {}).get("references")) or {}
    taxons = refs.get("taxons") or {}
    conn = taxons.get("connector") or {}
    ex = conn.get("extraction") if conn.get("type") == "derived" else None
    if not isinstance(ex, dict):
        return notes
    r = rng.rand()
    if r < 0.3:
        ex["incomplete_rows"] = "fill_unknown"
        notes.append("import.taxons: incomplete_rows -> fill_unknown "
                     "(every level COALESCEd to 'Unknown <name>')")
    elif r < 0.45:
        ex["incomplete_rows"] = "error"
        notes.append("import.taxons: incomplete_rows -> error "
                     "(global all-levels-non-NULL filter)")
    if rng.rand() < 0.3 and isinstance(ex.get("levels"), list) \
            and len(ex["levels"]) > 2:
        dropped = ex["levels"].pop()
        hl = (taxons.get("hierarchy") or {}).get("levels")
        if isinstance(hl, list) and hl and hl[-1] == dropped.get("name"):
            hl.pop()
        notes.append(f"import.taxons: deepest level dropped "
                     f"({dropped.get('name')}) — 3-level taxonomy")
    # r14 depth/fan-out axis: insert the synthesized 'section' rank
    # between genus and species (synth.make_occurrences carries the
    # column inertly) — deepens the tree one level and splits each
    # genus's fan-out in two.  Drawn AFTER the r13 arms so earlier
    # variants' seed streams are unchanged.
    if rng.rand() < 0.35 and isinstance(ex.get("levels"), list):
        names = [lv.get("name") for lv in ex["levels"]]
        if "genus" in names and "section" not in names:
            pos = names.index("genus") + 1
            ex["levels"].insert(pos,
                                {"name": "section", "column": "section"})
            hl = (taxons.get("hierarchy") or {}).get("levels")
            if isinstance(hl, list) and "genus" in hl:
                hl.insert(hl.index("genus") + 1, "section")
            notes.append("import.taxons: 'section' level inserted after "
                         f"genus — {len(ex['levels'])}-level taxonomy")
    return notes


# ---------------------------------------------------------------------------
# variant specs


def variant_spec(i: int) -> dict:
    """Spec for variant ``i``: 0 = clean baseline; 1..3 = config-axis
    seeds; 4+ = config + data mutations STACKED (composed doctrine)."""
    if i == 0:
        return {"name": "v0-clean", "config_seed": None, "data": {}}
    if i < 4:
        return {"name": f"v{i}-config", "config_seed": 1300 + i, "data": {}}
    spec = {"name": f"v{i}-composed", "config_seed": 1300 + i,
            "data": {"seed": 900 + i, "n_occurrences": 650,
                     "null_rate": 0.08, "null_geo_rate": 0.02,
                     "shuffle_seed": 77 + i}}
    if i >= 6:
        # r13: measurement BLACKOUT — 4 terminal taxa keep their rows
        # (so they still derive into the taxonomy) but lose every float
        # measurement, driving the reference plugins' empty-series
        # branches (stat-summary params echo, zero-count fills, the
        # [0]-int vs [0.0]-float zero-total percentage literals)
        spec["data"]["blackout_taxa"] = 4
    return spec
