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
# variant specs


def variant_spec(i: int) -> dict:
    """Spec for variant ``i``: 0 = clean baseline; 1..3 = config-axis
    seeds; 4+ = config + data mutations STACKED (composed doctrine)."""
    if i == 0:
        return {"name": "v0-clean", "config_seed": None, "data": {}}
    if i < 4:
        return {"name": f"v{i}-config", "config_seed": 1300 + i, "data": {}}
    return {"name": f"v{i}-composed", "config_seed": 1300 + i,
            "data": {"seed": 900 + i, "n_occurrences": 650,
                     "null_rate": 0.08, "null_geo_rate": 0.02,
                     "shuffle_seed": 77 + i}}
