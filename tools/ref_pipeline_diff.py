"""Whole-pipeline differential: reference engine vs this engine.

Synthesizes a niamoto project (tools/refdiff/synth.py), runs the
reference's own TransformerService/ExporterService over it
(tools/refdiff/run_ref.py, via shims) AND this engine's Pipeline
(tools/refdiff/run_spark.py), then diffs the per-entity widget JSONs at
2dp (tools/refdiff/diff.py) and the export trees byte-for-byte.

Usage:
    python tools/ref_pipeline_diff.py [project_root]
    python tools/ref_pipeline_diff.py --variants=5 [grid_root]

``--variants=N`` runs N seeded variants (tools/refdiff/variants.py):
v0 is the clean r12 baseline, v1-v3 permute the transform.yml parameter
branch space, v4+ stack config permutation onto composed-probe data
mutations (NULL holes, shuffled rows, alternate seed).  Exit 0 only if
EVERY variant diffs clean.

Requires /root/reference to be present; exits 3 when it is not.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(spark, root: str, spec: dict | None = None) -> dict:
    """Build one project (per ``spec``) and run the full differential.
    Returns the diff report (report['ok'] is the verdict)."""
    from tools.refdiff.diff import diff_results, print_report
    from tools.refdiff.run_ref import (build_reference_db,
                                       run_reference_export,
                                       run_reference_transform)
    from tools.refdiff.run_spark import run_spark_export, run_spark_pipeline
    from tools.refdiff.synth import build_project
    from tools.refdiff.tablediff import (diff_export_trees,
                                         diff_taxonomy_tables)

    mutator, export_mut, import_mut, notes = None, None, None, []
    data_kw = {}
    if spec:
        data_kw = dict(spec.get("data") or {})
        if "seed" in data_kw:
            data_kw["data_seed"] = data_kw.pop("seed")
        if spec.get("config_seed") is not None:
            from tools.refdiff.variants import (mutate_export,
                                                mutate_relation,
                                                mutate_transform)

            def mutator(cfg, _seed=spec["config_seed"]):
                notes.extend(mutate_transform(cfg, _seed))
                # independent seed stream (same doctrine as the export
                # axis): the relation/topology draws never reshuffle
                # the widget-parameter draws
                notes.extend(mutate_relation(cfg, _seed + 13000))

            # independent seed stream for the export axis so adding
            # export mutators never reshuffles the transform draws
            def export_mut(cfg, _seed=spec["config_seed"] + 5000):
                notes.extend(mutate_export(cfg, _seed))

            from tools.refdiff.variants import mutate_import

            def import_mut(cfg, _seed=spec["config_seed"] + 9000):
                notes.extend(mutate_import(cfg, _seed))

    proj = build_project(root, transform_mutator=mutator,
                         export_mutator=export_mut,
                         import_mutator=import_mut, **data_kw)
    print(f"project: {root}" + (f"  [{spec['name']}]" if spec else ""))
    for n in notes:
        print("  mutated:", n)

    # r14: no conditional blocked-set resolution left — the shim's
    # ast.Dict whitelist (shims.patch_custom_formula_dict) makes the
    # VERBATIM phenology chain reference-runnable, so REFERENCE_BLOCKED
    # is empty and every widget diffs on every variant.
    from tools.refdiff.diff import REFERENCE_BLOCKED
    blocked = dict(REFERENCE_BLOCKED)

    build_reference_db(proj)
    ref = run_reference_transform(proj)
    with open(os.path.join(root, "reference_results.json"), "w") as fh:
        json.dump(ref, fh, ensure_ascii=False, default=str)
    print("reference transform done:", {g: len(m) for g, m in ref.items()})

    sp = run_spark_pipeline(spark, proj)
    with open(os.path.join(root, "spark_results.json"), "w") as fh:
        json.dump(sp, fh, ensure_ascii=False, default=str)
    print("spark transform done:", {g: len(m) for g, m in sp.items()})

    # export phase: the reference ExporterService's targets vs our
    # reference-dialect export over the same transform results
    ref_api = run_reference_export(proj)
    spark_api = run_spark_export(spark, proj)
    export_problems = diff_export_trees(ref_api, spark_api,
                                        blocked=blocked)
    if export_problems:
        print(f"EXPORT TREE DIFFS ({len(export_problems)}):")
        for p in export_problems[:20]:
            print("  ", p)
    else:
        import subprocess
        n = subprocess.run(
            ["bash", "-c", f"find {ref_api} -name '*.json' | wc -l"],
            capture_output=True, text=True).stdout.strip()
        print(f"export tree: identical ({n} JSON files)")

    tax_problems = diff_taxonomy_tables(spark, proj)
    if tax_problems:
        print("TAXONOMY TABLE DIFFS:")
        for p in tax_problems[:20]:
            print("  ", p)
    else:
        print("taxonomy table: identical node-for-node")

    report = diff_results(ref, sp, blocked=blocked)
    report["taxonomy_table_diffs"] = tax_problems
    report["export_tree_diffs"] = export_problems
    report["config_mutations"] = notes
    if tax_problems or export_problems:
        report["ok"] = False
    with open(os.path.join(root, "diff_report.json"), "w") as fh:
        json.dump({"groups": report["groups"],
                   "blocked": report["blocked"], "ok": report["ok"],
                   "config_mutations": notes},
                  fh, ensure_ascii=False, indent=1, default=str)
    print_report(report)
    return report


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if any(a in ("--help", "-h") for a in sys.argv[1:]):
        print(__doc__)
        return 0
    if not os.path.isdir("/root/reference/src"):
        print("reference checkout not present; nothing to diff against")
        return 3

    n_variants = 0
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            n_variants = int(a.split("=", 1)[1])

    from niamoto_spark.session import get_spark
    spark = get_spark("refdiff")

    if not n_variants:
        root = args[0] if args else tempfile.mkdtemp(prefix="refdiff_")
        report = run_one(spark, root)
        return 0 if report["ok"] else 1

    from tools.refdiff.variants import variant_spec
    grid_root = args[0] if args else tempfile.mkdtemp(prefix="refdiff_grid_")
    verdicts = {}
    for i in range(n_variants):
        spec = variant_spec(i)
        print(f"\n=== variant {i}: {spec['name']} ===")
        report = run_one(spark, os.path.join(grid_root, spec["name"]), spec)
        verdicts[spec["name"]] = bool(report["ok"])
    print("\n=== variant grid ===")
    for name, ok in verdicts.items():
        print(f"  {name}: {'CLEAN' if ok else 'DIFFS'}")
    all_ok = all(verdicts.values())
    print(f"RESULT: {'CLEAN' if all_ok else 'DIFFS'} "
          f"({sum(verdicts.values())}/{len(verdicts)} variants clean)")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
