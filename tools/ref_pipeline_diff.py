"""Whole-pipeline differential: reference engine vs this engine.

Synthesizes one project (tools/refdiff/synth.py), runs the reference's
own TransformerService over it (tools/refdiff/run_ref.py, via shims)
AND this engine's Pipeline (tools/refdiff/run_spark.py), then diffs the
per-entity widget JSONs at 2dp (tools/refdiff/diff.py).

Usage:
    python tools/ref_pipeline_diff.py [project_root]

Requires /root/reference to be present; exits 3 when it is not.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if any(a in ("--help", "-h") for a in sys.argv[1:]):
        print(__doc__)
        return 0
    if not os.path.isdir("/root/reference/src"):
        print("reference checkout not present; nothing to diff against")
        return 3

    from tools.refdiff.diff import diff_results, print_report
    from tools.refdiff.run_ref import build_reference_db, \
        run_reference_transform
    from tools.refdiff.synth import build_project

    root = args[0] if args else tempfile.mkdtemp(prefix="refdiff_")
    proj = build_project(root)
    print(f"project: {root}")

    build_reference_db(proj)
    ref = run_reference_transform(proj)
    with open(os.path.join(root, "reference_results.json"), "w") as fh:
        json.dump(ref, fh, ensure_ascii=False, default=str)
    print("reference transform done:",
          {g: len(m) for g, m in ref.items()})

    from niamoto_spark.session import get_spark
    from tools.refdiff.run_spark import run_spark_pipeline
    spark = get_spark("refdiff")
    sp = run_spark_pipeline(spark, proj)
    with open(os.path.join(root, "spark_results.json"), "w") as fh:
        json.dump(sp, fh, ensure_ascii=False, default=str)
    print("spark transform done:", {g: len(m) for g, m in sp.items()})

    # export phase: the reference ExporterService's json_api target vs
    # our reference-dialect export over the same transform results
    from tools.refdiff.run_ref import run_reference_export
    from tools.refdiff.run_spark import run_spark_export
    from tools.refdiff.tablediff import diff_export_trees
    ref_api = run_reference_export(proj)
    spark_api = run_spark_export(spark, proj)
    export_problems = diff_export_trees(ref_api, spark_api)
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

    from tools.refdiff.tablediff import diff_taxonomy_tables
    tax_problems = diff_taxonomy_tables(spark, proj)
    if tax_problems:
        print("TAXONOMY TABLE DIFFS:")
        for p in tax_problems[:20]:
            print("  ", p)
    else:
        print("taxonomy table: identical node-for-node")

    report = diff_results(ref, sp)
    report["taxonomy_table_diffs"] = tax_problems
    report["export_tree_diffs"] = export_problems
    if tax_problems or export_problems:
        report["ok"] = False
    with open(os.path.join(root, "diff_report.json"), "w") as fh:
        json.dump({"groups": report["groups"],
                   "blocked": report["blocked"], "ok": report["ok"]},
                  fh, ensure_ascii=False, indent=1, default=str)
    print_report(report)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
