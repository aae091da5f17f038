"""Extended variant-grid run: variants [start, stop) beyond the
canonical 10 (tools/ref_pipeline_diff.py --variants=10).  The specs are
deterministic in the index (tools/refdiff/variants.py:variant_spec),
so every index above 9 is a brand-new seeded point on the same
config x export x import x relation x data x blackout axes — new
differential coverage for free.

Usage:
    python tools/grid_extend.py START STOP [grid_root]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) < 2:
        print(__doc__)
        return 2
    if not os.path.isdir("/root/reference/src"):
        print("reference checkout not present; nothing to diff against")
        return 3
    start, stop = int(args[0]), int(args[1])
    grid_root = args[2] if len(args) > 2 else tempfile.mkdtemp(
        prefix="refdiff_ext_")

    from niamoto_spark.session import get_spark
    from tools.ref_pipeline_diff import run_one
    from tools.refdiff.variants import variant_spec

    spark = get_spark("refdiff-ext")
    verdicts = {}
    for i in range(start, stop):
        spec = variant_spec(i)
        print(f"\n=== variant {i}: {spec['name']} ===")
        report = run_one(spark, os.path.join(grid_root, spec["name"]), spec)
        verdicts[spec["name"]] = bool(report["ok"])
    print("\n=== extended grid ===")
    for name, ok in verdicts.items():
        print(f"  {name}: {'CLEAN' if ok else 'DIFFS'}")
    all_ok = all(verdicts.values())
    print(f"RESULT: {'CLEAN' if all_ok else 'DIFFS'} "
          f"({sum(verdicts.values())}/{len(verdicts)} variants clean)")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
