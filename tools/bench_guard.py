"""Best-of-N bench regression guard (VERDICT r8 next-#2).

The driver's per-round bench records run on a loaded microVM with a
documented ±25% noise band, which makes single-run drift (q38: +4.2%
then +15.4% across r7/r8 with no code change) unactionable.  This
guard is the real regression signal: it runs ``bench.py`` N times
(default 3) on a quiet machine, takes the per-query BEST, appends the
record to ``BENCH_GUARD.jsonl`` at the repo root (its own file, not
PROGRESS.jsonl, so the driver's stall parser never sees foreign
lines), and exits nonzero when any query's best-of-N worsened more
than ``--threshold`` (default 10%) against the previous guard record.

Queries intentionally touched this round are exempted with
``--changed q38_minhash_candidates,...`` — the guard is for creep on
UNTOUCHED code, not for vetoing optimization work.

Usage (round-close checklist):
    python tools/bench_guard.py                # run, record, compare
    python tools/bench_guard.py --runs 1       # quick probe, still records
    python tools/bench_guard.py --changed q28_ann_topk
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUARD_FILE = os.path.join(ROOT, "BENCH_GUARD.jsonl")


def run_bench_once(env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, cwd=ROOT)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"bench.py failed (rc={out.returncode})")
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("bench.py emitted no JSON line")


def last_guard_record() -> dict | None:
    if not os.path.exists(GUARD_FILE):
        return None
    rec = None
    with open(GUARD_FILE) as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                # skip slow_guard's sibling records AND regressed runs
                # (a flagged record must not become the next baseline)
                if "kind" not in r and "regressed" not in r:
                    rec = r
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.10,
                    help="relative best-of-N regression that fails")
    ap.add_argument("--min-abs", type=float, default=0.15,
                    help="absolute seconds a query must worsen before the "
                         "relative threshold applies — sub-second queries "
                         "jitter 30-50ms on this microVM even best-of-3, "
                         "which is noise, not regression; the q38-class "
                         "creep this guard exists for (+0.23s) clears it")
    ap.add_argument("--changed", default="",
                    help="comma-separated query names exempt this round")
    args = ap.parse_args()
    changed = {q.strip() for q in args.changed.split(",") if q.strip()}

    env = dict(os.environ)
    best: dict[str, float] = {}
    quality: dict = {}
    for i in range(args.runs):
        r = run_bench_once(env)
        for q, sec in r["queries"].items():
            best[q] = min(best.get(q, float("inf")), sec)
        quality = {k: r[k] for k in
                   ("ivf_recall_at_5", "ivfpq_recall_at_5",
                    "approx_distinct_rel_err", "approx_p50_rel_err")
                   if k in r}
        print(f"# run {i + 1}/{args.runs}: total "
              f"{r['value']}s", file=sys.stderr)

    prev = last_guard_record()
    failures = []
    if prev is None:
        print("# no previous guard record — baseline established",
              file=sys.stderr)
    else:
        for q, sec in sorted(best.items()):
            ref = prev.get("queries", {}).get(q)
            if ref is None or ref <= 0:
                continue
            rel = (sec - ref) / ref
            flag = ("CHANGED-EXEMPT" if q in changed else
                    "REGRESSED" if (rel > args.threshold
                                    and sec - ref > args.min_abs)
                    else "ok")
            print(f"# {q}: {ref}s -> {sec}s ({rel:+.1%}) {flag}",
                  file=sys.stderr)
            if flag == "REGRESSED":
                failures.append((q, ref, sec, rel))
    # a REGRESSED run is recorded for history but flagged so it never
    # becomes the next baseline (one missed nonzero exit must not
    # self-heal the regression out of the guard)
    record = {"ts": time.time(), "runs": args.runs,
              "total_best": round(sum(best.values()), 3),
              "queries": best, **quality}
    if failures:
        record["regressed"] = [q for q, *_ in failures]
    with open(GUARD_FILE, "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    if failures:
        for q, ref, sec, rel in failures:
            print(f"REGRESSION {q}: best-of-{args.runs} {ref}s -> "
                  f"{sec}s ({rel:+.1%} > {args.threshold:.0%})",
                  file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
