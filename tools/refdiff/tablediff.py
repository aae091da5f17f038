"""Import-phase differential: the derived taxonomy TABLE itself.

The widget diff exercises the taxonomy indirectly (entity ids must
align, nested-set loaders must tag the same subtrees).  This makes the
import-parity claim explicit: every node row the reference's
HierarchyBuilder produced — id, parent_id, level, rank names/values,
full_path, external id, full_name, lft, rght — must match this
engine's derive_hierarchy output exactly.
"""

from __future__ import annotations

import os
import sqlite3

COLUMNS = ["id", "parent_id", "level", "rank_name", "rank_value",
           "full_path", "taxons_id", "full_name", "lft", "rght"]


def load_reference_taxons(proj: dict) -> list[tuple]:
    db_path = os.path.join(proj["root"], "db", "niamoto.db")
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(
            f"SELECT {', '.join(COLUMNS)} FROM entity_taxons")
        return sorted(tuple(r) for r in cur.fetchall())
    finally:
        con.close()


def load_spark_taxons(spark, proj: dict) -> list[tuple]:
    path = os.path.join(proj["root"], "warehouse", "taxons.parquet")
    df = spark.read.parquet(path).select(*COLUMNS)
    return sorted(tuple(r) for r in df.collect())


def _strip_blocked(doc, blocked=None):
    """Remove widgets the reference cannot produce in this container
    (diff.REFERENCE_BLOCKED — this engine is a superset on them) plus
    their flatten-merged top-level copies, so export detail files
    compare on the shared surface only.  ``blocked`` overrides the
    default set (r13: lifted when a variant makes the chain
    reference-runnable)."""
    from tools.refdiff.diff import REFERENCE_BLOCKED

    if blocked is None:
        blocked = REFERENCE_BLOCKED
    if not isinstance(doc, dict):
        return doc
    blocked_names = {w for (_g, w) in blocked}
    flatten_keys = set()
    for name in blocked_names & set(doc):
        if isinstance(doc[name], dict):
            flatten_keys |= set(doc[name].keys())
    return {k: v for k, v in doc.items()
            if k not in blocked_names and k not in flatten_keys}


def _defluff(doc):
    """Normalize the reference exporter's flatten artifact in detail
    docs: every dict widget's keys are ALSO merged at top level with
    later widgets overwriting earlier ones (json_api_exporter.py:
    852-856), which can pair e.g. top_ranking's 'tops' with another
    widget's 'counts'.  The per-widget objects remain the authoritative
    strictly-compared content; the duplicated top-level LIST copies are
    compared as sorted multisets so a tie-order artifact inside the
    melange cannot fail the diff."""
    if not isinstance(doc, dict):
        return doc
    widget_keys = set()
    for v in doc.values():
        if isinstance(v, dict):
            widget_keys |= set(v.keys())
    out = {}
    for k, v in doc.items():
        if k in widget_keys and isinstance(v, list) and \
                all(not isinstance(x, (dict, list)) for x in v):
            out[k] = sorted(v, key=lambda x: (x is None, str(x)))
        else:
            out[k] = v
    return out


def diff_export_trees(ref_dir: str, spark_dir: str,
                      max_problems: int = 40,
                      blocked: dict | None = None) -> list[str]:
    """Compare two static-API export trees file-by-file.

    metadata.json is excluded (wall-clock timestamps); everything else
    must exist on both sides and parse to JSON equal under the same
    numeric doctrine as the widget diff (canonicalized ties, 2dp with
    half-even-boundary allowance)."""
    import json

    from tools.refdiff.diff import canonicalize, compare

    def tree(d):
        out = {}
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f == "metadata.json":
                    continue
                p = os.path.join(root, f)
                out[os.path.relpath(p, d)] = p
        return out

    import gzip

    def read_text(p):
        # compress: true names files <x>.json.gz; gzip's header embeds
        # an mtime, so equality is on DECOMPRESSED text for those
        if p.endswith(".gz"):
            with gzip.open(p, "rt", encoding="utf-8") as fh:
                return fh.read()
        with open(p, encoding="utf-8") as fh:
            return fh.read()

    ref, sp = tree(ref_dir), tree(spark_dir)
    problems = []
    for rel in sorted(set(ref) - set(sp)):
        problems.append(f"only in reference: {rel}")
    for rel in sorted(set(sp) - set(ref)):
        problems.append(f"only in spark: {rel}")
    for rel in sorted(set(ref) & set(sp)):
        ta, tb = read_text(ref[rel]), read_text(sp[rel])
        try:
            a, b = json.loads(ta), json.loads(tb)
        except ValueError as e:
            problems.append(f"{rel}: unparseable ({e})")
            continue
        # formatting differential (r13): whenever the raw parsed values
        # are EXACTLY equal, the serialization must match too — the
        # json_options contract (indent / minify / ensure_ascii / float
        # repr / int-vs-float typing) is only testable at the text
        # layer.  Object KEY ORDER is deliberately excluded: the
        # reference itself is key-order nondeterministic (e.g.
        # binary_aggregator builds its distribution dict from a python
        # SET, whose string iteration order is hash-salt randomized per
        # process — a 10-variant sweep flipped 0/10 <-> 6/6 purely on
        # the interpreter salt), and RFC 8259 object order carries no
        # meaning.  So equality is asserted on (1) the key-sorted
        # canonical text, which still distinguishes 10 from 10.0, and
        # (2) a key-order-free formatting fingerprint (indentation
        # whitespace runs, separator style, \\u escaping).
        # Files that differ in content (superset widgets, 2dp boundary
        # floats, melange tie order) fall through to the tolerant
        # compare below and never reach this assertion.
        if a == b and ta != tb:
            import re as _re

            def canon(x):
                return json.dumps(x, sort_keys=True, ensure_ascii=False,
                                  separators=(",", ":"))

            def fmt(t):
                return (sorted(set(_re.findall(r"\n[ \t]*", t))),
                        sorted(set(_re.findall(r'[,:][ \t]*', t))),
                        "\\u" in t)

            if canon(a) != canon(b):
                problems.append(
                    f"{rel}: content equal but canonical serialization "
                    f"differs (int/float typing)")
            elif fmt(ta) != fmt(tb):
                problems.append(
                    f"{rel}: content equal but formatting differs: "
                    f"ref={fmt(ta)!r} spark={fmt(tb)!r}")
        a, b = _strip_blocked(a, blocked), _strip_blocked(b, blocked)
        bnd: list = []
        diffs = compare(_defluff(canonicalize(a)),
                        _defluff(canonicalize(b)), boundary=bnd)
        for path, x, y in diffs[:3]:
            problems.append(f"{rel}{path}: ref={x!r} spark={y!r}")
        if len(problems) >= max_problems:
            problems.append("... (truncated)")
            return problems
    return problems


def diff_taxonomy_tables(spark, proj: dict) -> list[str]:
    """Returns a list of human-readable row-level differences."""
    ref = load_reference_taxons(proj)
    sp = load_spark_taxons(spark, proj)
    problems = []
    if len(ref) != len(sp):
        problems.append(f"row count: reference {len(ref)} vs spark {len(sp)}")
    ref_by_id = {r[0]: r for r in ref}
    sp_by_id = {r[0]: r for r in sp}
    for nid in sorted(set(ref_by_id) | set(sp_by_id)):
        a, b = ref_by_id.get(nid), sp_by_id.get(nid)
        if a is None or b is None:
            problems.append(f"node {nid}: only in "
                            f"{'spark' if a is None else 'reference'}")
            continue
        for col, x, y in zip(COLUMNS, a, b):
            if x != y:
                problems.append(f"node {nid}.{col}: ref={x!r} spark={y!r}")
    return problems
