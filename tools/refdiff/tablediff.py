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
