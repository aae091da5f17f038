"""Hierarchy derivation, nested sets, ancestor closure, subtree joins."""

import pandas as pd
from pyspark.sql import functions as F

from niamoto_spark.hierarchy import (add_nested_sets, ancestor_closure,
                                     derive_hierarchy, descendants,
                                     subtree_join)


def _taxa(spark):
    return spark.createDataFrame(pd.DataFrame({
        "family": ["Araucariaceae", "Araucariaceae", "Araucariaceae",
                   "Myrtaceae", "Myrtaceae", None],
        "genus": ["Araucaria", "Araucaria", "Agathis",
                  "Syzygium", None, "Ghost"],
        "species": ["columnaris", "montana", "ovata", "acre", None, None],
    }))


def test_derive_hierarchy_structure(spark):
    h = derive_hierarchy(_taxa(spark), ["family", "genus", "species"])
    rows = {r["full_path"]: r for r in h.collect()}
    # family row with NULL genus contributes only the family node; the
    # NULL-family row is dropped entirely (reference TRIM/NULLIF cleanup)
    assert "Myrtaceae" in rows and "Ghost" not in {
        r["rank_value"] for r in rows.values() if r["level"] == 0}
    assert rows["Araucariaceae|Araucaria|columnaris"]["level"] == 2
    assert rows["Araucariaceae|Araucaria"]["parent_id"] == rows["Araucariaceae"]["id"]
    # nested sets: parent's [lft, rght] strictly contains child's
    p, c = rows["Araucariaceae"], rows["Araucariaceae|Agathis"]
    assert p["lft"] < c["lft"] <= c["rght"] < p["rght"]


def test_derive_hierarchy_deterministic_ids(spark):
    h1 = derive_hierarchy(_taxa(spark), ["family", "genus", "species"])
    h2 = derive_hierarchy(_taxa(spark), ["family", "genus", "species"])
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))


def _nodes(spark):
    # 1 root, children 2,3; grandchildren 4,5 under 2
    return spark.createDataFrame(pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "parent_id": [None, 1, 1, 2, 2],
    }).astype({"id": "int64"}))


def test_add_nested_sets_bounds(spark):
    ns = {r["id"]: (r["lft"], r["rght"]) for r in
          add_nested_sets(_nodes(spark), "id", "parent_id").collect()}
    assert ns[1] == (1, 10)
    assert ns[2][0] < ns[4][0] <= ns[4][1] < ns[2][1]
    assert not (ns[3][0] < ns[4][0] < ns[3][1])  # 4 not under 3


def test_descendants_range_query(spark):
    ns = add_nested_sets(_nodes(spark), "id", "parent_id")
    got = {r["id"] for r in descendants(ns, 2).collect()}
    assert got == {2, 4, 5}


def test_ancestor_closure(spark):
    cl = ancestor_closure(_nodes(spark), "id", "parent_id")
    got = {(r["node_id"], r["ancestor_id"], r["depth"]) for r in cl.collect()}
    assert (4, 4, 0) in got and (4, 2, 1) in got and (4, 1, 2) in got
    assert (3, 1, 1) in got
    assert not any(n == 1 and a != 1 for n, a, _ in got)


def test_subtree_join_rollup(spark):
    ns = add_nested_sets(_nodes(spark), "id", "parent_id")
    facts = spark.createDataFrame(pd.DataFrame(
        {"leaf": [4, 4, 5, 3], "v": [1.0, 2.0, 4.0, 8.0]}))
    tagged = subtree_join(facts, "leaf", ns, "id", "anc")
    sums = {r["anc"]: r["s"] for r in
            tagged.groupBy("anc").agg(F.sum("v").alias("s")).collect()}
    assert sums[1] == 15.0   # everything
    assert sums[2] == 7.0    # 4,5 subtree
    assert sums[3] == 8.0
    assert sums[4] == 3.0
