"""Deterministic k-means (operators/clustering.py)."""

from pyspark.sql import functions as F

from niamoto_spark.operators.clustering import (kmeans_assign,
                                                kmeans_cluster_profile,
                                                kmeans_fit)


def _blobs(spark):
    """Two well-separated 3-d blobs around (0,0,0) and (10,10,10).
    Ids 0 and 1 sit in different blobs so the deterministic min-id init
    starts with one centroid per blob (Lloyd's converges to whatever the
    init implies — a doc-ed property, not a defect)."""
    rows = [(0, [0.0, 0.0, 0.0]), (1, [10.0, 10.0, 10.0])]
    for i, eps in enumerate([0.1, -0.1, 0.2]):
        rows.append((10 + i, [0.0 + eps, 0.0, 0.0 - eps]))
    for i, eps in enumerate([0.1, -0.1, 0.2]):
        rows.append((100 + i, [10.0 + eps, 10.0, 10.0 - eps]))
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def test_recovers_separated_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, "vec_id", "v", k=2, iters=3)
    a = kmeans_assign(df, "vec_id", "v", cents).collect()
    by_cluster = {}
    for r in a:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups[0] == {0, 10, 11, 12}
    assert groups[1] == {1, 100, 101, 102}


def test_deterministic_across_runs(spark):
    df = _blobs(spark)
    p1 = sorted(map(tuple, kmeans_cluster_profile(
        df, "vec_id", "v", k=2, iters=2).collect()))
    p2 = sorted(map(tuple, kmeans_cluster_profile(
        df, "vec_id", "v", k=2, iters=2).collect()))
    assert p1 == p2


def test_empty_cluster_drops_out(spark):
    """k=3 on two tight blobs: min-id init puts centroids 0,1,2 — after
    one update at most two survive with members; the profile must not
    fabricate an empty third."""
    df = _blobs(spark)
    prof = kmeans_cluster_profile(df, "vec_id", "v", k=3, iters=2).collect()
    assert sum(r["n_members"] for r in prof) == 8
    assert all(r["n_members"] > 0 for r in prof)
    assert len(prof) <= 3


def test_assignment_is_broadcast_no_shuffle_join(spark):
    """The assignment plan must broadcast the centroid side — a
    SortMergeJoin on the corpus would be a scale bug."""
    df = _blobs(spark)
    cents = kmeans_fit(df, "vec_id", "v", k=2, iters=1)
    plan = kmeans_assign(df, "vec_id", "v", cents) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# --- DBSCAN ----------------------------------------------------------------

def test_dbscan_two_blobs_and_noise(spark):
    from niamoto_spark.operators.clustering import dbscan
    pts = []
    # blob A around (0,0), blob B around (10,10), 2 isolated noise
    for i in range(8):
        pts.append((i, 0.0 + i * 0.01, 0.0))
    for i in range(8):
        pts.append((100 + i, 10.0 + i * 0.01, 10.0))
    pts += [(900, 5.0, 5.0), (901, -5.0, 7.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = {r["id"]: r for r in
           dbscan(df, "id", "x", "y", eps=0.05, min_pts=4).collect()}
    a = {out[i]["cluster"] for i in range(8)}
    b = {out[100 + i]["cluster"] for i in range(8)}
    assert len(a) == 1 and len(b) == 1 and a != b
    assert a == {0} and b == {100}           # min-id cluster labels
    assert out[900]["cluster"] == -1 and out[901]["cluster"] == -1
    assert not out[900]["is_core"]


def test_dbscan_border_attaches_to_min_core(spark):
    from niamoto_spark.operators.clustering import dbscan
    # 5 tight core points + 1 border point within eps of one core
    pts = [(i, float(i) * 0.01, 0.0) for i in range(5)]
    pts.append((50, 0.08, 0.0))   # within eps of points 3,4 only
    df = spark.createDataFrame(pts, "id long, x double, y double")
    out = {r["id"]: r for r in
           dbscan(df, "id", "x", "y", eps=0.05, min_pts=4).collect()}
    assert out[50]["cluster"] == 0          # attached, not noise
    assert not out[50]["is_core"]
    assert all(out[i]["is_core"] for i in range(5))
