"""Grid-bucketed proximity join (operators/proximity.py)."""

import math

from pyspark.sql import functions as F

from niamoto_spark.operators.proximity import haversine_m, proximity_join


def _sides(spark, pts_a, pts_b):
    left = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts_a)],
        ["id_a", "lat", "lon"])
    right = spark.createDataFrame(
        [(100 + i, la, lo) for i, (la, lo) in enumerate(pts_b)],
        ["id_b", "lat_r", "lon_r"])
    return left, right


def _brute(pts_a, pts_b, radius):
    out = set()
    for i, (la, lo) in enumerate(pts_a):
        for j, (lb, lb2) in enumerate(pts_b):
            dla = math.radians(lb - la)
            dlo = math.radians(lb2 - lo)
            h = (math.sin(dla / 2) ** 2 +
                 math.cos(math.radians(la)) * math.cos(math.radians(lb))
                 * math.sin(dlo / 2) ** 2)
            d = 2 * 6_371_000 * math.asin(math.sqrt(h))
            if round(d, 2) <= radius:
                out.add((i, 100 + j))
    return out


def test_matches_brute_force_including_cell_boundaries(spark):
    import random

    rng = random.Random(7)
    pts_a = [(-22.0 + rng.random(), 165.0 + rng.random())
             for _ in range(40)]
    pts_b = [(-22.0 + rng.random(), 165.0 + rng.random())
             for _ in range(40)]
    left, right = _sides(spark, pts_a, pts_b)
    got = {(r["id_a"], r["id_b"])
           for r in proximity_join(left, right, 5000.0).collect()}
    assert got == _brute(pts_a, pts_b, 5000.0)


def test_high_latitude_lon_shrink_not_missed(spark):
    """At 60N a 0.1-degree lon gap is only ~5.5 km; the widened lon cell
    must still surface the pair."""
    pts_a = [(60.0, 10.0)]
    pts_b = [(60.0, 10.09)]  # ~5.0 km east
    left, right = _sides(spark, pts_a, pts_b)
    got = proximity_join(left, right, 5200.0, max_abs_lat=66.0).collect()
    assert len(got) == 1
    assert abs(got[0]["distance_m"] - 5008) < 20


def test_no_duplicate_pairs_across_neighborhoods(spark):
    pts = [(-22.0, 165.0), (-22.001, 165.001)]
    left, right = _sides(spark, pts, pts)
    rows = proximity_join(left, right, 10_000.0).collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows}) == 4


def test_haversine_known_distance(spark):
    # Paris -> London ~ 343.5 km
    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)],
                               ["la", "lo", "lb", "lc"])
    d = df.select(haversine_m(F.col("la"), F.col("lo"),
                              F.col("lb"), F.col("lc"))
                  .alias("d")).collect()[0]["d"]
    assert abs(d - 343_500) < 1500
