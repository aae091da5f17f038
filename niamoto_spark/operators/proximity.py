"""Point-proximity join: all pairs within a haversine radius, via grid
bucketing — the point-to-point complement of points_in_polygons
(operators/geospatial.py).

A naive radius join is all-pairs; the scale shape is the classic grid
spatial join: snap points to a lat/lon grid whose cell span is >= the
radius, explode ONE side to its 3x3 cell neighborhood, equi-join on the
cell id, refine with the exact haversine.  Every candidate pair meets in
exactly one (left-cell == exploded-right-cell) combination, so the join
result needs no dedup; the shuffle key cardinality scales with occupied
cells.

Longitude degrees shrink by cos(lat), so the lon cell size is widened by
1/cos(max_abs_lat) to keep "neighbor cell" a superset of "within
radius" at every latitude the data can reach (callers pass their
latitude bound; the default 66° costs a 2.5x wider lon cell).
Antimeridian wraparound and the poles are documented out of scope —
the reference's data (New Caledonia) and the test fixtures live far
from both.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

EARTH_RADIUS_M = 6_371_000.0
_M_PER_DEG = 111_194.92664455873  # pi/180 * R: meters per degree lat


def haversine_m(lat_a, lon_a, lat_b, lon_b) -> "F.Column":
    """Great-circle distance in meters, pure column expressions (same
    formula an oracle can repeat verbatim)."""
    la, lb = F.radians(lat_a), F.radians(lat_b)
    dla = F.radians(lat_b) - F.radians(lat_a)
    dlo = F.radians(lon_b) - F.radians(lon_a)
    h = (F.pow(F.sin(dla / 2), 2) +
         F.cos(la) * F.cos(lb) * F.pow(F.sin(dlo / 2), 2))
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(h))


@register("proximity_join", PluginType.TRANSFORMER)
def proximity_join(left: DataFrame, right: DataFrame, radius_m: float,
                   lat_col: str = "lat", lon_col: str = "lon",
                   max_abs_lat: float = 66.0,
                   round_dp: int = 2) -> DataFrame:
    """All (left, right) pairs with haversine distance <= radius_m.

    Inputs carry disjoint non-coordinate column names (rename before
    calling).  Output: left columns + right columns + ``distance_m``
    (rounded).  Left's coordinates are ``lat_col``/``lon_col``; right
    must expose ``{lat_col}_r`` / ``{lon_col}_r``.
    """
    lat_r, lon_r = f"{lat_col}_r", f"{lon_col}_r"
    cell_lat = radius_m / _M_PER_DEG
    cell_lon = cell_lat / math.cos(math.radians(max_abs_lat))

    lx = F.floor(F.col(lat_col) / cell_lat).cast("long")
    ly = F.floor(F.col(lon_col) / cell_lon).cast("long")
    tagged_left = left.withColumn("__cx", lx).withColumn("__cy", ly)

    rx = F.floor(F.col(lat_r) / cell_lat).cast("long")
    ry = F.floor(F.col(lon_r) / cell_lon).cast("long")
    neigh = F.expr("explode(flatten(transform(sequence(-1, 1), dx -> "
                   "transform(sequence(-1, 1), dy -> "
                   "struct(dx AS dx, dy AS dy)))))")
    tagged_right = (right.withColumn("__rx", rx).withColumn("__ry", ry)
                    .select("*", neigh.alias("__n"))
                    .withColumn("__cx", F.col("__rx") + F.col("__n.dx"))
                    .withColumn("__cy", F.col("__ry") + F.col("__n.dy"))
                    .drop("__n", "__rx", "__ry"))

    dist = haversine_m(F.col(lat_col), F.col(lon_col),
                       F.col(lat_r), F.col(lon_r))
    return (tagged_left.join(tagged_right, ["__cx", "__cy"])
            .withColumn("distance_m", F.round(dist, round_dp))
            .where(F.col("distance_m") <= radius_m)
            .drop("__cx", "__cy"))
