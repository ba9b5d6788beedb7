"""Spatial proximity join: the geospatial member of the blocking family.

All-pairs haversine is O(n²) — the same wall every dedup/similarity
operator in this engine avoids with candidate blocking (LSH bands, k-means
cells, pigeonhole slices). Here the block key is a latitude band: any two
points within ``radius_km`` differ in latitude by at most
``radius_km / 111.19`` degrees, so with cell height ``radius_km / 111``
(strictly larger — conservative) matching pairs sit in the same or an
adjacent band. One side joins from its home band, the other explodes to
its three-band neighborhood, candidates dedupe, and the exact haversine
verifies — candidates only, never all pairs. At planetary scale add a
longitude grid per band (width widened by 1/cos(lat)) for a full 2-D
tiling; the join shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_km

_KM_PER_DEG_LAT = 111.0  # < true 111.19: cells strictly taller than needed


def proximity_join_km(
    points: DataFrame,
    radius_km: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Pairs of distinct points within ``radius_km`` (great-circle):
    ``(id1, id2, distance_km)`` with id1 < id2, distance rounded to 3 dp.
    Sound and complete: banding never drops a true pair (cell height
    bounds the maximum latitude difference) and every candidate is
    exact-verified."""
    cell_deg = radius_km / _KM_PER_DEG_LAT
    p = points.select(
        F.col(id_col).alias("pid"),
        F.col(lat_col).cast("double").alias("plat"),
        F.col(lon_col).cast("double").alias("plon"),
        F.floor(F.col(lat_col) / F.lit(cell_deg)).cast("long").alias("band"),
    )
    neighbors = p.select(
        F.col("pid").alias("qid"),
        F.col("plat").alias("qlat"),
        F.col("plon").alias("qlon"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    cands = (
        p.join(neighbors, "band")
        .filter(F.col("pid") < F.col("qid"))
        .select("pid", "qid", "plat", "plon", "qlat", "qlon")
        .distinct()  # a pair can meet in up to two band orientations
    )
    dist = haversine_km(
        F.col("plat"), F.col("plon"), F.col("qlat"), F.col("qlon")
    )
    return (
        cands.withColumn("distance_km", F.round(dist, 3))
        .filter(F.col("distance_km") <= radius_km)
        .select(
            F.col("pid").alias("id1"), F.col("qid").alias("id2"), "distance_km"
        )
    )
