"""Geospatial column math.

Haversine distance exactly as the reference's fraud job computes it
(``streaming/flink_jobs/fraud_detection.py:64-71``: R = 6371 km, asin form) —
but as pure Spark column expressions, so the impossible-travel rule runs
JVM-side with no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Deterministic lat/lon grid-cell key at ``cell_deg`` resolution —
    struct(cell_lat, cell_lon) of floored cell indices. Pure column
    arithmetic (the geohash-style bucketing every tower-density /
    coverage-map rollup groups by); floor keeps negative coordinates in
    the correct cell, unlike a truncating cast."""
    return F.struct(
        F.floor(lat / F.lit(cell_deg)).cast("long").alias("cell_lat"),
        F.floor(lon / F.lit(cell_deg)).cast("long").alias("cell_lon"),
    )


def grid_density(
    df,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 1.0,
    value_col: str | None = None,
):
    """Spatial density rollup: per grid cell the point count, mean
    position of its members, and (optionally) a DECIMAL-exact value sum —
    the tower-density / coverage heat-map aggregate. ONE map-side-
    combined shuffle keyed by the cell; means derive from exact sums of
    1e-6-rounded coordinates so the output is engine-reproducible
    (raw double coordinate sums would be partition-order-dependent).
    Returns (cell_lat, cell_lon, n, centroid_lat, centroid_lon[, total])
    with centroids rounded to 6."""
    lat = F.col(lat_col)
    lon = F.col(lon_col)
    cell = grid_cell(lat, lon, cell_deg)
    dlat = F.round(lat, 6).cast("decimal(18,6)")
    dlon = F.round(lon, 6).cast("decimal(18,6)")
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dlat).alias("_slat"),
        F.sum(dlon).alias("_slon"),
    ]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col).cast("decimal(20,4)")).alias("_sv"))
    out = (
        df.groupBy(cell.alias("_c"))
        .agg(*aggs)
        .select(
            F.col("_c.cell_lat").alias("cell_lat"),
            F.col("_c.cell_lon").alias("cell_lon"),
            "n",
            F.round(F.col("_slat").cast("double") / F.col("n"), 6).alias("centroid_lat"),
            F.round(F.col("_slon").cast("double") / F.col("n"), 6).alias("centroid_lon"),
            *(
                [F.round(F.col("_sv").cast("double"), 4).alias("total")]
                if value_col is not None
                else []
            ),
        )
    )
    return out


def radius_of_gyration(
    df,
    user_col: str,
    lat_col: str,
    lon_col: str,
):
    """Per-user radius of gyration over location pings — the canonical
    human-mobility statistic (González/Hidalgo/Barabási 2008): the RMS
    haversine distance of a user's pings from their own centroid.
    Telecom reading: r_g ≈ 0 is a stationary device, a few km is a
    commuter, hundreds of km is a traveler — the one-number summary the
    impossible-travel fraud check (`queries/fraud.py`) and grid density
    don't give.

    Plan shape: ONE user-keyed exchange carries everything — the
    centroid (decimal-exact lat/lon sums over a partition window, cast
    to double for the single division) and the per-ping squared
    haversine distance both ride the same hash partitioning, and the
    final per-user aggregate reuses it (no join of a centroid relation
    back onto the ping relation, which would shuffle twice and re-scan).

    Determinism: the centroid is CAST(decimal-sum AS DOUBLE)/n — one
    deterministic division; each d² is a deterministic double ROUNDED to
    9 dp then decimal-summed, so the RMS is partition-order-free and
    mirrors in any engine. The arithmetic centroid-of-degrees is the
    standard approximation (exact spherical centroids need 3D vector
    means); it is documented, not hidden, and consistent cross-engine.

    Returns (user, n_pings, centroid_lat, centroid_lon, rg_km) with
    doubles rounded to 6."""
    u = F.col(user_col)
    w = Window.partitionBy(u)
    lat = F.col(lat_col).cast("decimal(24,8)")
    lon = F.col(lon_col).cast("decimal(24,8)")
    cur = df.select(
        u.alias("user"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        lat.alias("_latd"),
        lon.alias("_lond"),
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("user")).cast("double")
    cur = cur.withColumn(
        "_clat", F.sum("_latd").over(Window.partitionBy("user")).cast("double") / n
    ).withColumn(
        "_clon", F.sum("_lond").over(Window.partitionBy("user")).cast("double") / n
    )
    d = haversine_km(
        F.col("_lat"), F.col("_lon"), F.col("_clat"), F.col("_clon")
    )
    cur = cur.withColumn("_d2", F.round(d * d, 9).cast("decimal(28,9)"))
    agg = cur.groupBy("user").agg(
        F.count(F.lit(1)).cast("long").alias("n_pings"),
        F.round(F.first("_clat"), 6).alias("centroid_lat"),
        F.round(F.first("_clon"), 6).alias("centroid_lon"),
        F.sum("_d2").alias("_ss"),
    )
    return agg.select(
        "user",
        "n_pings",
        "centroid_lat",
        "centroid_lon",
        F.round(
            F.sqrt(F.col("_ss").cast("double") / F.col("n_pings").cast("double")), 6
        ).alias("rg_km"),
    )


# ---------------------------------------------------------------------------
# Geohash over integer micro-degrees — pure integer arithmetic end to end
# so both engines compute identical cells (no float quantization anywhere,
# hence no floor-boundary ulp risk). The bit-interleave and base32 decode
# are GENERATED once in Python and emitted per SQL dialect, so the Spark
# expression and the DuckDB oracle are the same tree by construction.
# ---------------------------------------------------------------------------

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat_us: str, lon_us: str, chars: int = 5, dialect: str = "spark") -> str:
    """SQL expression string computing the ``chars``-character geohash of
    integer micro-degree coordinates (lat ∈ [-90e6, 90e6), lon ∈
    [-180e6, 180e6)).

    Standard geohash bit layout: ``5·chars`` bits, longitude first,
    alternating lon/lat, MSB first; each 5-bit group decodes through the
    base32 alphabet. Quantization is integer: ``ix = (lon_us + 180e6) ·
    2^bits_lon DIV 360e6`` (exact — never a float ratio on a cell
    boundary). ``dialect`` picks shift syntax: Spark ``shiftleft/
    shiftright`` functions, DuckDB ``<<``/``>>`` operators; everything
    else (``&``, ``+``, ``substr``, ``DIV``/``//``) is shared.
    """
    if chars < 1 or chars > 7:
        raise ValueError("chars must be in 1..7 (35 bits max keeps BIGINT exact)")
    total_bits = 5 * chars
    bits_lon = (total_bits + 1) // 2
    bits_lat = total_bits // 2
    if dialect == "spark":
        def shr(e: str, n: int) -> str:
            return f"shiftright({e}, {n})"
        intdiv = "DIV"
    elif dialect == "duck":
        def shr(e: str, n: int) -> str:
            return f"(({e}) >> {n})"
        intdiv = "//"
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    ix = (
        f"(CAST(({lon_us}) + 180000000 AS BIGINT) * {1 << bits_lon}"
        f" {intdiv} 360000000)"
    )
    iy = (
        f"(CAST(({lat_us}) + 90000000 AS BIGINT) * {1 << bits_lat}"
        f" {intdiv} 180000000)"
    )
    # interleave MSB-first: even geohash bit positions take lon bits
    terms = []
    lon_taken = lat_taken = 0
    for k in range(total_bits):
        if k % 2 == 0:
            src, taken, width = ix, lon_taken, bits_lon
            lon_taken += 1
        else:
            src, taken, width = iy, lat_taken, bits_lat
            lat_taken += 1
        bit = f"({shr(src, width - 1 - taken)} & 1)"
        shift = total_bits - 1 - k
        terms.append(f"({bit} * {1 << shift})" if shift else bit)
    code = "(" + " + ".join(terms) + ")"
    chars_sql = [
        f"substr('{GEOHASH_BASE32}', ({shr(code, 5 * (chars - 1 - c))} & 31) + 1, 1)"
        for c in range(chars)
    ]
    return "concat(" + ", ".join(chars_sql) + ")"


def synthetic_micro_coords(key: str, dialect: str = "spark") -> tuple[str, str]:
    """Deterministic synthetic (lat_us, lon_us) micro-degree coordinates
    from an integer key — the fixture-coordinate precedent of the
    haversine/spatial queries, kept integer so geohash cells are exact.
    Knuth multiplier scatters latitude; a coprime multiplier scatters
    longitude independently. Identical text in both dialects (``%`` on
    non-negative operands agrees across engines)."""
    del dialect  # same text both sides; parameter kept for symmetry
    lat = f"((({key}) * 2654435761) % 180000000 - 90000000)"
    lon = f"((({key}) * 40503) % 360000000 - 180000000)"
    return lat, lon
