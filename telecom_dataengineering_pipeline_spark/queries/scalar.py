"""Scalar-function queries (SURVEY.md §2.8 F1–F24) — dialect-sensitive date
math, formatting, masking, keys, JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.compat import date_diff_unit, date_format_trino, split_part
from ..functions.keys import record_hash, surrogate_key
from ..functions.masking import mask_email, mask_name
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# F19 + F14 + F15 + F17: date spine → dim_date (dim_date.sql:7-66).
# Spark: explode(sequence(...)); DuckDB: generate_series.
# dayofweek: Spark 1=Sunday..7=Saturday; DuckDB 0=Sunday..6 → +1 on oracle.
# ---------------------------------------------------------------------------

_DIM_DATE_ORACLE = """
SELECT
  CAST(strftime(d, '%Y%m%d') AS INTEGER) AS date_key,
  strftime(d, '%Y-%m-%d')    AS full_date,
  CAST(year(d) AS INTEGER)   AS year,
  CAST(quarter(d) AS INTEGER) AS quarter,
  concat('Q', CAST(quarter(d) AS VARCHAR)) AS quarter_name,
  CAST(month(d) AS INTEGER)  AS month,
  strftime(d, '%B')          AS month_name,
  strftime(d, '%b')          AS month_abbr,
  CAST(day(d) AS INTEGER)    AS day_of_month,
  CAST(dayofyear(d) AS INTEGER) AS day_of_year,
  CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week,
  strftime(d, '%A')          AS day_name,
  (dayofweek(d) + 1 IN (1, 7)) AS is_weekend,
  strftime(d, '%Y-%m')       AS year_month
FROM (SELECT unnest(generate_series(DATE '2020-01-01', DATE '2025-12-31', INTERVAL 1 DAY)) AS d)
"""


@register("dim_date_spine", oracle=_DIM_DATE_ORACLE, tags=("F19", "F14", "F15", "F17"))
def dim_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    spine = spark.sql(
        "SELECT explode(sequence(to_date('2020-01-01'), to_date('2025-12-31'), interval 1 day)) AS d"
    )
    d = F.col("d")
    dow = F.dayofweek(d)  # 1=Sunday
    return spine.select(
        date_format_trino(d, "%Y%m%d").cast("int").alias("date_key"),
        date_format_trino(d, "%Y-%m-%d").alias("full_date"),
        F.year(d).cast("int").alias("year"),
        F.quarter(d).cast("int").alias("quarter"),
        F.concat(F.lit("Q"), F.quarter(d).cast("string")).alias("quarter_name"),
        F.month(d).cast("int").alias("month"),
        date_format_trino(d, "%B").alias("month_name"),
        date_format_trino(d, "%b").alias("month_abbr"),
        F.dayofmonth(d).cast("int").alias("day_of_month"),
        F.dayofyear(d).cast("int").alias("day_of_year"),
        dow.cast("int").alias("day_of_week"),
        date_format_trino(d, "%A").alias("day_name"),
        dow.isin(1, 7).alias("is_weekend"),
        date_format_trino(d, "%Y-%m").alias("year_month"),
    )


# ---------------------------------------------------------------------------
# F4–F8: PII masking + surrogate keys + SPLIT_PART (dim_customers.sql:29-48).
# Emails are synthesized deterministically from c_name so the regex mask
# (capture-group REGEXP_REPLACE, F6) is exercised end-to-end.
# ---------------------------------------------------------------------------

_MASKING_ORACLE = """
SELECT
  md5(concat_ws('|', coalesce(CAST(c_custkey AS VARCHAR), 'UNKNOWN'),
                     coalesce(c_name, 'UNKNOWN'))) AS customer_key,
  md5(concat_ws('||', coalesce(c_name, 'UNKNOWN'),
                      coalesce(c_mktsegment, 'UNKNOWN'),
                      coalesce(CAST(c_acctbal AS VARCHAR), 'UNKNOWN'))) AS record_hash,
  c_custkey AS custkey,
  concat(substring(c_name, 1, 1), '***') AS masked_name,
  regexp_replace(concat(lower(replace(c_name, '#', '')), '@example.com'),
                 '(.{2}).+(@.+)', '\\1***\\2') AS masked_email,
  str_split(c_name, '#')[1] AS name_prefix,
  str_split(c_name, '#')[2] AS name_digits,
  c_mktsegment AS mktsegment
FROM customer
"""


@register("customer_pii_masked_keys", oracle=_MASKING_ORACLE, tags=("F4", "F5", "F6", "F7", "F8"))
def customer_pii_masked_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    email = F.concat(F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit(""))), F.lit("@example.com"))
    return c.select(
        surrogate_key("c_custkey", "c_name").alias("customer_key"),
        record_hash("c_name", "c_mktsegment", "c_acctbal").alias("record_hash"),
        F.col("c_custkey").alias("custkey"),
        mask_name("c_name").alias("masked_name"),
        mask_email(email).alias("masked_email"),
        split_part(F.col("c_name"), "#", 1).alias("name_prefix"),
        split_part(F.col("c_name"), "#", 2).alias("name_digits"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


# ---------------------------------------------------------------------------
# F11–F13: Trino 3-arg DATE_ADD/DATE_DIFF and DATE_TRUNC translations
# (silver_customers.sql:61-64 tenure; silver_calls.sql:34 lookback).
# ---------------------------------------------------------------------------

_DATEMATH_ORACLE = """
SELECT
  o_orderkey AS orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  strftime(CAST(o_orderdate AS DATE) + 3, '%Y-%m-%d') AS plus_3_days,
  strftime(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus_2_months,
  strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
  datediff('day',   CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
  CAST(floor(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') / 7) AS INTEGER) AS weeks_to_y2k,
  CAST(floor(datediff('month', CAST(o_orderdate AS DATE), DATE '2000-01-01')
        - CASE WHEN day(DATE '2000-01-01') < day(CAST(o_orderdate AS DATE)) THEN 1 ELSE 0 END)
       AS INTEGER) AS months_to_y2k
FROM orders
"""


@register("order_date_math", oracle=_DATEMATH_ORACLE, tags=("F11", "F12", "F13"))
def order_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    y2k = F.lit("2000-01-01").cast("date")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format(d, "yyyy-MM-dd").alias("orderdate"),
        F.date_format(F.date_add(d, 3), "yyyy-MM-dd").alias("plus_3_days"),
        F.date_format(F.add_months(d, -2), "yyyy-MM-dd").alias("minus_2_months"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        date_diff_unit("day", d, y2k).alias("days_to_y2k"),
        date_diff_unit("week", d, y2k).cast("int").alias("weeks_to_y2k"),
        date_diff_unit("month", d, y2k).cast("int").alias("months_to_y2k"),
    )


# ---------------------------------------------------------------------------
# F23: JSON decode of the events.props payload (kafka_to_bronze.py:123 does
# json.loads per record; here from_json with an explicit schema, JVM-side).
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_id,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) AS prop_k,
       (CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INTEGER) >= 50) AS k_above_median
FROM events
"""


@register("event_props_json_decode", oracle=_JSON_ORACLE, tags=("F23", "F21"))
def event_props_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "struct<k:int>").getField("k")
    return ev.select(
        "event_id",
        k.alias("prop_k"),
        (k >= 50).alias("k_above_median"),
    )


# ---------------------------------------------------------------------------
# F20: haversine distance as pure column math (fraud_detection.py:64-71),
# on deterministic synthetic tower coordinates derived from nation keys.
# ---------------------------------------------------------------------------

_HAVERSINE_ORACLE = """
WITH towers AS (
  SELECT n_nationkey,
         -60 + (n_nationkey * 7.0)  AS lat,
         -150 + (n_nationkey * 11.0) AS lon
  FROM nation
)
SELECT a.n_nationkey AS from_key, b.n_nationkey AS to_key,
       round(2 * 6371.0 * asin(sqrt(
          sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
          + cos(radians(a.lat)) * cos(radians(b.lat))
            * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
       )), 3) AS distance_km
FROM towers a JOIN towers b ON a.n_nationkey < b.n_nationkey
"""


@register("haversine_tower_distances", oracle=_HAVERSINE_ORACLE, tags=("F20",))
def haversine_tower_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geo import haversine_km

    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey",
        (F.lit(-60) + F.col("n_nationkey") * 7.0).alias("lat"),
        (F.lit(-150) + F.col("n_nationkey") * 11.0).alias("lon"),
    )
    a = n.alias("a")
    b = n.alias("b")
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_nationkey").alias("from_key"),
            F.col("b.n_nationkey").alias("to_key"),
            F.round(
                haversine_km(F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")), 3
            ).alias("distance_km"),
        )
    )


# ---------------------------------------------------------------------------
# Spatial proximity join (operators/spatial.py): latitude-band blocking +
# exact haversine verification — candidates only, never all pairs. Points
# derive deterministically from customer keys (the synthetic-coordinate
# precedent of the haversine query); the oracle computes ALL-pairs
# haversine, which is valid for the same reason the LSH oracles are:
# blocking is provably complete, so the two algorithms must agree exactly.
# ---------------------------------------------------------------------------

_PROXIMITY_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS id,
         -60 + (c_custkey % 1200) / 10.0 AS lat,
         -150 + ((c_custkey * 7) % 3000) / 10.0 AS lon
  FROM customer
), d AS (
  SELECT a.id AS id1, b.id AS id2,
         round(2 * 6371.0 * asin(sqrt(
            sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
            + cos(radians(a.lat)) * cos(radians(b.lat))
              * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
         )), 3) AS distance_km
  FROM pts a JOIN pts b ON a.id < b.id
)
SELECT id1, id2, distance_km FROM d WHERE distance_km <= 50.0
"""


@register("spatial_proximity_pairs", oracle=_PROXIMITY_ORACLE, tags=("F20", "J5"))
def spatial_proximity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import proximity_join_km

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (F.lit(-60) + (F.col("c_custkey") % 1200) / 10.0).alias("lat"),
        (F.lit(-150) + ((F.col("c_custkey") * 7) % 3000) / 10.0).alias("lon"),
    )
    return proximity_join_km(pts, radius_km=50.0)
