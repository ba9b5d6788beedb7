"""Core relational queries — scans, filters, joins, aggregations, set ops.

Each query re-expresses a reference operator (SURVEY.md §2 ids in docstrings)
on the driver's TPC-H-ish tables. Column-name and numeric conventions per
``registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.decimals import dec, pct_of
from ..functions.keys import surrogate_key
from ..operators.dedup import dedup_keep_latest
from ..operators.joins import (
    anti_join_violations,
    broadcast_star_join,
    collapse_dim_snowflake,
    left_join_nonnull_filter,
)
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Flagship: hourly usage rollup (reference agg_tower_hourly_utilization —
# A1 multi-measure hash agg + A3 conditional agg + A5 derived ratios + J1
# broadcast dim join + P3 validity filter, recast onto events × customer).
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = """
SELECT
  strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:00:00') AS hour_ts,
  coalesce(c.c_mktsegment, 'UNKNOWN')                     AS mktsegment,
  count(*)                                                AS total_events,
  CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
  CAST(sum(CASE WHEN e.event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)     AS sum_value,
  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) / count(e.value) AS avg_value,
  max(e.value)                                            AS max_value,
  round(CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
        * 100 / count(*), 4)                              AS purchase_rate_pct
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_id IS NOT NULL AND e.value >= 0
GROUP BY 1, 2
"""


@register("hourly_usage_rollup", oracle=_HOURLY_ORACLE, tags=("A1", "A3", "A5", "J1", "P3"), bench=True)
def hourly_usage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & (F.col("value") >= 0)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = broadcast_star_join(
        ev, [(cust, ev["user_id"] == cust["c_custkey"], "left")]
    )
    purchases = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long")
    return (
        joined.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour_ts"),
            F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("mktsegment"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            purchases.alias("purchase_count"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("error_count"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
            (F.sum(dec("value")).cast("double") / F.count("value")).alias("avg_value"),
            F.max("value").alias("max_value"),
            F.round(purchases.cast("double") * 100 / F.count(F.lit(1)), 4).alias("purchase_rate_pct"),
        )
    )


# ---------------------------------------------------------------------------
# A2: multi-measure KPI rollup (TPC-H Q1 shape; reference's 12-measure
# AVG/MAX probe rollup agg_tower_hourly_utilization.sql:51-81).
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity      AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,4))
                                                       * CAST(1 + l_tax      AS DECIMAL(8,4))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity      AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount      AS DECIMAL(8,4)))  AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary_rollup", oracle=_Q1_ORACLE, tags=("A2", "P6"), bench=True)
def pricing_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = dec("l_quantity", 12, 2)
    price = dec("l_extendedprice", 12, 2)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    tax_f = (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc_f).cast("double").alias("sum_disc_price"),
            # narrow to scale 6 (exact: inputs are 2-decimal, product is 6dp)
            # before the double cast — a scale-10 unscaled value exceeds 2^53
            # and would round differently per engine.
            F.sum(price * disc_f * tax_f).cast("decimal(24,6)").cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 8, 4)).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1 + F8: star join fact→dims with broadcast + sentinel coalesce + surrogate
# key (reference fact_calls.sql:52,58-60,92-95).
# ---------------------------------------------------------------------------

_STAR_ORACLE = """
SELECT
  md5(concat_ws('|',
      coalesce(CAST(o.o_orderkey AS VARCHAR), 'UNKNOWN'),
      coalesce(CAST(o.o_custkey  AS VARCHAR), 'UNKNOWN'))) AS order_fact_key,
  o.o_orderkey   AS orderkey,
  o.o_totalprice AS totalprice,
  o.o_orderstatus AS orderstatus,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  coalesce(c.c_name, 'UNKNOWN')       AS customer_name,
  coalesce(c.c_mktsegment, 'UNKNOWN') AS mktsegment,
  coalesce(n.n_name, 'UNKNOWN')       AS nation_name,
  coalesce(r.r_name, 'UNKNOWN')       AS region_name
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
"""


@register("star_join_enriched_orders", oracle=_STAR_ORACLE, tags=("J1", "F8", "F3"), bench=True)
def star_join_enriched_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # Snowflake collapsed at dim cardinality: the chain joins run over ~c
    # rows, then every fact row probes ONE broadcast hash table instead of
    # three (same result — each chain key is unique on its right side).
    dim = collapse_dim_snowflake(
        c,
        [
            (n, c["c_nationkey"] == n["n_nationkey"], "left"),
            (r, n["n_regionkey"] == r["r_regionkey"], "left"),
        ],
        keep=["c_custkey", "c_name", "c_mktsegment", "n_name", "r_name"],
    )
    joined = broadcast_star_join(
        o, [(dim, o["o_custkey"] == dim["c_custkey"], "left")]
    )
    return joined.select(
        surrogate_key("o_orderkey", "o_custkey").alias("order_fact_key"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("orderstatus"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("customer_name"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("mktsegment"),
        F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
        F.coalesce("r_name", F.lit("UNKNOWN")).alias("region_name"),
    )


# ---------------------------------------------------------------------------
# J2 + A4: composite-key join of two aggregates (probe-hour × call-hour,
# agg_tower_hourly_utilization.sql:131-134) recast as user×month activity.
# J3: the left-join-then-NOT-NULL quirk (agg_customer_monthly_summary.sql:99-101).
# ---------------------------------------------------------------------------

_MONTHLY_ORACLE = """
WITH monthly AS (
  SELECT user_id,
         strftime(date_trunc('month', ts), '%Y-%m') AS year_month,
         count(*) AS event_count,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count
  FROM events GROUP BY 1, 2
)
SELECT c.c_custkey AS custkey, c.c_name AS customer_name, m.year_month,
       m.event_count, m.total_value, m.purchase_count,
       round(CAST(m.purchase_count AS DOUBLE) * 100 / m.event_count, 4) AS purchase_rate_pct
FROM customer c
LEFT JOIN monthly m ON c.c_custkey = m.user_id
WHERE m.year_month IS NOT NULL
"""


@register("customer_monthly_summary", oracle=_MONTHLY_ORACLE, tags=("A4", "A5", "J3"), bench=True)
def customer_monthly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    monthly = ev.groupBy(
        F.col("user_id"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("year_month"),
    ).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.sum(dec("value")).cast("double").alias("total_value"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("purchase_count"),
    )
    cust = load_table(spark, sf_dir, "customer")
    joined = left_join_nonnull_filter(
        cust.withColumnRenamed("c_custkey", "user_id"), monthly, ["user_id"], "year_month"
    )
    return joined.select(
        F.col("user_id").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        "year_month",
        "event_count",
        "total_value",
        "purchase_count",
        pct_of(F.col("purchase_count"), F.col("event_count")).alias("purchase_rate_pct"),
    )


# ---------------------------------------------------------------------------
# A6 + J4: daily row-count anomaly vs trailing-7-day baseline, single-row
# cross join (dbt test assert_row_count_anomaly.sql:4-33). Anchored on
# max(event date) instead of current_date for determinism.
# ---------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
), anchor AS (
  SELECT max(d) AS today FROM daily
), today_row AS (
  SELECT daily.n AS today_rows FROM daily, anchor WHERE daily.d = anchor.today
), baseline AS (
  SELECT CAST(sum(daily.n) AS DOUBLE) / count(*) AS avg_rows
  FROM daily, anchor
  WHERE daily.d < anchor.today AND daily.d >= anchor.today - INTERVAL 7 DAY
)
SELECT t.today_rows,
       round(b.avg_rows, 4) AS avg_daily_rows,
       round(CAST(t.today_rows AS DOUBLE) * 100 / b.avg_rows, 4) AS pct_of_avg,
       (t.today_rows < b.avg_rows * 0.5) AS is_anomaly
FROM today_row t CROSS JOIN baseline b
"""


@register("row_count_anomaly_check", oracle=_ANOMALY_ORACLE, tags=("A6", "J4", "F11"))
def row_count_anomaly_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(F.count(F.lit(1)).alias("n"))
    anchor = daily.agg(F.max("d").alias("today"))
    today_row = (
        daily.crossJoin(F.broadcast(anchor))
        .filter(F.col("d") == F.col("today"))
        .select(F.col("n").alias("today_rows"))
    )
    baseline = (
        daily.crossJoin(F.broadcast(anchor))
        .filter((F.col("d") < F.col("today")) & (F.col("d") >= F.date_sub(F.col("today"), 7)))
        .agg((F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_rows"))
    )
    return today_row.crossJoin(F.broadcast(baseline)).select(
        "today_rows",
        F.round(F.col("avg_rows"), 4).alias("avg_daily_rows"),
        F.round(F.col("today_rows").cast("double") * 100 / F.col("avg_rows"), 4).alias("pct_of_avg"),
        (F.col("today_rows") < F.col("avg_rows") * 0.5).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# J6: referential-integrity anti-join (dbt relationships test,
# models/gold/facts/schema.yml:18-35). Passing = 0 rows.
# ---------------------------------------------------------------------------

_ORPHAN_ORACLE = """
SELECT l.l_orderkey AS orderkey, l.l_linenumber AS linenumber
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
"""


@register("orphan_lineitems_check", oracle=_ORPHAN_ORACLE, tags=("J6",))
def orphan_lineitems_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return anti_join_violations(li, o, {"l_orderkey": "o_orderkey"}).select(
        F.col("l_orderkey").alias("orderkey"), F.col("l_linenumber").alias("linenumber")
    )


# ---------------------------------------------------------------------------
# U1: UNION ALL violation stack (assert_no_negative_revenue.sql:3-19) — here
# as over-threshold scans so the result is non-empty on clean data.
# ---------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT 'events' AS source_table, CAST(event_id AS VARCHAR) AS record_id,
       value AS amount, concat('value above threshold: ', CAST(value AS VARCHAR)) AS reason
FROM events WHERE value > 195
UNION ALL
SELECT 'orders' AS source_table, CAST(o_orderkey AS VARCHAR) AS record_id,
       o_totalprice AS amount, concat('totalprice above threshold: ', CAST(o_totalprice AS VARCHAR)) AS reason
FROM orders WHERE o_totalprice > 400000
"""


@register("threshold_violations_union", oracle=_UNION_ORACLE, tags=("U1", "F4"))
def threshold_violations_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 195).select(
        F.lit("events").alias("source_table"),
        F.col("event_id").cast("string").alias("record_id"),
        F.col("value").alias("amount"),
        F.concat(F.lit("value above threshold: "), F.col("value").cast("string")).alias("reason"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000).select(
        F.lit("orders").alias("source_table"),
        F.col("o_orderkey").cast("string").alias("record_id"),
        F.col("o_totalprice").alias("amount"),
        F.concat(F.lit("totalprice above threshold: "), F.col("o_totalprice").cast("string")).alias("reason"),
    )
    return ev.unionByName(o)


# ---------------------------------------------------------------------------
# W1: keep-latest dedup via row_number (silver_calls.sql:40-55). Events are
# unique per event_id, so the dedup key here is (user_id, event_type):
# "latest event of each type per user" — same operator shape.
# Ordering uses epoch-microseconds + event_id tie-break on both engines.
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, value,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_second
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type
      ORDER BY epoch_us(ts) DESC, event_id DESC) AS _rn
  FROM events
) WHERE _rn = 1
"""


@register("latest_event_per_user_type", oracle=_DEDUP_ORACLE, tags=("W1",), bench=True)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = dedup_keep_latest(
        ev,
        keys=["user_id", "event_type"],
        order_by=[F.unix_micros(F.col("ts")).desc(), F.col("event_id").desc()],
    )
    return latest.select(
        "user_id",
        "event_type",
        "event_id",
        "value",
        F.date_format(F.date_trunc("second", "ts"), "yyyy-MM-dd HH:mm:ss").alias("ts_second"),
    )


# ---------------------------------------------------------------------------
# O1/O6: global sort + top-k with deterministic tie-break.
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


@register("top_orders_by_price", oracle=_TOPK_ORACLE, tags=("O1", "O6"))
def top_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# P1/P2/P5 + F2: projection, renames, derived boolean flags, CASE decode
# (silver_calls.sql:60-114 status decode; silver_network_probes.sql:65-76).
# ---------------------------------------------------------------------------

_FLAGS_ORACLE = """
SELECT
  event_id,
  user_id AS customer_ref,
  event_type,
  value   AS amount,
  (event_type = 'purchase')               AS is_purchase,
  (event_type = 'error')                  AS is_error,
  (value = 0)                             AS is_zero_amount,
  CASE event_type
    WHEN 'purchase' THEN 'REVENUE'
    WHEN 'signup'   THEN 'ACQUISITION'
    WHEN 'error'    THEN 'FAILURE'
    WHEN 'click'    THEN 'ENGAGEMENT'
    WHEN 'view'     THEN 'ENGAGEMENT'
    ELSE concat('UNKNOWN_', event_type)
  END AS event_class,
  CASE
    WHEN value >= 150 THEN 'CRITICAL'
    WHEN value >= 100 THEN 'WARNING'
    WHEN value >= 50  THEN 'ELEVATED'
    ELSE 'NORMAL'
  END AS value_status
FROM events
"""


@register("event_flags_projection", oracle=_FLAGS_ORACLE, tags=("P1", "P2", "P5", "F2"))
def event_flags_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    et = F.col("event_type")
    return ev.select(
        "event_id",
        F.col("user_id").alias("customer_ref"),
        "event_type",
        v.alias("amount"),
        (et == "purchase").alias("is_purchase"),
        (et == "error").alias("is_error"),
        (v == 0).alias("is_zero_amount"),
        F.when(et == "purchase", "REVENUE")
        .when(et == "signup", "ACQUISITION")
        .when(et == "error", "FAILURE")
        .when(et == "click", "ENGAGEMENT")
        .when(et == "view", "ENGAGEMENT")
        .otherwise(F.concat(F.lit("UNKNOWN_"), et))
        .alias("event_class"),
        F.when(v >= 150, "CRITICAL")
        .when(v >= 100, "WARNING")
        .when(v >= 50, "ELEVATED")
        .otherwise("NORMAL")
        .alias("value_status"),
    )


# ---------------------------------------------------------------------------
# P4: incremental-lookback predicate (3-day window, silver_calls.sql:31-37),
# anchored on max(ts) for determinism; P7-style slice included.
# ---------------------------------------------------------------------------

_LOOKBACK_ORACLE = """
WITH anchor AS (SELECT CAST(max(ts) AS DATE) AS today FROM events)
SELECT e.event_id, e.user_id, e.event_type, e.value,
       strftime(e.ts, '%Y-%m-%d') AS event_date
FROM events e, anchor a
WHERE CAST(e.ts AS DATE) >= a.today - 3
"""


@register("incremental_lookback_slice", oracle=_LOOKBACK_ORACLE, tags=("P4", "P6"))
def incremental_lookback_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("today"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts").cast("date") >= F.date_sub(F.col("today"), 3))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: multi-way join (customer⋈orders⋈lineitem⋈nation⋈region)
# with a region + date-window filter and revenue rollup per nation — the
# biggest shuffle-join shape in the engine (lineitem⋈orders is the only
# shuffled join; every dimension broadcasts).
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n.n_name AS nation,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("revenue_by_nation", oracle=_Q5_ORACLE, tags=("J1", "A1", "tpch"), bench=True)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = dec("l_extendedprice", 12, 2)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.sum(price * disc_f).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping priority — top unshipped orders by revenue for
# one market segment (filter → shuffled join → agg → deterministic top-k).
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l.l_orderkey AS orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       strftime(min(o.o_orderdate), '%Y-%m-%d') AS orderdate,
       min(o.o_orderpriority) AS orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


@register("shipping_priority_topk", oracle=_Q3_ORACLE, tags=("J1", "A1", "O6", "tpch"), bench=True)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    price = dec("l_extendedprice", 12, 2)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        joined.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.sum(price * disc_f).cast("double").alias("revenue"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
            F.min("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery — lineitems below 20% of their
# part's average quantity. Spark expresses the decorrelated plan directly:
# broadcast the filtered part dim, then a per-part window average (one
# shuffle on l_partkey) instead of a second lineitem scan + self-join.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@register("small_quantity_revenue", oracle=_Q17_ORACLE, tags=("J1", "A1", "tpch"))
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    # Correlated avg decorrelates to a window over the part key: the brand
    # filter restricts to those partkeys, so the window average equals the
    # full-table per-part average the subquery describes.
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("qty_lim", F.lit(0.2) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            (F.sum(dec("l_extendedprice", 12, 2)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top supplier(s) — revenue per supplier over a shipping
# window, keep the rows equal to the global max (correlated max subquery ≡
# an unpartitioned window max over the aggregated, already-tiny result).
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH rev AS (
  SELECT l.l_suppkey AS suppkey,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS total_revenue
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name, r.total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@register("top_supplier_by_revenue", oracle=_Q15_ORACLE, tags=("J1", "A1", "tpch"))
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    price = dec("l_extendedprice", 12, 2)
    disc_f = (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(price * disc_f).cast("double").alias("total_revenue")
    )
    # The correlated max runs over the per-supplier aggregate (|suppliers|
    # rows) — an unpartitioned window here is a single-partition pass over
    # an already-reduced input, not over lineitem.
    w = Window.partitionBy()
    top = (
        rev.withColumn("_mx", F.max("total_revenue").over(w))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .drop("_mx")
    )
    s = load_table(spark, sf_dir, "supplier")
    return top.join(F.broadcast(s), top["suppkey"] == s["s_suppkey"]).select(
        "suppkey", F.col("s_name").alias("supplier_name"), "total_revenue"
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-quantity customers — group filter (HAVING) on a
# big aggregation, then enrich the few survivors via broadcast joins.
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
SELECT c.c_name AS customer_name, c.c_custkey AS custkey,
       o.o_orderkey AS orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("large_quantity_customers", oracle=_Q18_ORACLE, tags=("J1", "A1", "tpch"))
def large_quantity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_name").alias("customer_name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# EXISTS / left-semi join: customers with at least one open order above a
# price floor. LeftSemi is its own physical operator — probe side emits each
# row at most once, no fan-out, no columns from the build side.
# ---------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c.c_custkey AS custkey, c.c_name AS customer_name, c.c_mktsegment AS mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O' AND o.o_totalprice > 200000
)
"""


@register("customers_with_open_orders", oracle=_SEMI_ORACLE, tags=("J1", "semi"))
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 200000)
    )
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )


# ---------------------------------------------------------------------------
# INTERSECT: users active in both the first and last week of the event
# window — Spark's Intersect rewrites to a distinct + semi-join pair; the
# date filters prune at the scan.
# ---------------------------------------------------------------------------

_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'
INTERSECT
SELECT user_id FROM events WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-24' AND DATE '2024-01-30'
"""


@register("users_active_both_periods", oracle=_INTERSECT_ORACLE, tags=("U1", "setop"))
def users_active_both_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    first = ev.filter(d.between("2024-01-01", "2024-01-07")).select("user_id")
    last = ev.filter(d.between("2024-01-24", "2024-01-30")).select("user_id")
    return first.intersect(last)


# ---------------------------------------------------------------------------
# The flagship rollup through the two-phase SALTED aggregation path,
# value-checked against the SAME oracle as the direct form: proof that the
# skew-mitigation machinery is semantics-preserving, not just plausible.
# Every aggregate decomposes into (phase-1 partial over rows, phase-2
# combine over partials); derived ratios are computed after the combine.
# ---------------------------------------------------------------------------


@register("hourly_usage_rollup_salted", oracle=_HOURLY_ORACLE, tags=("A1", "skew"))
def hourly_usage_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & (F.col("value") >= 0)
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = broadcast_star_join(
        ev, [(cust, ev["user_id"] == cust["c_custkey"], "left")]
    ).select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour_ts"),
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("mktsegment"),
        "event_type",
        "value",
    )
    agg = salted_agg(
        joined,
        ["hour_ts", "mktsegment"],
        {
            "total_events": (F.count(F.lit(1)), F.sum("total_events")),
            "purchase_count": (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
                F.sum("purchase_count"),
            ),
            "error_count": (
                F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)),
                F.sum("error_count"),
            ),
            "_sum_dec": (F.sum(dec("value")), F.sum("_sum_dec")),
            "_n_value": (F.count("value"), F.sum("_n_value")),
            "max_value": (F.max("value"), F.max("max_value")),
        },
        salt_buckets=16,
    )
    return agg.select(
        "hour_ts",
        "mktsegment",
        F.col("total_events").cast("long").alias("total_events"),
        F.col("purchase_count").cast("long").alias("purchase_count"),
        F.col("error_count").cast("long").alias("error_count"),
        F.col("_sum_dec").cast("double").alias("sum_value"),
        (F.col("_sum_dec").cast("double") / F.col("_n_value")).alias("avg_value"),
        "max_value",
        F.round(F.col("purchase_count").cast("double") * 100 / F.col("total_events"), 4).alias(
            "purchase_rate_pct"
        ),
    )


# ---------------------------------------------------------------------------
# Top-k per group (k>1): highest-value orders per market segment. Exercises
# the WindowGroupLimit pushdown at k=3 — each input partition pre-prunes to
# 3 candidates per segment BEFORE the shuffle, the same reason keep-latest
# dedup (k=1) scales.
# ---------------------------------------------------------------------------

_TOPK_GROUP_ORACLE = """
SELECT * FROM (
  SELECT c.c_mktsegment AS mktsegment, o.o_orderkey AS orderkey,
         CAST(o.o_totalprice AS DOUBLE) AS totalprice,
         CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                                 ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS INTEGER) AS rnk
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
WHERE rnk <= 3
"""


@register("top_orders_per_segment", oracle=_TOPK_GROUP_ORACLE, tags=("W1", "O6"))
def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("mktsegment").orderBy(
        F.col("totalprice").desc(), F.col("orderkey").asc()
    )
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# EXCEPT: users active in the first week but silent in the last — churn's
# raw form, and the set-difference counterpart of the INTERSECT query.
# ---------------------------------------------------------------------------

_EXCEPT_ORACLE = """
SELECT user_id FROM events
WHERE event_type = 'purchase'
  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-07'
EXCEPT
SELECT user_id FROM events
WHERE event_type = 'purchase'
  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-24' AND DATE '2024-01-30'
"""


@register("lapsed_users", oracle=_EXCEPT_ORACLE, tags=("U1", "setop"))
def lapsed_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cohort = PURCHASERS (not merely active users): in this fixture every
    # week-1 user also has late-January activity, so the raw-activity split
    # was empty at every SF and EXCEPT DISTINCT was never value-exercised.
    # The purchase split is non-empty at sf0.001/0.01/0.1 (1/8/53 users)
    # AND diverges from exceptAll there (25/173/1414 rows), so the
    # subtract-vs-exceptAll distinction this query pins is finally live.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    d = F.to_date("ts")
    first = ev.filter(d.between("2024-01-01", "2024-01-07")).select("user_id")
    last = ev.filter(d.between("2024-01-24", "2024-01-30")).select("user_id")
    # subtract == EXCEPT DISTINCT; exceptAll would keep a user who merely
    # has more week-1 purchases than last-week purchases (multiset diff)
    return first.subtract(last)


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share — the 7-table star/snowflake join
# (lineitem ⋈ part ⋈ orders ⋈ customer ⋈ nation ⋈ region + supplier nation)
# with a conditional-share aggregate per year. Dims broadcast; the two fact
# tables join on their key; decimal-exact volume sums.
# ---------------------------------------------------------------------------

_MKTSHARE_ORACLE = """
WITH base AS (
  SELECT strftime(CAST(o.o_orderdate AS DATE), '%Y') AS o_year,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(8,4))) AS DECIMAL(24,6)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p       ON p.p_partkey = l.l_partkey
  JOIN orders o     ON o.o_orderkey = l.l_orderkey
  JOIN customer c   ON c.c_custkey = o.o_custkey
  JOIN nation cn    ON cn.n_nationkey = c.c_nationkey
  JOIN region r     ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s   ON s.s_suppkey = l.l_suppkey
  JOIN nation sn    ON sn.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'PROMO' AND r.r_name = 'AFRICA'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) AS nation_volume,
       CAST(sum(volume) AS DOUBLE) AS total_volume,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
"""


@register("national_market_share", oracle=_MKTSHARE_ORACLE, tags=("J1", "A3", "A5"))
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    s = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation")
    volume = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
    ).cast("decimal(24,6)")
    base = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["n_nationkey"])
        .join(F.broadcast(r), cn["n_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(sn.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(24,6)")
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("volume")).otherwise(zero))
    tot = F.sum("volume")
    return base.groupBy("o_year").agg(
        nat.cast("double").alias("nation_volume"),
        tot.cast("double").alias("total_volume"),
        F.round(nat.cast("double") / tot.cast("double"), 6).alias("mkt_share"),
    )
