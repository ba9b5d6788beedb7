"""Data-quality and observability queries (SURVEY.md §5, §2.4 A6–A11).

Each reproduces a reference quality gate as an engine query: dbt generic
tests (unique / accepted_values / expression), GX-style profiles, and the
custom observability monitors (volume z-score, null rate, cardinality,
freshness). The same logic is exposed as reusable check functions in
``telecom_dataengineering_pipeline_spark/quality/checks.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# dbt `unique` test (models/silver/schema.yml): duplicated PKs → violations.
# ---------------------------------------------------------------------------

_UNIQUE_ORACLE = """
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, count(*) AS n
FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
"""


@register("dq_unique_violations", oracle=_UNIQUE_ORACLE, tags=("DQ", "A7"))
def dq_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.col("l_orderkey").alias("orderkey"), F.col("l_linenumber").alias("linenumber")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# dbt `accepted_values` + expression tests: violating rows (pass = empty).
# ---------------------------------------------------------------------------

_ACCEPTED_ORACLE = """
SELECT event_id, event_type AS offending_value, 'event_type not in accepted set' AS reason
FROM events
WHERE event_type NOT IN ('signup', 'click', 'purchase', 'error', 'view')
   OR event_type IS NULL
UNION ALL
SELECT event_id, CAST(value AS VARCHAR) AS offending_value, 'value out of range [0, 100000]' AS reason
FROM events WHERE value < 0 OR value > 100000
"""


def accepted_values_violations(ev: DataFrame) -> DataFrame:
    """The dbt ``accepted_values`` + range-expression violation stack —
    shared by the pass-state query (empty on clean data) and its
    violation-injected twin in ``round11.py`` (non-empty by
    construction, so the driver's green is not vacuous)."""
    bad_type = ev.filter(
        ~F.col("event_type").isin("signup", "click", "purchase", "error", "view")
        | F.col("event_type").isNull()
    ).select(
        "event_id",
        F.col("event_type").alias("offending_value"),
        F.lit("event_type not in accepted set").alias("reason"),
    )
    bad_range = ev.filter((F.col("value") < 0) | (F.col("value") > 100000)).select(
        "event_id",
        F.col("value").cast("string").alias("offending_value"),
        F.lit("value out of range [0, 100000]").alias("reason"),
    )
    return bad_type.unionByName(bad_range)


@register("dq_accepted_values_violations", oracle=_ACCEPTED_ORACLE, tags=("DQ", "U1"))
def dq_accepted_values_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return accepted_values_violations(ev)


# ---------------------------------------------------------------------------
# A10: null-rate profile per column (pipeline_observability.py:150-173) —
# one row per profiled column, distributed aggregation only.
# ---------------------------------------------------------------------------

_NULLRATE_ORACLE = """
SELECT 'o_custkey' AS column_name, count(*) AS total_rows,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS null_count,
       round(CAST(count(*) - count(o_custkey) AS DOUBLE) / count(*), 6) AS null_rate
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*), CAST(count(*) - count(o_totalprice) AS BIGINT),
       round(CAST(count(*) - count(o_totalprice) AS DOUBLE) / count(*), 6)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*), CAST(count(*) - count(o_orderstatus) AS BIGINT),
       round(CAST(count(*) - count(o_orderstatus) AS DOUBLE) / count(*), 6)
FROM orders
"""


@register("dq_null_rate_profile", oracle=_NULLRATE_ORACLE, tags=("DQ", "A10"))
def dq_null_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    total = F.count(F.lit(1))
    parts = []
    for c in ["o_custkey", "o_totalprice", "o_orderstatus"]:
        nulls = (total - F.count(c)).cast("long")
        parts.append(
            o.agg(
                F.lit(c).alias("column_name"),
                total.alias("total_rows"),
                nulls.alias("null_count"),
                F.round(nulls.cast("double") / total, 6).alias("null_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# A9: cardinality profile (distinct counts; pipeline_observability.py:175-205).
# Exact countDistinct here (oracle-checkable); approx_count_distinct is the
# documented 100 TB path in quality/monitors.py.
# ---------------------------------------------------------------------------

_CARDINALITY_ORACLE = """
SELECT 'user_id' AS column_name, CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_count FROM events
UNION ALL
SELECT 'event_type', CAST(count(DISTINCT event_type) AS BIGINT) FROM events
UNION ALL
SELECT 'event_date', CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) FROM events
"""


@register("dq_cardinality_profile", oracle=_CARDINALITY_ORACLE, tags=("DQ", "A9"))
def dq_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rows = [
        ev.agg(F.lit("user_id").alias("column_name"), F.countDistinct("user_id").alias("distinct_count")),
        ev.agg(F.lit("event_type").alias("column_name"), F.countDistinct("event_type").alias("distinct_count")),
        ev.agg(
            F.lit("event_date").alias("column_name"),
            F.countDistinct(F.col("ts").cast("date")).alias("distinct_count"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# A8: volume z-score monitor (pipeline_observability.py:99,118-124): daily
# counts vs mean/stddev. Stddev is computed with an explicit two-pass formula
# (identical expression both engines) rather than builtin stddev, so the
# floating-point result is bit-identical.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1
), stats AS (
  SELECT CAST(sum(n) AS DOUBLE) / count(*) AS mean_n,
         sqrt((CAST(sum(n * n) AS DOUBLE) - CAST(sum(n) AS DOUBLE) * sum(n) / count(*))
              / (count(*) - 1)) AS sd_n
  FROM daily
)
SELECT strftime(daily.d, '%Y-%m-%d') AS day,
       daily.n AS daily_rows,
       round(stats.mean_n, 4) AS mean_rows,
       round(stats.sd_n, 4) AS stddev_rows,
       round((daily.n - stats.mean_n) / stats.sd_n, 4) AS z_score,
       (abs((daily.n - stats.mean_n) / stats.sd_n) > 3.0) AS is_anomaly
FROM daily CROSS JOIN stats
"""


@register("dq_volume_zscore", oracle=_ZSCORE_ORACLE, tags=("DQ", "A8"))
def dq_volume_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(F.count(F.lit(1)).alias("n"))
    n = F.col("n")
    cnt = F.count(F.lit(1))
    stats = daily.agg(
        (F.sum(n).cast("double") / cnt).alias("mean_n"),
        F.sqrt(
            (F.sum(n * n).cast("double") - F.sum(n).cast("double") * F.sum(n) / cnt)
            / (cnt - 1)
        ).alias("sd_n"),
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd_n")
    return daily.crossJoin(F.broadcast(stats)).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").alias("daily_rows"),
        F.round("mean_n", 4).alias("mean_rows"),
        F.round("sd_n", 4).alias("stddev_rows"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 3.0).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Freshness monitor (pipeline_observability.py:52-87): per event_type, how
# stale is the newest record vs the table's global high-water mark.
# ---------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH per_type AS (
  SELECT event_type, max(epoch_us(ts)) AS max_us, count(*) AS n
  FROM events GROUP BY 1
), hwm AS (SELECT max(max_us) AS global_us FROM per_type)
SELECT p.event_type,
       strftime(make_timestamp(p.max_us), '%Y-%m-%d %H:%M:%S') AS latest_ts,
       CAST((h.global_us - p.max_us) // 1000000 AS BIGINT) AS lag_seconds,
       ((h.global_us - p.max_us) // 1000000 > 86400) AS sla_breached,
       p.n AS row_count
FROM per_type p CROSS JOIN hwm h
"""


@register("dq_freshness_check", oracle=_FRESHNESS_ORACLE, tags=("DQ",))
def dq_freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("max_us"), F.count(F.lit(1)).alias("n")
    )
    hwm = per_type.agg(F.max("max_us").alias("global_us"))
    lag_s = F.floor((F.col("global_us") - F.col("max_us")) / 1_000_000).cast("long")
    return per_type.crossJoin(F.broadcast(hwm)).select(
        "event_type",
        F.date_format(F.timestamp_micros(F.col("max_us")), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        lag_s.alias("lag_seconds"),
        (lag_s > 86400).alias("sla_breached"),
        F.col("n").alias("row_count"),
    )


# ---------------------------------------------------------------------------
# A3 (preserved quirk): "worst status" via rank-encode → MAX → decode
# (agg_tower_hourly_utilization.sql:70-77,106-111) + threshold-breach count.
# ---------------------------------------------------------------------------

_WORST_STATUS_ORACLE = """
WITH statused AS (
  SELECT user_id,
         CASE
           WHEN value >= 150 THEN 'CRITICAL'
           WHEN value >= 100 THEN 'WARNING'
           WHEN value >= 50  THEN 'ELEVATED'
           ELSE 'NORMAL'
         END AS value_status,
         (value > 185) AS breached
  FROM events
), encoded AS (
  SELECT user_id,
         max(CASE value_status
               WHEN 'CRITICAL' THEN 4 WHEN 'WARNING' THEN 3
               WHEN 'ELEVATED' THEN 2 ELSE 1 END) AS worst_rank,
         CAST(sum(CASE WHEN breached THEN 1 ELSE 0 END) AS BIGINT) AS breach_count,
         count(*) AS n
  FROM statused GROUP BY user_id
)
SELECT user_id,
       CASE worst_rank WHEN 4 THEN 'CRITICAL' WHEN 3 THEN 'WARNING'
            WHEN 2 THEN 'ELEVATED' ELSE 'NORMAL' END AS worst_status,
       breach_count, n
FROM encoded
"""


@register("worst_status_rollup", oracle=_WORST_STATUS_ORACLE, tags=("A3", "F2"))
def worst_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    status = (
        F.when(v >= 150, "CRITICAL")
        .when(v >= 100, "WARNING")
        .when(v >= 50, "ELEVATED")
        .otherwise("NORMAL")
    )
    rank = (
        F.when(status == "CRITICAL", 4)
        .when(status == "WARNING", 3)
        .when(status == "ELEVATED", 2)
        .otherwise(1)
    )
    encoded = ev.groupBy("user_id").agg(
        F.max(rank).alias("worst_rank"),
        F.sum(F.when(v > 185, 1).otherwise(0)).cast("long").alias("breach_count"),
        F.count(F.lit(1)).alias("n"),
    )
    decode = (
        F.when(F.col("worst_rank") == 4, "CRITICAL")
        .when(F.col("worst_rank") == 3, "WARNING")
        .when(F.col("worst_rank") == 2, "ELEVATED")
        .otherwise("NORMAL")
    )
    return encoded.select("user_id", decode.alias("worst_status"), "breach_count", "n")


# ---------------------------------------------------------------------------
# Cross-table reconciliation: o_totalprice vs the lineitem-derived total —
# the classic finance DQ gate (header amount == sum of lines). Reports the
# top-20 relative deviations plus orders with no lines at all. All money
# math in DECIMAL so the ranking is deterministic across engines.
# ---------------------------------------------------------------------------

_RECON_ORACLE = """
WITH s AS (
  SELECT l_orderkey,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - l_discount AS DECIMAL(8,4))
             * CAST(1 + l_tax AS DECIMAL(8,4))) AS net
  FROM lineitem GROUP BY 1
), d AS (
  SELECT o.o_orderkey AS orderkey,
         CAST(o.o_totalprice AS DOUBLE) AS header_total,
         CAST(s.net AS DOUBLE) AS lines_total,
         s.l_orderkey IS NULL AS no_lines,
         CASE WHEN s.l_orderkey IS NULL THEN 1e9
              ELSE round(CAST(abs(CAST(o.o_totalprice AS DECIMAL(14,4)) - s.net)
                              / CAST(o.o_totalprice AS DECIMAL(14,4)) AS DOUBLE), 6)
         END AS rel_dev
  FROM orders o LEFT JOIN s ON s.l_orderkey = o.o_orderkey
)
SELECT orderkey, header_total, lines_total, no_lines, rel_dev
FROM d ORDER BY rel_dev DESC, orderkey ASC LIMIT 20
"""


@register("dq_totalprice_reconciliation", oracle=_RECON_ORACLE, tags=("DQ", "A5"))
def dq_totalprice_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.decimals import dec

    li = load_table(spark, sf_dir, "lineitem")
    net = (
        dec("l_extendedprice", 12, 2)
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
        * (F.lit(1) + F.col("l_tax")).cast("decimal(8,4)")
    )
    s = li.groupBy("l_orderkey").agg(F.sum(net).alias("net"))
    o = load_table(spark, sf_dir, "orders")
    tot_dec = F.col("o_totalprice").cast("decimal(14,4)")
    rel = F.when(F.col("l_orderkey").isNull(), F.lit(1e9)).otherwise(
        F.round((F.abs(tot_dec - F.col("net")) / tot_dec).cast("double"), 6)
    )
    return (
        o.join(s, o["o_orderkey"] == s["l_orderkey"], "left")
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").cast("double").alias("header_total"),
            F.col("net").cast("double").alias("lines_total"),
            F.col("l_orderkey").isNull().alias("no_lines"),
            rel.alias("rel_dev"),
        )
        .orderBy(F.col("rel_dev").desc(), F.col("orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grouped distribution profile (A11 per group): exact quartiles of `value`
# per event type — percentile_approx's exact twin, checked against
# quantile_cont per group.
# ---------------------------------------------------------------------------

_GROUPED_DIST_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events WHERE value IS NOT NULL
GROUP BY 1
"""


@register("value_distribution_by_type", oracle=_GROUPED_DIST_ORACLE, tags=("A11", "DQ"))
def value_distribution_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


# ---------------------------------------------------------------------------
# A11 at scale: mergeable histogram quantile sketch (quality/quantile_sketch)
# — exact percentile() needs the full per-group value multiset; the sketch
# is one map-side-combined pass over fixed [0, 500)×100 buckets, mergeable
# across shards, with deterministic interpolation both engines reproduce
# bit-exactly.
# ---------------------------------------------------------------------------

_QSKETCH_ORACLE = """
WITH h AS (
  SELECT event_type,
         CAST(least(greatest(CAST(floor((value - 0.0) / 5.0) AS BIGINT), 0), 99) AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT event_type, bucket, n,
         sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type) AS total
  FROM h
), p AS (SELECT unnest([0.5, 0.9, 0.99]) AS prob)
SELECT event_type, p.prob,
       round(0.0 + 5.0 * (bucket + (p.prob * total - (cum - n)) / n), 6) AS quantile_est
FROM c CROSS JOIN p
WHERE (cum - n) < p.prob * total AND p.prob * total <= cum
"""


@register("value_quantile_sketch", oracle=_QSKETCH_ORACLE, tags=("A11", "DQ", "sketch"), bench=True)
def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.quantile_sketch import histogram_sketch, quantile_estimates

    ev = load_table(spark, sf_dir, "events")
    sk = histogram_sketch(
        ev, "value", lo=0.0, hi=500.0, n_buckets=100, group_cols=["event_type"]
    )
    return quantile_estimates(
        sk, [0.5, 0.9, 0.99], lo=0.0, hi=500.0, n_buckets=100, group_cols=["event_type"]
    )


# ---------------------------------------------------------------------------
# Pearson correlation from exact decimal sums: corr() in both engines sums
# doubles in partition order (never reproducible bit-exact); deriving it
# from DECIMAL Σx, Σy, Σxy, Σx², Σy², n — exact, order-independent — and
# applying the SAME double formula at the end makes the statistic itself
# value-comparable. The shape that scales: one map-side-combined aggregate,
# five running sums per group.
# ---------------------------------------------------------------------------

_CORR_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
         sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
         sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
         sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       AS qty_price_corr
FROM s
"""


@register("qty_price_correlation", oracle=_CORR_ORACLE, tags=("A8", "DQ"))
def qty_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select("l_returnflag", "n", F.round(corr, 6).alias("qty_price_corr"))


# ---------------------------------------------------------------------------
# A9 at scale, oracle-checkable form: engine-neutral HyperLogLog.
# approx_count_distinct is HLL with engine-internal registers; this
# construction (llmprep/sketches.py) hashes with the md5 family so DuckDB
# rebuilds the EXACT register table, and integer-scaled harmonic sums make
# the estimate bit-identical — an approximate algorithm behind an exact
# correctness gate, like the quantile sketch.
# ---------------------------------------------------------------------------


def _hll_oracle() -> str:
    from ..llmprep.sketches import hll_const

    c = repr(hll_const(5))
    est = f"CASE WHEN ({c} / (z + (32 - cnt) * 268435456)) <= 80.0 AND (32 - cnt) > 0 THEN 32.0 * ln(32.0 / (32 - cnt)) ELSE {c} / (z + (32 - cnt) * 268435456) END"
    return f"""
WITH h AS (
  SELECT event_type,
         ('0x'||substr(md5('hll_' || CAST(event_id AS VARCHAR)),1,8))::BIGINT AS h
  FROM events
), reg AS (
  SELECT event_type, CAST(h % 32 AS INTEGER) AS bucket,
         MAX(CASE WHEN h // 32 > 0 THEN 28 - length(bin(h // 32)) ELSE 28 END) AS M
  FROM h GROUP BY 1, 2
), g AS (
  SELECT event_type,
         CAST(sum(1::BIGINT << (28 - M)) AS BIGINT) AS z,
         CAST(count(*) AS BIGINT) AS cnt
  FROM reg GROUP BY 1
), ex AS (
  SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
)
SELECT g.event_type, ex.n_exact,
       round({est}, 4) AS hll_estimate,
       round(abs(round({est}, 4) - ex.n_exact) / ex.n_exact, 4) AS rel_error
FROM g JOIN ex ON g.event_type = ex.event_type
"""


@register("cardinality_hll_profile", oracle=_hll_oracle(), tags=("A9", "DQ", "sketch"))
def cardinality_hll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.sketches import hll_estimate_expr, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "event_id", group_cols=["event_type"])
    z_agg, cnt_agg, est = hll_estimate_expr()
    g = regs.groupBy("event_type").agg(z_agg.alias("z"), cnt_agg.alias("cnt"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("event_id").cast("long").alias("n_exact")
    )
    out = g.join(exact, "event_type").withColumn(
        "hll_estimate", est(F.col("z"), F.col("cnt"))
    )
    return out.select(
        "event_type",
        "n_exact",
        "hll_estimate",
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Winsorization: clip each group's values at the sketch's p05/p95 before
# computing stats — the standard outlier-robust normalization for training
# signals, composed FROM the quantile sketch (one extra broadcast of
# groups×2 bounds; the clip is a pure column expression). Decimal-summed
# means keep the result engine-exact.
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = f"""
WITH q AS ({_QSKETCH_ORACLE.replace("[0.5, 0.9, 0.99]", "[0.05, 0.95]")}),
bounds AS (
  SELECT event_type,
         max(CASE WHEN prob = 0.05 THEN quantile_est END) AS lo,
         max(CASE WHEN prob = 0.95 THEN quantile_est END) AS hi
  FROM q GROUP BY 1
), clipped AS (
  SELECT e.event_type,
         least(greatest(e.value, b.lo), b.hi) AS cv,
         CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS clip_hi
  FROM events e JOIN bounds b ON e.event_type = b.event_type
  WHERE e.value IS NOT NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(clip_lo) AS BIGINT) AS n_clipped_lo,
       CAST(sum(clip_hi) AS BIGINT) AS n_clipped_hi,
       round(CAST(sum(CAST(round(cv, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS winsorized_mean
FROM clipped GROUP BY 1
"""


@register("winsorized_value_stats", oracle=_WINSOR_ORACLE, tags=("A11", "DQ", "sketch"))
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.quantile_sketch import histogram_sketch, quantile_estimates

    ev = load_table(spark, sf_dir, "events")
    sk = histogram_sketch(ev, "value", 0.0, 500.0, 100, ["event_type"])
    qs = quantile_estimates(sk, [0.05, 0.95], 0.0, 500.0, 100, ["event_type"])
    bounds = qs.groupBy("event_type").agg(
        F.max(F.when(F.col("prob") == 0.05, F.col("quantile_est"))).alias("lo"),
        F.max(F.when(F.col("prob") == 0.95, F.col("quantile_est"))).alias("hi"),
    )
    clipped = (
        ev.filter(F.col("value").isNotNull())
        .join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("cv"),
            (F.col("value") < F.col("lo")).cast("int").alias("clip_lo"),
            (F.col("value") > F.col("hi")).cast("int").alias("clip_hi"),
        )
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("clip_lo").cast("long").alias("n_clipped_lo"),
        F.sum("clip_hi").cast("long").alias("n_clipped_hi"),
        F.round(
            F.sum(F.round(F.col("cv"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnostics (quality/monitors.py): the pre-flight report
# that decides plain vs salted vs AQE-skew-split plans.
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), total AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts),
top AS (
  SELECT user_id, n, CAST(row_number() OVER (ORDER BY n DESC, user_id ASC) AS INTEGER) AS rank
  FROM counts ORDER BY n DESC, user_id ASC LIMIT 10
)
SELECT rank, CAST(user_id AS VARCHAR) AS key, n,
       round(CAST(n AS DOUBLE) / t, 6) AS share,
       round(CAST(sum(n) OVER (ORDER BY rank) AS DOUBLE) / t, 6) AS cum_share
FROM top CROSS JOIN total
"""


@register("events_key_skew_profile", oracle=_SKEW_ORACLE, tags=("A12", "DQ"))
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import key_skew_profile

    return key_skew_profile(load_table(spark, sf_dir, "events"), "user_id", top_k=10)


# ---------------------------------------------------------------------------
# Referential-integrity audit across the whole schema in one battery: per
# FK relationship, child rows and orphan count via left-anti probes (J6 at
# schema scope — the dbt relationships test generalized).
# ---------------------------------------------------------------------------

_FK_AUDIT_ORACLE = """
SELECT 'lineitem.l_orderkey -> orders' AS relationship,
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT count(*) FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey) AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders.o_custkey -> customer',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders r ANTI JOIN customer c ON r.o_custkey = c.c_custkey) AS BIGINT)
UNION ALL
SELECT 'customer.c_nationkey -> nation',
       CAST((SELECT count(*) FROM customer) AS BIGINT),
       CAST((SELECT count(*) FROM customer c ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey) AS BIGINT)
UNION ALL
SELECT 'supplier.s_nationkey -> nation',
       CAST((SELECT count(*) FROM supplier) AS BIGINT),
       CAST((SELECT count(*) FROM supplier s ANTI JOIN nation n ON s.s_nationkey = n.n_nationkey) AS BIGINT)
UNION ALL
SELECT 'nation.n_regionkey -> region',
       CAST((SELECT count(*) FROM nation) AS BIGINT),
       CAST((SELECT count(*) FROM nation n ANTI JOIN region r ON n.n_regionkey = r.r_regionkey) AS BIGINT)
"""


@register("fk_integrity_audit", oracle=_FK_AUDIT_ORACLE, tags=("J6", "DQ"))
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema relationships audit: each FK probes its parent with a
    left-anti join (parent keys broadcast when dim-sized). Scale shape:
    the child sides stream once each; nothing materializes beyond five
    (relationship, count, count) rows."""
    from ..operators.joins import anti_join_violations

    pairs = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for child, fk, parent, pk in pairs:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent)
        row = (
            c.agg(F.count(F.lit(1)).cast("long").alias("n_child"))
            .crossJoin(
                anti_join_violations(c, p, {fk: pk})
                .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            )
            .select(
                F.lit(f"{child}.{fk} -> {parent}").alias("relationship"),
                "n_child",
                "n_orphans",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Recency-weighted volume anomaly (operators/trend.py): the reference's
# flat 7-day-average anomaly test (A6) upgraded to a weighted out-of-sample
# baseline — entirely exact DECIMAL arithmetic, so the flags (not just the
# numbers) are engine-identical.
# ---------------------------------------------------------------------------

_WMA_ORACLE = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
), w AS (
  SELECT day, rev,
         CAST('0.4' AS DECIMAL(4,3)) * lag(rev, 1) OVER win
       + CAST('0.3' AS DECIMAL(4,3)) * lag(rev, 2) OVER win
       + CAST('0.2' AS DECIMAL(4,3)) * lag(rev, 3) OVER win
       + CAST('0.1' AS DECIMAL(4,3)) * lag(rev, 4) OVER win AS wma
  FROM daily
  WINDOW win AS (ORDER BY day)
)
SELECT day,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(wma AS DOUBLE) AS wma,
       CASE WHEN wma IS NOT NULL THEN rev < CAST('0.5' AS DECIMAL(4,2)) * wma END AS is_drop,
       CASE WHEN wma IS NOT NULL THEN rev > CAST('2.0' AS DECIMAL(4,2)) * wma END AS is_spike
FROM w
"""


@register("daily_revenue_wma_anomaly", oracle=_WMA_ORACLE, tags=("A6", "A8", "DQ"))
def daily_revenue_wma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import band_anomaly_flags, weighted_moving_avg

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"))
    )
    flagged = band_anomaly_flags(
        weighted_moving_avg(
            daily, order_col="day", value_col="rev",
            weights=("0.4", "0.3", "0.2", "0.1"),
        ),
        value_col="rev",
    )
    return flagged.select(
        "day",
        F.col("rev").cast("double").alias("revenue"),
        F.col("wma").cast("double").alias("wma"),
        "is_drop",
        "is_spike",
    )


# ---------------------------------------------------------------------------
# PSI drift (quality/monitors.py::psi_drift) through the value gate: the
# standard model/feature drift score between two windows of events.value.
# The windows here are a deterministic synthetic A/B split (event_id
# parity) so the query is reproducible at any SF; production callers pass
# two time windows. Equal-width buckets come from ONE broadcast 2-value
# aggregate of the reference; the PSI sum runs round-then-decimal (9 dp)
# so the double log terms accumulate order-independently in both engines.
# ---------------------------------------------------------------------------

_PSI_ORACLE = """
WITH ref AS (SELECT value AS v FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
cur AS (SELECT value AS v FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
b AS (SELECT CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi FROM ref),
rbuck AS (
  SELECT CASE WHEN v < lo THEN -1 WHEN v > hi THEN 10
              ELSE least(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INTEGER), 9) END AS bucket,
         CAST(count(*) AS BIGINT) AS n_ref
  FROM ref CROSS JOIN b GROUP BY 1
),
cbuck AS (
  SELECT CASE WHEN v < lo THEN -1 WHEN v > hi THEN 10
              ELSE least(CAST(floor((v - lo) / ((hi - lo) / 10)) AS INTEGER), 9) END AS bucket,
         CAST(count(*) AS BIGINT) AS n_cur
  FROM cur CROSS JOIN b GROUP BY 1
),
cells AS (
  SELECT coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
  FROM rbuck r FULL OUTER JOIN cbuck c ON r.bucket = c.bucket
),
t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref, CAST(sum(n_cur) AS BIGINT) AS t_cur FROM cells),
terms AS (
  SELECT CAST(round((q - p) * ln(q / p), 9) AS DECIMAL(28,9)) AS term, t_ref, t_cur
  FROM (
    SELECT greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6) AS p,
           greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6) AS q,
           t_ref, t_cur
    FROM cells CROSS JOIN t
  )
),
agg AS (
  SELECT round(CAST(sum(term) AS DOUBLE), 6) AS psi,
         CAST(max(t_ref) AS BIGINT) AS n_ref,
         CAST(max(t_cur) AS BIGINT) AS n_cur
  FROM terms
)
SELECT psi, n_ref, n_cur,
       CASE WHEN psi IS NULL OR coalesce(n_ref, 0) = 0 OR coalesce(n_cur, 0) = 0
                 THEN 'no_reference'
            WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'moderate_shift'
            ELSE 'major_shift' END AS status
FROM agg
"""


@register("psi_value_drift", oracle=_PSI_ORACLE, tags=("DQ", "A11", "drift"))
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import psi_drift

    ev = load_table(spark, sf_dir, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return psi_drift(ref, cur, "value", n_buckets=10)


# ---------------------------------------------------------------------------
# HLL set algebra (llmprep/sketches.py::hll_set_ops): |A|, |B|, |A∪B| by
# bucketwise register MAX (exact sketch algebra — why shards compose),
# |A∩B| / Jaccard by inclusion-exclusion. Same engine-neutral register
# recipe as cardinality_hll_profile, so the whole thing is oracle-exact.
# ---------------------------------------------------------------------------


def _hll_setops_oracle() -> str:
    from ..llmprep.sketches import hll_const

    c = repr(hll_const(5))
    est = (
        f"CASE WHEN ({c} / (z + (32 - cnt) * 268435456)) <= 80.0 AND (32 - cnt) > 0 "
        f"THEN round(32.0 * ln(32.0 / (32 - cnt)), 4) "
        f"ELSE round({c} / (z + (32 - cnt) * 268435456), 4) END"
    )
    side = (
        "SELECT CAST(h % 32 AS INTEGER) AS bucket, "
        "MAX(CASE WHEN h // 32 > 0 THEN 28 - length(bin(h // 32)) ELSE 28 END) AS M "
        "FROM (SELECT ('0x'||substr(md5('hll_' || CAST(user_id AS VARCHAR)),1,8))::BIGINT AS h "
        "      FROM events WHERE event_type = '{et}' AND user_id IS NOT NULL) GROUP BY 1"
    )
    return f"""
WITH ra AS ({side.format(et="click")}),
rb AS ({side.format(et="purchase")}),
merged AS (
  SELECT coalesce(ra.bucket, rb.bucket) AS bucket,
         greatest(coalesce(ra.M, 0), coalesce(rb.M, 0)) AS Mu,
         ra.M AS Ma, rb.M AS Mb
  FROM ra FULL OUTER JOIN rb ON ra.bucket = rb.bucket
),
ea AS (
  SELECT coalesce({est}, 0.0) AS est_a FROM (
    SELECT CAST(sum(1::BIGINT << (28 - Ma)) AS BIGINT) AS z,
           CAST(count(*) AS BIGINT) AS cnt
    FROM merged WHERE Ma IS NOT NULL)
),
eb AS (
  SELECT coalesce({est}, 0.0) AS est_b FROM (
    SELECT CAST(sum(1::BIGINT << (28 - Mb)) AS BIGINT) AS z,
           CAST(count(*) AS BIGINT) AS cnt
    FROM merged WHERE Mb IS NOT NULL)
),
eu AS (
  SELECT coalesce({est}, 0.0) AS est_union FROM (
    SELECT CAST(sum(1::BIGINT << (28 - Mu)) AS BIGINT) AS z,
           CAST(count(*) AS BIGINT) AS cnt
    FROM merged)
)
SELECT est_a, est_b, est_union,
       greatest(round(est_a + est_b - est_union, 4), 0.0) AS est_intersection,
       coalesce(round(greatest(round(est_a + est_b - est_union, 4), 0.0) / est_union, 6), 0.0) AS jaccard_est
FROM ea CROSS JOIN eb CROSS JOIN eu
"""


@register("hll_set_ops_users", oracle=_hll_setops_oracle(), tags=("A9", "DQ", "sketch"))
def hll_set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.sketches import hll_set_ops

    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click")
    buyers = ev.filter(F.col("event_type") == "purchase")
    return hll_set_ops(clickers, buyers, "user_id")
