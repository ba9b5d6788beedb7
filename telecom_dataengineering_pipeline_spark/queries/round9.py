"""Round-7 session-3 registrations: the last two session-2 operators
promoted from tests-only to oracle-checked driver queries (Mann–Kendall/
Theil–Sen trend test, categorical mutual information), plus the new
session-3 wave — drift (PSI), encoding (WOE/IV), ranking quality
(NDCG@k), survival (Kaplan–Meier), recommendations (item–item CF), and
seasonal smoothing (Holt–Winters).

Reference parity: extends the reference's monitoring/marts tier
(``monitoring/pipeline_observability.py``, ``dbt_project/models/marts``)
with the churn-survival / campaign-evaluation statistics a telecom BI
stack computes downstream, re-expressed as distributed plans under the
registry determinism conventions (decimal-exact sums, round-then-decimal
log/ratio terms, tie-broken windows, matching column names)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Mann–Kendall + Theil–Sen (operators/trend.py::mann_kendall_trend): is
# each nation's MONTHLY revenue monotonically drifting? Monthly grain
# (~80 points/nation) keeps the O(T²/2) pair join tiny per the series
# contract; whole-dollar decimal sums keep the pairwise slopes
# bit-identical cross-engine.
# ---------------------------------------------------------------------------

_MK_ORACLE = """
WITH base AS (
  SELECT n.n_name AS k,
         CAST((CAST(strftime(o.o_orderdate, '%Y') AS INT) - 1995) * 12
              + CAST(strftime(o.o_orderdate, '%m') AS INT) - 1 AS BIGINT) AS t,
         CAST(sum(CAST(round(o.o_totalprice, 0) AS DECIMAL(18,0))) AS DECIMAL(24,6)) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), pairs AS (
  SELECT a.k, a.t AS ti, b.t AS tj,
         CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn,
         CAST(b.v - a.v AS DOUBLE) / (b.t - a.t) AS slope
  FROM base a JOIN base b ON a.k = b.k AND a.t < b.t
), ranked AS (
  SELECT k, sgn, slope,
         CAST(row_number() OVER (PARTITION BY k ORDER BY slope ASC, ti ASC, tj ASC) AS BIGINT) AS rk,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS m
  FROM pairs
), sen AS (
  SELECT k, sum(slope) / count(*) AS sen_slope
  FROM ranked
  WHERE rk = CAST(floor((m + 1) / 2.0) AS BIGINT) OR rk = CAST(floor(m / 2.0 + 1) AS BIGINT)
  GROUP BY k
), sstat AS (
  SELECT k, CAST(sum(sgn) AS BIGINT) AS s_stat FROM ranked GROUP BY k
), ties AS (
  SELECT k, CAST(sum(tg) AS BIGINT) AS n,
         CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
  FROM (SELECT k, v, CAST(count(*) AS BIGINT) AS tg FROM base GROUP BY 1, 2)
  GROUP BY k
), d AS (
  SELECT t.k, t.n, coalesce(s.s_stat, 0) AS s_stat,
         CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term AS DOUBLE) / 18.0 AS var_s,
         sen.sen_slope
  FROM ties t LEFT JOIN sstat s ON s.k = t.k LEFT JOIN sen ON sen.k = t.k
)
SELECT k AS n_name, n, s_stat, round(var_s, 6) AS var_s,
  round(CASE WHEN var_s > 0 THEN
    CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
         WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) ELSE 0.0 END END, 6) AS z,
  CASE WHEN var_s <= 0 THEN NULL
       WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) ELSE 0.0 END) > 1.96
         THEN 'increasing'
       WHEN (CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) ELSE 0.0 END) < -1.96
         THEN 'decreasing'
       ELSE 'no_trend' END AS trend,
  round(sen_slope, 6) AS sen_slope
FROM d
"""


@register("mk_trend_nation_revenue", oracle=_MK_ORACLE, tags=("trend", "A11"))
def mk_trend_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import mann_kendall_trend

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            "n_name",
            (
                (F.year("o_orderdate") - F.lit(1995)) * 12
                + F.month("o_orderdate")
                - F.lit(1)
            )
            .cast("long")
            .alias("t"),
        )
        .agg(
            F.sum(F.round("o_totalprice", 0).cast("decimal(18,0)"))
            .cast("decimal(24,6)")
            .alias("v")
        )
    )
    return mann_kendall_trend(monthly, ["n_name"], "t", "v")


# ---------------------------------------------------------------------------
# Mutual information (quality/monitors.py::mutual_information): does
# order PRIORITY predict order STATUS? The feature-selection screen on
# the two categorical order columns; one-row output.
# ---------------------------------------------------------------------------

_MI_ORACLE = """
WITH cells AS (
  SELECT coalesce(o_orderpriority, '__null__') AS cx,
         coalesce(o_orderstatus, '__null__') AS cy,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
), t AS (
  SELECT cx, cy, n,
         CAST(sum(n) OVER (PARTITION BY cx) AS BIGINT) AS nx,
         CAST(sum(n) OVER (PARTITION BY cy) AS BIGINT) AS ny,
         CAST(sum(n) OVER () AS BIGINT) AS tot
  FROM cells
), mi AS (
  SELECT CAST(any_value(tot) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cells,
         round(CAST(sum(CAST(round((n / CAST(tot AS DOUBLE))
               * ln((CAST(n AS DOUBLE) * tot) / (CAST(nx AS DOUBLE) * ny)), 9)
               AS DECIMAL(28,9))) AS DOUBLE), 6) AS mi
  FROM t
), hx AS (
  SELECT round(CAST(sum(CAST(round(-(m / CAST(tt AS DOUBLE))
               * ln(m / CAST(tt AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS h_x
  FROM (SELECT cx, CAST(sum(n) AS BIGINT) AS m,
               CAST(sum(sum(n)) OVER () AS BIGINT) AS tt FROM cells GROUP BY cx)
), hy AS (
  SELECT round(CAST(sum(CAST(round(-(m / CAST(tt AS DOUBLE))
               * ln(m / CAST(tt AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS h_y
  FROM (SELECT cy, CAST(sum(n) AS BIGINT) AS m,
               CAST(sum(sum(n)) OVER () AS BIGINT) AS tt FROM cells GROUP BY cy)
)
SELECT n, n_cells, mi, h_x, h_y,
       CASE WHEN h_x > 0 AND h_y > 0 THEN round(mi / sqrt(h_x * h_y), 6) END AS nmi
FROM mi, hx, hy
"""


@register("mi_priority_status", oracle=_MI_ORACLE, tags=("DQ", "A11"))
def mi_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import mutual_information

    orders = load_table(spark, sf_dir, "orders")
    return mutual_information(orders, "o_orderpriority", "o_orderstatus")


# ---------------------------------------------------------------------------
# WOE / IV (operators/features.py::woe_iv_profile): how much does order
# PRIORITY predict fulfilment (status 'F')? The credit-scoring audit of
# a categorical feature against a binary label; counts-only shuffle.
# ---------------------------------------------------------------------------

_WOE_ORACLE = """
WITH cells AS (
  SELECT coalesce(o_orderpriority, '__null__') AS category,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM orders GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n_pos) OVER () AS BIGINT) AS tp,
         CAST(sum(n_neg) OVER () AS BIGINT) AS tn,
         CAST(count(*) OVER () AS BIGINT) AS c
  FROM cells
), d AS (
  SELECT category, n, n_pos, n_neg,
    (CAST(n_pos AS DOUBLE) + 0.5) / (CAST(tp AS DOUBLE) + 0.5 * CAST(c AS DOUBLE)) AS dp,
    (CAST(n_neg AS DOUBLE) + 0.5) / (CAST(tn AS DOUBLE) + 0.5 * CAST(c AS DOUBLE)) AS dn
  FROM t
), e AS (
  SELECT category, n, n_pos, n_neg,
         round(ln(dp / dn), 6) AS woe,
         CAST(round((dp - dn) * ln(dp / dn), 9) AS DECIMAL(28,9)) AS ivc
  FROM d
)
SELECT category, n, n_pos, n_neg, woe,
       CAST(ivc AS DOUBLE) AS iv_contrib,
       round(CAST(sum(ivc) OVER () AS DOUBLE), 6) AS iv_total
FROM e
"""


@register("woe_iv_priority_fulfilled", oracle=_WOE_ORACLE, tags=("feature", "A11"))
def woe_iv_priority_fulfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import woe_iv_profile

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "_is_f", (F.col("o_orderstatus") == "F").cast("int")
    )
    return woe_iv_profile(orders, "o_orderpriority", "_is_f", smoothing=0.5)


# ---------------------------------------------------------------------------
# NDCG@10 (operators/features.py::ndcg_at_k): per nation, does account
# balance RANK customers by actual spend? Relevance = spend band via
# fixed thresholds (the per-customer spend distribution is
# scale-invariant: quartiles ~1.8M/2.5M/3.1M at every SF, so the grades
# stay populated from sf0.001 to sf0.1).
# ---------------------------------------------------------------------------

_NDCG_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice, 0) AS DECIMAL(18,0))) AS spend
  FROM orders GROUP BY 1
), base AS (
  SELECT n.n_name, c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS s,
         CAST(CASE WHEN sp.spend < 1800000 THEN 0
                   WHEN sp.spend < 2500000 THEN 1
                   WHEN sp.spend < 3200000 THEN 2 ELSE 3 END AS BIGINT) AS r
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN spend sp ON sp.o_custkey = c.c_custkey
), ranked AS (
  SELECT n_name,
         CAST((1 << CAST(r AS INT)) - 1 AS BIGINT) AS g,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY s DESC, c_custkey ASC) AS BIGINT) AS rk,
         CAST(row_number() OVER (PARTITION BY n_name ORDER BY r DESC, c_custkey ASC) AS BIGINT) AS irk
  FROM base
), agg AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_docs,
    sum(CASE WHEN rk <= 10 THEN CAST(round(CAST(g AS DOUBLE)
        / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS dcg_d,
    sum(CASE WHEN irk <= 10 THEN CAST(round(CAST(g AS DOUBLE)
        / (ln(CAST(irk AS DOUBLE) + 1.0) / ln(2.0)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS idcg_d
  FROM ranked GROUP BY 1
)
SELECT n_name, n_docs,
       round(CAST(dcg_d AS DOUBLE), 6) AS dcg,
       round(CAST(idcg_d AS DOUBLE), 6) AS idcg,
       CASE WHEN CAST(idcg_d AS DOUBLE) > 0
            THEN round(CAST(dcg_d AS DOUBLE) / CAST(idcg_d AS DOUBLE), 6) END AS ndcg
FROM agg
"""


@register("ndcg_acctbal_vs_spend", oracle=_NDCG_ORACLE, tags=("feature", "eval"))
def ndcg_acctbal_vs_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import ndcg_at_k

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 0).cast("decimal(18,0)")).alias("spend")
    )
    base = (
        cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(spend, cust["c_custkey"] == spend["o_custkey"])
        .select(
            "n_name",
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("s"),
            F.when(F.col("spend") < 1_800_000, 0)
            .when(F.col("spend") < 2_500_000, 1)
            .when(F.col("spend") < 3_200_000, 2)
            .otherwise(3)
            .cast("long")
            .alias("r"),
        )
    )
    return ndcg_at_k(base, ["n_name"], "s", "r", k=10, tiebreak_col="c_custkey")


# ---------------------------------------------------------------------------
# Kaplan–Meier (operators/survival.py::kaplan_meier): per-segment churn
# survival. Duration = days between a customer's first and last order;
# event = churned (last order before the 2000-10-01 cutoff), else
# right-censored — the estimator keeps censored customers in the risk
# set, which a naive churn-rate rollup can't.
# ---------------------------------------------------------------------------

_KM_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(CAST(max(o_orderdate) AS DATE) - CAST(min(o_orderdate) AS DATE) AS BIGINT) AS dur,
         CASE WHEN max(o_orderdate) <= TIMESTAMP '2000-10-01 00:00:00' THEN 1 ELSE 0 END AS ev
  FROM orders GROUP BY 1
), j AS (
  SELECT c.c_mktsegment, cust.dur, cust.ev
  FROM cust JOIN customer c ON c.c_custkey = cust.o_custkey
), g AS (
  SELECT c_mktsegment, dur AS duration,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(ev) AS BIGINT) AS d
  FROM j GROUP BY 1, 2
), r AS (
  SELECT c_mktsegment, duration, d, n - d AS c,
    CAST(sum(n) OVER (PARTITION BY c_mktsegment)
         - coalesce(sum(n) OVER (PARTITION BY c_mktsegment ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM g
), s AS (
  SELECT c_mktsegment, duration, n_risk, d, c,
    sum(CASE WHEN d < n_risk THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(28,9))
             ELSE CAST(0 AS DECIMAL(28,9)) END)
      OVER (PARTITION BY c_mktsegment ORDER BY duration
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum,
    sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      OVER (PARTITION BY c_mktsegment ORDER BY duration
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zs
  FROM r
)
SELECT c_mktsegment, duration, n_risk, d AS n_event, c AS n_censored,
       CASE WHEN zs > 0 THEN 0.0 ELSE round(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
FROM s
"""


@register("km_survival_customer_churn", oracle=_KM_ORACLE, tags=("survival", "A11"), bench=True)
def km_survival_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import kaplan_meier

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    obs = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("dur"),
        (F.max("o_orderdate") <= F.lit("2000-10-01 00:00:00").cast("timestamp"))
        .cast("int")
        .alias("ev"),
    )
    j = obs.join(F.broadcast(cust), obs["o_custkey"] == cust["c_custkey"])
    return kaplan_meier(j, "dur", "ev", ["c_mktsegment"])


# ---------------------------------------------------------------------------
# Item–item CF (operators/market.py::item_item_cosine_topk): top-5
# "customers who bought X also bought Y" neighbors per part over the
# customer×part interaction relation. min_count prunes cold parts before
# the per-customer fan-out; the basket cap guards crawler-sized baskets
# (TPC-H baskets are ~40 distinct parts at every SF, so 60 is a guard,
# not a filter).
# ---------------------------------------------------------------------------

_CF_ORACLE = """
WITH ui AS (
  SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS item
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), counts AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM ui GROUP BY 1),
freq AS (SELECT * FROM counts WHERE n_item >= 5),
pruned0 AS (SELECT ui.u, ui.item FROM ui JOIN freq ON freq.item = ui.item),
sizes AS (SELECT u, count(*) AS bsz FROM pruned0 GROUP BY 1),
pruned AS (
  SELECT p.u, p.item FROM pruned0 p JOIN sizes s ON s.u = p.u AND s.bsz <= 60
), pairs AS (
  SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS n_co
  FROM pruned a JOIN pruned b ON a.u = b.u AND a.item < b.item
  GROUP BY 1, 2
), both_dir AS (
  SELECT i, j, n_co FROM pairs UNION ALL SELECT j, i, n_co FROM pairs
), scored AS (
  SELECT b.i, b.j, ni.n_item, nj.n_item AS n_neighbor, b.n_co,
         round(CAST(b.n_co AS DOUBLE)
               / sqrt(CAST(ni.n_item AS DOUBLE) * CAST(nj.n_item AS DOUBLE)), 6) AS cosine
  FROM both_dir b
  JOIN freq ni ON ni.item = b.i JOIN freq nj ON nj.item = b.j
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY i ORDER BY cosine DESC, j ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT i AS item, j AS neighbor, n_item, n_neighbor, n_co, cosine, rk
FROM ranked WHERE rk <= 5
"""


@register("cf_item_neighbors_copurchase", oracle=_CF_ORACLE, tags=("recommend", "LLM"), bench=True)
def cf_item_neighbors_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.market import item_item_cosine_topk

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ui = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("u"), F.col("l_partkey").alias("item")
    )
    return item_item_cosine_topk(
        ui, "u", "item", k=5, min_count=5, max_basket_size=60
    )


# ---------------------------------------------------------------------------
# BFS hop distance (operators/graph.py::bfs_hop_distance): the 4-hop
# reachability ball around the two smallest nodes of the sampled
# copurchase graph (the ppr_copurchase_seeds construction). Oracle is a
# bounded recursive CTE with min-hop election.
# ---------------------------------------------------------------------------


def _bfs_oracle() -> str:
    from .round8 import _COPURCHASE_CTE

    return (
        _COPURCHASE_CTE
        + """, edges AS (
  SELECT u AS src, v AS dst FROM sampled
  UNION ALL SELECT v AS src, u AS dst FROM sampled
), seeds AS (
  SELECT DISTINCT src AS node FROM edges ORDER BY src ASC LIMIT 2
), walk AS (
  WITH RECURSIVE w(node, hop) AS (
    SELECT node, 0 FROM seeds
    UNION
    SELECT e.dst, w.hop + 1 FROM w JOIN edges e ON e.src = w.node WHERE w.hop < 4
  )
  SELECT node, hop FROM w
)
SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM walk GROUP BY node
"""
    )


@register("bfs_copurchase_radius", oracle=_bfs_oracle(), tags=("graph", "LLM"))
def bfs_copurchase_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bfs_hop_distance
    from .round8 import _sampled_copurchase_pairs

    sampled = _sampled_copurchase_pairs(spark, sf_dir)
    edges = sampled.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(sampled.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    # Deterministic seed discovery: the two smallest node ids (bounded
    # 2-row collect — the seed set is a query parameter by contract).
    seeds = [
        r["src"]
        for r in edges.select("src")
        .distinct()
        .orderBy(F.col("src").asc())
        .limit(2)
        .collect()
    ]
    return bfs_hop_distance(edges, seeds, max_hops=4)


# ---------------------------------------------------------------------------
# Holt–Winters additive (operators/trend.py::holt_winters_additive):
# 7-day-ahead forecast of each event type's daily value over the four
# complete January weeks (period 7 — weekly seasonality). Oracle
# GENERATED by the paired holt_winters_oracle_sql (identical left-fold
# init sums and recurrence chains), the holt/cusum/ewma pattern.
# ---------------------------------------------------------------------------

_HW_DAYS = [f"{d:02d}" for d in range(1, 29)]


def _hw_oracle() -> str:
    from ..operators.trend import holt_winters_oracle_sql

    inner = holt_winters_oracle_sql(
        "SELECT event_type, strftime(ts, '%d') AS step, "
        "CAST(round(value, 2) AS DECIMAL(12,2)) AS val FROM events "
        "WHERE CAST(strftime(ts, '%d') AS INT) <= 28",
        "event_type",
        "step",
        "val",
        _HW_DAYS,
        period=7,
    )
    return inner.replace("SELECT k,", "SELECT k AS event_type,", 1)


@register("hw_forecast_event_values", oracle=_hw_oracle(), tags=("trend", "forecast"))
def hw_forecast_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import holt_winters_additive

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("step", F.date_format("ts", "dd"))
        .filter(F.col("step") <= "28")
        .select(
            "event_type", "step", F.round("value", 2).cast("decimal(12,2)").alias("val")
        )
    )
    hw = holt_winters_additive(ev, ["event_type"], "step", "val", _HW_DAYS, period=7)
    return hw.select(
        "event_type",
        "h",
        F.round("level", 4).alias("level"),
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round("forecast", 4).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# CCF (operators/trend.py::ccf_profile): does each event type's daily
# VOLUME lead its daily VALUE (lags −2..+2)? The two-series sibling of
# acf_daily_event_value on the same daily grain.
# ---------------------------------------------------------------------------

_CCF_ORACLE = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS x,
         sum(CAST(round(value, 2) AS DECIMAL(12,2))) AS y
  FROM events GROUP BY 1, 2
), base AS (
  SELECT event_type,
         CAST(x AS DECIMAL(24,6)) AS x, CAST(y AS DECIMAL(24,6)) AS y,
         count(*) OVER (PARTITION BY event_type) AS n,
         CAST(sum(CAST(x AS DECIMAL(24,6))) OVER (PARTITION BY event_type) AS DOUBLE)
           / count(*) OVER (PARTITION BY event_type) AS mx,
         CAST(sum(CAST(y AS DECIMAL(24,6))) OVER (PARTITION BY event_type) AS DOUBLE)
           / count(*) OVER (PARTITION BY event_type) AS my,
         lag(CAST(y AS DECIMAL(24,6)), 2) OVER w AS lm2,
         lag(CAST(y AS DECIMAL(24,6)), 1) OVER w AS lm1,
         lead(CAST(y AS DECIMAL(24,6)), 1) OVER w AS lp1,
         lead(CAST(y AS DECIMAL(24,6)), 2) OVER w AS lp2
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
), agg AS (
  SELECT event_type, max(n) AS n,
    sum(CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx), 9) AS DECIMAL(28,9))) AS denx,
    sum(CAST(round((CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my), 9) AS DECIMAL(28,9))) AS deny,
    sum(CASE WHEN lm2 IS NOT NULL THEN CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(lm2 AS DOUBLE) - my), 9) AS DECIMAL(28,9)) END) AS numm2,
    sum(CASE WHEN lm1 IS NOT NULL THEN CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(lm1 AS DOUBLE) - my), 9) AS DECIMAL(28,9)) END) AS numm1,
    sum(CASE WHEN y IS NOT NULL THEN CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(y AS DOUBLE) - my), 9) AS DECIMAL(28,9)) END) AS num0,
    sum(CASE WHEN lp1 IS NOT NULL THEN CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(lp1 AS DOUBLE) - my), 9) AS DECIMAL(28,9)) END) AS nump1,
    sum(CASE WHEN lp2 IS NOT NULL THEN CAST(round((CAST(x AS DOUBLE) - mx) * (CAST(lp2 AS DOUBLE) - my), 9) AS DECIMAL(28,9)) END) AS nump2,
    count(lm2) AS npm2, count(lm1) AS npm1, count(y) AS np0,
    count(lp1) AS npp1, count(lp2) AS npp2
  FROM base GROUP BY event_type
)
SELECT event_type, lag, CAST(n AS BIGINT) AS n, CAST(n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN denx > 0 AND deny > 0 AND n_pairs > 0
            THEN round(CAST(num AS DOUBLE)
                 / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)), 6) END AS ccf
FROM (
  SELECT event_type, CAST(-2 AS BIGINT) AS lag, n, npm2 AS n_pairs, numm2 AS num, denx, deny FROM agg
  UNION ALL SELECT event_type, CAST(-1 AS BIGINT), n, npm1, numm1, denx, deny FROM agg
  UNION ALL SELECT event_type, CAST(0 AS BIGINT), n, np0, num0, denx, deny FROM agg
  UNION ALL SELECT event_type, CAST(1 AS BIGINT), n, npp1, nump1, denx, deny FROM agg
  UNION ALL SELECT event_type, CAST(2 AS BIGINT), n, npp2, nump2, denx, deny FROM agg
)
"""


@register("ccf_event_volume_vs_value", oracle=_CCF_ORACLE, tags=("trend", "A11"))
def ccf_event_volume_vs_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import ccf_profile

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.round("value", 2).cast("decimal(12,2)")).alias("y"),
        )
    )
    return ccf_profile(daily, ["event_type"], "day", "x", "y", max_lag=2)


# ---------------------------------------------------------------------------
# Eventually-follows matrix (operators/windows.py::eventually_follows):
# the process-mining EF relation over user event logs — which event
# types eventually lead to which, per user case, on µs epochs.
# ---------------------------------------------------------------------------

_EF_ORACLE = """
WITH prof AS (
  SELECT user_id, event_type,
         CAST(min(epoch_us(ts)) AS BIGINT) AS f,
         CAST(max(epoch_us(ts)) AS BIGINT) AS l
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS activity_a, b.event_type AS activity_b,
         CASE WHEN a.f < b.l THEN 1 ELSE 0 END AS fol
  FROM prof a JOIN prof b ON a.user_id = b.user_id AND a.event_type <> b.event_type
)
SELECT activity_a, activity_b,
       CAST(count(*) AS BIGINT) AS n_cases_both,
       CAST(sum(fol) AS BIGINT) AS n_follows,
       round(CAST(sum(fol) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS support
FROM pairs GROUP BY 1, 2
"""


@register("ef_event_process_matrix", oracle=_EF_ORACLE, tags=("sequence", "W3"))
def ef_event_process_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import eventually_follows

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_t_us", F.unix_micros("ts")
    )
    return eventually_follows(ev, "user_id", "_t_us", "event_type")
