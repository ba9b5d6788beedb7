"""Round-7 session-4 registrations: the statistics tier built at the tail
of session 3 promoted to oracle-checked driver queries (one-way ANOVA,
Spearman rank correlation) plus the grid-based spatial clustering
(DBSCAN-lite) rollup over synthesized event positions.

Reference parity: extends the reference's monitoring tier
(``monitoring/pipeline_observability.py``) with the variance-decomposition
and monotone-association screens its pandas checks stop short of, and the
coverage-blob detector a telecom RAN team runs over the tower heat map —
re-expressed as distributed plans under the registry determinism
conventions (decimal-exact sums, round-then-decimal ratio terms,
tie-broken windows, matching column names).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..streaming.staging import pin_staging_mtimes
from .registry import register
from ..lineage import lineage_cut

# ---------------------------------------------------------------------------
# One-way ANOVA (quality/monitors.py::anova_oneway): does event_type move
# the event value? Values pre-rounded to 2 dp at the query grain (the
# repo-wide double→decimal safety pattern); the operator's per-level sums
# are exact DECIMAL(24,6) and the SS terms round-then-decimal at 9 dp, so
# the F statistic is one fixed-shape double expression cross-engine.
# ---------------------------------------------------------------------------

_ANOVA_ORACLE = """
WITH cells AS (
  SELECT coalesce(event_type, '__null__') AS g, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(value, 2) AS DECIMAL(24,6))) AS s,
         sum(CAST(round(value, 2) AS DECIMAL(24,6)) * CAST(round(value, 2) AS DECIMAL(24,6))) AS ss
  FROM events WHERE value IS NOT NULL GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n) OVER () AS BIGINT) AS tn,
         sum(s) OVER () AS tsum, CAST(count(*) OVER () AS BIGINT) AS k
  FROM cells
), terms AS (
  SELECT tn, k,
    CAST(round(CAST(n AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE))
         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - CAST(tsum AS DOUBLE) / CAST(tn AS DOUBLE)), 9) AS DECIMAL(28,9)) AS ssb_t,
    CAST(round(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) AS ssw_t
  FROM t
), agg AS (
  SELECT CAST(max(tn) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k,
         CAST(sum(ssb_t) AS DOUBLE) AS ssb, CAST(sum(ssw_t) AS DOUBLE) AS ssw
  FROM terms
)
SELECT n, k, round(ssb, 6) AS ss_between, round(ssw, 6) AS ss_within,
       CAST(k - 1 AS BIGINT) AS df_between, CAST(n - k AS BIGINT) AS df_within,
       CASE WHEN k - 1 > 0 AND n - k > 0 AND ssw > 0
            THEN round((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6) END AS f_stat,
       CASE WHEN ssb + ssw > 0 THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
FROM agg
"""


@register("anova_event_value_by_type", oracle=_ANOVA_ORACLE, tags=("A11", "DQ"))
def anova_event_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import anova_oneway

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round("value", 2).cast("double").alias("v")
    )
    return anova_oneway(ev, "event_type", "v")


# ---------------------------------------------------------------------------
# Spearman rank correlation (quality/monitors.py::spearman_correlation):
# per nation, does a customer's account balance track their total spend?
# Whole-dollar spend keeps the y-axis ranks exact; the doubled-rank trick
# (2·avg_rank = 2·rank + tie_count − 1) keeps every accumulated sum an
# exact DECIMAL of integers, so ρ is one fixed-shape double cross-engine.
# ---------------------------------------------------------------------------

_SPEARMAN_ORACLE = """
WITH base AS (
  SELECT n.n_name, c.c_custkey,
         CAST(max(c.c_acctbal) AS DOUBLE) AS x,
         CAST(sum(CAST(round(o.o_totalprice, 0) AS DECIMAL(18,0))) AS DOUBLE) AS y
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT n_name,
    CAST(2 * rank() OVER (PARTITION BY n_name ORDER BY x ASC)
         + count(*) OVER (PARTITION BY n_name, x) - 1 AS DECIMAL(24,0)) AS u,
    CAST(2 * rank() OVER (PARTITION BY n_name ORDER BY y ASC)
         + count(*) OVER (PARTITION BY n_name, y) - 1 AS DECIMAL(24,0)) AS v
  FROM base WHERE x IS NOT NULL AND y IS NOT NULL
), agg AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
         sum(u) AS su, sum(v) AS sv,
         sum(u * u) AS suu, sum(v * v) AS svv,
         sum(CAST(u * v AS DECIMAL(38,0))) AS suv
  FROM ranked GROUP BY 1
)
SELECT n_name, n,
  CASE WHEN CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) > 0
        AND CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) > 0
       THEN round((CAST(n AS DOUBLE) * CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))), 6)
  END AS rho
FROM agg
"""


@register("spearman_acctbal_vs_spend", oracle=_SPEARMAN_ORACLE, tags=("A11", "DQ"))
def spearman_acctbal_vs_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import spearman_correlation

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(
            F.max("c_acctbal").cast("double").alias("x"),
            F.sum(F.round("o_totalprice", 0).cast("decimal(18,0)"))
            .cast("double")
            .alias("y"),
        )
    )
    return spearman_correlation(base, "x", "y", ["n_name"])


# ---------------------------------------------------------------------------
# Grid-based spatial clustering (operators/spatial.py::grid_cluster_cells)
# over positions synthesized from event_id (the fixture carries no
# coordinates — same fixed-formula trick as grid_density_event_cells, with
# a 60% hot region over 12 cells so dense structure exists at EVERY scale
# and a quadratic-residue scatter whose cells cross the min_pts line as SF
# grows). The oracle replays the union-find as a recursive CTE over the
# metadata-sized dense-cell graph.
# ---------------------------------------------------------------------------

_SPATIAL_MIN_PTS = 10

_SPATIAL_ORACLE = f"""
WITH pts AS (
  SELECT CASE WHEN event_id % 100 < 60
              THEN (event_id % 300) / 10.0
              ELSE ((event_id * event_id) % 1800) / 10.0 - 90.0 END AS lat,
         CASE WHEN event_id % 100 < 60
              THEN (event_id % 350) / 10.0
              ELSE ((event_id * 131) % 3600) / 10.0 - 180.0 END AS lon
  FROM events
), dense AS (
  SELECT CAST(floor(lat / 10.0) AS BIGINT) AS ci, CAST(floor(lon / 10.0) AS BIGINT) AS cj,
         CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2 HAVING count(*) >= {_SPATIAL_MIN_PTS}
), ids AS (
  SELECT ci, cj, n, (ci + 4000000) * 10000000 + (cj + 4000000) AS cid FROM dense
), edges AS (
  SELECT a.cid AS u, b.cid AS v
  FROM ids a JOIN ids b
    ON abs(a.ci - b.ci) <= 1 AND abs(a.cj - b.cj) <= 1 AND a.cid <> b.cid
), reach AS (
  WITH RECURSIVE r(node, root) AS (
    SELECT cid, cid FROM ids
    UNION
    SELECT e.v, r.root FROM r JOIN edges e ON e.u = r.node
  )
  SELECT node, min(root) AS cluster_id FROM r GROUP BY node
), labeled AS (
  SELECT i.ci, i.cj, i.n, reach.cluster_id FROM ids i JOIN reach ON reach.node = i.cid
)
SELECT ci AS cell_lat, cj AS cell_lon, n, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_cells,
       CAST(sum(n) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_points
FROM labeled
"""


@register("spatial_cluster_event_cells", oracle=_SPATIAL_ORACLE, tags=("A1", "geo"))
def spatial_cluster_event_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import grid_cluster_cells

    hot = F.col("event_id") % 100 < 60
    pts = load_table(spark, sf_dir, "events").select(
        F.when(hot, (F.col("event_id") % 300) / F.lit(10.0))
        .otherwise(((F.col("event_id") * F.col("event_id")) % 1800) / F.lit(10.0) - F.lit(90.0))
        .alias("lat"),
        F.when(hot, (F.col("event_id") % 350) / F.lit(10.0))
        .otherwise(((F.col("event_id") * 131) % 3600) / F.lit(10.0) - F.lit(180.0))
        .alias("lon"),
    )
    return grid_cluster_cells(pts, "lat", "lon", cell_deg=10.0, min_pts=_SPATIAL_MIN_PTS)


# ---------------------------------------------------------------------------
# Kruskal–Wallis (quality/monitors.py::kruskal_wallis): nonparametric twin
# of the ANOVA query — does event_type shift the DISTRIBUTION of daily
# value totals, judged on ranks? Runs at the (event_type, day) post-agg
# grain per the operator's global-sort contract (~600 rows at sf0.1).
# ---------------------------------------------------------------------------

_KW_ORACLE = """
WITH daily AS (
  SELECT event_type AS g,
         CAST(sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS DOUBLE) AS v
  FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
), ranked AS (
  SELECT coalesce(g, '__null__') AS g,
    CAST(2 * rank() OVER (ORDER BY v ASC) + count(*) OVER (PARTITION BY v) - 1
         AS DECIMAL(24,0)) AS u
  FROM daily WHERE v IS NOT NULL
), per_g AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(u) AS DECIMAL(38,0)) AS su
  FROM ranked GROUP BY 1
), groups AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum(CAST(round(CAST(su AS DOUBLE) * CAST(su AS DOUBLE)
             / (4.0 * CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS t
  FROM per_g
), ties AS (
  SELECT sum(CAST(tsz * tsz * tsz - tsz AS DECIMAL(38,0))) AS tie
  FROM (SELECT u, CAST(count(*) AS BIGINT) AS tsz FROM ranked GROUP BY 1)
)
SELECT n, k,
  round(CASE WHEN k >= 2 THEN 12.0 * CAST(t AS DOUBLE)
        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        - 3.0 * (CAST(n AS DOUBLE) + 1.0) END, 6) AS h_stat,
  round(CASE WHEN n > 1 THEN 1.0 - CAST(tie AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) END, 6)
    AS tie_correction,
  CASE WHEN (CASE WHEN n > 1 THEN 1.0 - CAST(tie AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)) END) > 0
        AND k >= 2
       THEN round((12.0 * CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             - 3.0 * (CAST(n AS DOUBLE) + 1.0))
            / (1.0 - CAST(tie AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))), 6)
  END AS h_adj
FROM groups CROSS JOIN ties
"""


@register("kw_daily_value_by_type", oracle=_KW_ORACLE, tags=("A11", "DQ"))
def kw_daily_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import kruskal_wallis

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("dv"))
        .select("event_type", F.col("dv").cast("double").alias("v"))
    )
    return kruskal_wallis(daily, "event_type", "v")


# ---------------------------------------------------------------------------
# Welch's t-test (quality/monitors.py::welch_t_test): do purchase events
# carry a different mean value than view events, without assuming equal
# spreads? Single map-side-combined scalar aggregate — safe at raw event
# grain at any scale.
# ---------------------------------------------------------------------------

_WELCH_ORACLE = """
WITH base AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b,
         CAST(round(value, 2) AS DECIMAL(24,6)) AS v
  FROM events WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
), agg AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         sum(CASE WHEN a = 1 THEN v END) AS sa, sum(CASE WHEN b = 1 THEN v END) AS sb,
         sum(CASE WHEN a = 1 THEN v * v END) AS ssa, sum(CASE WHEN b = 1 THEN v * v END) AS ssb
  FROM base
), d AS (
  SELECT n_a, n_b,
    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
    CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
    CAST(ssa AS DOUBLE) AS ssad, CAST(ssb AS DOUBLE) AS ssbd
  FROM agg
), m AS (
  SELECT *, sad / nad AS ma, sbd / nbd AS mb,
    CASE WHEN n_a > 1 THEN (ssad - sad * sad / nad) / (nad - 1.0) END AS vara,
    CASE WHEN n_b > 1 THEN (ssbd - sbd * sbd / nbd) / (nbd - 1.0) END AS varb
  FROM d
)
SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
  round(vara, 6) AS var_a, round(varb, 6) AS var_b,
  CASE WHEN vara / nad + varb / nbd > 0
       THEN round((ma - mb) / sqrt(vara / nad + varb / nbd), 6) END AS t_stat,
  CASE WHEN vara / nad + varb / nbd > 0 AND n_a > 1 AND n_b > 1
       THEN round((vara / nad + varb / nbd) * (vara / nad + varb / nbd)
            / ((vara / nad) * (vara / nad) / (nad - 1.0)
               + (varb / nbd) * (varb / nbd) / (nbd - 1.0)), 6) END AS df_welch
FROM m
"""


@register("welch_purchase_vs_view_value", oracle=_WELCH_ORACLE, tags=("A11", "DQ"))
def welch_purchase_vs_view_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import welch_t_test

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round("value", 2).cast("double").alias("v")
    )
    return welch_t_test(ev, "event_type", "v", "purchase", "view")


# ---------------------------------------------------------------------------
# Log-rank test (operators/survival.py::log_rank_test): is the BUILDING
# segment's churn curve different from AUTOMOBILE's? Same duration/event
# derivation as km_survival_customer_churn — the inference companion that
# says whether the two KM curves differ beyond noise.
# ---------------------------------------------------------------------------

_LOGRANK_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(CAST(max(o_orderdate) AS DATE) - CAST(min(o_orderdate) AS DATE) AS BIGINT) AS dur,
         CASE WHEN max(o_orderdate) <= TIMESTAMP '2000-10-01 00:00:00' THEN 1 ELSE 0 END AS ev
  FROM orders GROUP BY 1
), base AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ga,
         cust.dur AS t, cust.ev
  FROM cust JOIN customer c ON c.c_custkey = cust.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
), grp AS (
  SELECT ga, t, CAST(count(*) AS BIGINT) AS n, CAST(sum(ev) AS BIGINT) AS d
  FROM base GROUP BY 1, 2
), wide AS (
  SELECT t,
    CAST(sum(CASE WHEN ga = 1 THEN d ELSE 0 END) AS BIGINT) AS d1,
    CAST(sum(CASE WHEN ga = 1 THEN n ELSE 0 END) AS BIGINT) AS t1,
    CAST(sum(CASE WHEN ga = 0 THEN d ELSE 0 END) AS BIGINT) AS d2,
    CAST(sum(CASE WHEN ga = 0 THEN n ELSE 0 END) AS BIGINT) AS t2
  FROM grp GROUP BY 1
), r AS (
  SELECT *,
    CAST(sum(t1) OVER () - coalesce(sum(t1) OVER (ORDER BY t ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n1,
    CAST(sum(t2) OVER () - coalesce(sum(t2) OVER (ORDER BY t ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n2
  FROM wide
), agg AS (
  SELECT CAST(sum(t1) AS BIGINT) AS n_a, CAST(sum(t2) AS BIGINT) AS n_b,
    CAST(sum(d1) AS BIGINT) AS o_a, CAST(sum(d2) AS BIGINT) AS o_b,
    sum(CASE WHEN d1 + d2 > 0 THEN CAST(round(CAST(d1 + d2 AS DOUBLE)
        * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS e1,
    sum(CASE WHEN d1 + d2 > 0 THEN CAST(round(CAST(d1 + d2 AS DOUBLE)
        * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS e2,
    sum(CASE WHEN d1 + d2 > 0 AND n1 + n2 > 1 THEN CAST(round(
          CAST(d1 + d2 AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
          * (1.0 - CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
          * (CAST(n1 + n2 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE))
          / (CAST(n1 + n2 AS DOUBLE) - 1.0), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS v
  FROM r
)
SELECT n_a, n_b, o_a, round(CAST(e1 AS DOUBLE), 6) AS e_a,
       o_b, round(CAST(e2 AS DOUBLE), 6) AS e_b,
       round(CAST(v AS DOUBLE), 6) AS var_s,
       CASE WHEN CAST(v AS DOUBLE) > 0
            THEN round((CAST(o_a AS DOUBLE) - CAST(e1 AS DOUBLE))
                 * (CAST(o_a AS DOUBLE) - CAST(e1 AS DOUBLE)) / CAST(v AS DOUBLE), 6)
       END AS chi_sq
FROM agg
"""


@register("logrank_churn_building_vs_auto", oracle=_LOGRANK_ORACLE, tags=("survival", "A11"))
def logrank_churn_building_vs_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.survival import log_rank_test

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
    return log_rank_test(j, "dur", "ev", "c_mktsegment", "BUILDING", "AUTOMOBILE")


# ---------------------------------------------------------------------------
# Precision/Recall@k + AP@k (operators/features.py::pr_map_at_k): the
# binary-relevance twin of ndcg_acctbal_vs_spend — per nation, does
# ranking customers by account balance surface the top spenders
# (spend ≥ 2.5M)? Same base relation, binary relevance, k = 10.
# ---------------------------------------------------------------------------

_PR_AT_K_ORACLE = """
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice, 0) AS DECIMAL(18,0))) AS spend
  FROM orders GROUP BY 1
), base AS (
  SELECT n.n_name, c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS s,
         CASE WHEN spend.spend >= 2500000 THEN 1 ELSE 0 END AS rel
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN spend ON spend.o_custkey = c.c_custkey
), ranked AS (
  SELECT n_name, rel,
    CAST(row_number() OVER (PARTITION BY n_name ORDER BY s DESC, c_custkey ASC) AS BIGINT) AS rk,
    CAST(sum(rel) OVER (PARTITION BY n_name ORDER BY s DESC, c_custkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base
), agg AS (
  SELECT n_name, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(rel) AS BIGINT) AS n_rel,
    CAST(sum(CASE WHEN rk <= 10 THEN rel ELSE 0 END) AS BIGINT) AS hits_at_k,
    sum(CASE WHEN rel = 1 AND rk <= 10
        THEN CAST(round(CAST(cum AS DOUBLE) / CAST(rk AS DOUBLE), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS ap
  FROM ranked GROUP BY 1
)
SELECT n_name, n_docs, n_rel, hits_at_k,
  round(CAST(hits_at_k AS DOUBLE) / 10.0, 6) AS p_at_k,
  CASE WHEN n_rel > 0 THEN round(CAST(hits_at_k AS DOUBLE) / CAST(n_rel AS DOUBLE), 6) END AS r_at_k,
  CASE WHEN n_rel > 0 THEN round(CAST(ap AS DOUBLE)
       / CAST(CASE WHEN n_rel < 10 THEN n_rel ELSE 10 END AS DOUBLE), 6) END AS ap_at_k
FROM agg
"""


@register("pr_at_k_acctbal_vs_spend", oracle=_PR_AT_K_ORACLE, tags=("feature", "eval"))
def pr_at_k_acctbal_vs_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import pr_map_at_k

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
            (F.col("spend") >= 2_500_000).cast("int").alias("rel"),
        )
    )
    return pr_map_at_k(base, ["n_name"], "s", "rel", k=10, tiebreak_col="c_custkey")


# ---------------------------------------------------------------------------
# Decile lift (operators/features.py::lift_table): rank orders by their
# max line discount — do returned-line orders concentrate in the deep-
# discount deciles? Order grain (the scored-entity contract), l_orderkey
# tie-break.
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH ord AS (
  SELECT l_orderkey, CAST(max(l_discount) AS DOUBLE) AS s,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
  FROM lineitem GROUP BY 1
), bucketed AS (
  SELECT CAST(ntile(10) OVER (ORDER BY s DESC, l_orderkey ASC) AS BIGINT) AS bucket, y
  FROM ord
), g AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM bucketed GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n) OVER () AS BIGINT) AS tn, CAST(sum(n_pos) OVER () AS BIGINT) AS tp,
    CAST(sum(n_pos) OVER (ORDER BY bucket ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
  FROM g
)
SELECT bucket, n, n_pos,
  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resp_rate,
  CASE WHEN tp > 0 THEN round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
       / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) END AS lift,
  cum_pos,
  CASE WHEN tp > 0 THEN round(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE), 6) END AS cum_gain
FROM t
"""


@register("lift_deciles_order_returns", oracle=_LIFT_ORACLE, tags=("feature", "eval"))
def lift_deciles_order_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import lift_table

    ord_grain = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.max("l_discount").cast("double").alias("s"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("y"),
        )
    )
    return lift_table(ord_grain, "s", "y", n_buckets=10, tiebreak_col="l_orderkey")


# ---------------------------------------------------------------------------
# Calibration bins (operators/features.py::calibration_bins): read each
# order's mean line discount ×10 as a pseudo-probability of a return —
# is that "model" calibrated against actual returned lines? The
# reliability diagram over the same order grain as the lift table.
# ---------------------------------------------------------------------------

_CALIB_ORACLE = """
WITH ord AS (
  SELECT l_orderkey,
         round(CAST(sum(CAST(round(l_discount, 2) AS DECIMAL(8,2))) AS DOUBLE)
               * 10.0 / CAST(count(*) AS DOUBLE), 4) AS p,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS y
  FROM lineitem GROUP BY 1
), base AS (
  SELECT CAST(least(CAST(floor(p * 10.0) AS BIGINT), 9) AS BIGINT) AS bin,
         CAST(p AS DECIMAL(18,6)) AS p, y
  FROM ord WHERE p IS NOT NULL AND y IS NOT NULL
), g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         sum(p) AS sp
  FROM base GROUP BY 1
)
SELECT bin, round(CAST(bin AS DOUBLE) / 10.0, 6) AS bin_lo, n, n_pos,
  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_prob,
  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
        - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap
FROM g
"""


@register("calibration_discount_returns", oracle=_CALIB_ORACLE, tags=("feature", "eval"))
def calibration_discount_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import calibration_bins

    ord_grain = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.round("l_discount", 2).cast("decimal(8,2)")).cast("double")
                * F.lit(10.0)
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("p"),
            F.max((F.col("l_returnflag") == "R").cast("int")).alias("y"),
        )
    )
    return calibration_bins(ord_grain, "p", "y", n_bins=10)


# ---------------------------------------------------------------------------
# Degree assortativity (operators/graph.py::degree_assortativity) of the
# sampled co-purchase graph — do frequently-co-bought parts pair with
# other hubs or with the long tail? One-number structure diagnostic over
# the same relation the jaccard/k-core/BFS queries share.
# ---------------------------------------------------------------------------


def _assort_oracle() -> str:
    from .round8 import _COPURCHASE_CTE

    return (
        _COPURCHASE_CTE
        + """, und AS (
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM sampled WHERE u <> v
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY 1
), directed AS (
  SELECT u AS a, v AS b FROM und UNION ALL SELECT v AS a, u AS b FROM und
), pairs AS (
  SELECT CAST(da.deg AS DECIMAL(20,0)) AS x, CAST(db.deg AS DECIMAL(20,0)) AS y
  FROM directed JOIN deg da ON da.node = directed.a JOIN deg db ON db.node = directed.b
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS m, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         sum(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
  CASE WHEN CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
        AND CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       THEN round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
  END AS r_assort
FROM agg
"""
    )


@register("assortativity_copurchase", oracle=_assort_oracle(), tags=("graph", "LLM"))
def assortativity_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import degree_assortativity
    from .round8 import _sampled_copurchase_pairs

    sampled = _sampled_copurchase_pairs(spark, sf_dir)
    return degree_assortativity(
        sampled.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )


# ---------------------------------------------------------------------------
# Closeness + harmonic centrality (operators/graph.py::
# closeness_centrality) for the three smallest parts of the sampled
# co-purchase graph — per-seed labeled BFS folded into the two standard
# centrality numbers; the per-seed sibling of bfs_copurchase_radius.
# ---------------------------------------------------------------------------


def _closeness_oracle() -> str:
    from .round8 import _COPURCHASE_CTE

    return (
        _COPURCHASE_CTE
        + """, edges AS (
  SELECT u AS src, v AS dst FROM sampled
  UNION ALL SELECT v AS src, u AS dst FROM sampled
), seeds AS (
  SELECT DISTINCT src AS node FROM edges ORDER BY node ASC LIMIT 3
), walk AS (
  WITH RECURSIVE w(seed, node, hop) AS (
    SELECT node, node, 0 FROM seeds
    UNION
    SELECT w.seed, e.dst, w.hop + 1 FROM w JOIN edges e ON e.src = w.node
    WHERE w.hop < 4
  )
  SELECT seed, node, CAST(min(hop) AS INTEGER) AS hop FROM w GROUP BY 1, 2
)
SELECT seed,
  CAST(sum(CASE WHEN hop > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
  CAST(sum(hop) AS BIGINT) AS total_hops,
  CASE WHEN sum(hop) > 0 THEN round(CAST(sum(CASE WHEN hop > 0 THEN 1 ELSE 0 END) AS DOUBLE)
       / CAST(sum(hop) AS DOUBLE), 6) END AS closeness,
  round(CAST(sum(CASE WHEN hop > 0
        THEN CAST(round(1.0 / CAST(hop AS DOUBLE), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE), 6) AS harmonic
FROM walk GROUP BY 1
"""
    )


@register("closeness_copurchase_seeds", oracle=_closeness_oracle(), tags=("graph", "LLM"))
def closeness_copurchase_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import closeness_centrality
    from .round8 import _sampled_copurchase_pairs

    sampled = _sampled_copurchase_pairs(spark, sf_dir)
    edges = sampled.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(sampled.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    # Deterministic seed discovery: the three smallest node ids (bounded
    # 3-row collect — the seed set is a query parameter by contract;
    # DISTINCT before LIMIT per the repeated-minimum gotcha).
    seeds = [
        r["src"]
        for r in edges.select("src")
        .distinct()
        .orderBy(F.col("src").asc())
        .limit(3)
        .collect()
    ]
    return closeness_centrality(edges, seeds, max_hops=4)


# ---------------------------------------------------------------------------
# Pettitt change-point test (operators/trend.py::pettitt_test): for each
# event type's daily value series, where does the distribution break and
# is it significant? Daily DECIMAL totals keep every sgn comparison and
# U_t exact; the calendar-grain contract bounds the O(T²) recurrence at
# ~30 steps per key.
# ---------------------------------------------------------------------------

_PETTITT_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, CAST(strftime(ts, '%d') AS BIGINT) AS t,
         sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS v
  FROM events GROUP BY 1, 2
), base AS (
  SELECT k, t, v FROM daily WHERE t IS NOT NULL AND v IS NOT NULL
), vt AS (
  SELECT b.k, b.t, CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS vt
  FROM base b JOIN base a ON a.k = b.k AND a.t <> b.t
  GROUP BY 1, 2
), u AS (
  SELECT k, t,
    CAST(sum(vt) OVER (PARTITION BY k ORDER BY t ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS u,
    CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
    CAST(row_number() OVER (PARTITION BY k ORDER BY t DESC) AS BIGINT) AS rlast
  FROM vt
), cand AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY k ORDER BY abs(u) DESC, t ASC) AS BIGINT) AS rk
  FROM u WHERE rlast <> 1
), best AS (
  SELECT k, t, u, CAST(abs(u) AS BIGINT) AS k_stat,
    round(least(1.0, 2.0 * exp(-6.0 * CAST(abs(u) AS DOUBLE) * CAST(abs(u) AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
             + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))), 6) AS p_value
  FROM cand WHERE rk = 1
), keyn AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1
)
SELECT keyn.k AS event_type, keyn.n, best.t AS t_star, best.u AS u_at_t,
       best.k_stat, best.p_value
FROM keyn LEFT JOIN best ON best.k = keyn.k
"""


@register("pettitt_daily_event_value", oracle=_PETTITT_ORACLE, tags=("trend", "A11"))
def pettitt_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import pettitt_test

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_format("ts", "dd").cast("long").alias("t"),
        )
        .agg(F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("v"))
    )
    return pettitt_test(daily, ["event_type"], "t", "v")


# ---------------------------------------------------------------------------
# Periodogram (operators/trend.py::periodogram): spectral power of each
# event type's DAILY VOLUME at candidate weekly-ish periods — the
# frequency-domain sibling of acf_daily_event_value. Counts are exact;
# the trig table is Python-embedded in both engines (paired generator).
# ---------------------------------------------------------------------------

_PERIODOGRAM_PERIODS = [3, 5, 7, 10, 14]


def _periodogram_oracle() -> str:
    from ..operators.trend import periodogram_oracle_sql

    inner = (
        "SELECT event_type, CAST(strftime(ts, '%d') AS BIGINT) - 1 AS t, "
        "CAST(count(*) AS DECIMAL(18,0)) AS v FROM events GROUP BY 1, 2"
    )
    sql = periodogram_oracle_sql(inner, "event_type", "t", "v", _PERIODOGRAM_PERIODS)
    return sql.replace(
        "SELECT k, period,\n  round(",
        "SELECT k AS event_type, period,\n  round(",
        1,
    )


@register("periodogram_daily_event_volume", oracle=_periodogram_oracle(), tags=("trend", "A11"))
def periodogram_daily_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import periodogram

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            (F.date_format("ts", "dd").cast("long") - 1).alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("v"))
    )
    return periodogram(daily, ["event_type"], "t", "v", _PERIODOGRAM_PERIODS)


# ---------------------------------------------------------------------------
# Case variants (operators/windows.py::case_variants): which 5-step user
# journeys dominate the event log? The trace-level rollup above
# ef_event_process_matrix (case = user, activity = event_type,
# microsecond order with event_id tie-break).
# ---------------------------------------------------------------------------

_VARIANTS_ORACLE = """
WITH base AS (
  SELECT user_id AS c, event_type AS act, epoch_us(ts) AS us,
         CAST(event_id AS VARCHAR) AS tb
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), ranked AS (
  SELECT c, act, us, tb,
    row_number() OVER (PARTITION BY c ORDER BY us ASC, tb ASC) AS rn
  FROM base
), per_case AS (
  SELECT c, string_agg(act, '>' ORDER BY us ASC, tb ASC) AS variant
  FROM ranked WHERE rn <= 5 GROUP BY c
), g AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_cases FROM per_case GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n_cases) OVER () AS BIGINT) AS tot FROM g
)
SELECT variant, n_cases,
  round(CAST(n_cases AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
  CAST(row_number() OVER (ORDER BY n_cases DESC, variant ASC) AS BIGINT) AS rank
FROM t
"""


@register("variants_user_journeys", oracle=_VARIANTS_ORACLE, tags=("sequence", "process"))
def variants_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import case_variants

    ev = load_table(spark, sf_dir, "events")
    return case_variants(
        ev, "user_id", "event_type", "ts", "event_id", max_steps=5
    )


# ---------------------------------------------------------------------------
# Cycle-time profile (operators/windows.py::case_cycle_profile): how long
# is a user's whole journey, grouped by how it STARTED? Exact-µs
# durations; first event elected by (time, event_id).
# ---------------------------------------------------------------------------

_CYCLE_ORACLE = """
WITH base AS (
  SELECT user_id AS c, event_type AS act, epoch_us(ts) AS us,
         CAST(event_id AS VARCHAR) AS tb
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), firsts AS (
  SELECT c, act AS first_activity FROM (
    SELECT c, act, row_number() OVER (PARTITION BY c ORDER BY us ASC, tb ASC) AS rn
    FROM base
  ) WHERE rn = 1
), spans AS (
  SELECT c, min(us) AS lo, max(us) AS hi FROM base GROUP BY c
), per_case AS (
  SELECT f.first_activity, s.hi - s.lo AS dur
  FROM firsts f JOIN spans s ON s.c = f.c
), g AS (
  SELECT first_activity, CAST(count(*) AS BIGINT) AS n_cases,
    sum(CAST(dur AS DECIMAL(24,0))) AS sd, min(dur) AS mn, max(dur) AS mx
  FROM per_case GROUP BY 1
)
SELECT first_activity, n_cases,
  round(CAST(sd AS DOUBLE) / CAST(n_cases AS DOUBLE) / 1000000.0, 6) AS mean_duration_s,
  round(CAST(mn AS DOUBLE) / 1000000.0, 6) AS min_duration_s,
  round(CAST(mx AS DOUBLE) / 1000000.0, 6) AS max_duration_s
FROM g
"""


@register("cycle_time_by_entry_event", oracle=_CYCLE_ORACLE, tags=("sequence", "process"))
def cycle_time_by_entry_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import case_cycle_profile

    ev = load_table(spark, sf_dir, "events")
    return case_cycle_profile(ev, "user_id", "event_type", "ts", "event_id")


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence (quality/monitors.py::js_divergence): how far
# did the event-type mix move from the first half of January to the
# second, on the absolute [0,1]-bit scale? The effect-size companion to
# dq_chi_squared_event_mix over the same split.
# ---------------------------------------------------------------------------

_JSD_ORACLE = """
WITH cells AS (
  SELECT c, CAST(sum(ra) AS BIGINT) AS a, CAST(sum(rb) AS BIGINT) AS b FROM (
    SELECT coalesce(event_type, '__null__') AS c, 1 AS ra, 0 AS rb FROM events
    WHERE CAST(strftime(ts, '%d') AS INT) <= 15
    UNION ALL
    SELECT coalesce(event_type, '__null__') AS c, 0 AS ra, 1 AS rb FROM events
    WHERE CAST(strftime(ts, '%d') AS INT) > 15
  ) GROUP BY 1
), t AS (
  SELECT *, CAST(sum(a) OVER () AS BIGINT) AS na, CAST(sum(b) OVER () AS BIGINT) AS nb
  FROM cells
), terms AS (
  SELECT na, nb,
    CASE WHEN a > 0 THEN CAST(round((CAST(a AS DOUBLE) / CAST(na AS DOUBLE))
      * ln((CAST(a AS DOUBLE) / CAST(na AS DOUBLE))
           / ((CAST(a AS DOUBLE) / CAST(na AS DOUBLE) + CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0)), 9)
      AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END AS tp,
    CASE WHEN b > 0 THEN CAST(round((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))
      * ln((CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))
           / ((CAST(a AS DOUBLE) / CAST(na AS DOUBLE) + CAST(b AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0)), 9)
      AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END AS tq
  FROM t
), agg AS (
  SELECT CAST(max(na) AS BIGINT) AS n_ref, CAST(max(nb) AS BIGINT) AS n_cur,
         CAST(count(*) AS BIGINT) AS n_categories,
         sum(tp) AS stp, sum(tq) AS stq
  FROM terms
)
SELECT n_ref, n_cur, n_categories,
  round((CAST(stp AS DOUBLE) + CAST(stq AS DOUBLE)) / 2.0, 6) AS jsd_nats,
  round(((CAST(stp AS DOUBLE) + CAST(stq AS DOUBLE)) / 2.0) / ln(2.0), 6) AS jsd_bits,
  CASE WHEN n_ref = 0 OR n_cur = 0 THEN 'no_reference'
       WHEN ((CAST(stp AS DOUBLE) + CAST(stq AS DOUBLE)) / 2.0) / ln(2.0) < 0.05 THEN 'stable'
       WHEN ((CAST(stp AS DOUBLE) + CAST(stq AS DOUBLE)) / 2.0) / ln(2.0) < 0.2 THEN 'moderate_shift'
       ELSE 'major_shift' END AS status
FROM agg
"""


@register("jsd_event_mix_halves", oracle=_JSD_ORACLE, tags=("DQ", "drift"))
def jsd_event_mix_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import js_divergence

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format("ts", "dd").cast("int").alias("_d")
    )
    ref = ev.filter(F.col("_d") <= 15)
    cur = ev.filter(F.col("_d") > 15)
    return js_divergence(ref, cur, "event_type")


# ---------------------------------------------------------------------------
# Theil index (quality/monitors.py::theil_index): customer-spend
# inequality decomposed between vs within nations — the decomposition
# gini_revenue_by_nation can't produce. Whole-dollar spend keeps every
# sum exact.
# ---------------------------------------------------------------------------

_THEIL_ORACLE = """
WITH spend AS (
  SELECT n.n_name AS g,
         CAST(sum(CAST(round(o.o_totalprice, 0) AS DECIMAL(18,0))) AS DECIMAL(24,6)) AS v
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, o.o_custkey
), base AS (
  SELECT coalesce(g, '__null__') AS g, v FROM spend WHERE v > 0
), excluded AS (
  SELECT CAST(count(*) AS BIGINT) AS n_excluded FROM spend WHERE v IS NULL OR v <= 0
), totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(v) AS s FROM base
), unit AS (
  SELECT CAST(sum(CAST(round((CAST(b.v AS DOUBLE) / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
    * ln(CAST(b.v AS DOUBLE) / (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))), 9) AS DECIMAL(28,9)))
    AS DOUBLE) AS tt
  FROM base b CROSS JOIN totals t
), grp AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng, sum(v) AS sg FROM base GROUP BY 1
), btier AS (
  SELECT CAST(count(*) AS BIGINT) AS k_groups,
    CAST(sum(CASE WHEN sg > 0 THEN CAST(round((CAST(sg AS DOUBLE) / CAST(t.s AS DOUBLE))
      * ln((CAST(sg AS DOUBLE) / CAST(t.s AS DOUBLE)) / (CAST(ng AS DOUBLE) / CAST(t.n AS DOUBLE))), 9)
      AS DECIMAL(28,9)) ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE) AS tb
  FROM grp CROSS JOIN totals t GROUP BY t.n, t.s
)
SELECT t.n, e.n_excluded, b.k_groups,
  round(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS mean,
  round(u.tt / CAST(t.n AS DOUBLE), 6) AS theil_total,
  round(b.tb, 6) AS theil_between,
  round(u.tt / CAST(t.n AS DOUBLE) - b.tb, 6) AS theil_within
FROM totals t CROSS JOIN excluded e CROSS JOIN unit u CROSS JOIN btier b
"""


@register("theil_spend_by_nation", oracle=_THEIL_ORACLE, tags=("DQ", "A11"))
def theil_spend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import theil_index

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.round("o_totalprice", 0).cast("decimal(18,0)"))
            .cast("decimal(24,6)")
            .alias("v")
        )
        .select(F.col("n_name").alias("g"), "v")
    )
    return theil_index(spend, "g", "v")


# ---------------------------------------------------------------------------
# Cohen's kappa + per-class report (quality/monitors.py::cohens_kappa,
# operators/features.py::classification_report): grade the deep-discount
# return rule (discount ≥ 0.06 → predict 'R' else 'N') against the actual
# return flag — κ for chance-corrected agreement, the report for
# per-class precision/recall/F1.
# ---------------------------------------------------------------------------

_RULE_BASE_SQL = """
  SELECT CASE WHEN l_discount >= 0.06 THEN 'R' ELSE 'N' END AS pred,
         l_returnflag AS y
  FROM lineitem
"""

_KAPPA_ORACLE = f"""
WITH fixture AS ({_RULE_BASE_SQL}),
base AS (
  SELECT coalesce(pred, '__null__') AS a, coalesce(y, '__null__') AS b FROM fixture
), cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(count(DISTINCT a) AS BIGINT) AS k_a,
         CAST(count(DISTINCT b) AS BIGINT) AS k_b,
         CAST(sum(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS agree
  FROM cells
), ma AS (SELECT a AS lbl, CAST(sum(n) AS BIGINT) AS ca FROM cells GROUP BY 1),
mb AS (SELECT b AS lbl, CAST(sum(n) AS BIGINT) AS cb FROM cells GROUP BY 1),
pe AS (
  SELECT sum(CAST(round((CAST(ca AS DOUBLE) / CAST(t.n AS DOUBLE))
       * (CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS pe
  FROM ma JOIN mb ON ma.lbl = mb.lbl CROSS JOIN tot t GROUP BY t.n
)
SELECT t.n, t.k_a, t.k_b,
  round(CAST(t.agree AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS po,
  round(coalesce(CAST(p.pe AS DOUBLE), 0.0), 6) AS pe,
  CASE WHEN coalesce(CAST(p.pe AS DOUBLE), 0.0) < 1.0
       THEN round((CAST(t.agree AS DOUBLE) / CAST(t.n AS DOUBLE) - coalesce(CAST(p.pe AS DOUBLE), 0.0))
            / (1.0 - coalesce(CAST(p.pe AS DOUBLE), 0.0)), 6) END AS kappa
FROM tot t CROSS JOIN pe p
"""


def _rule_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_discount") >= 0.06, "R").otherwise("N").alias("pred"),
        F.col("l_returnflag").alias("y"),
    )


@register("kappa_discount_rule_vs_returns", oracle=_KAPPA_ORACLE, tags=("eval", "DQ"))
def kappa_discount_rule_vs_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import cohens_kappa

    return cohens_kappa(_rule_base(spark, sf_dir), "pred", "y")


_REPORT_ORACLE = f"""
WITH fixture AS ({_RULE_BASE_SQL}),
base AS (
  SELECT coalesce(pred, '__null__') AS p, coalesce(y, '__null__') AS y FROM fixture
), cells AS (
  SELECT p, y, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1, 2
), pm AS (SELECT p AS class, CAST(sum(n) AS BIGINT) AS np FROM cells GROUP BY 1),
lm AS (SELECT y AS class, CAST(sum(n) AS BIGINT) AS ny FROM cells GROUP BY 1),
dg AS (SELECT p AS class, n AS tp FROM cells WHERE p = y),
rep AS (
  SELECT coalesce(pm.class, lm.class) AS class,
    CAST(coalesce(ny, 0) AS BIGINT) AS support,
    CAST(coalesce(tp, 0) AS BIGINT) AS tp,
    CAST(coalesce(np, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
    CAST(coalesce(ny, 0) - coalesce(tp, 0) AS BIGINT) AS fn
  FROM pm FULL OUTER JOIN lm ON pm.class = lm.class
  LEFT JOIN dg ON dg.class = coalesce(pm.class, lm.class)
)
SELECT class, support, tp, fp, fn,
  round(CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6) AS precision,
  round(CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6) AS recall,
  CASE WHEN tp + fp > 0 AND tp + fn > 0
        AND CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) > 0
       THEN round(2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
            * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
            / (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
               + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)), 6) END AS f1
FROM rep
"""


@register("report_discount_rule_vs_returns", oracle=_REPORT_ORACLE, tags=("eval",))
def report_discount_rule_vs_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import classification_report

    return classification_report(_rule_base(spark, sf_dir), "pred", "y")


# ---------------------------------------------------------------------------
# Nearest-tower assignment (operators/spatial.py::nearest_assignment):
# synthesize event positions over the continental-US box, assign each to
# its serving tower from the CSV seed (broadcast dimension argmin), and
# roll up load per tower — the coverage-map join the reference's
# fraud/geo tier implies but never materializes.
# ---------------------------------------------------------------------------


def _nearest_oracle() -> str:
    from .advanced import SEED_PATH

    return f"""
WITH pts AS (
  SELECT event_id AS id,
         30.0 + (event_id % 1800) / 100.0 AS lat,
         -123.0 + ((event_id * 31) % 4800) / 100.0 AS lon
  FROM events
), sites AS (
  SELECT tower_id, CAST(latitude AS DOUBLE) AS lat, CAST(longitude AS DOUBLE) AS lon
  FROM read_csv('{SEED_PATH}', header=true, columns={{
    'tower_id': 'VARCHAR', 'city': 'VARCHAR', 'state': 'VARCHAR',
    'latitude': 'DECIMAL(9,6)', 'longitude': 'DECIMAL(9,6)',
    'tower_type': 'VARCHAR', 'capacity_erlangs': 'INTEGER', 'is_active': 'BOOLEAN'
  }})
), d AS (
  SELECT p.id, s.tower_id,
    round(2 * 6371.0 * asin(sqrt(
       sin(radians(s.lat - p.lat) / 2) * sin(radians(s.lat - p.lat) / 2)
       + cos(radians(p.lat)) * cos(radians(s.lat))
         * sin(radians(s.lon - p.lon) / 2) * sin(radians(s.lon - p.lon) / 2)
    )), 6) AS distance_km
  FROM pts p CROSS JOIN sites s
), best AS (
  SELECT id, tower_id, distance_km FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY distance_km ASC, tower_id ASC) AS rn
    FROM d
  ) WHERE rn = 1
)
SELECT tower_id, CAST(count(*) AS BIGINT) AS n_points,
  round(CAST(sum(CAST(distance_km AS DECIMAL(14,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS mean_km,
  round(max(distance_km), 6) AS max_km
FROM best GROUP BY 1
"""


@register("nearest_tower_load", oracle=_nearest_oracle(), tags=("geo", "J1"))
def nearest_tower_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import nearest_assignment
    from .advanced import SEED_PATH, TOWER_SEED_SCHEMA

    pts = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        (F.lit(30.0) + (F.col("event_id") % 1800) / F.lit(100.0)).alias("lat"),
        (F.lit(-123.0) + ((F.col("event_id") * 31) % 4800) / F.lit(100.0)).alias("lon"),
    )
    towers = (
        spark.read.option("header", True)
        .schema(TOWER_SEED_SCHEMA)
        .csv(SEED_PATH)
        .select(
            "tower_id",
            F.col("latitude").cast("double").alias("lat"),
            F.col("longitude").cast("double").alias("lon"),
        )
    )
    assigned = nearest_assignment(pts, towers, point_id_col="id", site_id_col="tower_id")
    return assigned.groupBy(F.col("site_id").alias("tower_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(
            F.sum(F.col("distance_km").cast("decimal(14,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_km"),
        F.round(F.max("distance_km"), 6).alias("max_km"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg over the Pettitt alerts (quality/monitors.py::
# bh_adjust ∘ operators/trend.py::pettitt_test): the per-type change-point
# p-values corrected as a FAMILY — the composed monitor-of-monitors, both
# stages through the value gate.
# ---------------------------------------------------------------------------

_BH_PETTITT_ORACLE = f"""
WITH pett AS ({_PETTITT_ORACLE}),
base AS (
  SELECT event_type AS test, CAST(p_value AS DOUBLE) AS p FROM pett
  WHERE p_value IS NOT NULL
), ranked AS (
  SELECT test, p,
    CAST(row_number() OVER (ORDER BY p ASC, test ASC) AS BIGINT) AS rank,
    CAST(count(*) OVER () AS BIGINT) AS m
  FROM base
), q AS (
  SELECT test, p, rank,
    least(1.0, min(round(p * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE), 9))
      OVER (ORDER BY rank DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS qv
  FROM ranked
)
SELECT test, round(p, 6) AS p_value, rank, round(qv, 6) AS q_value,
       round(qv, 6) <= 0.1 AS reject
FROM q
"""


@register("bh_fdr_pettitt_alerts", oracle=_BH_PETTITT_ORACLE, tags=("DQ", "A11"))
def bh_fdr_pettitt_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import pettitt_test
    from ..quality.monitors import bh_adjust

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_format("ts", "dd").cast("long").alias("t"),
        )
        .agg(F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("v"))
    )
    alerts = pettitt_test(daily, ["event_type"], "t", "v")
    return bh_adjust(alerts, "event_type", "p_value", alpha=0.1)


# ---------------------------------------------------------------------------
# Stratified allocation (llmprep/sampling.py::stratified_allocation):
# design a 1000-row event sample across event types — proportional vs
# Neyman (variance-optimal) side by side, largest-remainder exact totals.
# ---------------------------------------------------------------------------

_ALLOC_ORACLE = """
WITH cells AS (
  SELECT coalesce(event_type, '__null__') AS stratum,
         CAST(count(*) AS BIGINT) AS n_pop,
         CAST(count(round(value, 2)) AS BIGINT) AS nv,
         sum(CAST(round(value, 2) AS DECIMAL(24,6))) AS sv,
         sum(CAST(round(value, 2) AS DECIMAL(24,6)) * CAST(round(value, 2) AS DECIMAL(24,6))) AS ssv
  FROM events GROUP BY 1
), d AS (
  SELECT stratum, n_pop,
    round(CASE WHEN nv > 1 THEN sqrt(greatest(0.0,
      (CAST(ssv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(nv AS DOUBLE))
      / (CAST(nv AS DOUBLE) - 1.0))) ELSE 0.0 END, 9) AS sd
  FROM cells
), t AS (
  SELECT *, CAST(sum(n_pop) OVER () AS BIGINT) AS tot,
    sum(CAST(round(CAST(n_pop AS DOUBLE) * sd, 9) AS DECIMAL(28,9))) OVER () AS wsum
  FROM d
), quotas AS (
  SELECT stratum, n_pop, sd,
    1000.0 * CAST(n_pop AS DOUBLE) / CAST(tot AS DOUBLE) AS qp,
    CASE WHEN CAST(wsum AS DOUBLE) > 0
         THEN 1000.0 * round(CAST(n_pop AS DOUBLE) * sd, 9) / CAST(wsum AS DOUBLE)
         ELSE 1000.0 * CAST(n_pop AS DOUBLE) / CAST(tot AS DOUBLE) END AS qn
  FROM t
), fl AS (
  SELECT *, CAST(floor(qp) AS BIGINT) AS bp, CAST(floor(qn) AS BIGINT) AS bn,
    CAST(sum(CAST(floor(qp) AS BIGINT)) OVER () AS BIGINT) AS sbp,
    CAST(sum(CAST(floor(qn) AS BIGINT)) OVER () AS BIGINT) AS sbn,
    CAST(row_number() OVER (ORDER BY round(qp - floor(qp), 9) DESC, stratum ASC) AS BIGINT) AS rp,
    CAST(row_number() OVER (ORDER BY round(qn - floor(qn), 9) DESC, stratum ASC) AS BIGINT) AS rn
  FROM quotas
)
SELECT stratum, n_pop, round(sd, 6) AS sd,
  CAST(bp + CASE WHEN rp <= 1000.0 - sbp THEN 1 ELSE 0 END AS BIGINT) AS alloc_proportional,
  CAST(bn + CASE WHEN rn <= 1000.0 - sbn THEN 1 ELSE 0 END AS BIGINT) AS alloc_neyman
FROM fl
"""


@register("stratified_alloc_event_sample", oracle=_ALLOC_ORACLE, tags=("LLM", "sampling"))
def stratified_alloc_event_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.sampling import stratified_allocation

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round("value", 2).cast("double").alias("v")
    )
    return stratified_allocation(ev, "event_type", "v", total_n=1000)


# ---------------------------------------------------------------------------
# Forecast errors (operators/trend.py::forecast_errors): grade the
# seasonal-naive baseline (today = same weekday last week) on each event
# type's daily values — the MASE scorecard that any real forecaster must
# beat. Complete-case join on day−7 keeps missing cells out of the score.
# ---------------------------------------------------------------------------

_MASE_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, CAST(strftime(ts, '%d') AS BIGINT) AS t,
         CAST(sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS DECIMAL(24,6)) AS v
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT a.k, a.t, a.v AS a, f.v AS f
  FROM daily a JOIN daily f ON f.k = a.k AND f.t = a.t - 7
), lagged AS (
  SELECT *, lag(a) OVER (PARTITION BY k ORDER BY t ASC) AS prev FROM paired
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_actual,
    sum(abs(a - f)) AS sae, sum((a - f) * (a - f)) AS sse,
    sum(CASE WHEN a <> 0 THEN CAST(round(abs(CAST(a AS DOUBLE) - CAST(f AS DOUBLE)) / abs(CAST(a AS DOUBLE)), 9) AS DECIMAL(28,9)) END) AS smap,
    CAST(count(CASE WHEN a <> 0 THEN 1 END) AS BIGINT) AS nmape,
    sum(CASE WHEN abs(CAST(a AS DOUBLE)) + abs(CAST(f AS DOUBLE)) > 0
        THEN CAST(round(2.0 * abs(CAST(a AS DOUBLE) - CAST(f AS DOUBLE))
             / (abs(CAST(a AS DOUBLE)) + abs(CAST(f AS DOUBLE))), 9) AS DECIMAL(28,9)) END) AS ssm,
    CAST(count(CASE WHEN abs(CAST(a AS DOUBLE)) + abs(CAST(f AS DOUBLE)) > 0 THEN 1 END) AS BIGINT) AS nsm,
    sum(CASE WHEN prev IS NOT NULL THEN abs(a - prev) END) AS snaive,
    CAST(count(CASE WHEN prev IS NOT NULL THEN 1 END) AS BIGINT) AS nnaive
  FROM lagged GROUP BY 1
)
SELECT k AS event_type, n, n_zero_actual,
  round(CAST(sae AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mae,
  round(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS rmse,
  round(CASE WHEN nmape > 0 THEN CAST(smap AS DOUBLE) / CAST(nmape AS DOUBLE) END, 6) AS mape,
  round(CASE WHEN nsm > 0 THEN CAST(ssm AS DOUBLE) / CAST(nsm AS DOUBLE) END, 6) AS smape,
  CASE WHEN nnaive > 0 AND CAST(snaive AS DOUBLE) / CAST(nnaive AS DOUBLE) > 0
       THEN round((CAST(sae AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(snaive AS DOUBLE) / CAST(nnaive AS DOUBLE)), 6) END AS mase
FROM agg
"""


@register("mase_naive7_event_values", oracle=_MASE_ORACLE, tags=("trend", "eval"))
def mase_naive7_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import forecast_errors

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("k"),
            F.date_format("ts", "dd").cast("long").alias("t"),
        )
        .agg(
            F.sum(F.round("value", 2).cast("decimal(14,2)"))
            .cast("decimal(24,6)")
            .alias("v")
        )
        .transform(lineage_cut)
    )
    fc = daily.select(
        F.col("k").alias("fk"), (F.col("t") + 7).alias("ft"), F.col("v").alias("f")
    )
    paired = daily.join(
        fc, (F.col("k") == F.col("fk")) & (F.col("t") == F.col("ft"))
    ).select("k", "t", F.col("v").alias("a"), "f")
    out = forecast_errors(paired, ["k"], "t", "a", "f")
    return out.withColumnRenamed("k", "event_type")


# ---------------------------------------------------------------------------
# Kendall τ-b (quality/monitors.py::kendall_tau): per event type, do
# days with more events also carry more value? Daily grain keeps the
# O(T²/2) pair join at ~30 steps per key; counts and DECIMAL sums keep
# every comparison exact.
# ---------------------------------------------------------------------------

_TAU_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, strftime(ts, '%d') AS d,
         CAST(count(*) AS BIGINT) AS x,
         sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS y
  FROM events GROUP BY 1, 2
), base AS (
  SELECT k, x, y, row_number() OVER (ORDER BY k, d) AS rid
  FROM daily WHERE x IS NOT NULL AND y IS NOT NULL
), pairs AS (
  SELECT b.k,
    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sx,
    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sy
  FROM base b JOIN base a ON a.k = b.k AND a.rid < b.rid
), agg AS (
  SELECT k,
    CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
    CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
    CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
    CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
    CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS txy
  FROM pairs GROUP BY 1
), counts AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1
)
SELECT a.k AS event_type, c.n, a.concordant, a.discordant,
  CASE WHEN CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.tx + a.txy AS DOUBLE) > 0
        AND CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.ty + a.txy AS DOUBLE) > 0
       THEN round((CAST(a.concordant AS DOUBLE) - CAST(a.discordant AS DOUBLE))
            / sqrt((CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.tx + a.txy AS DOUBLE))
                   * (CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.ty + a.txy AS DOUBLE))), 6)
  END AS tau_b
FROM agg a JOIN counts c ON c.k = a.k
"""


@register("kendall_daily_volume_vs_value", oracle=_TAU_ORACLE, tags=("A11", "DQ"))
def kendall_daily_volume_vs_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import kendall_tau

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"),
            F.date_format("ts", "dd").alias("d"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("y"),
        )
    )
    out = kendall_tau(daily, "x", "y", ["event_type"])
    return out


# ---------------------------------------------------------------------------
# Quantile normalization (operators/features.py::quantile_normalize):
# map each market segment's account-balance distribution onto the pooled
# customer distribution — the cross-source calibration step before any
# segment-blind scoring. Integer order-statistic election, engine-exact.
# ---------------------------------------------------------------------------

_QNORM_ORACLE = """
WITH base AS (
  SELECT c_mktsegment AS grp, c_custkey AS tb, CAST(c_acctbal AS DOUBLE) AS v
  FROM customer WHERE c_acctbal IS NOT NULL
), ranked AS (
  SELECT grp, tb, v,
    CAST(row_number() OVER (PARTITION BY grp ORDER BY v ASC, tb ASC) AS BIGINT) AS r,
    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS ng
  FROM base
), pooled AS (
  SELECT CAST(row_number() OVER (ORDER BY v ASC, tb ASC) AS BIGINT) AS idx, v AS pv
  FROM base
), nt AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM base)
SELECT ranked.grp AS "group", ranked.tb AS tiebreak, ranked.v AS value,
  round(CAST(r AS DOUBLE) / CAST(ng AS DOUBLE), 6) AS quantile_frac,
  pooled.pv AS normalized
FROM ranked CROSS JOIN nt
JOIN pooled ON pooled.idx = (r * nn + ng - 1) // ng
"""


@register("qnorm_acctbal_across_segments", oracle=_QNORM_ORACLE, tags=("feature", "DQ"))
def qnorm_acctbal_across_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import quantile_normalize

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )
    return quantile_normalize(cust, "c_mktsegment", "c_acctbal", "c_custkey")


# ---------------------------------------------------------------------------
# HHI concentration (quality/monitors.py::hhi_concentration): how
# concentrated is each nation's order revenue across its customers? The
# regulator's number next to gini_revenue_by_nation and
# theil_spend_by_nation — three concentration lenses over one fixture.
# ---------------------------------------------------------------------------

_HHI_ORACLE = """
WITH spend AS (
  SELECT n.n_name AS k, CAST(o.o_custkey AS VARCHAR) AS g,
         sum(CAST(round(o.o_totalprice, 0) AS DECIMAL(18,0))) AS raw
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
), cells AS (
  SELECT k, g, sum(CAST(raw AS DECIMAL(24,6))) AS s FROM spend
  WHERE raw IS NOT NULL AND CAST(raw AS DECIMAL(24,6)) >= 0 GROUP BY 1, 2
), t AS (
  SELECT *, sum(s) OVER (PARTITION BY k) AS tot FROM cells
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
    sum(CASE WHEN tot > 0 THEN CAST(round((CAST(s AS DOUBLE) / CAST(tot AS DOUBLE))
        * (CAST(s AS DOUBLE) / CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS ss
  FROM t GROUP BY 1
)
SELECT k AS n_name, n_groups,
  round(CAST(ss AS DOUBLE) * 10000.0, 2) AS hhi,
  CASE WHEN CAST(ss AS DOUBLE) > 0 THEN round(1.0 / CAST(ss AS DOUBLE), 4) END AS effective_n,
  CASE WHEN round(CAST(ss AS DOUBLE) * 10000.0, 2) < 1500 THEN 'unconcentrated'
       WHEN round(CAST(ss AS DOUBLE) * 10000.0, 2) <= 2500 THEN 'moderate'
       ELSE 'concentrated' END AS verdict
FROM agg
"""


@register("hhi_revenue_by_nation", oracle=_HHI_ORACLE, tags=("DQ", "A11"))
def hhi_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import hhi_concentration

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .groupBy("n_name", "o_custkey")
        .agg(
            F.sum(F.round("o_totalprice", 0).cast("decimal(18,0)")).alias("raw")
        )
        .select(
            F.col("n_name"),
            F.col("o_custkey").cast("string").alias("g"),
            F.col("raw").cast("double").alias("v"),
        )
    )
    return hhi_concentration(spend, "g", "v", ["n_name"])


# ---------------------------------------------------------------------------
# Vocabulary richness (llmprep/text.py::vocab_richness): the one-row
# lexical health check over the documents corpus — TTR and hapax share
# are the fastest boilerplate/OCR-noise alarms a curation pipeline has.
# ---------------------------------------------------------------------------

_RICHNESS_ORACLE = """
WITH ex AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents
), counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM ex WHERE tok <> '' GROUP BY 1
), fof AS (
  SELECT c, CAST(count(*) AS BIGINT) AS v FROM counts GROUP BY 1
), agg AS (
  SELECT CAST(sum(c * v) AS BIGINT) AS n_tokens, CAST(sum(v) AS BIGINT) AS vocab_size,
    CAST(sum(CASE WHEN c = 1 THEN v ELSE 0 END) AS BIGINT) AS hapax_count,
    CAST(sum(CASE WHEN c = 2 THEN v ELSE 0 END) AS BIGINT) AS dis_count
  FROM fof
)
SELECT n_tokens, vocab_size,
  CASE WHEN n_tokens > 0 THEN round(CAST(vocab_size AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) END AS ttr,
  hapax_count, dis_count,
  CASE WHEN vocab_size > 0 THEN round(CAST(hapax_count AS DOUBLE) / CAST(vocab_size AS DOUBLE), 6) END AS hapax_share
FROM agg
"""


@register("vocab_richness_profile", oracle=_RICHNESS_ORACLE, tags=("LLM", "text"))
def vocab_richness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.text import vocab_richness

    return vocab_richness(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Conversion-latency profile: per user, time from FIRST view to the first
# purchase strictly after it; exact rank-elected quartiles over the
# converted-user grain (the funnel tier's "how fast", next to
# sequence_funnel_purchase's "how many"). Pure composition of the window
# discipline — µs-exact integers end to end.
# ---------------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH firsts AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view
  FROM events GROUP BY 1
), conv AS (
  SELECT e.user_id, f.first_view,
    min(epoch_us(e.ts)) AS first_purchase
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND f.first_view IS NOT NULL
    AND epoch_us(e.ts) > f.first_view
  GROUP BY 1, 2
), lat AS (
  SELECT user_id, first_purchase - first_view AS us,
    CAST(row_number() OVER (ORDER BY first_purchase - first_view ASC, user_id ASC) AS BIGINT) AS r,
    CAST(count(*) OVER () AS BIGINT) AS n
  FROM conv
)
SELECT CAST(max(n) AS BIGINT) AS n_converted,
  round(CAST(sum(CAST(us AS DECIMAL(24,0))) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 1000000.0, 6) AS mean_s,
  round(CAST(max(CASE WHEN r = CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) THEN us END) AS DOUBLE) / 1000000.0, 6) AS p50_s,
  round(CAST(max(CASE WHEN r = CAST(ceil(CAST(n AS DOUBLE) * 0.9) AS BIGINT) THEN us END) AS DOUBLE) / 1000000.0, 6) AS p90_s,
  round(CAST(max(us) AS DOUBLE) / 1000000.0, 6) AS max_s
FROM lat
"""


@register("conversion_latency_profile", oracle=_CONV_LATENCY_ORACLE, tags=("sequence", "W3"))
def conversion_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias("first_view")
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("first_view").isNotNull() & (F.col("us") > F.col("first_view")))
        .groupBy("user_id", "first_view")
        .agg(F.min("us").alias("first_purchase"))
    )
    w = Window.orderBy(F.col("lat_us").asc(), F.col("user_id").asc())
    wall = Window.partitionBy()
    lat = conv.select(
        "user_id",
        (F.col("first_purchase") - F.col("first_view")).alias("lat_us"),
    ).withColumn("r", F.row_number().over(w).cast("long")).withColumn(
        "n", F.count(F.lit(1)).over(wall).cast("long")
    )
    nd = F.col("n").cast("double")
    p50_rank = F.ceil(nd * F.lit(0.5)).cast("long")
    p90_rank = F.ceil(nd * F.lit(0.9)).cast("long")
    return lat.groupBy().agg(
        F.max("n").cast("long").alias("n_converted"),
        F.round(
            F.sum(F.col("lat_us").cast("decimal(24,0)")).cast("double")
            / F.max("n").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean_s"),
        F.round(
            F.max(F.when(F.col("r") == p50_rank, F.col("lat_us"))).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("p50_s"),
        F.round(
            F.max(F.when(F.col("r") == p90_rank, F.col("lat_us"))).cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("p90_s"),
        F.round(F.max("lat_us").cast("double") / F.lit(1000000.0), 6).alias("max_s"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (quality/monitors.py::two_proportion_test): do
# journeys that START with a view convert to purchase at a different
# rate than journeys that start with a click? The rate companion to the
# Welch mean test, over the entry-activity framing of
# cycle_time_by_entry_event.
# ---------------------------------------------------------------------------

_ZPROP_ORACLE = """
WITH per_user AS (
  SELECT user_id,
    (SELECT e2.event_type FROM events e2 WHERE e2.user_id = e.user_id
     ORDER BY epoch_us(e2.ts) ASC, CAST(e2.event_id AS VARCHAR) ASC LIMIT 1) AS first_act,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events e GROUP BY user_id
), base AS (
  SELECT CASE WHEN first_act = 'view' THEN 1 ELSE 0 END AS a,
         CASE WHEN first_act = 'click' THEN 1 ELSE 0 END AS b,
         converted AS y
  FROM per_user WHERE first_act IN ('view', 'click') AND converted IS NOT NULL
), agg AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(b) AS BIGINT) AS n_b,
         CAST(sum(a * y) AS BIGINT) AS sa, CAST(sum(b * y) AS BIGINT) AS sb
  FROM base
), d AS (
  SELECT n_a, n_b, CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
         CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd
  FROM agg
)
SELECT n_a, n_b,
  round(CASE WHEN n_a > 0 THEN sad / nad END, 6) AS rate_a,
  round(CASE WHEN n_b > 0 THEN sbd / nbd END, 6) AS rate_b,
  round(CASE WHEN n_a > 0 AND n_b > 0 THEN sad / nad - sbd / nbd END, 6) AS diff,
  round(CASE WHEN n_a > 0 AND n_b > 0 THEN 1.959963984540054 * sqrt((sad / nad) * (1.0 - sad / nad) / nad
        + (sbd / nbd) * (1.0 - sbd / nbd) / nbd) END, 6) AS ci95_halfwidth,
  CASE WHEN n_a > 0 AND n_b > 0
        AND sqrt(((sad + sbd) / (nad + nbd)) * (1.0 - (sad + sbd) / (nad + nbd))
                 * (1.0 / nad + 1.0 / nbd)) > 0
       THEN round((sad / nad - sbd / nbd)
            / sqrt(((sad + sbd) / (nad + nbd)) * (1.0 - (sad + sbd) / (nad + nbd))
                   * (1.0 / nad + 1.0 / nbd)), 6) END AS z_stat
FROM d
"""


@register("zprop_entry_view_vs_click", oracle=_ZPROP_ORACLE, tags=("A11", "eval"))
def zprop_entry_view_vs_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import two_proportion_test

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("string").alias("tb"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.struct("us", "tb", "event_type")).alias("_first"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    ).select(
        F.col("_first.event_type").alias("first_act"), "converted"
    )
    return two_proportion_test(per_user, "first_act", "converted", "view", "click")


# ---------------------------------------------------------------------------
# STREAMING Jensen–Shannon drift (streaming/monitors.py::jsd_stream):
# the second-half event mix streams file-by-file against the first-half
# reference; the final keyed-state snapshot must equal the BATCH
# js_divergence on the same two windows — so the oracle is literally the
# batch query's oracle. Stream ≡ batch ≡ DuckDB through one value gate.
# ---------------------------------------------------------------------------


@register("jsd_stream_event_mix", oracle=_JSD_ORACLE, tags=("T2", "stream", "DQ"))
def jsd_stream_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..streaming.monitors import jsd_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.coalesce(F.col("event_type"), F.lit("__null__")).alias("cat"),
        F.date_format("ts", "dd").cast("int").alias("_d"),
    )
    # reference mix: first half of January (bounded collect — category
    # cardinality, the same metadata-sized contract as seed discovery)
    ref_counts = {
        r["cat"]: r["n"]
        for r in ev.filter(F.col("_d") <= 15)
        .groupBy("cat")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    n_ref = int(sum(ref_counts.values()))
    sink = "jsd_stream_event_mix_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="jsd_stream_src_")
    try:
        cur = ev.filter(F.col("_d") > 15).select(
            F.lit("all").alias("key"), "cat", "_d"
        )
        cur.filter(F.col("_d") <= 22).select("key", "cat").coalesce(1).write.parquet(
            os.path.join(staging, "b0")
        )
        cur.filter(F.col("_d") > 22).select("key", "cat").coalesce(1).write.parquet(
            os.path.join(staging, "b1")
        )
        pin_staging_mtimes(staging, 2)  # deterministic trigger order
        stream = (
            spark.readStream.schema("key string, cat string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging + "/b*")
        )
        q = (
            jsd_stream(stream, ref_counts)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    snaps = spark.table(sink)
    return snaps.groupBy("key").agg(
        F.max("n_cur").cast("long").alias("n_cur"),
        F.max_by("n_categories", "n_cur").cast("long").alias("n_categories"),
        F.max_by("jsd_nats", "n_cur").alias("jsd_nats"),
        F.max_by("jsd_bits", "n_cur").alias("jsd_bits"),
        F.max_by("status", "n_cur").alias("status"),
    ).select(
        F.lit(n_ref).cast("long").alias("n_ref"),
        "n_cur",
        "n_categories",
        "jsd_nats",
        "jsd_bits",
        "status",
    )
