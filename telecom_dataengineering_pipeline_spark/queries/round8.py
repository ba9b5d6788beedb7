"""Round-7 session-2 registrations: the operators built this session
promoted straight to oracle-checked driver queries (no tests-only lag) —
categorical drift, privacy audit, entropy, feature encoding, ranking
evaluation, market-basket rules, collocations, retention, mobility,
burstiness, fusion, graph centralities, and the join pre-flight.

Reference parity: these extend the reference's monitoring/campaign tier
(``monitoring/pipeline_observability.py``, ``dbt_project/models/marts``)
with the drift/privacy/eval statistics its BI layer computes downstream,
re-expressed as distributed plans under the registry determinism
conventions (decimal-exact sums, round-then-decimal log/ratio terms, µs
epochs, tie-broken windows, matching column names)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Chi-squared categorical drift (quality/monitors.py::chi_squared_drift):
# did the event-type MIX shift between the first and second half of the
# month? Counts-only shuffle; per-cell terms round-then-decimal.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH ref AS (
  SELECT coalesce(event_type, '__null__') AS cat, CAST(count(*) AS BIGINT) AS n_ref
  FROM events WHERE CAST(strftime(ts, '%d') AS INT) <= 15 GROUP BY 1
), cur AS (
  SELECT coalesce(event_type, '__null__') AS cat, CAST(count(*) AS BIGINT) AS n_cur
  FROM events WHERE CAST(strftime(ts, '%d') AS INT) > 15 GROUP BY 1
), cells AS (
  SELECT coalesce(r.cat, c.cat) AS cat,
         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
  FROM ref r FULL JOIN cur c ON r.cat = c.cat
), t AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM cells),
terms AS (
  SELECT n_ref, n_cur, t_ref, t_cur,
    CAST(round(
      CASE WHEN t_ref * (n_ref + n_cur) > 0 THEN
        pow(n_ref - t_ref * (n_ref + n_cur) / CAST(t_ref + t_cur AS DOUBLE), 2)
          / (t_ref * (n_ref + n_cur) / CAST(t_ref + t_cur AS DOUBLE)) ELSE 0 END
      + CASE WHEN t_cur * (n_ref + n_cur) > 0 THEN
        pow(n_cur - t_cur * (n_ref + n_cur) / CAST(t_ref + t_cur AS DOUBLE), 2)
          / (t_cur * (n_ref + n_cur) / CAST(t_ref + t_cur AS DOUBLE)) ELSE 0 END,
      9) AS DECIMAL(28,9)) AS term
  FROM cells, t
), agg AS (
  SELECT round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
         CAST(count(*) - 1 AS BIGINT) AS dof,
         CAST(any_value(t_ref) AS BIGINT) AS n_ref,
         CAST(any_value(t_cur) AS BIGINT) AS n_cur,
         CAST(count(*) AS BIGINT) AS n_categories
  FROM terms
)
SELECT chi2, dof, n_ref, n_cur, n_categories,
       round(sqrt(chi2 / (n_ref + n_cur)), 6) AS cramers_v,
       CASE WHEN coalesce(n_ref, 0) = 0 OR coalesce(n_cur, 0) = 0 OR dof < 1
              THEN 'no_reference'
            WHEN round(sqrt(chi2 / (n_ref + n_cur)), 6) < 0.1 THEN 'stable'
            WHEN round(sqrt(chi2 / (n_ref + n_cur)), 6) < 0.3 THEN 'moderate_shift'
            ELSE 'major_shift' END AS status
FROM agg
"""


@register("dq_chi_squared_event_mix", oracle=_CHI2_ORACLE, tags=("DQ", "A11"))
def dq_chi_squared_event_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import chi_squared_drift

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_dom", F.date_format("ts", "dd").cast("int")
    )
    return chi_squared_drift(
        ev.filter(F.col("_dom") <= 15),
        ev.filter(F.col("_dom") > 15),
        "event_type",
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (quality/monitors.py::k_anonymity_profile) over the
# customer dim with a deliberately fine quasi-identifier set (nation ×
# segment × acctbal-thousand band) — the release-safety check behind the
# masking tier, on real fixture skew.
# ---------------------------------------------------------------------------

_KANON_ORACLE = """
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, floor(c_acctbal / 1000) AS band,
         CAST(count(*) AS BIGINT) AS sz
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(coalesce(sum(sz), 0) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(sz) AS BIGINT) AS min_class_size,
       CAST(5 AS BIGINT) AS k_threshold,
       CAST(coalesce(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS violating_classes,
       CAST(coalesce(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END), 0) AS BIGINT)
         AS violating_rows,
       CASE WHEN sum(sz) > 0 THEN
         round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) / CAST(sum(sz) AS DOUBLE), 6)
       END AS at_risk_pct,
       (coalesce(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END), 0) = 0) AS is_k_anonymous
FROM classes
"""


@register("pii_k_anonymity_customers", oracle=_KANON_ORACLE, tags=("DQ", "privacy"))
def pii_k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import k_anonymity_profile

    cust = load_table(spark, sf_dir, "customer").withColumn(
        "band", F.floor(F.col("c_acctbal") / 1000)
    )
    return k_anonymity_profile(
        cust, ["c_nationkey", "c_mktsegment", "band"], k=5
    )


# ---------------------------------------------------------------------------
# Entropy profile (quality/monitors.py::entropy_profile): per-day Shannon
# entropy + evenness of the event-type mix — the dispersion monitor over
# the calendar grain (bounded rows at every SF).
# ---------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cells AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, coalesce(event_type, '__null__') AS cat,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), t AS (
  SELECT day, cat, n, CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS tot
  FROM cells
), a AS (
  SELECT day, CAST(any_value(tot) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_categories,
         round(CAST(sum(CAST(round(-(n / CAST(tot AS DOUBLE))
               * ln(n / CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE), 6)
           AS entropy
  FROM t GROUP BY day
)
SELECT day, n_rows, n_categories, entropy,
       CASE WHEN n_categories > 1
            THEN round(entropy / ln(CAST(n_categories AS DOUBLE)), 6) END AS evenness
FROM a
"""


@register("dq_event_type_entropy_daily", oracle=_ENTROPY_ORACLE, tags=("DQ", "A11"))
def dq_event_type_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import entropy_profile

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return entropy_profile(ev, ["day"], "event_type")


# ---------------------------------------------------------------------------
# ECDF normalization (operators/features.py::ecdf_normalize): per-priority
# percentile position of each order's total — tie-safe cume_dist /
# percent_rank, one sort-window exchange.
# ---------------------------------------------------------------------------

_ECDF_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       round(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
         AS ecdf,
       round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice), 6)
         AS pct_rank
FROM orders
"""


@register("ecdf_order_totals_by_priority", oracle=_ECDF_ORACLE, tags=("feature",))
def ecdf_order_totals_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import ecdf_normalize

    orders = load_table(spark, sf_dir, "orders")
    return ecdf_normalize(orders, ["o_orderpriority"], "o_totalprice").select(
        "o_orderkey", "o_orderpriority", "ecdf", "pct_rank"
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (operators/features.py::target_encode_loo):
# encode the customer's market segment against order totals without
# leaking the row's own label; smoothing 10 pseudo-counts toward the
# global mean.
# ---------------------------------------------------------------------------

_TE_ORACLE = """
WITH joined AS (
  SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), g AS (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
           / count(o_totalprice) AS gmean
  FROM joined
), w AS (
  SELECT o_orderkey, c_mktsegment, o_totalprice,
         CAST(sum(CAST(o_totalprice AS DECIMAL(24,6)))
              OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS sy,
         count(o_totalprice) OVER (PARTITION BY c_mktsegment) AS ny
  FROM joined
)
SELECT o_orderkey, c_mktsegment,
       CASE WHEN (ny - CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END) + 10.0 > 0
       THEN round((coalesce(sy, 0) - coalesce(o_totalprice, 0) + 10.0 * g.gmean)
            / ((ny - CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END) + 10.0), 6)
       END AS te_loo
FROM w, g
"""


@register("te_loo_segment_order_totals", oracle=_TE_ORACLE, tags=("feature",))
def te_loo_segment_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import target_encode_loo

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "c_mktsegment", "o_totalprice")
    return target_encode_loo(
        joined, "c_mktsegment", "o_totalprice", smoothing=10.0
    ).select("o_orderkey", "c_mktsegment", "te_loo")


# ---------------------------------------------------------------------------
# Binary AUC (operators/features.py::binary_auc): does the discount level
# predict returned lineitems? Mann-Whitney with tie-averaged ranks —
# heavy ties here (discounts are cents-quantized), exactly the regime the
# integral 2·avg_rank form exists for.
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH base AS (
  SELECT l_linestatus, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         l_discount AS s
  FROM lineitem WHERE l_returnflag IS NOT NULL AND l_discount IS NOT NULL
), r AS (
  SELECT l_linestatus, y,
         CAST(2 * rank() OVER (PARTITION BY l_linestatus ORDER BY s)
              + count(*) OVER (PARTITION BY l_linestatus ORDER BY s
                               RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
              - 1 AS BIGINT) AS r2
  FROM base
), a AS (
  SELECT l_linestatus, CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
         CAST(sum(CASE WHEN y = 1 THEN r2 ELSE 0 END) AS BIGINT) AS s2r
  FROM r GROUP BY 1
)
SELECT l_linestatus, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN round((s2r - CAST(n_pos AS DOUBLE) * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) END AS auc
FROM a
"""


@register("auc_discount_predicts_returns", oracle=_AUC_ORACLE, tags=("eval",))
def auc_discount_predicts_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import binary_auc

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_linestatus",
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
        F.col("l_discount").alias("s"),
    ).filter(F.col("l_returnflag").isNotNull())
    return binary_auc(li, "y", "s", ["l_linestatus"])


# ---------------------------------------------------------------------------
# Join-cardinality pre-flight (operators/joins.py::join_cardinality_estimate):
# forecast |orders ⋈ lineitem| exactly from the two count relations plus
# the top-5 hot keys — the expensive join itself never executes.
# ---------------------------------------------------------------------------

_PREFLIGHT_ORACLE = """
WITH cl AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS nl FROM orders GROUP BY 1),
cr AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nr FROM lineitem GROUP BY 1),
cells AS (
  SELECT CAST(cl.k AS VARCHAR) AS key, nl, nr, CAST(nl * nr AS BIGINT) AS pr
  FROM cl JOIN cr ON cl.k = cr.k
),
tot AS (
  SELECT CAST(coalesce(sum(nl), 0) AS BIGINT) AS lr,
         CAST(coalesce(sum(nr), 0) AS BIGINT) AS rr,
         CAST(coalesce(sum(pr), 0) AS BIGINT) AS pr
  FROM cells
),
top AS (
  SELECT CAST(row_number() OVER (ORDER BY pr DESC, key ASC) AS INT) AS rank,
         key, nl, nr, pr,
         round(pr / CAST((SELECT pr FROM tot) AS DOUBLE), 6) AS share
  FROM cells ORDER BY pr DESC, key ASC LIMIT 5
)
SELECT CAST(0 AS INT) AS rank, CAST(NULL AS VARCHAR) AS key,
       lr AS left_rows, rr AS right_rows, pr AS pair_rows, 1.0 AS share FROM tot
UNION ALL
SELECT rank, key, nl AS left_rows, nr AS right_rows, pr AS pair_rows, share FROM top
"""


@register("join_preflight_orders_lineitem", oracle=_PREFLIGHT_ORACLE, tags=("plan",))
def join_preflight_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import join_cardinality_estimate

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    return join_cardinality_estimate(orders, li, ["k"], top_k=5)
