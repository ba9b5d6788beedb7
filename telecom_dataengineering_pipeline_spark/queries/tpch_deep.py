"""Deeper TPC-H-shaped relational coverage (round 4).

Eight classic decision-support shapes NOT covered by the round-1 relational
tier, each exercising an operator composition the reference's dbt/Trino
models rely on (SURVEY.md §2 ids in docstrings):

- ``volume_shipping_pairs``   (Q7)  — nation-pair revenue matrix, symmetric
  OR predicate over a 6-table join (J1/J2 + A1).
- ``product_profit_by_nation`` (Q9) — LIKE-filtered part scan feeding a
  profit rollup by supplier nation × year (P3 pushdown + J1 + A1).
- ``returned_items_report``   (Q10) — top-k customers by returned-item
  revenue inside an order-date quarter (A4 + O6 TakeOrderedAndProject).
- ``customer_order_counts_dist`` (Q13) — left-outer join with an ON-clause
  right-side predicate, then a two-level COUNT distribution (J3-adjacent:
  the outer join must NOT collapse to inner; zero-order customers count).
- ``promo_revenue_ratio``     (Q14) — conditional-aggregate ratio (A3/A5).
- ``brand_predicate_revenue`` (Q19) — three-branch OR of AND predicates;
  the whole disjunction must push into the scan/join, not a post-filter.
- ``min_cost_supplier_per_part`` (Q2) — correlated-min supplier selection
  re-expressed as two-level agg + deterministic window pick (W1 pattern;
  the reference would write a correlated scalar subquery in Trino SQL).
- ``prospect_balance_anti``   (Q22) — global scalar-subquery threshold
  (J4 1×1 cross join) + referential anti-join (J6) + rollup.

All follow the registry's cross-engine determinism conventions: DECIMAL
sums cast to DOUBLE at the edge, identical derived-ratio expression shapes
on both engines, unique tie-break keys under every window/top-k order.

Scale notes: part/supplier/customer/nation are the small sides at any SF
and are broadcast explicitly; lineitem/orders join on their natural keys
(one shuffle each, AQE-coalesced); the Q2 shape's per-(part,supplier)
pre-aggregation is map-side combinable and the window runs on the already
tiny aggregate, never on raw lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# Shared decimal-exact volume expression: extendedprice * (1 - discount).
def _volume() -> F.Column:
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
    ).cast("decimal(24,6)")


_VOLUME_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - l_discount AS DECIMAL(8,4)) AS DECIMAL(24,6))"
)


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations, both directions, by year.
# ---------------------------------------------------------------------------

_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT sn.n_name AS supp_nation,
         cn.n_name AS cust_nation,
         strftime(l.l_shipdate, '%Y') AS l_year,
         {_VOLUME_SQL} AS volume
  FROM lineitem l
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  JOIN customer c  ON o.o_custkey = c.c_custkey
  JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
  WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    AND sn.n_name <> cn.n_name
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register("volume_shipping_pairs", oracle=_Q7_ORACLE, tags=("J1", "J2", "A1"))
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue shipped between a nation pair, per direction and
    year. The nation-pair disjunction is applied AFTER resolving both
    nation names, but Catalyst pushes each branch's nation filter into the
    respective broadcast side (dims are tiny at every SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nations = ["NATION_1", "NATION_2", "NATION_3", "NATION_4"]
    pair = (
        F.col("supp_nation").isin(nations)
        & F.col("cust_nation").isin(nations)
        & (F.col("supp_nation") != F.col("cust_nation"))
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
    )
    return (
        base.select(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
            _volume().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by supplier nation and year.
# ---------------------------------------------------------------------------

_Q9_ORACLE = f"""
SELECT nation, o_year, CAST(sum(profit) AS DOUBLE) AS sum_profit
FROM (
  SELECT sn.n_name AS nation,
         strftime(o.o_orderdate, '%Y') AS o_year,
         {_VOLUME_SQL} AS profit
  FROM lineitem l
  JOIN part p      ON l.l_partkey = p.p_partkey
  JOIN orders o    ON l.l_orderkey = o.o_orderkey
  JOIN supplier s  ON l.l_suppkey = s.s_suppkey
  JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
  WHERE p.p_name LIKE '%red%'
)
GROUP BY nation, o_year
"""


@register("product_profit_by_nation", oracle=_Q9_ORACLE, tags=("J1", "A1", "P3"))
def product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (profit term reduced to extendedprice×(1−discount): the
    driver schema has no partsupp cost side). The LIKE filter lands on the
    broadcast part side before the join — lineitem rows for non-matching
    parts never survive the broadcast hash probe."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    base = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return (
        base.select(
            "nation",
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
            _volume().alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("profit").cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top 20 customers by lost revenue.
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
SELECT c.c_custkey, c.c_name, c.c_mktsegment, n.n_name AS nation,
       CAST(sum({_VOLUME_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_items_report", oracle=_Q10_ORACLE, tags=("A4", "O6", "J1"))
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a quarter.
    orderBy(...).limit(20) compiles to TakeOrderedAndProject — per-partition
    top-k then a 20-row driver merge, never a global sort. Tie-break on
    c_custkey keeps the cut deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        li.join(o.select("o_orderkey", "o_custkey"), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        base.groupBy("c_custkey", "c_name", "c_mktsegment", F.col("n_name").alias("nation"))
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13 — customer distribution by order count (outer join must survive).
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority <> '1-URGENT') o
         ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register("customer_order_counts_dist", oracle=_Q13_ORACLE, tags=("J3", "A6"))
def customer_order_counts_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed exactly N (non-urgent) orders.
    The right-side priority predicate belongs to the join's ON clause —
    pre-filtering orders is equivalent and keeps the join a plain left
    equi-join; customers with zero surviving orders land in c_count=0
    (count(col) skips the nulls the outer join produced). The second-level
    distribution groups ~|customer| rows by a small-domain integer — cheap."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 — promotion revenue ratio for one month.
# ---------------------------------------------------------------------------

_Q14_ORACLE = f"""
SELECT
  CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_VOLUME_SQL}
                ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum({_VOLUME_SQL}) AS DOUBLE) AS total_revenue,
  round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_VOLUME_SQL}
                             ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
        / CAST(sum({_VOLUME_SQL}) AS DOUBLE), 6) AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


@register("promo_revenue_ratio", oracle=_Q14_ORACLE, tags=("A3", "A5"))
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from PROMO parts. Single
    scan, broadcast part join, one global aggregate — the month filter is
    pushed to the lineitem scan (min/max row-group pruning at rest)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(24,6)")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _volume()).otherwise(zero))
    total = F.sum(_volume())
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            promo.cast("double").alias("promo_revenue"),
            total.cast("double").alias("total_revenue"),
            F.round(F.lit(100.0) * promo.cast("double") / total.cast("double"), 6).alias(
                "promo_pct"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q19 — three-branch OR of AND predicates (pushdown composition).
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT CAST(sum({_VOLUME_SQL}) AS DOUBLE) AS revenue,
       count(*) AS match_count
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 1 AND 50 AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("brand_predicate_revenue", oracle=_Q19_ORACLE, tags=("P3", "A1"))
def brand_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity conjunctions spanning
    both join sides. Catalyst derives the single-side implications (brand IN
    (...) onto part, quantity BETWEEN 1 AND 30 onto lineitem) and pushes
    them into both scans; the residual mixed predicate evaluates post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    def branch(brand: str, smax: int, qlo: int, qhi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )

    cond = (
        branch("Brand#12", 15, 1, 11)
        | branch("Brand#15", 25, 10, 20)
        | branch("Brand#18", 50, 20, 30)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(_volume()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("match_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape — cheapest supplier per part (correlated min → window pick).
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
SELECT p_partkey, p_name, s_suppkey, s_name,
       CAST(min_price AS DOUBLE) AS min_price
FROM (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(12,2))) AS min_price,
         row_number() OVER (
           PARTITION BY l_partkey
           ORDER BY min(CAST(l_extendedprice AS DECIMAL(12,2))), l_suppkey
         ) AS rn
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
) ps
JOIN part p     ON ps.l_partkey = p.p_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
WHERE rn = 1 AND p.p_size <= 10
"""


@register("min_cost_supplier_per_part", oracle=_Q2_ORACLE, tags=("W1", "A1", "J1"))
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each (small) part, the supplier quoting the
    lowest observed price. Trino would run a correlated scalar subquery;
    here it is a per-(part,supplier) pre-aggregate (map-side combinable,
    one shuffle on l_partkey+l_suppkey) and a window pick over the already
    tiny aggregate — the window never touches raw lineitem. Ties break on
    s_suppkey so the pick is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(12,2)")).alias("min_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("min_price", "l_suppkey")
    best = per_ps.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("min_price").cast("double").alias("min_price"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape — wealthy customers with no orders (scalar threshold + anti).
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
SELECT c_mktsegment,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
CROSS JOIN (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
) t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@register("prospect_balance_anti", oracle=_Q22_ORACLE, tags=("J4", "J6", "A4"))
def prospect_balance_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    order (lapsed prospects), rolled up by segment. The global average is a 1-row aggregate broadcast
    via crossJoin (J4's sanctioned scalar-anchor pattern — identical
    sum/count double derivation on both engines, never AVG(decimal) whose
    result scale differs per engine); the "never ordered" side is a
    left-anti join against orders' custkey projection."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    never_ordered = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return never_ordered.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("totacctbal"),
    )
