"""Round-7 session-4 operator wave, part 1 — hypothesis-testing tier:
log-rank survival comparison, Kruskal–Wallis rank ANOVA, Welch's t-test.

Each operator gets (a) plain-Python reference parity, (b) degenerate-case
behavior, (c) a DuckDB mirror proving the oracle SQL shape cross-engine
before the registered query reuses it.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from telecom_dataengineering_pipeline_spark.operators.survival import log_rank_test
from telecom_dataengineering_pipeline_spark.quality.monitors import (
    kruskal_wallis,
    welch_t_test,
)

# ---------------------------------------------------------------------------
# Log-rank test
# ---------------------------------------------------------------------------


def _logrank_reference(obs):
    """obs: list of (group 'a'|'b', duration int, event 0|1)."""
    times = sorted({t for _, t, _ in obs})
    o1 = sum(e for g, _, e in obs if g == "a")
    o2 = sum(e for g, _, e in obs if g == "b")
    e1 = e2 = v = 0.0
    for t in times:
        n1 = sum(1 for g, d, _ in obs if g == "a" and d >= t)
        n2 = sum(1 for g, d, _ in obs if g == "b" and d >= t)
        d1 = sum(e for g, d, e in obs if g == "a" and d == t)
        d2 = sum(e for g, d, e in obs if g == "b" and d == t)
        dt, nt = d1 + d2, n1 + n2
        if dt > 0:
            e1 += round(dt * (n1 / nt), 9)
            e2 += round(dt * (n2 / nt), 9)
            if nt > 1:
                v += round(dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1), 9)
    chi = round((o1 - e1) ** 2 / v, 6) if v > 0 else None
    return (
        sum(1 for g, _, _ in obs if g == "a"),
        sum(1 for g, _, _ in obs if g == "b"),
        o1,
        round(e1, 6),
        o2,
        round(e2, 6),
        round(v, 6),
        chi,
    )


_LOGRANK_OBS = (
    [("a", 2, 1), ("a", 3, 0), ("a", 5, 1), ("a", 5, 1), ("a", 8, 0), ("a", 11, 1)]
    + [("b", 1, 1), ("b", 2, 1), ("b", 2, 1), ("b", 4, 1), ("b", 6, 0), ("b", 9, 1), ("b", 9, 0)]
)


def test_logrank_matches_reference(spark):
    df = spark.createDataFrame(_LOGRANK_OBS, "g string, dur int, ev int")
    got = tuple(log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0])
    ref = _logrank_reference(_LOGRANK_OBS)
    assert got[:3] == ref[:3] and got[4] == ref[4]
    for i in (3, 5, 6, 7):
        assert got[i] == pytest.approx(ref[i], abs=2e-6)


def test_logrank_identical_groups_chi_near_zero(spark):
    rows = [("a", d, e) for d, e in [(1, 1), (2, 1), (3, 0), (4, 1)]] + [
        ("b", d, e) for d, e in [(1, 1), (2, 1), (3, 0), (4, 1)]
    ]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    r = log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    # mirror-image groups: observed == expected exactly
    assert r["chi_sq"] == pytest.approx(0.0, abs=1e-9)
    assert r["o_a"] == pytest.approx(r["e_a"], abs=1e-6)


def test_logrank_no_events_null_chi(spark):
    rows = [("a", 1, 0), ("a", 2, 0), ("b", 1, 0), ("b", 3, 0)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    r = log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    assert r["chi_sq"] is None and r["var_s"] == 0.0


def test_logrank_strong_separation_large_chi(spark):
    rows = [("a", d, 1) for d in range(1, 9)] + [("b", d + 20, 1) for d in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, dur int, ev int")
    r = log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    assert r["chi_sq"] > 10  # group a dies strictly first


_LOGRANK_MIRROR = """
WITH base AS (
  SELECT CASE WHEN g = 'a' THEN 1 ELSE 0 END AS ga, dur AS t, ev
  FROM fixture WHERE g IN ('a', 'b') AND dur IS NOT NULL AND ev IS NOT NULL
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


def test_logrank_duckdb_mirror(spark):
    df = spark.createDataFrame(_LOGRANK_OBS, "g string, dur int, ev int")
    got = tuple(log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, dur INT, ev INT)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{g}', {d}, {e})" for g, d, e in _LOGRANK_OBS)
    )
    assert tuple(con.execute(_LOGRANK_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Kruskal–Wallis
# ---------------------------------------------------------------------------


def _kw_reference(rows):
    vals = sorted(v for _, v in rows if v is not None)
    n = len(vals)
    avg_rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        for _ in range(i, j):
            avg_rank[vals[i]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v in rows:
        if v is not None:
            by_g["__null__" if g is None else str(g)].append(avg_rank[v])
    k = len(by_g)
    t = sum(
        round((2 * sum(rs)) ** 2 / (4 * len(rs)), 9) for rs in by_g.values()
    )
    h = 12.0 * t / (n * (n + 1)) - 3.0 * (n + 1) if k >= 2 else None
    from collections import Counter

    tie_sizes = Counter(vals)
    tie = sum(c**3 - c for c in tie_sizes.values())
    c_corr = 1.0 - tie / (n**3 - n) if n > 1 else None
    h_adj = round(h / c_corr, 6) if h is not None and c_corr and c_corr > 0 else None
    return (
        n,
        k,
        round(h, 6) if h is not None else None,
        round(c_corr, 6) if c_corr is not None else None,
        h_adj,
    )


def test_kw_matches_reference_with_ties(spark):
    rows = (
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.5)]
        + [("b", 2.0), ("b", 4.0), ("b", 5.0), ("b", 5.0)]
        + [("c", 5.0), ("c", 6.0), ("c", 7.5), (None, 1.0), ("a", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(kruskal_wallis(df, "g", "v").collect()[0])
    ref = _kw_reference(rows)
    assert got[:2] == ref[:2]
    for i in (2, 3, 4):
        assert got[i] == pytest.approx(ref[i], abs=2e-6)


def test_kw_separated_groups_large_h(spark):
    rows = [("a", float(i)) for i in range(10)] + [("b", float(i + 100)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["h_stat"] > 10 and r["tie_correction"] == 1.0
    assert r["h_adj"] == r["h_stat"]


def test_kw_degenerate(spark):
    # all values identical: C = 0, h_adj NULL; single group: h NULL
    df = spark.createDataFrame([("a", 1.0), ("b", 1.0), ("b", 1.0)], "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r["tie_correction"] == 0.0 and r["h_adj"] is None
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert kruskal_wallis(one, "g", "v").collect()[0]["h_stat"] is None


_KW_MIRROR = """
WITH ranked AS (
  SELECT coalesce(g, '__null__') AS g,
    CAST(2 * rank() OVER (ORDER BY v ASC) + count(*) OVER (PARTITION BY v) - 1
         AS DECIMAL(24,0)) AS u
  FROM fixture WHERE v IS NOT NULL
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


def test_kw_duckdb_mirror(spark):
    rows = [(f"g{i % 4}", float((i * 7 + 3) % 11) + 0.25 * (i % 3)) for i in range(48)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(kruskal_wallis(df, "g", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{g}', {v})" for g, v in rows)
    )
    assert tuple(con.execute(_KW_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------


def _welch_reference(rows, a, b):
    xa = [v for g, v in rows if g == a and v is not None]
    xb = [v for g, v in rows if g == b and v is not None]
    na, nb = len(xa), len(xb)
    ma, mb = sum(xa) / na, sum(xb) / nb
    va = sum((x - ma) ** 2 for x in xa) / (na - 1)
    vb = sum((x - mb) ** 2 for x in xb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return na, nb, ma, mb, va, vb, round(t, 6), round(dfw, 6)


def test_welch_matches_reference(spark):
    rows = [("a", 10.0 + 0.5 * i) for i in range(12)] + [
        ("b", 12.5 + 1.25 * i) for i in range(8)
    ] + [("c", 99.0), ("a", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    ref = _welch_reference(rows, "a", "b")
    assert (got["n_a"], got["n_b"]) == ref[:2]
    assert got["mean_a"] == pytest.approx(ref[2], abs=1e-6)
    assert got["var_b"] == pytest.approx(ref[5], abs=1e-6)
    assert got["t_stat"] == pytest.approx(ref[6], abs=2e-6)
    assert got["df_welch"] == pytest.approx(ref[7], abs=2e-4)


def test_welch_degenerate_singleton_side(spark):
    df = spark.createDataFrame([("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double")
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert r["t_stat"] is None and r["df_welch"] is None and r["var_a"] is None


def test_welch_zero_variance_both_sides(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 7.0), ("b", 7.0)], "g string, v double"
    )
    r = welch_t_test(df, "g", "v", "a", "b").collect()[0]
    assert r["t_stat"] is None  # se2 = 0: difference certain but t undefined


_WELCH_MIRROR = """
WITH base AS (
  SELECT CASE WHEN g = 'a' THEN 1 ELSE 0 END AS a,
         CASE WHEN g = 'b' THEN 1 ELSE 0 END AS b,
         CAST(v AS DECIMAL(24,6)) AS v
  FROM fixture WHERE g IN ('a', 'b') AND v IS NOT NULL
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


def test_welch_duckdb_mirror(spark):
    rows = [
        (f"{'ab'[i % 2]}", float((i * 13 + 5) % 29) + 0.5 * (i % 4)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(welch_t_test(df, "g", "v", "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{g}', {v})" for g, v in rows)
    )
    assert tuple(con.execute(_WELCH_MIRROR).fetchone()) == got
