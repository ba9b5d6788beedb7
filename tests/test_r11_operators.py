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


# ---------------------------------------------------------------------------
# Precision/Recall@k + AP@k
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.features import (  # noqa: E402
    calibration_bins,
    lift_table,
    pr_map_at_k,
)


def _pr_reference(rows, k):
    """rows: (key, score, rel, tb). Returns {key: (n, n_rel, hits, p, r, ap)}."""
    from collections import defaultdict

    by_k = defaultdict(list)
    for key, s, r, tb in rows:
        if s is None or r is None:
            continue
        by_k[key].append((s, 1 if r > 0 else 0, tb))
    out = {}
    for key, docs in by_k.items():
        docs.sort(key=lambda d: (-d[0], d[2]))
        n, n_rel = len(docs), sum(d[1] for d in docs)
        hits = sum(d[1] for d in docs[:k])
        cum, ap = 0, 0.0
        for i, (_, r, _) in enumerate(docs[:k], start=1):
            cum += r
            if r:
                ap += round(cum / i, 9)
        out[key] = (
            n,
            n_rel,
            hits,
            round(hits / k, 6),
            round(hits / n_rel, 6) if n_rel else None,
            round(ap / min(n_rel, k), 6) if n_rel else None,
        )
    return out


_PR_ROWS = [
    ("q1", 0.9, 1, "a"), ("q1", 0.8, 0, "b"), ("q1", 0.7, 1, "c"),
    ("q1", 0.6, 0, "d"), ("q1", 0.5, 1, "e"),
    ("q2", 0.9, 0, "a"), ("q2", 0.8, 0, "b"), ("q2", 0.7, 1, "c"),
    ("q3", 0.5, 0, "a"), ("q3", 0.4, 0, "b"),  # no relevant docs
]


def test_pr_map_matches_reference(spark):
    df = spark.createDataFrame(_PR_ROWS, "k string, s double, r int, tb string")
    got = {
        r["k"]: (r["n_docs"], r["n_rel"], r["hits_at_k"], r["p_at_k"], r["r_at_k"], r["ap_at_k"])
        for r in pr_map_at_k(df, ["k"], "s", "r", k=3, tiebreak_col="tb").collect()
    }
    assert got == _pr_reference(_PR_ROWS, 3)
    assert got["q3"][4] is None and got["q3"][5] is None


def test_pr_map_perfect_ranking_ap_one(spark):
    rows = [("q", 1.0 - 0.1 * i, 1 if i < 3 else 0, f"t{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "k string, s double, r int, tb string")
    r = pr_map_at_k(df, ["k"], "s", "r", k=5, tiebreak_col="tb").collect()[0]
    assert r["ap_at_k"] == 1.0 and r["r_at_k"] == 1.0 and r["p_at_k"] == 0.6


_PR_MIRROR = """
WITH base AS (
  SELECT k, s, CASE WHEN r > 0 THEN 1 ELSE 0 END AS rel, tb
  FROM fixture WHERE s IS NOT NULL AND r IS NOT NULL
), ranked AS (
  SELECT k, rel,
    CAST(row_number() OVER (PARTITION BY k ORDER BY s DESC, tb ASC) AS BIGINT) AS rk,
    CAST(sum(rel) OVER (PARTITION BY k ORDER BY s DESC, tb ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(rel) AS BIGINT) AS n_rel,
    CAST(sum(CASE WHEN rk <= 3 THEN rel ELSE 0 END) AS BIGINT) AS hits_at_k,
    sum(CASE WHEN rel = 1 AND rk <= 3
        THEN CAST(round(CAST(cum AS DOUBLE) / CAST(rk AS DOUBLE), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS ap
  FROM ranked GROUP BY 1
)
SELECT k, n_docs, n_rel, hits_at_k,
  round(CAST(hits_at_k AS DOUBLE) / 3.0, 6) AS p_at_k,
  CASE WHEN n_rel > 0 THEN round(CAST(hits_at_k AS DOUBLE) / CAST(n_rel AS DOUBLE), 6) END AS r_at_k,
  CASE WHEN n_rel > 0 THEN round(CAST(ap AS DOUBLE)
       / CAST(CASE WHEN n_rel < 3 THEN n_rel ELSE 3 END AS DOUBLE), 6) END AS ap_at_k
FROM agg
"""


def test_pr_map_duckdb_mirror(spark):
    df = spark.createDataFrame(_PR_ROWS, "k string, s double, r int, tb string")
    got = sorted(
        tuple(r)
        for r in pr_map_at_k(df, ["k"], "s", "r", k=3, tiebreak_col="tb").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, s DOUBLE, r INT, tb VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {s}, {r}, '{tb}')" for k, s, r, tb in _PR_ROWS)
    )
    assert sorted(tuple(r) for r in con.execute(_PR_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Decile lift / gains
# ---------------------------------------------------------------------------


def _lift_reference(rows, b):
    """rows: (score, label, tb)."""
    docs = sorted(((s, 1 if y > 0 else 0, t) for s, y, t in rows), key=lambda d: (-d[0], d[2]))
    n = len(docs)
    sizes = [n // b + (1 if i < n % b else 0) for i in range(b)]
    out, i = {}, 0
    tp = sum(d[1] for d in docs)
    cum = 0
    for bkt, sz in enumerate(sizes, start=1):
        chunk = docs[i : i + sz]
        i += sz
        if not chunk:
            continue
        pos = sum(d[1] for d in chunk)
        cum += pos
        rate = pos / sz
        out[bkt] = (
            sz,
            pos,
            round(rate, 6),
            round(rate / (tp / n), 6) if tp else None,
            cum,
            round(cum / tp, 6) if tp else None,
        )
    return out


def test_lift_matches_reference(spark):
    rows = [(float(100 - i), 1 if (i * 7) % 3 == 0 and i < 40 else 0, f"t{i:03d}") for i in range(73)]
    df = spark.createDataFrame(rows, "s double, y int, tb string")
    got = {
        r["bucket"]: (r["n"], r["n_pos"], r["resp_rate"], r["lift"], r["cum_pos"], r["cum_gain"])
        for r in lift_table(df, "s", "y", n_buckets=10, tiebreak_col="tb").collect()
    }
    assert got == _lift_reference(rows, 10)
    # positives concentrated at high scores: top decile lift > 1
    assert got[1][3] > 1.0 and got[10][5] == 1.0


def test_ranking_eval_requires_tiebreak(spark):
    """ADVICE r7 (low): omitting tiebreak_col used to fall back to
    score_col — a no-op tiebreak making ranks partition-order-dependent
    under ties. All three ranking graders now require it, matching
    quantile_normalize's mandatory-tiebreak contract."""
    from telecom_dataengineering_pipeline_spark.operators.features import ndcg_at_k

    df = spark.createDataFrame([("q", 1.0, 1, "t0")], "k string, s double, r int, tb string")
    with pytest.raises(ValueError, match="tiebreak_col"):
        ndcg_at_k(df, ["k"], "s", "r", k=3)
    with pytest.raises(ValueError, match="tiebreak_col"):
        pr_map_at_k(df, ["k"], "s", "r", k=3)
    with pytest.raises(ValueError, match="tiebreak_col"):
        lift_table(df, "s", "r", n_buckets=2)


def test_lift_no_positives_nulls(spark):
    rows = [(float(i), 0, f"t{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "s double, y int, tb string")
    for r in lift_table(df, "s", "y", n_buckets=4, tiebreak_col="tb").collect():
        assert r["lift"] is None and r["cum_gain"] is None


_LIFT_MIRROR = """
WITH base AS (
  SELECT s, CASE WHEN y > 0 THEN 1 ELSE 0 END AS y, tb
  FROM fixture WHERE s IS NOT NULL AND y IS NOT NULL
), bucketed AS (
  SELECT CAST(ntile(10) OVER (ORDER BY s DESC, tb ASC) AS BIGINT) AS bucket, y
  FROM base
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


def test_lift_duckdb_mirror(spark):
    rows = [(float((i * 17) % 53), 1 if (i * 11) % 4 == 0 else 0, f"t{i:03d}") for i in range(67)]
    df = spark.createDataFrame(rows, "s double, y int, tb string")
    got = sorted(
        tuple(r) for r in lift_table(df, "s", "y", n_buckets=10, tiebreak_col="tb").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (s DOUBLE, y INT, tb VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"({s}, {y}, '{t}')" for s, y, t in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_LIFT_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Calibration bins
# ---------------------------------------------------------------------------


def test_calibration_matches_reference(spark):
    rows = [(round(i / 20, 2), 1 if (i * 3) % 5 < 2 else 0) for i in range(21)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["mean_prob"], r["frac_pos"])
        for r in calibration_bins(df, "p", "y", n_bins=5).collect()
    }
    from collections import defaultdict

    by_b = defaultdict(list)
    for p, y in rows:
        by_b[min(int(p * 5), 4)].append((p, 1 if y > 0 else 0))
    ref = {
        b: (
            len(v),
            sum(y for _, y in v),
            round(sum(p for p, _ in v) / len(v), 6),
            round(sum(y for _, y in v) / len(v), 6),
        )
        for b, v in by_b.items()
    }
    assert got == ref


def test_calibration_prob_one_in_last_bin(spark):
    df = spark.createDataFrame([(1.0, 1), (0.0, 0)], "p double, y int")
    bins = {r["bin"] for r in calibration_bins(df, "p", "y", n_bins=10).collect()}
    assert bins == {0, 9}


_CALIB_MIRROR = """
WITH base AS (
  SELECT CAST(least(CAST(floor(p * 5.0) AS BIGINT), 4) AS BIGINT) AS bin,
         CAST(p AS DECIMAL(18,6)) AS p,
         CASE WHEN y > 0 THEN 1 ELSE 0 END AS y
  FROM fixture WHERE p IS NOT NULL AND y IS NOT NULL
), g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
         sum(p) AS sp
  FROM base GROUP BY 1
)
SELECT bin, round(CAST(bin AS DOUBLE) / 5.0, 6) AS bin_lo, n, n_pos,
  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_prob,
  round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos,
  round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
        - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gap
FROM g
"""


def test_calibration_duckdb_mirror(spark):
    rows = [(round(((i * 13) % 21) / 20, 2), 1 if (i * 7) % 3 == 0 else 0) for i in range(50)]
    df = spark.createDataFrame(rows, "p double, y int")
    got = sorted(tuple(r) for r in calibration_bins(df, "p", "y", n_bins=5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (p DOUBLE, y INT)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"({p}, {y})" for p, y in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_CALIB_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Degree assortativity
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.graph import (  # noqa: E402
    closeness_centrality,
    degree_assortativity,
)


def _assort_reference(und_edges):
    from collections import Counter

    deg = Counter()
    for u, v in und_edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in und_edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    varx, vary = m * sxx - sx * sx, m * syy - sy * sy
    r = (
        round((m * sxy - sx * sy) / math.sqrt(varx * vary), 6)
        if varx > 0 and vary > 0
        else None
    )
    return len(deg), len(und_edges), r


def test_assortativity_star_is_minus_one(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert (r["n_nodes"], r["n_edges"]) == (6, 5)
    assert r["r_assort"] == -1.0


def test_assortativity_cycle_null(spark):
    # 2-regular graph: zero degree variance
    edges = [(i, (i + 1) % 6) for i in range(6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert degree_assortativity(df).collect()[0]["r_assort"] is None


def test_assortativity_matches_reference_and_orientation_proof(spark):
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6), (5, 7), (2, 7)]
    df = spark.createDataFrame(und, "src long, dst long")
    got = tuple(degree_assortativity(df).collect()[0])
    ref = _assort_reference(und)
    assert got[:2] == ref[:2]
    assert got[2] == pytest.approx(ref[2], abs=1e-6)
    # feeding BOTH orientations + duplicates must not change anything
    noisy = und + [(v, u) for u, v in und] + und[:3]
    df2 = spark.createDataFrame(noisy, "src long, dst long")
    assert tuple(degree_assortativity(df2).collect()[0]) == got


_ASSORT_MIRROR = """
WITH und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM fixture WHERE src <> dst
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


def test_assortativity_duckdb_mirror(spark):
    und = [(i, (i * 7 + 3) % 23) for i in range(40) if i != (i * 7 + 3) % 23]
    df = spark.createDataFrame(und, "src long, dst long")
    got = tuple(degree_assortativity(df).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (src BIGINT, dst BIGINT)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"({u}, {v})" for u, v in und)
    )
    assert tuple(con.execute(_ASSORT_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Closeness centrality
# ---------------------------------------------------------------------------


def _closeness_reference(directed, seeds, max_hops):
    from collections import deque

    adj = {}
    nodes = set()
    for s, d in directed:
        adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    out = {}
    for s in seeds:
        if s not in nodes:
            continue
        dist = {s: 0}
        q = deque([s])
        while q:
            cur = q.popleft()
            if dist[cur] >= max_hops:
                continue
            for nxt in adj.get(cur, ()):
                if nxt not in dist:
                    dist[nxt] = dist[cur] + 1
                    q.append(nxt)
        hops = [h for h in dist.values() if h > 0]
        harm = sum(round(1 / h, 9) for h in hops)
        out[s] = (
            len(hops),
            sum(hops),
            round(len(hops) / sum(hops), 6) if hops else None,
            round(harm, 6),
        )
    return out


def test_closeness_path_graph(spark):
    # directed path 0→1→2→3→4: from 0, dist 1,2,3,4 capped at 3 hops
    edges = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["seed"]: (r["n_reached"], r["total_hops"], r["closeness"], r["harmonic"])
        for r in closeness_centrality(df, [0, 4], max_hops=3).collect()
    }
    ref = _closeness_reference(edges, [0, 4], 3)
    assert got == ref
    assert got[0][0] == 3 and got[0][1] == 6  # hops 1+2+3, node 4 beyond cap
    assert got[4] == (0, 0, None, 0.0)  # sink seed: reaches nothing


def test_closeness_matches_reference_undirected(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (6, 7)]
    directed = und + [(v, u) for u, v in und]
    df = spark.createDataFrame(directed, "src long, dst long")
    seeds = [0, 2, 6]
    got = {
        r["seed"]: (r["n_reached"], r["total_hops"], r["closeness"], r["harmonic"])
        for r in closeness_centrality(df, seeds, max_hops=4).collect()
    }
    ref = _closeness_reference(directed, seeds, 4)
    for s in seeds:
        assert got[s][:2] == ref[s][:2]
        assert got[s][2] == pytest.approx(ref[s][2], abs=1e-6)
        assert got[s][3] == pytest.approx(ref[s][3], abs=1e-6)
    # component {6,7}: seed 6 sees exactly one node at hop 1
    assert got[6] == (1, 1, 1.0, 1.0)


_CLOSENESS_MIRROR = """
WITH edges AS (SELECT DISTINCT src, dst FROM fixture),
seeds AS (SELECT DISTINCT node FROM (
  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges
) WHERE node IN (0, 2, 6)),
walk AS (
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


def test_closeness_duckdb_mirror(spark):
    und = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (4, 5), (6, 7)]
    directed = und + [(v, u) for u, v in und]
    df = spark.createDataFrame(directed, "src long, dst long")
    got = sorted(
        tuple(r) for r in closeness_centrality(df, [0, 2, 6], max_hops=4).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (src BIGINT, dst BIGINT)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"({u}, {v})" for u, v in directed)
    )
    assert sorted(tuple(r) for r in con.execute(_CLOSENESS_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Pettitt change-point test
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.trend import (  # noqa: E402
    periodogram,
    periodogram_oracle_sql,
    pettitt_test,
)


def _pettitt_reference(series):
    """series: [(t, v)] sorted by t. Returns (n, t_star, u_at_t, k, p)."""
    series = sorted(series)
    T = len(series)
    best = None
    for ti in range(T - 1):  # boundary after index ti
        u = sum(
            (series[i][1] > series[j][1]) - (series[i][1] < series[j][1])
            for i in range(ti + 1)
            for j in range(ti + 1, T)
        )
        key = (-abs(u), series[ti][0])
        if best is None or key < best[0]:
            best = (key, series[ti][0], u)
    _, t_star, u = best
    k = abs(u)
    p = round(min(1.0, 2.0 * math.exp(-6.0 * k * k / (T**3 + T**2))), 6)
    return (T, t_star, u, k, p)


def test_pettitt_finds_planted_shift(spark):
    series = [(t, 10.0) for t in range(1, 13)] + [(t, 25.0) for t in range(13, 25)]
    df = spark.createDataFrame([("s", t, v) for t, v in series], "k string, t int, v double")
    r = pettitt_test(df, ["k"], "t", "v").collect()[0]
    ref = _pettitt_reference(series)
    assert (r["n"], r["t_star"], r["u_at_t"], r["k_stat"]) == ref[:4]
    assert r["t_star"] == 12 and r["p_value"] < 0.01
    assert r["p_value"] == pytest.approx(ref[4], abs=2e-6)


def test_pettitt_flat_series_p_one(spark):
    df = spark.createDataFrame(
        [("s", t, 5.0) for t in range(1, 11)], "k string, t int, v double"
    )
    r = pettitt_test(df, ["k"], "t", "v").collect()[0]
    assert r["k_stat"] == 0 and r["p_value"] == 1.0
    assert r["t_star"] == 1  # earliest step wins the all-zero tie


def test_pettitt_single_point_emits_null_row(spark):
    """ADVICE r7 (low): a 1-point key produces no comparison pairs, but
    the docstring promises one row per key — it must emit (k, n=1,
    NULLs), not vanish (callers joining results back by key would
    silently lose the series)."""
    df = spark.createDataFrame(
        [("solo", 1, 5.0), ("pair", 1, 1.0), ("pair", 2, 9.0)],
        "k string, t int, v double",
    )
    rows = {r["k"]: r for r in pettitt_test(df, ["k"], "t", "v").collect()}
    assert set(rows) == {"solo", "pair"}
    solo = rows["solo"]
    assert solo["n"] == 1
    assert solo["t_star"] is None and solo["u_at_t"] is None
    assert solo["k_stat"] is None and solo["p_value"] is None
    assert rows["pair"]["n"] == 2 and rows["pair"]["p_value"] is not None


def test_pettitt_keyed_matches_reference(spark):
    s1 = [(t, float((t * 7) % 13)) for t in range(1, 20)]
    s2 = [(t, float(t if t < 10 else t + 50)) for t in range(1, 18)]
    rows = [("a", t, v) for t, v in s1] + [("b", t, v) for t, v in s2]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {
        r["k"]: (r["n"], r["t_star"], r["u_at_t"], r["k_stat"], r["p_value"])
        for r in pettitt_test(df, ["k"], "t", "v").collect()
    }
    for k, series in (("a", s1), ("b", s2)):
        ref = _pettitt_reference(series)
        assert got[k][:4] == ref[:4]
        assert got[k][4] == pytest.approx(ref[4], abs=2e-6)


_PETTITT_MIRROR = """
WITH base AS (
  SELECT k, CAST(t AS BIGINT) AS t, v FROM fixture
  WHERE t IS NOT NULL AND v IS NOT NULL
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
SELECT keyn.k, keyn.n, best.t AS t_star, best.u AS u_at_t,
       best.k_stat, best.p_value
FROM keyn LEFT JOIN best ON best.k = keyn.k
"""


def test_pettitt_duckdb_mirror(spark):
    rows = [("a", t, float((t * 11 + 2) % 17)) for t in range(1, 22)] + [
        ("b", t, float(3 if t < 8 else 30)) for t in range(1, 15)
    ] + [("c", 1, 4.0)]  # 1-point key: NULL row in BOTH engines
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = sorted(tuple(r) for r in pettitt_test(df, ["k"], "t", "v").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, t INT, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {t}, {v})" for k, t, v in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_PETTITT_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Periodogram
# ---------------------------------------------------------------------------


def test_periodogram_recovers_planted_period(spark):
    rows = [
        ("s", t, 100.0 + (7.0 if t % 7 == 0 else 0.0) + 0.01 * (t % 3))
        for t in range(28)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {r["period"]: r["power"] for r in periodogram(df, ["k"], "t", "v", [3, 5, 7, 9]).collect()}
    assert max(out, key=out.get) == 7


def test_periodogram_matches_numpy_reference(spark):
    import numpy as np

    vals = [float(((t * 13) % 9) + (5 if t % 4 == 0 else 0)) for t in range(24)]
    rows = [("s", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r["period"]: (r["c_sum"], r["s_sum"], r["power"]) for r in periodogram(df, ["k"], "t", "v", [4, 6]).collect()}
    v = np.array(vals) - np.mean(vals)
    for p in (4, 6):
        t = np.arange(24)
        c = sum(round(x, 9) for x in v * np.cos(2 * np.pi * (t % p) / p))
        s = sum(round(x, 9) for x in v * np.sin(2 * np.pi * (t % p) / p))
        assert got[p][0] == pytest.approx(c, abs=1e-5)
        assert got[p][1] == pytest.approx(s, abs=1e-5)
        assert got[p][2] == pytest.approx(c * c + s * s, abs=1e-3)


def test_periodogram_duckdb_mirror(spark):
    rows = [("a", t, float((t * 7) % 11)) for t in range(20)] + [
        ("b", t, float(10 if t % 5 == 0 else 1)) for t in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = sorted(tuple(r) for r in periodogram(df, ["k"], "t", "v", [5, 7]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, t INT, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {t}, {v})" for k, t, v in rows)
    )
    sql = periodogram_oracle_sql("SELECT * FROM fixture", "k", "t", "v", [5, 7])
    assert sorted(tuple(r) for r in con.execute(sql).fetchall()) == got


def test_periodogram_validation(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t int, v double")
    with pytest.raises(ValueError):
        periodogram(df, ["k"], "t", "v", [])
    with pytest.raises(ValueError):
        periodogram(df, ["k"], "t", "v", [1])


# ---------------------------------------------------------------------------
# Process-mining: case variants + cycle-time profile
# ---------------------------------------------------------------------------

from datetime import datetime  # noqa: E402

from telecom_dataengineering_pipeline_spark.operators.windows import (  # noqa: E402
    case_cycle_profile,
    case_variants,
)


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


_PM_ROWS = [
    # case 1: view > click > purchase
    (1, "view", _ts("2024-01-01 10:00:00"), "a"),
    (1, "click", _ts("2024-01-01 10:05:00"), "b"),
    (1, "purchase", _ts("2024-01-01 10:30:00"), "c"),
    # case 2: same path
    (2, "view", _ts("2024-01-02 09:00:00"), "d"),
    (2, "click", _ts("2024-01-02 09:01:00"), "e"),
    (2, "purchase", _ts("2024-01-02 09:02:00"), "f"),
    # case 3: error first, long path truncated at max_steps=3
    (3, "error", _ts("2024-01-03 08:00:00"), "g"),
    (3, "view", _ts("2024-01-03 08:10:00"), "h"),
    (3, "view", _ts("2024-01-03 08:20:00"), "i"),
    (3, "click", _ts("2024-01-03 08:30:00"), "j"),
    # case 4: single event
    (4, "signup", _ts("2024-01-04 12:00:00"), "k"),
    # tie-break: two events same timestamp, order by tb
    (5, "b_second", _ts("2024-01-05 00:00:00"), "z2"),
    (5, "a_first", _ts("2024-01-05 00:00:00"), "z1"),
]


def test_case_variants_counts_and_truncation(spark):
    df = spark.createDataFrame(_PM_ROWS, "c long, act string, ts timestamp, tb string")
    got = {
        r["variant"]: (r["n_cases"], r["share"], r["rank"])
        for r in case_variants(df, "c", "act", "ts", "tb", max_steps=3).collect()
    }
    assert got["view>click>purchase"] == (2, 0.4, 1)
    assert "error>view>view" in got  # truncated at 3 steps
    assert got["signup"][0] == 1
    assert "a_first>b_second" in got  # tie broken by tiebreak col
    assert sum(v[0] for v in got.values()) == 5


def test_case_variants_rank_tie_on_variant_string(spark):
    df = spark.createDataFrame(_PM_ROWS, "c long, act string, ts timestamp, tb string")
    rows = case_variants(df, "c", "act", "ts", "tb", max_steps=3).collect()
    singles = sorted(
        (r["variant"], r["rank"]) for r in rows if r["n_cases"] == 1
    )
    ranks = [rk for _, rk in singles]
    assert ranks == sorted(ranks)  # alphabetical variants get increasing ranks


def test_cycle_profile_matches_reference(spark):
    df = spark.createDataFrame(_PM_ROWS, "c long, act string, ts timestamp, tb string")
    got = {
        r["first_activity"]: (
            r["n_cases"],
            r["mean_duration_s"],
            r["min_duration_s"],
            r["max_duration_s"],
        )
        for r in case_cycle_profile(df, "c", "act", "ts", "tb").collect()
    }
    # cases 1 (1800 s) and 2 (120 s) start with view
    assert got["view"] == (2, 960.0, 120.0, 1800.0)
    assert got["error"] == (1, 1800.0, 1800.0, 1800.0)
    assert got["signup"] == (1, 0.0, 0.0, 0.0)
    assert got["a_first"] == (1, 0.0, 0.0, 0.0)  # same-ts tie elects a_first


_PM_FIXTURE_SQL = """
CREATE TABLE fixture AS SELECT * FROM (VALUES {rows}) t(c, act, ts, tb)
"""

_VARIANT_MIRROR = """
WITH base AS (
  SELECT c, act, epoch_us(ts) AS us, tb FROM fixture
  WHERE c IS NOT NULL AND act IS NOT NULL AND ts IS NOT NULL
), ranked AS (
  SELECT c, act, us, tb,
    row_number() OVER (PARTITION BY c ORDER BY us ASC, tb ASC) AS rn
  FROM base
), per_case AS (
  SELECT c, string_agg(act, '>' ORDER BY us ASC, tb ASC) AS variant
  FROM ranked WHERE rn <= 3 GROUP BY c
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

_CYCLE_MIRROR = """
WITH base AS (
  SELECT c, act, epoch_us(ts) AS us, tb FROM fixture
  WHERE c IS NOT NULL AND act IS NOT NULL AND ts IS NOT NULL
), per_case AS (
  SELECT c,
    min(us) AS lo, max(us) AS hi,
    (SELECT b2.act FROM base b2 WHERE b2.c = base.c
     ORDER BY b2.us ASC, b2.tb ASC LIMIT 1) AS first_activity
  FROM base GROUP BY c
), g AS (
  SELECT first_activity, CAST(count(*) AS BIGINT) AS n_cases,
    sum(CAST(hi - lo AS DECIMAL(24,0))) AS sd,
    min(hi - lo) AS mn, max(hi - lo) AS mx
  FROM per_case GROUP BY 1
)
SELECT first_activity, n_cases,
  round(CAST(sd AS DOUBLE) / CAST(n_cases AS DOUBLE) / 1000000.0, 6) AS mean_duration_s,
  round(CAST(mn AS DOUBLE) / 1000000.0, 6) AS min_duration_s,
  round(CAST(mx AS DOUBLE) / 1000000.0, 6) AS max_duration_s
FROM g
"""


def _pm_duckdb():
    con = duckdb.connect()
    vals = ", ".join(
        f"({c}, '{a}', TIMESTAMP '{ts}', '{tb}')" for c, a, ts, tb in _PM_ROWS
    )
    con.execute(_PM_FIXTURE_SQL.format(rows=vals))
    return con


def test_case_variants_duckdb_mirror(spark):
    df = spark.createDataFrame(_PM_ROWS, "c long, act string, ts timestamp, tb string")
    got = sorted(
        tuple(r) for r in case_variants(df, "c", "act", "ts", "tb", max_steps=3).collect()
    )
    con = _pm_duckdb()
    assert sorted(tuple(r) for r in con.execute(_VARIANT_MIRROR).fetchall()) == got


def test_cycle_profile_duckdb_mirror(spark):
    df = spark.createDataFrame(_PM_ROWS, "c long, act string, ts timestamp, tb string")
    got = sorted(
        tuple(r) for r in case_cycle_profile(df, "c", "act", "ts", "tb").collect()
    )
    con = _pm_duckdb()
    assert sorted(tuple(r) for r in con.execute(_CYCLE_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.quality.monitors import (  # noqa: E402
    cohens_kappa,
    js_divergence,
    theil_index,
)


def _jsd_reference(ref, cur):
    from collections import Counter

    ca, cb = Counter(ref), Counter(cur)
    na, nb = len(ref), len(cur)
    tp = tq = 0.0
    for c in set(ca) | set(cb):
        p, q = ca.get(c, 0) / na, cb.get(c, 0) / nb
        m = (p + q) / 2
        if p > 0:
            tp += round(p * math.log(p / m), 9)
        if q > 0:
            tq += round(q * math.log(q / m), 9)
    return (tp + tq) / 2


def test_jsd_identical_zero_disjoint_one_bit(spark):
    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 5, "c string")
    r = js_divergence(a, a, "c").collect()[0]
    assert r["jsd_bits"] == 0.0 and r["status"] == "stable"
    b = spark.createDataFrame([("z",)] * 10, "c string")
    r2 = js_divergence(a, b, "c").collect()[0]
    assert r2["jsd_bits"] == pytest.approx(1.0, abs=1e-6)
    assert r2["status"] == "major_shift"


def test_jsd_matches_reference_with_nulls(spark):
    ref = ["a"] * 6 + ["b"] * 3 + [None]
    cur = ["a"] * 3 + ["b"] * 5 + ["c"] * 2
    da = spark.createDataFrame([(x,) for x in ref], "c string")
    db = spark.createDataFrame([(x,) for x in cur], "c string")
    r = js_divergence(da, db, "c").collect()[0]
    exp = _jsd_reference(["__null__" if x is None else x for x in ref], cur)
    assert r["jsd_nats"] == pytest.approx(exp, abs=2e-6)
    assert r["n_categories"] == 4


_JSD_MIRROR = """
WITH cells AS (
  SELECT c, CAST(sum(ra) AS BIGINT) AS a, CAST(sum(rb) AS BIGINT) AS b FROM (
    SELECT coalesce(c, '__null__') AS c, 1 AS ra, 0 AS rb FROM ref_fixture
    UNION ALL
    SELECT coalesce(c, '__null__') AS c, 0 AS ra, 1 AS rb FROM cur_fixture
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


def test_jsd_duckdb_mirror(spark):
    ref = [f"c{i % 5}" for i in range(40)]
    cur = [f"c{(i * 3) % 7}" for i in range(35)]
    da = spark.createDataFrame([(x,) for x in ref], "c string")
    db = spark.createDataFrame([(x,) for x in cur], "c string")
    got = tuple(js_divergence(da, db, "c").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE ref_fixture (c VARCHAR)")
    con.execute("CREATE TABLE cur_fixture (c VARCHAR)")
    con.execute("INSERT INTO ref_fixture VALUES " + ", ".join(f"('{x}')" for x in ref))
    con.execute("INSERT INTO cur_fixture VALUES " + ", ".join(f"('{x}')" for x in cur))
    assert tuple(con.execute(_JSD_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Theil index
# ---------------------------------------------------------------------------


def _theil_reference(rows):
    vals = [(g, v) for g, v in rows if v is not None and v > 0]
    n = len(vals)
    mu = sum(v for _, v in vals) / n
    tt = sum(round((v / mu) * math.log(v / mu), 9) for _, v in vals) / n
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, v in vals:
        by_g[g].append(v)
    s = sum(v for _, v in vals)
    tb = sum(
        round((sum(vs) / s) * math.log((sum(vs) / s) / (len(vs) / n)), 9)
        for vs in by_g.values()
    )
    return n, len(by_g), round(mu, 6), round(tt, 6), round(tb, 6), round(tt - tb, 6)


def test_theil_equal_values_zero(spark):
    df = spark.createDataFrame([("a", 10.0)] * 4 + [("b", 10.0)] * 4, "g string, v double")
    r = theil_index(df, "g", "v").collect()[0]
    assert r["theil_total"] == 0.0 and r["theil_between"] == 0.0


def test_theil_matches_reference_and_decomposition(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0), ("b", 30.0),
            ("c", 5.0), ("c", 0.0), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = theil_index(df, "g", "v").collect()[0]
    ref = _theil_reference(rows)
    assert (r["n"], r["k_groups"]) == ref[:2] and r["n_excluded"] == 2
    assert r["theil_total"] == pytest.approx(ref[3], abs=2e-6)
    assert r["theil_between"] == pytest.approx(ref[4], abs=2e-6)
    assert r["theil_within"] == pytest.approx(ref[5], abs=2e-6)
    # between-group inequality dominates (groups differ 10x)
    assert r["theil_between"] > r["theil_within"]


_THEIL_MIRROR = """
WITH base AS (
  SELECT coalesce(g, '__null__') AS g, CAST(v AS DECIMAL(24,6)) AS v
  FROM fixture WHERE CAST(v AS DECIMAL(24,6)) > 0
), excluded AS (
  SELECT CAST(count(*) AS BIGINT) AS n_excluded FROM fixture
  WHERE v IS NULL OR CAST(v AS DECIMAL(24,6)) <= 0
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


def test_theil_duckdb_mirror(spark):
    rows = [(f"g{i % 3}", float((i * 7 + 1) % 23) + 0.5) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(theil_index(df, "g", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{g}', {v})" for g, v in rows)
    )
    assert tuple(con.execute(_THEIL_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------


def _kappa_reference(pairs):
    from collections import Counter

    pairs = [("__null__" if a is None else a, "__null__" if b is None else b) for a, b in pairs]
    n = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    pe = sum(round((ca[c] / n) * (cb.get(c, 0) / n), 9) for c in ca if c in cb)
    kappa = round((po - pe) / (1 - pe), 6) if pe < 1 else None
    return n, len(ca), len(cb), round(po, 6), round(pe, 6), kappa


def test_kappa_perfect_and_chance(spark):
    same = [("x", "x")] * 5 + [("y", "y")] * 5
    df = spark.createDataFrame(same, "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0
    const = [("x", "x")] * 10  # both constant: pe = 1
    assert cohens_kappa(
        spark.createDataFrame(const, "a string, b string"), "a", "b"
    ).collect()[0]["kappa"] is None


def test_kappa_matches_reference(spark):
    pairs = [("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"), ("y", "x"),
             ("z", "z"), ("z", "y"), (None, None), ("x", None)]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = tuple(cohens_kappa(df, "a", "b").collect()[0])
    ref = _kappa_reference(pairs)
    assert got[:3] == ref[:3]
    for i in (3, 4, 5):
        assert got[i] == pytest.approx(ref[i], abs=2e-6)


_KAPPA_MIRROR = """
WITH base AS (
  SELECT coalesce(a, '__null__') AS a, coalesce(b, '__null__') AS b FROM fixture
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


def test_kappa_duckdb_mirror(spark):
    pairs = [(f"c{i % 4}", f"c{(i * 5 + (1 if i % 7 == 0 else 0)) % 4}") for i in range(60)]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = tuple(cohens_kappa(df, "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (a VARCHAR, b VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    )
    assert tuple(con.execute(_KAPPA_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Classification report
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.features import (  # noqa: E402
    classification_report,
)


def test_classification_report_reference(spark):
    pairs = [("p", "p")] * 6 + [("p", "n")] * 2 + [("n", "p")] * 3 + [("n", "n")] * 9
    df = spark.createDataFrame(pairs, "pred string, y string")
    got = {r["class"]: r for r in classification_report(df, "pred", "y").collect()}
    p = got["p"]
    assert (p["tp"], p["fp"], p["fn"], p["support"]) == (6, 2, 3, 9)
    assert p["precision"] == 0.75 and p["recall"] == pytest.approx(6 / 9, abs=1e-6)
    assert p["f1"] == pytest.approx(2 * 0.75 * (6 / 9) / (0.75 + 6 / 9), abs=1e-6)


def test_classification_report_one_sided_classes(spark):
    pairs = [("a", "a"), ("a", "b"), ("c", "a")]  # 'b' never predicted, 'c' never true
    df = spark.createDataFrame(pairs, "pred string, y string")
    got = {r["class"]: r for r in classification_report(df, "pred", "y").collect()}
    assert got["b"]["precision"] is None and got["b"]["recall"] == 0.0
    assert got["c"]["recall"] is None and got["c"]["precision"] == 0.0


_REPORT_MIRROR = """
WITH base AS (
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


def test_classification_report_duckdb_mirror(spark):
    pairs = [
        (f"c{(i * 3) % 3}", f"c{(i * 3 + (1 if i % 5 == 0 else 0)) % 3}")
        for i in range(45)
    ]
    df = spark.createDataFrame(pairs, "pred string, y string")
    got = sorted(tuple(r) for r in classification_report(df, "pred", "y").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (pred VARCHAR, y VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    )
    assert sorted(tuple(r) for r in con.execute(_REPORT_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Nearest-site assignment
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.spatial import (  # noqa: E402
    nearest_assignment,
)


def test_nearest_assignment_picks_closest_with_tiebreak(spark):
    pts = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 20.05, 20.0), (3, 0.0, 0.0)], "id long, lat double, lon double"
    )
    sites = spark.createDataFrame(
        [("A", 10.1, 10.0), ("B", 20.0, 20.0), ("C", 20.1, 20.0)],
        "site_id string, lat double, lon double",
    )
    got = {r["point_id"]: (r["site_id"], r["distance_km"]) for r in nearest_assignment(pts, sites).collect()}
    assert got[1][0] == "A"
    assert got[2][0] in ("B", "C")  # equidistant: tie broken by site_id
    assert got[2][0] == "B"
    assert got[3][0] == "A"  # nearest of the three from origin


_NEAREST_MIRROR = """
WITH d AS (
  SELECT p.id AS point_id, s.site_id,
    round(2 * 6371.0 * asin(sqrt(
       sin(radians(s.lat - p.lat) / 2) * sin(radians(s.lat - p.lat) / 2)
       + cos(radians(p.lat)) * cos(radians(s.lat))
         * sin(radians(s.lon - p.lon) / 2) * sin(radians(s.lon - p.lon) / 2)
    )), 6) AS distance_km
  FROM pts p CROSS JOIN sites s
), r AS (
  SELECT *, row_number() OVER (PARTITION BY point_id ORDER BY distance_km ASC, site_id ASC) AS rn
  FROM d
)
SELECT point_id, site_id, distance_km FROM r WHERE rn = 1
"""


def test_nearest_assignment_duckdb_mirror(spark):
    pts_rows = [(i, float((i * 13) % 50) - 10.0, float((i * 7) % 80) - 40.0) for i in range(30)]
    site_rows = [(f"S{j}", float(j * 9) - 10.0, float(j * 17) - 30.0) for j in range(5)]
    pts = spark.createDataFrame(pts_rows, "id long, lat double, lon double")
    sites = spark.createDataFrame(site_rows, "site_id string, lat double, lon double")
    got = sorted(tuple(r) for r in nearest_assignment(pts, sites).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (id BIGINT, lat DOUBLE, lon DOUBLE)")
    con.execute("CREATE TABLE sites (site_id VARCHAR, lat DOUBLE, lon DOUBLE)")
    con.execute("INSERT INTO pts VALUES " + ", ".join(f"({i},{a},{b})" for i, a, b in pts_rows))
    con.execute("INSERT INTO sites VALUES " + ", ".join(f"('{s}',{a},{b})" for s, a, b in site_rows))
    assert sorted(tuple(r) for r in con.execute(_NEAREST_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.quality.monitors import bh_adjust  # noqa: E402


def _bh_reference(tests, alpha):
    m = len(tests)
    ranked = sorted(tests, key=lambda t: (t[1], t[0]))
    terms = [round(p * m / (i + 1), 9) for i, (_, p) in enumerate(ranked)]
    qs = []
    run = 1.0
    for t in reversed(terms):
        run = min(run, t)
        qs.append(run)
    qs.reverse()
    return {
        name: (round(p, 6), i + 1, round(min(1.0, q), 6), round(min(1.0, q), 6) <= alpha)
        for i, ((name, p), q) in enumerate(zip(ranked, qs))
    }


def test_bh_matches_reference(spark):
    tests = [("t1", 0.001), ("t2", 0.008), ("t3", 0.039), ("t4", 0.041),
             ("t5", 0.042), ("t6", 0.06), ("t7", 0.074), ("t8", 0.205),
             ("t9", 0.212), ("t10", 0.216)]
    df = spark.createDataFrame(tests, "t string, p double")
    got = {
        r["test"]: (r["p_value"], r["rank"], r["q_value"], r["reject"])
        for r in bh_adjust(df, "t", "p", alpha=0.05).collect()
    }
    assert got == _bh_reference(tests, 0.05)
    # the running min equalizes t3..t5 at q = 0.084 (0.042·10/5), so only
    # the two small p-values survive at alpha = 0.05
    assert got["t1"][3] and got["t2"][3] and not got["t3"][3]
    assert got["t3"][2] == got["t4"][2] == got["t5"][2] == 0.084


def test_bh_monotone_q_and_cap(spark):
    tests = [(f"t{i}", min(1.0, 0.3 + 0.1 * i)) for i in range(9)]
    df = spark.createDataFrame(tests, "t string, p double")
    rows = sorted(bh_adjust(df, "t", "p").collect(), key=lambda r: r["rank"])
    qs = [r["q_value"] for r in rows]
    assert qs == sorted(qs) and max(qs) <= 1.0
    with pytest.raises(ValueError):
        bh_adjust(df, "t", "p", alpha=0.0)


_BH_MIRROR = """
WITH base AS (
  SELECT t AS test, CAST(p AS DOUBLE) AS p FROM fixture WHERE p IS NOT NULL
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
       round(qv, 6) <= 0.05 AS reject
FROM q
"""


def test_bh_duckdb_mirror(spark):
    tests = [(f"m{i:02d}", round(((i * 37) % 97) / 97, 4)) for i in range(25)]
    df = spark.createDataFrame(tests, "t string, p double")
    got = sorted(tuple(r) for r in bh_adjust(df, "t", "p", alpha=0.05).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (t VARCHAR, p DOUBLE)")
    con.execute("INSERT INTO fixture VALUES " + ", ".join(f"('{t}', {p})" for t, p in tests))
    assert sorted(tuple(r) for r in con.execute(_BH_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Stratified allocation
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.llmprep.sampling import (  # noqa: E402
    stratified_allocation,
)


def _alloc_reference(rows, total_n):
    from collections import defaultdict

    by_s = defaultdict(list)
    counts = defaultdict(int)
    for s, v in rows:
        s = "__null__" if s is None else s
        counts[s] += 1
        if v is not None:
            by_s[s].append(v)
    stats = {}
    for s in counts:
        vs = by_s.get(s, [])
        if len(vs) > 1:
            mu = sum(vs) / len(vs)
            sd = math.sqrt(max(0.0, sum((x - mu) ** 2 for x in vs) / (len(vs) - 1)))
        else:
            sd = 0.0
        stats[s] = (counts[s], round(sd, 9))
    tot = sum(c for c, _ in stats.values())

    def lr(quotas):
        base = {s: int(math.floor(q)) for s, q in quotas.items()}
        short = total_n - sum(base.values())
        order = sorted(quotas, key=lambda s: (-round(quotas[s] - base[s], 9), s))
        for s in order[:short]:
            base[s] += 1
        return base

    qp = {s: total_n * c / tot for s, (c, _) in stats.items()}
    wsum = sum(round(c * sd, 9) for c, sd in stats.values())
    qn = (
        {s: total_n * round(c * sd, 9) / wsum for s, (c, sd) in stats.items()}
        if wsum > 0
        else qp
    )
    ap, an = lr(qp), lr(qn)
    return {s: (stats[s][0], round(stats[s][1], 6), ap[s], an[s]) for s in stats}


def test_alloc_sums_exact_and_neyman_oversamples_volatile(spark):
    rows = (
        [("flat", 10.0)] * 40
        + [("wild", float(v)) for v in (0, 50, 100, 0, 80, 20, 60, 90, 10, 70)] * 4
    )
    df = spark.createDataFrame(rows, "s string, v double")
    got = {
        r["stratum"]: (r["n_pop"], r["sd"], r["alloc_proportional"], r["alloc_neyman"])
        for r in stratified_allocation(df, "s", "v", total_n=20).collect()
    }
    assert sum(v[2] for v in got.values()) == 20
    assert sum(v[3] for v in got.values()) == 20
    # equal sizes: proportional splits evenly, Neyman tilts to the volatile one
    assert got["flat"][2] == got["wild"][2] == 10
    assert got["wild"][3] > got["flat"][3]
    assert got["flat"][3] == 0  # sd 0 stratum gets nothing under Neyman


def test_alloc_matches_reference(spark):
    rows = [(f"s{i % 3}", float((i * 7) % 13) if i % 11 else None) for i in range(50)]
    df = spark.createDataFrame(rows, "s string, v double")
    got = {
        r["stratum"]: (r["n_pop"], r["sd"], r["alloc_proportional"], r["alloc_neyman"])
        for r in stratified_allocation(df, "s", "v", total_n=17).collect()
    }
    ref = _alloc_reference(rows, 17)
    for s in ref:
        assert got[s][0] == ref[s][0]
        assert got[s][1] == pytest.approx(ref[s][1], abs=1e-6)
        assert got[s][2:] == ref[s][2:]


_ALLOC_MIRROR = """
WITH cells AS (
  SELECT coalesce(s, '__null__') AS stratum,
         CAST(count(*) AS BIGINT) AS n_pop,
         CAST(count(v) AS BIGINT) AS nv,
         sum(CAST(v AS DECIMAL(24,6))) AS sv,
         sum(CAST(v AS DECIMAL(24,6)) * CAST(v AS DECIMAL(24,6))) AS ssv
  FROM fixture GROUP BY 1
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
    {N} * CAST(n_pop AS DOUBLE) / CAST(tot AS DOUBLE) AS qp,
    CASE WHEN CAST(wsum AS DOUBLE) > 0
         THEN {N} * round(CAST(n_pop AS DOUBLE) * sd, 9) / CAST(wsum AS DOUBLE)
         ELSE {N} * CAST(n_pop AS DOUBLE) / CAST(tot AS DOUBLE) END AS qn
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
  CAST(bp + CASE WHEN rp <= {N} - sbp THEN 1 ELSE 0 END AS BIGINT) AS alloc_proportional,
  CAST(bn + CASE WHEN rn <= {N} - sbn THEN 1 ELSE 0 END AS BIGINT) AS alloc_neyman
FROM fl
"""


def test_alloc_duckdb_mirror(spark):
    rows = [(f"s{i % 4}", float((i * 11 + 3) % 19)) for i in range(60)]
    df = spark.createDataFrame(rows, "s string, v double")
    got = sorted(tuple(r) for r in stratified_allocation(df, "s", "v", total_n=23).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (s VARCHAR, v DOUBLE)")
    con.execute("INSERT INTO fixture VALUES " + ", ".join(f"('{s}', {v})" for s, v in rows))
    sql = _ALLOC_MIRROR.replace("{N}", "23.0")
    assert sorted(tuple(r) for r in con.execute(sql).fetchall()) == got


# ---------------------------------------------------------------------------
# Forecast errors
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.trend import forecast_errors  # noqa: E402


def _fc_reference(series):
    """series: [(t, a, f)] sorted by t."""
    series = sorted(series)
    n = len(series)
    mae = sum(abs(a - f) for _, a, f in series) / n
    rmse = math.sqrt(sum((a - f) ** 2 for _, a, f in series) / n)
    mape_rows = [(a, f) for _, a, f in series if a != 0]
    mape = (
        sum(round(abs(a - f) / abs(a), 9) for a, f in mape_rows) / len(mape_rows)
        if mape_rows
        else None
    )
    smape_rows = [(a, f) for _, a, f in series if abs(a) + abs(f) > 0]
    smape = (
        sum(round(2 * abs(a - f) / (abs(a) + abs(f)), 9) for a, f in smape_rows)
        / len(smape_rows)
        if smape_rows
        else None
    )
    naive = [abs(series[i][1] - series[i - 1][1]) for i in range(1, n)]
    scale = sum(naive) / len(naive) if naive else None
    mase = round(mae / scale, 6) if scale else None
    return (
        n,
        sum(1 for _, a, _ in series if a == 0),
        round(mae, 6),
        round(rmse, 6),
        round(mape, 6) if mape is not None else None,
        round(smape, 6) if smape is not None else None,
        mase,
    )


def test_forecast_errors_matches_reference(spark):
    series = [(t, float((t * 7) % 11), float((t * 7) % 11) + (1.5 if t % 3 == 0 else -0.5)) for t in range(12)]
    df = spark.createDataFrame([("s", t, a, f) for t, a, f in series], "k string, t int, a double, f double")
    r = forecast_errors(df, ["k"], "t", "a", "f").collect()[0]
    ref = _fc_reference(series)
    assert (r["n"], r["n_zero_actual"]) == ref[:2]
    for i, c in enumerate(("mae", "rmse", "mape", "smape", "mase"), start=2):
        assert r[c] == pytest.approx(ref[i], abs=2e-6), c


def test_forecast_errors_perfect_forecast(spark):
    df = spark.createDataFrame(
        [("s", t, float(t + 1), float(t + 1)) for t in range(5)],
        "k string, t int, a double, f double",
    )
    r = forecast_errors(df, ["k"], "t", "a", "f").collect()[0]
    assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["mase"] == 0.0


def test_forecast_errors_flat_series_mase_null(spark):
    df = spark.createDataFrame(
        [("s", t, 5.0, 6.0) for t in range(5)], "k string, t int, a double, f double"
    )
    r = forecast_errors(df, ["k"], "t", "a", "f").collect()[0]
    assert r["mase"] is None and r["mae"] == 1.0


_FC_MIRROR = """
WITH base AS (
  SELECT k, CAST(t AS BIGINT) AS t, CAST(a AS DECIMAL(24,6)) AS a, CAST(f AS DECIMAL(24,6)) AS f
  FROM fixture WHERE a IS NOT NULL AND f IS NOT NULL AND t IS NOT NULL
), lagged AS (
  SELECT *, lag(a) OVER (PARTITION BY k ORDER BY t ASC) AS prev FROM base
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
SELECT k, n, n_zero_actual,
  round(CAST(sae AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mae,
  round(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS rmse,
  round(CASE WHEN nmape > 0 THEN CAST(smap AS DOUBLE) / CAST(nmape AS DOUBLE) END, 6) AS mape,
  round(CASE WHEN nsm > 0 THEN CAST(ssm AS DOUBLE) / CAST(nsm AS DOUBLE) END, 6) AS smape,
  CASE WHEN nnaive > 0 AND CAST(snaive AS DOUBLE) / CAST(nnaive AS DOUBLE) > 0
       THEN round((CAST(sae AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(snaive AS DOUBLE) / CAST(nnaive AS DOUBLE)), 6) END AS mase
FROM agg
"""


def test_forecast_errors_duckdb_mirror(spark):
    rows = [("a", t, float((t * 13) % 7), float((t * 5) % 9)) for t in range(15)] + [
        ("b", t, float(t % 4), float((t + 1) % 4)) for t in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, t int, a double, f double")
    got = sorted(tuple(r) for r in forecast_errors(df, ["k"], "t", "a", "f").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, t INT, a DOUBLE, f DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {t}, {a}, {f})" for k, t, a, f in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_FC_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.quality.monitors import kendall_tau  # noqa: E402


def _tau_reference(pairs):
    pairs = [(x, y) for x, y in pairs if x is not None and y is not None]
    n = len(pairs)
    c = d = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (pairs[j][0] > pairs[i][0]) - (pairs[j][0] < pairs[i][0])
            sy = (pairs[j][1] > pairs[i][1]) - (pairs[j][1] < pairs[i][1])
            if sx == 0 and sy == 0:
                txy += 1
            elif sx == 0:
                tx += 1
            elif sy == 0:
                ty += 1
            elif sx * sy > 0:
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) / 2
    denom = math.sqrt((n0 - (tx + txy)) * (n0 - (ty + txy)))
    tau = round((c - d) / denom, 6) if denom > 0 else None
    return n, c, d, tau


def test_tau_perfect_and_inverted(spark):
    rows = [("s", float(i), float(i * 2)) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    assert kendall_tau(df, "x", "y", ["k"]).collect()[0]["tau_b"] == 1.0
    inv = spark.createDataFrame(
        [("s", float(i), float(-i)) for i in range(8)], "k string, x double, y double"
    )
    assert kendall_tau(inv, "x", "y", ["k"]).collect()[0]["tau_b"] == -1.0


def test_tau_matches_reference_with_ties(spark):
    pairs = [(1.0, 2.0), (1.0, 3.0), (2.0, 2.0), (3.0, 1.0), (3.0, 5.0),
             (4.0, 4.0), (5.0, 4.0), (None, 1.0), (2.0, None)]
    df = spark.createDataFrame([("s", x, y) for x, y in pairs], "k string, x double, y double")
    r = kendall_tau(df, "x", "y", ["k"]).collect()[0]
    ref = _tau_reference(pairs)
    assert (r["n"], r["concordant"], r["discordant"]) == ref[:3]
    assert r["tau_b"] == pytest.approx(ref[3], abs=2e-6)


def test_tau_constant_axis_null(spark):
    df = spark.createDataFrame(
        [("s", 1.0, float(i)) for i in range(5)], "k string, x double, y double"
    )
    assert kendall_tau(df, "x", "y", ["k"]).collect()[0]["tau_b"] is None


_TAU_MIRROR = """
WITH base AS (
  SELECT k, x, y, row_number() OVER (ORDER BY x, y) AS rid
  FROM fixture WHERE x IS NOT NULL AND y IS NOT NULL
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
SELECT a.k, c.n, a.concordant, a.discordant,
  CASE WHEN CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.tx + a.txy AS DOUBLE) > 0
        AND CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.ty + a.txy AS DOUBLE) > 0
       THEN round((CAST(a.concordant AS DOUBLE) - CAST(a.discordant AS DOUBLE))
            / sqrt((CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.tx + a.txy AS DOUBLE))
                   * (CAST(c.n AS DOUBLE) * (CAST(c.n AS DOUBLE) - 1) / 2 - CAST(a.ty + a.txy AS DOUBLE))), 6)
  END AS tau_b
FROM agg a JOIN counts c ON c.k = a.k
"""


def test_tau_duckdb_mirror(spark):
    rows = [(f"k{i % 2}", float((i * 7) % 11), float((i * 5 + 1) % 9)) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = sorted(tuple(r) for r in kendall_tau(df, "x", "y", ["k"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, x DOUBLE, y DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{k}', {x}, {y})" for k, x, y in rows)
    )
    mirror = sorted(
        (r[0], r[1], r[2], r[3], r[4]) for r in con.execute(_TAU_MIRROR).fetchall()
    )
    # column order: k, n, concordant, discordant, tau_b
    assert mirror == got


# ---------------------------------------------------------------------------
# Quantile normalization
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.operators.features import (  # noqa: E402
    quantile_normalize,
)


def _qn_reference(rows):
    """rows: (group, tb, value). Returns {(g, tb): (frac, normalized)}."""
    pooled = sorted(((v, tb) for _, tb, v in rows if v is not None))
    N = len(pooled)
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, tb, v in rows:
        if v is not None:
            by_g[g].append((v, tb))
    out = {}
    for g, vs in by_g.items():
        vs.sort()
        ng = len(vs)
        for r, (v, tb) in enumerate(vs, start=1):
            tgt = (r * N + ng - 1) // ng
            out[(g, tb)] = (round(r / ng, 6), pooled[tgt - 1][0])
    return out


def test_qn_matches_reference_and_aligns_groups(spark):
    rows = (
        [("a", f"a{i}", float(i)) for i in range(10)]            # uniform 0..9
        + [("b", f"b{i}", float(i * 100)) for i in range(5)]     # same shape, x100
    )
    df = spark.createDataFrame(rows, "g string, tb string, v double")
    got = {
        (r["group"], r["tiebreak"]): (r["quantile_frac"], r["normalized"])
        for r in quantile_normalize(df, "g", "v", "tb").collect()
    }
    assert got == _qn_reference(rows)
    # both groups' maxima map to the pooled maximum (b's 400)
    assert got[("a", "a9")][1] == got[("b", "b4")][1] == 400.0


def test_qn_single_group_is_identityish(spark):
    rows = [("a", f"t{i}", float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, tb string, v double")
    for r in quantile_normalize(df, "g", "v", "tb").collect():
        assert r["normalized"] == r["value"]  # one group: pooled == own


_QN_MIRROR = """
WITH base AS (
  SELECT CAST(g AS VARCHAR) AS grp, tb, CAST(v AS DOUBLE) AS v
  FROM fixture WHERE v IS NOT NULL
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


def test_qn_duckdb_mirror(spark):
    rows = [(f"g{i % 3}", f"t{i:02d}", float((i * 17) % 23)) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, tb string, v double")
    got = sorted(tuple(r) for r in quantile_normalize(df, "g", "v", "tb").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, tb VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{g}', '{t}', {v})" for g, t, v in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_QN_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# HHI concentration
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.quality.monitors import (  # noqa: E402
    hhi_concentration,
)


def test_hhi_monopoly_and_uniform(spark):
    mono = spark.createDataFrame([("k", "a", 100.0), ("k", "b", 0.0)], "k string, g string, v double")
    r = hhi_concentration(mono, "g", "v", ["k"]).collect()[0]
    assert r["hhi"] == 10000.0 and r["verdict"] == "concentrated"
    assert r["effective_n"] == 1.0
    uni = spark.createDataFrame(
        [("k", f"g{i}", 10.0) for i in range(10)], "k string, g string, v double"
    )
    r2 = hhi_concentration(uni, "g", "v", ["k"]).collect()[0]
    assert r2["hhi"] == 1000.0 and r2["verdict"] == "unconcentrated"
    assert r2["effective_n"] == pytest.approx(10.0, abs=1e-3)


def test_hhi_reference_and_exclusions(spark):
    rows = [("k", "a", 50.0), ("k", "b", 30.0), ("k", "c", 20.0),
            ("k", "d", None), ("k", "e", -5.0)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    r = hhi_concentration(df, "g", "v", ["k"]).collect()[0]
    exp = round((0.5**2 + 0.3**2 + 0.2**2) * 10000, 2)
    assert r["hhi"] == pytest.approx(exp, abs=0.01)
    assert r["n_groups"] == 3  # NULL and negative values excluded


_HHI_MIRROR = """
WITH cells AS (
  SELECT k, coalesce(g, '__null__') AS g, sum(CAST(v AS DECIMAL(24,6))) AS s
  FROM fixture WHERE v IS NOT NULL AND CAST(v AS DECIMAL(24,6)) >= 0
  GROUP BY 1, 2
), t AS (
  SELECT *, sum(s) OVER (PARTITION BY k) AS tot FROM cells
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_groups,
    sum(CASE WHEN tot > 0 THEN CAST(round((CAST(s AS DOUBLE) / CAST(tot AS DOUBLE))
        * (CAST(s AS DOUBLE) / CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9))
        ELSE CAST(0 AS DECIMAL(28,9)) END) AS ss
  FROM t GROUP BY 1
)
SELECT k, n_groups,
  round(CAST(ss AS DOUBLE) * 10000.0, 2) AS hhi,
  CASE WHEN CAST(ss AS DOUBLE) > 0 THEN round(1.0 / CAST(ss AS DOUBLE), 4) END AS effective_n,
  CASE WHEN round(CAST(ss AS DOUBLE) * 10000.0, 2) < 1500 THEN 'unconcentrated'
       WHEN round(CAST(ss AS DOUBLE) * 10000.0, 2) <= 2500 THEN 'moderate'
       ELSE 'concentrated' END AS verdict
FROM agg
"""


def test_hhi_duckdb_mirror(spark):
    rows = [(f"k{i % 2}", f"g{(i * 3) % 5}", float((i * 7 + 1) % 13)) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = sorted(tuple(r) for r in hhi_concentration(df, "g", "v", ["k"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, g VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', '{g}', {v})" for k, g, v in rows)
    )
    assert sorted(tuple(r) for r in con.execute(_HHI_MIRROR).fetchall()) == got


# ---------------------------------------------------------------------------
# Vocabulary richness
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.llmprep.text import vocab_richness  # noqa: E402


def test_vocab_richness_reference(spark):
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the dog sat"), (2, "  ")],
        "doc_id long, text string",
    )
    r = vocab_richness(docs).collect()[0]
    # tokens: the x3, cat, sat x2, on, mat, dog => N=9, V=6
    assert (r["n_tokens"], r["vocab_size"]) == (9, 6)
    assert r["hapax_count"] == 4 and r["dis_count"] == 1  # sat twice
    assert r["ttr"] == pytest.approx(6 / 9, abs=1e-6)
    assert r["hapax_share"] == pytest.approx(4 / 6, abs=1e-6)


_RICHNESS_MIRROR = """
WITH ex AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM fixture
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


def test_vocab_richness_duckdb_mirror(spark):
    texts = [f"tok{i % 7} tok{(i * 3) % 11} filler word{i}" for i in range(20)]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = tuple(vocab_richness(docs).collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (doc_id BIGINT, text VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    )
    assert tuple(con.execute(_RICHNESS_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Property-based parity: randomized tie layouts and censoring patterns
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_small_vals = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 6)),
    min_size=3,
    max_size=25,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_small_vals)
def test_kruskal_random_ties_match_reference(spark, rows):
    frows = [(g, float(v)) for g, v in rows]
    df = spark.createDataFrame(frows, "g string, v double")
    got = tuple(kruskal_wallis(df, "g", "v").collect()[0])
    ref = _kw_reference(frows)
    assert got[:2] == ref[:2]
    for i in (2, 3, 4):
        if ref[i] is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(ref[i], abs=2e-5)


_pairs_xy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=2, max_size=20
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pairs=_pairs_xy)
def test_kendall_random_ties_match_reference(spark, pairs):
    fp = [(float(x), float(y)) for x, y in pairs]
    df = spark.createDataFrame([("s", x, y) for x, y in fp], "k string, x double, y double")
    r = kendall_tau(df, "x", "y", ["k"]).collect()[0]
    ref = _tau_reference(fp)
    assert (r["n"], r["concordant"], r["discordant"]) == ref[:3]
    if ref[3] is None:
        assert r["tau_b"] is None
    else:
        assert r["tau_b"] == pytest.approx(ref[3], abs=2e-6)


_lr_obs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(1, 8),
        st.integers(0, 1),
    ),
    min_size=2,
    max_size=24,
).filter(lambda rows: {g for g, _, _ in rows} == {"a", "b"})


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(obs=_lr_obs)
def test_logrank_random_censoring_matches_reference(spark, obs):
    df = spark.createDataFrame(obs, "g string, dur int, ev int")
    got = tuple(log_rank_test(df, "dur", "ev", "g", "a", "b").collect()[0])
    ref = _logrank_reference(obs)
    assert got[:3] == ref[:3] and got[4] == ref[4]
    for i in (3, 5, 6, 7):
        if ref[i] is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(ref[i], abs=2e-5)


# ---------------------------------------------------------------------------
# Two-proportion z-test
# ---------------------------------------------------------------------------

from telecom_dataengineering_pipeline_spark.quality.monitors import (  # noqa: E402
    two_proportion_test,
)


def _zprop_reference(rows, a, b):
    na = sum(1 for g, _ in rows if g == a)
    nb = sum(1 for g, _ in rows if g == b)
    sa = sum(1 for g, y in rows if g == a and y > 0)
    sb = sum(1 for g, y in rows if g == b and y > 0)
    pa, pb = sa / na, sb / nb
    pool = (sa + sb) / (na + nb)
    se = math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    z = round((pa - pb) / se, 6) if se > 0 else None
    seu = math.sqrt(pa * (1 - pa) / na + pb * (1 - pb) / nb)
    return (na, nb, round(pa, 6), round(pb, 6), round(pa - pb, 6),
            round(1.959963984540054 * seu, 6), z)


def test_zprop_matches_reference(spark):
    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 45 + [("b", 0)] * 55
    df = spark.createDataFrame(rows, "g string, y int")
    got = tuple(two_proportion_test(df, "g", "y", "a", "b").collect()[0])
    ref = _zprop_reference(rows, "a", "b")
    assert got[:2] == ref[:2]
    for i in range(2, 7):
        assert got[i] == pytest.approx(ref[i], abs=2e-6)
    assert got[6] < -2  # b converts more: strongly negative z


def test_zprop_degenerate_all_success(spark):
    rows = [("a", 1)] * 5 + [("b", 1)] * 5
    df = spark.createDataFrame(rows, "g string, y int")
    r = two_proportion_test(df, "g", "y", "a", "b").collect()[0]
    assert r["z_stat"] is None and r["diff"] == 0.0


_ZPROP_MIRROR = """
WITH base AS (
  SELECT CASE WHEN g = 'a' THEN 1 ELSE 0 END AS a,
         CASE WHEN g = 'b' THEN 1 ELSE 0 END AS b,
         CASE WHEN y > 0 THEN 1 ELSE 0 END AS y
  FROM fixture WHERE g IN ('a', 'b') AND y IS NOT NULL
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


def test_zprop_duckdb_mirror(spark):
    rows = [(f"{'ab'[i % 2]}", 1 if (i * 7) % 5 < 2 else 0) for i in range(80)]
    df = spark.createDataFrame(rows, "g string, y int")
    got = tuple(two_proportion_test(df, "g", "y", "a", "b").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, y INT)")
    con.execute("INSERT INTO fixture VALUES " + ", ".join(f"('{g}', {y})" for g, y in rows))
    assert tuple(con.execute(_ZPROP_MIRROR).fetchone()) == got


# ---------------------------------------------------------------------------
# Streaming JSD drift: batch ≡ stream parity across micro-batch splits
# ---------------------------------------------------------------------------


def _run_jsd_stream(spark, tmpdir, rows_by_file, ref_counts, sink):
    import os

    from telecom_dataengineering_pipeline_spark.streaming.monitors import jsd_stream

    schema = "key string, cat string"
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(tmpdir, f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(tmpdir + "/b*")
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
    import pyspark.sql.functions as SF

    return (
        spark.table(sink)
        .groupBy("key")
        .agg(
            SF.max_by("jsd_nats", "n_cur").alias("jsd_nats"),
            SF.max_by("jsd_bits", "n_cur").alias("jsd_bits"),
            SF.max_by("status", "n_cur").alias("status"),
            SF.max("n_cur").alias("n_cur"),
            SF.max_by("n_categories", "n_cur").alias("n_categories"),
        )
        .collect()[0]
    )


@pytest.mark.slow
def test_jsd_stream_equals_batch_across_splits(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.quality.monitors import js_divergence

    ref_rows = ["a"] * 12 + ["b"] * 6 + ["c"] * 2
    cur_rows = ["a"] * 4 + ["b"] * 9 + ["d"] * 5
    ref_counts = {"a": 12, "b": 6, "c": 2}
    batch = js_divergence(
        spark.createDataFrame([(x,) for x in ref_rows], "c string"),
        spark.createDataFrame([(x,) for x in cur_rows], "c string"),
        "c",
    ).collect()[0]
    # split A: one file; split B: two files cut mid-category
    one = _run_jsd_stream(
        spark, str(tmp_path / "one"), [[("k", c) for c in cur_rows]], ref_counts, "jsd_one"
    )
    two = _run_jsd_stream(
        spark,
        str(tmp_path / "two"),
        [[("k", c) for c in cur_rows[:7]], [("k", c) for c in cur_rows[7:]]],
        ref_counts,
        "jsd_two",
    )
    for got in (one, two):
        assert got["jsd_nats"] == batch["jsd_nats"]
        assert got["jsd_bits"] == batch["jsd_bits"]
        assert got["status"] == batch["status"]
        assert got["n_cur"] == batch["n_cur"]
        assert got["n_categories"] == batch["n_categories"]


def test_jsd_stream_identical_mix_stable(spark, tmp_path):
    rows = ["x"] * 9 + ["y"] * 3
    got = _run_jsd_stream(
        spark, str(tmp_path / "s"), [[("k", c) for c in rows]], {"x": 9, "y": 3}, "jsd_same"
    )
    assert got["jsd_bits"] == 0.0 and got["status"] == "stable"
