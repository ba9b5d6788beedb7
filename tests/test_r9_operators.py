"""Round-7 session-3 operator tests: brute-force / reference parity and
edge-case matrices for WOE/IV, NDCG@k, Kaplan–Meier, item–item CF,
Holt–Winters, and BFS hop distance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.features import (
    ndcg_at_k,
    woe_iv_profile,
)


# ---------------------------------------------------------------------------
# WOE / IV
# ---------------------------------------------------------------------------


def _woe_reference(rows, s):
    """Plain-Python WOE/IV over (cat, label) pairs."""
    cells: dict[str, list[int]] = {}
    for cat, y in rows:
        if y is None:
            continue
        c = "__null__" if cat is None else str(cat)
        n_pos, n_neg = cells.setdefault(c, [0, 0])
        cells[c] = [n_pos + y, n_neg + (1 - y)]
    tp = sum(v[0] for v in cells.values())
    tn = sum(v[1] for v in cells.values())
    C = len(cells)
    out = {}
    ivc = {}
    for c, (p, n) in cells.items():
        dp = (p + s) / (tp + s * C)
        dn = (n + s) / (tn + s * C)
        woe = math.log(dp / dn)
        out[c] = (p + n, p, n, round(woe, 6))
        ivc[c] = round((dp - dn) * woe, 9)
    iv = round(float(sum(ivc.values())), 6)
    return out, ivc, iv


def test_woe_iv_matches_reference(spark):
    rows = (
        [("gold", 1)] * 30
        + [("gold", 0)] * 10
        + [("silver", 1)] * 10
        + [("silver", 0)] * 30
        + [("bronze", 1)] * 5
        + [("bronze", 0)] * 5
        + [(None, 1)] * 3
        + [("rare", 0)] * 2
        + [("gold", None)]  # NULL label excluded
    )
    df = spark.createDataFrame(rows, "cat string, y int")
    got = {r["category"]: r for r in woe_iv_profile(df, "cat", "y", smoothing=0.5).collect()}
    ref, ivc, iv = _woe_reference(rows, 0.5)
    assert set(got) == set(ref)
    for c, (n, p, nn, woe) in ref.items():
        r = got[c]
        assert (r["n"], r["n_pos"], r["n_neg"]) == (n, p, nn)
        assert r["woe"] == pytest.approx(woe, abs=1e-6)
        assert r["iv_contrib"] == pytest.approx(ivc[c], abs=1e-9)
        assert r["iv_total"] == pytest.approx(iv, abs=1e-6)
    # direction: gold is positive-heavy => woe > 0; silver negative => < 0
    assert got["gold"]["woe"] > 0 > got["silver"]["woe"]
    # one-sided levels stay finite under smoothing
    assert got["rare"]["woe"] is not None and math.isfinite(got["rare"]["woe"])


def test_woe_iv_validates_smoothing(spark):
    df = spark.createDataFrame([("a", 1)], "cat string, y int")
    with pytest.raises(ValueError):
        woe_iv_profile(df, "cat", "y", smoothing=-1.0)


def test_woe_iv_duckdb_mirror(spark):
    import duckdb

    rows = (
        [("a", 1)] * 7 + [("a", 0)] * 3 + [("b", 1)] * 2 + [("b", 0)] * 8
        + [(None, 0)] * 4 + [("c", 1)] * 1
    )
    df = spark.createDataFrame(rows, "cat string, y int")
    got = sorted(tuple(r) for r in woe_iv_profile(df, "cat", "y", smoothing=0.5).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (cat VARCHAR, y INTEGER)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(
            "(" + ("NULL" if c is None else f"'{c}'") + f", {y})" for c, y in rows
        )
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH cells AS (
  SELECT coalesce(cat, '__null__') AS category,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM fixture WHERE y IS NOT NULL GROUP BY 1
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
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# NDCG@k
# ---------------------------------------------------------------------------


def _ndcg_reference(rows, k):
    """rows: (q, doc, score, rel)."""
    out = {}
    qs = {q for q, *_ in rows}
    for q in qs:
        docs = [(d, s, r) for qq, d, s, r in rows if qq == q]
        by_score = sorted(docs, key=lambda x: (-x[1], x[0]))
        by_rel = sorted(docs, key=lambda x: (-x[2], x[0]))
        dcg = sum(
            round((2 ** r - 1) / (math.log(i + 2.0) / math.log(2.0)), 9)
            for i, (_, _, r) in enumerate(by_score[:k])
        )
        idcg = sum(
            round((2 ** r - 1) / (math.log(i + 2.0) / math.log(2.0)), 9)
            for i, (_, _, r) in enumerate(by_rel[:k])
        )
        out[q] = (
            len(docs),
            round(dcg, 6),
            round(idcg, 6),
            round(dcg / idcg, 6) if idcg > 0 else None,
        )
    return out


def test_ndcg_matches_reference(spark):
    rows = [
        # q1: perfect ranking
        ("q1", 1, 0.9, 3), ("q1", 2, 0.8, 2), ("q1", 3, 0.7, 1), ("q1", 4, 0.6, 0),
        # q2: inverted ranking
        ("q2", 1, 0.9, 0), ("q2", 2, 0.8, 1), ("q2", 3, 0.7, 2), ("q2", 4, 0.6, 3),
        # q3: no relevant docs -> ndcg NULL
        ("q3", 1, 0.5, 0), ("q3", 2, 0.4, 0),
        # q4: ties on score, broken by doc id
        ("q4", 1, 0.5, 2), ("q4", 2, 0.5, 0), ("q4", 3, 0.5, 3),
    ]
    df = spark.createDataFrame(rows, "q string, doc int, score double, rel int")
    got = {
        r["q"]: (r["n_docs"], r["dcg"], r["idcg"], r["ndcg"])
        for r in ndcg_at_k(df, ["q"], "score", "rel", k=3, tiebreak_col="doc").collect()
    }
    ref = _ndcg_reference(rows, 3)
    for q, (n, dcg, idcg, ndcg) in ref.items():
        gn, gd, gi, gnd = got[q]
        assert gn == n
        assert gd == pytest.approx(dcg, abs=1e-6)
        assert gi == pytest.approx(idcg, abs=1e-6)
        if ndcg is None:
            assert gnd is None
        else:
            assert gnd == pytest.approx(ndcg, abs=1e-6)
    assert got["q1"][3] == 1.0  # perfect order
    assert got["q2"][3] < 1.0  # inverted loses
    assert got["q3"][3] is None


def test_ndcg_validates_k(spark):
    df = spark.createDataFrame([("q", 1, 0.5, 1)], "q string, doc int, score double, rel int")
    with pytest.raises(ValueError):
        ndcg_at_k(df, ["q"], "score", "rel", k=0)


# ---------------------------------------------------------------------------
# Kaplan–Meier
# ---------------------------------------------------------------------------


def _km_reference(rows):
    """Textbook product-limit over (key, duration, event) observations."""
    out = {}
    keys = {k for k, *_ in rows}
    for k in keys:
        obs = sorted((d, e) for kk, d, e in rows if kk == k)
        durations = sorted({d for d, _ in obs})
        total = len(obs)
        removed = 0
        s = 1.0
        dead = False
        for t in durations:
            d_i = sum(1 for dd, e in obs if dd == t and e == 1)
            c_i = sum(1 for dd, e in obs if dd == t and e == 0)
            n_i = total - removed
            if d_i == n_i:
                dead = True
            if not dead:
                # mirror the operator's round-then-decimal ln chain
                s_ln = sum(
                    round(
                        math.log(
                            1.0
                            - sum(1 for dd, e in obs if dd == tt and e == 1)
                            / (
                                total
                                - sum(1 for dd, _ in obs if dd < tt)
                            )
                        ),
                        9,
                    )
                    for tt in durations
                    if tt <= t
                )
                surv = round(math.exp(s_ln), 6)
            else:
                surv = 0.0
            out[(k, t)] = (n_i, d_i, c_i, surv)
            removed += d_i + c_i
    return out


def test_kaplan_meier_matches_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.survival import kaplan_meier

    rows = [
        # classic textbook arm: events at 1,3,4; censored at 2,5
        ("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 3, 1), ("a", 4, 1), ("a", 5, 0),
        # arm where everyone eventually dies (curve reaches 0)
        ("b", 1, 1), ("b", 2, 1), ("b", 2, 1),
        # censored-only arm (curve stays 1)
        ("c", 1, 0), ("c", 2, 0),
    ]
    df = spark.createDataFrame(rows, "k string, dur int, ev int")
    got = {
        (r["k"], r["duration"]): (r["n_risk"], r["n_event"], r["n_censored"], r["survival"])
        for r in kaplan_meier(df, "dur", "ev", ["k"]).collect()
    }
    ref = _km_reference(rows)
    assert set(got) == set(ref)
    for key, (n, d, c, s) in ref.items():
        gn, gd, gc, gs = got[key]
        assert (gn, gd, gc) == (n, d, c), key
        assert gs == pytest.approx(s, abs=1e-6), key
    assert got[("b", 2)][3] == 0.0  # everyone dead
    assert got[("c", 2)][3] == 1.0  # censoring never drops the curve


def test_kaplan_meier_censoring_vs_event_differs(spark):
    """A censored observation must NOT lower the curve the way an event
    does — the defining property vs naive death-rate rollups."""
    from telecom_dataengineering_pipeline_spark.operators.survival import kaplan_meier

    ev = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 1), ("k", 3, 1)], "k string, dur int, ev int"
    )
    cen = spark.createDataFrame(
        [("k", 1, 1), ("k", 2, 0), ("k", 3, 1)], "k string, dur int, ev int"
    )
    s_ev = {r["duration"]: r["survival"] for r in kaplan_meier(ev, "dur", "ev", ["k"]).collect()}
    s_cen = {r["duration"]: r["survival"] for r in kaplan_meier(cen, "dur", "ev", ["k"]).collect()}
    assert s_cen[2] > s_ev[2]  # censoring at 2 keeps the curve higher
    # with the middle observation censored, the last one still dies: the
    # curve drops to 0 at t=3 in both arms
    assert s_ev[3] == 0.0 and s_cen[3] == 0.0


def test_kaplan_meier_two_grain_exchanges(spark):
    """Shape pin: the map-side-combined (key, duration) aggregate is the
    only exchange at observation grain; the keyed window exchange carries
    the already-collapsed duration grain. All four window columns share
    the second exchange — no further shuffles, no self-join."""
    from telecom_dataengineering_pipeline_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(
        [("k", i % 7 + 1, i % 3 != 0) for i in range(50)], "k string, dur int, ev boolean"
    )
    plan = (
        kaplan_meier(df.withColumn("ev", F.col("ev").cast("int")), "dur", "ev", ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "HashAggregate" in plan and "Join" not in plan


def test_kaplan_meier_duckdb_mirror(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.survival import kaplan_meier

    rows = [
        ("x", (i * 7 + 3) % 11 + 1, 1 if i % 3 else 0) for i in range(40)
    ] + [("y", (i * 5 + 1) % 6 + 1, i % 2) for i in range(25)]
    df = spark.createDataFrame(rows, "k string, dur int, ev int")
    got = sorted(tuple(r) for r in kaplan_meier(df, "dur", "ev", ["k"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, dur INTEGER, ev INTEGER)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {d}, {e})" for k, d, e in rows)
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH g AS (
  SELECT k, CAST(dur AS BIGINT) AS duration,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(ev) AS BIGINT) AS d
  FROM fixture GROUP BY 1, 2
), r AS (
  SELECT k, duration, d, n - d AS c,
    CAST(sum(n) OVER (PARTITION BY k)
         - coalesce(sum(n) OVER (PARTITION BY k ORDER BY duration
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM g
), s AS (
  SELECT k, duration, n_risk, d, c,
    sum(CASE WHEN d < n_risk THEN CAST(round(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(28,9))
             ELSE CAST(0 AS DECIMAL(28,9)) END)
      OVER (PARTITION BY k ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum,
    sum(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
      OVER (PARTITION BY k ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zs
  FROM r
)
SELECT k, duration, n_risk, d AS n_event, c AS n_censored,
       CASE WHEN zs > 0 THEN 0.0 ELSE round(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
FROM s
"""
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# Item–item collaborative filtering
# ---------------------------------------------------------------------------


def _cf_reference(rows, k, min_count, cap=None):
    from collections import defaultdict

    ui = sorted(set(rows))
    items = defaultdict(set)
    for u, i in ui:
        items[i].add(u)
    freq = {i for i, us in items.items() if len(us) >= min_count}
    if cap is not None:
        basket = defaultdict(set)
        for u, i in ui:
            if i in freq:
                basket[u].add(i)
        ok_users = {u for u, its in basket.items() if len(its) <= cap}
    else:
        ok_users = {u for u, _ in ui}
    eff = defaultdict(set)
    for u, i in ui:
        if i in freq and u in ok_users:
            eff[i].add(u)
    out = defaultdict(list)
    for i in freq:
        for j in freq:
            if i == j:
                continue
            co = len(eff[i] & eff[j])
            if co == 0:
                continue
            cos = round(co / math.sqrt(len(items[i]) * len(items[j])), 6)
            out[i].append((cos, j, len(items[i]), len(items[j]), co))
    ranked = {}
    for i, lst in out.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rk, (cos, j, n_i, n_j, co) in enumerate(lst[:k], 1):
            ranked[(i, j)] = (n_i, n_j, co, cos, rk)
    return ranked


def test_item_item_cf_matches_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.market import (
        item_item_cosine_topk,
    )

    rows = [
        (u, i)
        for u in range(12)
        for i in ["a", "b", "c", "d", "e"]
        if (u * 7 + ord(i)) % 3 != 0
    ] + [(0, "a"), (1, "b")]  # duplicate interactions must collapse
    df = spark.createDataFrame(rows, "u int, item string")
    got = {
        (r["item"], r["neighbor"]): (
            r["n_item"], r["n_neighbor"], r["n_co"], r["cosine"], r["rk"]
        )
        for r in item_item_cosine_topk(df, "u", "item", k=3, min_count=2).collect()
    }
    ref = _cf_reference(rows, 3, 2)
    assert got == ref


def test_item_item_cf_min_count_prunes_and_cap_guards(spark):
    from telecom_dataengineering_pipeline_spark.operators.market import (
        item_item_cosine_topk,
    )

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "rare")]
    df = spark.createDataFrame(rows, "u int, item string")
    got = item_item_cosine_topk(df, "u", "item", k=5, min_count=2).collect()
    assert {r["item"] for r in got} == {"a", "b"}  # 'rare' pruned
    # mega-basket user removed by the cap: no pairs survive
    mega = [(9, it) for it in ["a", "b", "c"]] + [(1, "a"), (2, "a"), (1, "b"), (2, "b"), (1, "c"), (2, "c")]
    df2 = spark.createDataFrame(mega, "u int, item string")
    capped = item_item_cosine_topk(df2, "u", "item", k=5, min_count=2, max_basket_size=2).collect()
    assert capped == []  # every user's pruned basket is 3 > cap
    with pytest.raises(ValueError):
        item_item_cosine_topk(df, "u", "item", k=0)


def test_item_item_cf_duckdb_mirror(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.market import (
        item_item_cosine_topk,
    )

    rows = [(u, f"i{(u * 3 + p) % 7}") for u in range(15) for p in range(4)]
    df = spark.createDataFrame(rows, "u int, item string")
    got = sorted(
        tuple(r) for r in item_item_cosine_topk(df, "u", "item", k=3, min_count=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (u INTEGER, item VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"({u}, '{i}')" for u, i in rows)
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH ui AS (SELECT DISTINCT u, item FROM fixture),
counts AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM ui GROUP BY 1),
freq AS (SELECT * FROM counts WHERE n_item >= 2),
pruned AS (SELECT ui.u, ui.item FROM ui JOIN freq ON freq.item = ui.item),
pairs AS (
  SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS n_co
  FROM pruned a JOIN pruned b ON a.u = b.u AND a.item < b.item
  GROUP BY 1, 2
), both_dir AS (
  SELECT i, j, n_co FROM pairs UNION ALL SELECT j, i, n_co FROM pairs
), scored AS (
  SELECT b.i, b.j, ni.n_item, nj.n_item AS n_neighbor, b.n_co,
         round(CAST(b.n_co AS DOUBLE) / sqrt(CAST(ni.n_item AS DOUBLE) * CAST(nj.n_item AS DOUBLE)), 6) AS cosine
  FROM both_dir b
  JOIN freq ni ON ni.item = b.i JOIN freq nj ON nj.item = b.j
), ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY i ORDER BY cosine DESC, j ASC) AS BIGINT) AS rk
  FROM scored
)
SELECT i AS item, j AS neighbor, n_item, n_neighbor, n_co, cosine, rk
FROM ranked WHERE rk <= 3
"""
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# BFS hop distance
# ---------------------------------------------------------------------------


def _bfs_reference(edges, seeds, max_hops):
    from collections import defaultdict, deque

    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes.add(s)
        nodes.add(d)
    dist = {s: 0 for s in seeds if s in nodes}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_matches_reference_and_takes_min_hop(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import bfs_hop_distance

    # diamond + chain + disconnected node: node 4 reachable via two paths
    # (min hop must win), node 9 unreachable, seed 99 not in graph.
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7), (8, 9)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["hop"] for r in bfs_hop_distance(df, [1, 99], max_hops=3).collect()}
    assert got == _bfs_reference(edges, [1, 99], 3)
    assert got[4] == 2 and 6 not in got or got.get(5) == 3
    assert 9 not in got  # disconnected component never shuffles in


def test_bfs_multi_source_and_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import bfs_hop_distance

    edges = [(1, 2), (2, 3), (10, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["hop"] for r in bfs_hop_distance(df, [1, 10], max_hops=4).collect()}
    assert got == _bfs_reference(edges, [1, 10], 4)
    assert got[3] == 1  # via seed 10, not hop-2 via seed 1
    with pytest.raises(ValueError):
        bfs_hop_distance(df, [], max_hops=2)
    with pytest.raises(ValueError):
        bfs_hop_distance(df, [1], max_hops=0)


def test_bfs_duckdb_recursive_mirror(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.graph import bfs_hop_distance

    edges = [((i * 7 + 1) % 23, (i * 11 + 3) % 23) for i in range(60)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = sorted((r["node"], r["hop"]) for r in bfs_hop_distance(df, [0, 1], max_hops=4).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (src INTEGER, dst INTEGER)")
    con.execute("INSERT INTO edges VALUES " + ", ".join(f"({s}, {d})" for s, d in edges))
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH RECURSIVE walk(node, hop) AS (
  SELECT node, 0 FROM (
    SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges
  ) WHERE node IN (0, 1)
  UNION
  SELECT e.dst, w.hop + 1 FROM walk w JOIN edges e ON e.src = w.node WHERE w.hop < 4
)
SELECT node, CAST(min(hop) AS INTEGER) AS hop FROM walk GROUP BY node
"""
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# Holt–Winters additive
# ---------------------------------------------------------------------------


def _hw_reference(xs, m, a, b, g, hz):
    """Textbook additive HW with the operator's init, plain Python."""
    l = sum(xs[:m]) / m
    bb = (sum(xs[m : 2 * m]) - sum(xs[:m])) / (m * m)
    s = [x - l for x in xs[:m]]
    for t in range(m, len(xs)):
        l_new = a * (xs[t] - s[t - m]) + (1 - a) * (l + bb)
        bb = b * (l_new - l) + (1 - b) * bb
        l = l_new
        s.append(g * (xs[t] - l) + (1 - g) * s[t - m])
    T = len(xs)
    out = {}
    for h in range(1, hz + 1):
        si = s[T - m + ((h - 1) % m)]
        out[h] = (l, bb, si, l + h * bb + si)
    return out


def test_holt_winters_matches_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        holt_winters_additive,
    )

    m = 4
    steps = [f"{i:02d}" for i in range(12)]
    # seasonal sawtooth + upward trend
    xs = [10.0 + 2.0 * t + [5.0, -3.0, 1.0, -2.0][t % m] for t in range(12)]
    rows = [("k", steps[t], xs[t]) for t in range(12)]
    df = spark.createDataFrame(rows, "k string, step string, v double")
    got = {
        r["h"]: (r["level"], r["trend"], r["seasonal"], r["forecast"])
        for r in holt_winters_additive(
            df, ["k"], "step", "v", steps, period=m, alpha=0.5, beta=0.3, gamma=0.3
        ).collect()
    }
    ref = _hw_reference(xs, m, 0.5, 0.3, 0.3, m)
    assert set(got) == set(ref)
    for h in ref:
        for gv, rv in zip(got[h], ref[h]):
            assert gv == pytest.approx(rv, rel=1e-12)
    # forecasts must carry the seasonal sawtooth: h=1 (peak phase) above
    # the pure trend line, h=2 (trough phase) below
    assert got[1][3] - (got[1][0] + got[1][1]) > 3
    assert got[2][3] - (got[2][0] + 2 * got[2][1]) < -2


def test_holt_winters_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        holt_winters_additive,
    )

    df = spark.createDataFrame([("k", "00", 1.0)], "k string, step string, v double")
    with pytest.raises(ValueError):
        holt_winters_additive(df, ["k"], "step", "v", ["00"] * 6, period=4)
    with pytest.raises(ValueError):
        holt_winters_additive(df, ["k"], "step", "v", ["00"] * 8, period=1)
    with pytest.raises(ValueError):
        holt_winters_additive(df, ["k"], "step", "v", ["00"] * 8, period=4, horizon=0)


def test_holt_winters_generated_mirror(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.trend import (
        holt_winters_additive,
        holt_winters_oracle_sql,
    )

    m = 3
    steps = [f"{i:02d}" for i in range(9)]
    rows = [
        (k, steps[t], float(((t * 7 + j * 5) % 13) + (1 if t % m == 0 else -1) * 3))
        for j, k in enumerate(["a", "b"])
        for t in range(9)
    ]
    df = spark.createDataFrame(rows, "k string, step string, v double")
    hw = holt_winters_additive(df, ["k"], "step", "v", steps, period=m)
    got = sorted(
        (
            r["k"], r["h"],
            round(r["level"], 4), round(r["trend"], 4),
            round(r["seasonal"], 4), round(r["forecast"], 4),
        )
        for r in hw.collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, step VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', '{s}', {v})" for k, s, v in rows)
    )
    sql = holt_winters_oracle_sql(
        "SELECT k, step, v FROM fixture", "k", "step", "v", steps, period=m
    )
    mirror = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert mirror == got


# ---------------------------------------------------------------------------
# Cross-correlation profile
# ---------------------------------------------------------------------------


def _ccf_reference(series, K):
    """series: {key: [(t, x, y), ...]} sorted by t."""
    out = {}
    for key, pts in series.items():
        pts = sorted(pts)
        xs = [x for _, x, _ in pts]
        ys = [y for _, _, y in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denx = sum(round((x - mx) ** 2, 9) for x in xs)
        deny = sum(round((y - my) ** 2, 9) for y in ys)
        for k in range(-K, K + 1):
            num, np_ = 0.0, 0
            for t in range(n):
                u = t + k
                if 0 <= u < n:
                    num += round((xs[t] - mx) * (ys[u] - my), 9)
                    np_ += 1
            if denx > 0 and deny > 0 and np_ > 0:
                ccf = round(num / math.sqrt(denx * deny), 6)
            else:
                ccf = None
            out[(key, k)] = (n, np_, ccf)
    return out


def test_ccf_matches_reference_and_finds_lead(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import ccf_profile

    # y is x shifted forward by 2 steps (x LEADS y by 2): peak at lag +2
    xs = [float((i * 7 + 3) % 13) for i in range(20)]
    ys = [0.0, 0.0] + xs[:-2]
    rows = [("k", t, xs[t], ys[t]) for t in range(20)]
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    got = {
        (r["k"], r["lag"]): (r["n"], r["n_pairs"], r["ccf"])
        for r in ccf_profile(df, ["k"], "t", "x", "y", max_lag=3).collect()
    }
    ref = _ccf_reference({"k": [(t, xs[t], ys[t]) for t in range(20)]}, 3)
    assert set(got) == set(ref)
    for key in ref:
        assert got[key][0] == ref[key][0] and got[key][1] == ref[key][1]
        if ref[key][2] is None:
            assert got[key][2] is None
        else:
            assert got[key][2] == pytest.approx(ref[key][2], abs=1e-6)
    peak = max((v[2], k[1]) for k, v in got.items() if v[2] is not None)
    assert peak[1] == 2  # the true lead is recovered


def test_ccf_constant_series_null_and_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import ccf_profile

    df = spark.createDataFrame(
        [("k", t, 5.0, float(t)) for t in range(6)], "k string, t int, x double, y double"
    )
    got = ccf_profile(df, ["k"], "t", "x", "y", max_lag=1).collect()
    assert all(r["ccf"] is None for r in got)  # constant x
    with pytest.raises(ValueError):
        ccf_profile(df, ["k"], "t", "x", "y", max_lag=0)


def test_ccf_single_exchange(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import ccf_profile

    df = spark.createDataFrame(
        [("k", t, float(t % 5), float(t % 3)) for t in range(20)],
        "k string, t int, x double, y double",
    )
    plan = (
        ccf_profile(df, ["k"], "t", "x", "y", max_lag=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# Eventually-follows matrix
# ---------------------------------------------------------------------------


def _ef_reference(rows):
    from collections import defaultdict

    prof = defaultdict(dict)
    for c, t, a in rows:
        f, l = prof[c].get(a, (t, t))
        prof[c][a] = (min(f, t), max(l, t))
    out = defaultdict(lambda: [0, 0])
    for c, acts in prof.items():
        for a, (fa, _) in acts.items():
            for b, (_, lb) in acts.items():
                if a == b:
                    continue
                out[(a, b)][0] += 1
                if fa < lb:
                    out[(a, b)][1] += 1
    return {
        k: (nb, nf, round(nf / nb, 6)) for k, (nb, nf) in out.items()
    }


def test_eventually_follows_matches_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.windows import (
        eventually_follows,
    )

    rows = [
        # case 1: a@1 b@2 c@3 a@4  => a EF b, a EF c, b EF c, b EF a (a@4), ...
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
        # case 2: c then a only
        (2, 1, "c"), (2, 5, "a"),
        # case 3: simultaneous a/b (strict < means neither follows)
        (3, 7, "a"), (3, 7, "b"),
    ]
    df = spark.createDataFrame(rows, "c int, t int, act string")
    got = {
        (r["activity_a"], r["activity_b"]): (
            r["n_cases_both"], r["n_follows"], r["support"]
        )
        for r in eventually_follows(df, "c", "t", "act").collect()
    }
    assert got == _ef_reference(rows)
    assert got[("a", "b")] == (2, 1, 0.5)  # case 3 tie does NOT count
    assert got[("c", "a")][1] == 2  # both cases with c then a


def test_eventually_follows_duckdb_mirror(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        eventually_follows,
    )

    rows = [
        (u % 9, (u * 13 + i * 5) % 40, "abcde"[(u + i) % 5])
        for u in range(25)
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "c int, t int, act string")
    got = sorted(tuple(r) for r in eventually_follows(df, "c", "t", "act").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (c INTEGER, t INTEGER, act VARCHAR)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"({c}, {t}, '{a}')" for c, t, a in rows)
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH prof AS (
  SELECT c, act, CAST(min(t) AS BIGINT) AS f, CAST(max(t) AS BIGINT) AS l
  FROM fixture GROUP BY 1, 2
), pairs AS (
  SELECT a.act AS activity_a, b.act AS activity_b,
         CASE WHEN a.f < b.l THEN 1 ELSE 0 END AS fol
  FROM prof a JOIN prof b ON a.c = b.c AND a.act <> b.act
)
SELECT activity_a, activity_b,
       CAST(count(*) AS BIGINT) AS n_cases_both,
       CAST(sum(fol) AS BIGINT) AS n_follows,
       round(CAST(sum(fol) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS support
FROM pairs GROUP BY 1, 2
"""
        ).fetchall()
    )
    assert mirror == got


def test_ndcg_single_exchange(spark):
    """Both rankings ride ONE hash exchange on the query key."""
    df = spark.createDataFrame(
        [("q", i, float(i), i % 4) for i in range(20)],
        "q string, doc int, score double, rel int",
    )
    plan = ndcg_at_k(df, ["q"], "score", "rel", k=5, tiebreak_col="doc")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
