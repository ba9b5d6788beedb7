"""Round-8 registration queue: operators built late in round 7 with their
DuckDB oracle SQL proven cross-engine here — registration next round is a
paste of these mirrors (the test_r7/r8 pattern)."""

from __future__ import annotations

import math

import duckdb
import pytest

from telecom_dataengineering_pipeline_spark.quality.monitors import (
    anova_oneway,
    spearman_correlation,
)


# ---------------------------------------------------------------------------
# One-way ANOVA
# ---------------------------------------------------------------------------


def _anova_reference(rows):
    from collections import defaultdict

    cells = defaultdict(list)
    for g, v in rows:
        if v is None:
            continue
        cells["__null__" if g is None else str(g)].append(v)
    n = sum(len(vs) for vs in cells.values())
    k = len(cells)
    gm = sum(sum(vs) for vs in cells.values()) / n
    ssb = sum(round(len(vs) * (sum(vs) / len(vs) - gm) ** 2, 9) for vs in cells.values())
    ssw = sum(
        round(sum(v * v for v in vs) - sum(vs) ** 2 / len(vs), 9)
        for vs in cells.values()
    )
    dfb, dfw = k - 1, n - k
    f = (
        round((ssb / dfb) / (ssw / dfw), 6)
        if dfb > 0 and dfw > 0 and ssw > 0
        else None
    )
    eta = round(ssb / (ssb + ssw), 6) if ssb + ssw > 0 else None
    return (n, k, round(ssb, 6), round(ssw, 6), dfb, dfw, f, eta)


def test_anova_matches_reference(spark):
    rows = (
        [("a", 10.0 + i * 0.5) for i in range(8)]
        + [("b", 20.0 + i * 0.5) for i in range(8)]
        + [("c", 15.0 + i * 0.25) for i in range(6)]
        + [(None, 12.0), ("a", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(anova_oneway(df, "g", "v").collect()[0])
    ref = _anova_reference(rows)
    assert got[:6] == ref[:6]
    assert got[6] == pytest.approx(ref[6], abs=1e-6)
    assert got[7] == pytest.approx(ref[7], abs=1e-6)
    assert got[6] > 10  # strongly separated groups


def test_anova_degenerate_single_group_null_f(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r["k"] == 1 and r["f_stat"] is None


@pytest.mark.slow
def test_anova_duckdb_mirror(spark):
    rows = [(f"g{i % 4}", float((i * 7 + 3) % 11) + i * 0.25) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = tuple(anova_oneway(df, "g", "v").collect()[0])
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (g VARCHAR, v DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES " + ", ".join(f"('{g}', {v})" for g, v in rows)
    )
    mirror = con.execute(
        """
WITH cells AS (
  SELECT coalesce(g, '__null__') AS g, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(v AS DECIMAL(24,6))) AS s,
         sum(CAST(v AS DECIMAL(24,6)) * CAST(v AS DECIMAL(24,6))) AS ss
  FROM fixture WHERE v IS NOT NULL GROUP BY 1
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
    ).fetchone()
    assert tuple(mirror) == got


# ---------------------------------------------------------------------------
# Spearman rank correlation
# ---------------------------------------------------------------------------


def _spearman_reference(pairs):
    def avg_ranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and vals[s[j]] == vals[s[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for t in range(i, j):
                r[s[t]] = avg
            i = j
        return r

    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    if dx == 0 or dy == 0:
        return None
    return round(num / (dx * dy), 6)


def test_spearman_matches_reference_with_ties(spark):
    pairs = [
        (1.0, 2.0), (2.0, 4.0), (2.0, 3.0), (3.0, 9.0), (4.0, 8.0),
        (5.0, 8.0), (5.0, 30.0), (7.0, 50.0), (8.0, 40.0),
    ]
    df = spark.createDataFrame(pairs, "x double, y double")
    r = spearman_correlation(df, "x", "y").collect()[0]
    assert r["n"] == len(pairs)
    assert r["rho"] == pytest.approx(_spearman_reference(pairs), abs=1e-6)


@pytest.mark.slow
def test_spearman_monotone_nonlinear_is_one_pearson_is_not(spark):
    from pyspark.sql import functions as F

    # y = x^3: perfectly monotone, nonlinear
    pairs = [(float(x), float(x) ** 3) for x in range(-5, 6)]
    df = spark.createDataFrame(pairs, "x double, y double")
    r = spearman_correlation(df, "x", "y").collect()[0]
    assert r["rho"] == 1.0
    pearson = df.agg(F.corr("x", "y")).collect()[0][0]
    assert pearson < 0.95  # Pearson underrates the monotone relation
    # constant axis -> NULL
    const = spark.createDataFrame([(1.0, 2.0), (1.0, 3.0)], "x double, y double")
    assert spearman_correlation(const, "x", "y").collect()[0]["rho"] is None


@pytest.mark.slow
def test_spearman_keyed_and_duckdb_mirror(spark):
    rows = [
        (f"k{i % 3}", float((i * 7 + 1) % 13), float((i * 5 + 2) % 9))
        for i in range(45)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = sorted(tuple(r) for r in spearman_correlation(df, "x", "y", ["k"]).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE fixture (k VARCHAR, x DOUBLE, y DOUBLE)")
    con.execute(
        "INSERT INTO fixture VALUES "
        + ", ".join(f"('{k}', {x}, {y})" for k, x, y in rows)
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH ranked AS (
  SELECT k,
    CAST(2 * rank() OVER (PARTITION BY k ORDER BY x ASC)
         + count(*) OVER (PARTITION BY k, x) - 1 AS DECIMAL(24,0)) AS u,
    CAST(2 * rank() OVER (PARTITION BY k ORDER BY y ASC)
         + count(*) OVER (PARTITION BY k, y) - 1 AS DECIMAL(24,0)) AS v
  FROM fixture WHERE x IS NOT NULL AND y IS NOT NULL
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         sum(u) AS su, sum(v) AS sv,
         sum(u * u) AS suu, sum(v * v) AS svv,
         sum(CAST(u * v AS DECIMAL(38,0))) AS suv
  FROM ranked GROUP BY 1
)
SELECT k, n,
  CASE WHEN CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) > 0
        AND CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) > 0
       THEN round((CAST(n AS DOUBLE) * CAST(suv AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sv AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))), 6)
  END AS rho
FROM agg
"""
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# Grid-based spatial clustering (DBSCAN-lite)
# ---------------------------------------------------------------------------


def _grid_cluster_reference(points, cell_deg, min_pts):
    from collections import Counter, defaultdict

    cells = Counter(
        (math.floor(la / cell_deg), math.floor(lo / cell_deg)) for la, lo in points
    )
    dense = {c: n for c, n in cells.items() if n >= min_pts}
    # union-find over 8-adjacency
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for (i, j) in dense:
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if (di, dj) != (0, 0) and (i + di, j + dj) in dense:
                    a, b = find((i, j)), find((i + di, j + dj))
                    if a != b:
                        parent[max(a, b)] = min(a, b)
    comp = defaultdict(list)
    for c in dense:
        comp[find(c)].append(c)
    off, stride = 4_000_000, 10_000_000
    out = {}
    for root, members in comp.items():
        cid = min((i + off) * stride + (j + off) for i, j in members)
        n_cells = len(members)
        n_pts = sum(dense[c] for c in members)
        for c in members:
            out[c] = (dense[c], cid, n_cells, n_pts)
    return out


@pytest.mark.slow
def test_grid_cluster_matches_union_find_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.spatial import (
        grid_cluster_cells,
    )

    # two blobs joined diagonally + an isolated dense cell + noise
    points = (
        [(0.5 + 0.01 * i, 0.5) for i in range(4)]           # cell (0,0)
        + [(1.5, 1.5), (1.6, 1.4)]                            # cell (1,1) diag-adjacent
        + [(2.5, 2.5), (2.6, 2.4), (2.4, 2.6)]                # cell (2,2) diag chain
        + [(10.5, 10.5), (10.6, 10.6)]                        # isolated dense cell
        + [(50.5, 50.5)]                                      # noise: 1 < min_pts
    )
    df = spark.createDataFrame(points, "lat double, lon double")
    got = {
        (r["cell_lat"], r["cell_lon"]): (
            r["n"], r["cluster_id"], r["cluster_cells"], r["cluster_points"]
        )
        for r in grid_cluster_cells(df, "lat", "lon", cell_deg=1.0, min_pts=2).collect()
    }
    ref = _grid_cluster_reference(points, 1.0, 2)
    assert got == ref
    # the diagonal chain merged into one 3-cell cluster
    assert got[(0, 0)][2] == 3 and got[(0, 0)][1] == got[(2, 2)][1]
    assert got[(10, 10)][2] == 1  # isolated cell is its own cluster
    assert (50, 50) not in got  # noise dropped


@pytest.mark.slow
def test_grid_cluster_negative_coords_and_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.spatial import (
        grid_cluster_cells,
    )

    points = [(-0.5, -0.5), (-0.4, -0.6), (0.5, 0.5), (0.4, 0.6)]
    df = spark.createDataFrame(points, "lat double, lon double")
    got = {
        (r["cell_lat"], r["cell_lon"]): r
        for r in grid_cluster_cells(df, "lat", "lon", cell_deg=1.0, min_pts=2).collect()
    }
    ref = _grid_cluster_reference(points, 1.0, 2)
    assert set(got) == set(ref)
    # (-1,-1) and (0,0) are diagonal neighbors: one cluster of 2 cells
    assert got[(-1, -1)]["cluster_id"] == got[(0, 0)]["cluster_id"]
    with pytest.raises(ValueError):
        grid_cluster_cells(df, "lat", "lon", min_pts=0)


def test_grid_cluster_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.operators.spatial import (
        grid_cluster_cells,
    )

    points = [
        (float(((i * 7) % 5) + 0.3 * (i % 3)), float(((i * 11) % 4) + 0.2 * (i % 4)))
        for i in range(60)
    ]
    df = spark.createDataFrame(points, "lat double, lon double")
    got = sorted(
        tuple(r)
        for r in grid_cluster_cells(df, "lat", "lon", cell_deg=1.0, min_pts=2).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lat DOUBLE, lon DOUBLE)")
    con.execute(
        "INSERT INTO pts VALUES " + ", ".join(f"({a}, {b})" for a, b in points)
    )
    mirror = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH dense AS (
  SELECT CAST(floor(lat / 1.0) AS BIGINT) AS ci, CAST(floor(lon / 1.0) AS BIGINT) AS cj,
         CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2 HAVING count(*) >= 2
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
        ).fetchall()
    )
    assert mirror == got


# ---------------------------------------------------------------------------
# Property-based parity: randomized censoring patterns and tie layouts
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_km_obs = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(rows=_km_obs)
def test_kaplan_meier_random_censoring_matches_reference(spark, rows):
    from telecom_dataengineering_pipeline_spark.operators.survival import kaplan_meier

    df = spark.createDataFrame(rows, "k string, dur int, ev int")
    got = {
        (r["k"], r["duration"]): (r["n_risk"], r["n_event"], r["n_censored"], r["survival"])
        for r in kaplan_meier(df, "dur", "ev", ["k"]).collect()
    }
    # plain-Python product-limit (true product; operator uses the rounded
    # ln chain, so compare at 1e-5)
    from collections import defaultdict

    obs = defaultdict(list)
    for k, d, e in rows:
        obs[k].append((d, e))
    for k, lst in obs.items():
        durations = sorted({d for d, _ in lst})
        total, removed, s, dead = len(lst), 0, 1.0, False
        for t in durations:
            d_i = sum(1 for dd, e in lst if dd == t and e == 1)
            c_i = sum(1 for dd, e in lst if dd == t and e == 0)
            n_i = total - removed
            if d_i == n_i:
                dead = True
                s = 0.0
            elif not dead:
                s *= 1.0 - d_i / n_i
            gn, gd, gc, gs = got[(k, t)]
            assert (gn, gd, gc) == (n_i, d_i, c_i)
            assert gs == pytest.approx(0.0 if dead else s, abs=1e-5)
            removed += d_i + c_i


_sp_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=6)
    ),
    min_size=3,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
@given(pairs=_sp_pairs)
def test_spearman_random_ties_match_reference(spark, pairs):
    fp = [(float(x), float(y)) for x, y in pairs]
    df = spark.createDataFrame(fp, "x double, y double")
    r = spearman_correlation(df, "x", "y").collect()[0]
    ref = _spearman_reference(fp)
    assert r["n"] == len(fp)
    if ref is None:
        assert r["rho"] is None
    else:
        assert r["rho"] == pytest.approx(ref, abs=1e-6)
