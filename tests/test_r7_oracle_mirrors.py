"""Cross-engine mirrors for the round-7 registration queue: each new
operator's DuckDB oracle SQL is exercised NOW against the Spark output on
a shared fixture — so the later driver registration is a paste, not a
derivation, and the cross-engine determinism of each expression shape is
already proven."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _con_with(rows, ddl):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE fixture ({ddl})")
    con.execute("INSERT INTO fixture VALUES " + ", ".join(rows))
    return con


def test_bm25_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.text import bm25_scores

    docs = [
        (0, "spark shuffle join and shuffle again"),
        (1, "spark " + "filler " * 30 + "shuffle"),
        (2, "spark spark spark"),
        (3, "unrelated words entirely"),
        (4, "shuffle tuning guide"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_scores(df, ["spark", "shuffle"], top_k=10).collect()
    }
    con = _con_with(
        [f"({d}, '{t}')" for d, t in docs], "doc_id BIGINT, text VARCHAR"
    )
    mirror = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok,
         len(regexp_split_to_array(lower(trim(text)), '\s+')) AS dl
  FROM fixture
), lengths AS (
  SELECT doc_id, CAST(any_value(dl) AS DOUBLE) AS dl FROM toks GROUP BY 1
), corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lengths
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
  WHERE tok IN ('spark', 'shuffle') GROUP BY 1, 2
), dfreq AS (
  SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
), parts AS (
  SELECT t.doc_id,
         CAST(round(
           ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * (t.tf * (1.2 + 1.0) / (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * l.dl / c.avgdl))),
           9) AS DECIMAL(22,9)) AS s
  FROM tf t JOIN dfreq d ON t.tok = d.tok
  JOIN lengths l ON t.doc_id = l.doc_id CROSS JOIN corpus c
)
SELECT doc_id, round(CAST(sum(s) AS DOUBLE), 6) AS score,
       CAST(count(*) AS INTEGER) AS n
FROM parts GROUP BY 1
"""
        ).fetchall()
    }
    assert mirror == got


def test_robust_outlier_duckdb_mirror(spark):
    """Rank-exact regime: the sketch medians equal the values at rank
    ceil(n/2), which is what the mirror computes with row_number."""
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        robust_outlier_profile,
    )

    vals = [100.0 + (i % 7) * 1.5 for i in range(40)] + [5000.0, -900.0, 250.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = robust_outlier_profile(df, "x").collect()[0]
    got = (row["n"], row["median"], row["mad"], row["n_outliers"], row["outlier_rate"])

    con = _con_with([f"({v})" for v in vals], "x DOUBLE")
    mirror = con.execute(
        """
WITH rk AS (
  SELECT x, row_number() OVER (ORDER BY x) AS r, count(*) OVER () AS cnt
  FROM fixture
), med AS (
  SELECT max(CASE WHEN r = CAST(ceil(0.5 * cnt) AS BIGINT) THEN x END) AS m FROM rk
), dev AS (
  SELECT abs(f.x - med.m) AS d FROM fixture f CROSS JOIN med
), rk2 AS (
  SELECT d, row_number() OVER (ORDER BY d) AS r, count(*) OVER () AS cnt FROM dev
), mad AS (
  SELECT max(CASE WHEN r = CAST(ceil(0.5 * cnt) AS BIGINT) THEN d END) AS md FROM rk2
)
SELECT CAST(count(f.x) AS BIGINT),
       round(any_value(med.m), 6),
       round(any_value(mad.md), 6),
       CAST(sum(CASE WHEN mad.md > 0 THEN ((0.6745 * abs(f.x - med.m) / mad.md) > 3.5)::INT END) AS BIGINT),
       round(CAST(sum(CASE WHEN mad.md > 0 THEN ((0.6745 * abs(f.x - med.m) / mad.md) > 3.5)::INT END) AS DOUBLE) / count(f.x), 6)
FROM fixture f CROSS JOIN med CROSS JOIN mad
"""
    ).fetchone()
    assert tuple(mirror) == got


def test_last_touch_attribution_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.operators.windows import (
        last_touch_attribution,
    )

    rows = [
        (1, 10_000_000, 1, "click"),
        (1, 20_000_000, 2, "purchase"),
        (1, 25_000_000, 3, "purchase"),
        (2, 5_000_000, 4, "view"),
        (2, 9_000_000, 5, "click"),
        (2, 12_000_000, 6, "purchase"),
        (3, 1_000_000, 7, "click"),
        (3, 50_000_000, 8, "purchase"),
        (4, 8_000_000, 9, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, us long, event_id long, event_type string"
    ).select(
        "user_id", F.timestamp_micros("us").alias("ts"), "event_id", "event_type"
    )
    got = {
        (r["user_id"], r["conversion_us"]): (r["touch_event"], r["touch_us"])
        for r in last_touch_attribution(
            ev, "user_id", "ts", "event_type", "purchase", ["view", "click"],
            within_seconds=10, tiebreak_col="event_id",
        ).collect()
    }
    con = _con_with(
        [f"({u}, {us}, {e}, '{t}')" for u, us, e, t in rows],
        "user_id BIGINT, us BIGINT, event_id BIGINT, event_type VARCHAR",
    )
    mirror = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            """
WITH ev AS (
  SELECT user_id, us, CAST(event_id AS VARCHAR) AS tb, event_type AS ev
  FROM fixture WHERE event_type IN ('purchase', 'view', 'click')
), carried AS (
  SELECT *,
    last_value(CASE WHEN ev IN ('view', 'click') THEN ev END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY us, tb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_ev,
    last_value(CASE WHEN ev IN ('view', 'click') THEN us END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY us, tb
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t_us
  FROM ev
)
SELECT user_id, us AS conversion_us,
       CASE WHEN us - t_us <= 10000000 THEN t_ev END AS touch_event,
       CASE WHEN us - t_us <= 10000000 THEN t_us END AS touch_us
FROM carried WHERE ev = 'purchase'
"""
        ).fetchall()
    }
    assert mirror == got


def test_grid_density_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.functions.geo import grid_density

    pts = [(0.2, 0.2, 10.0), (0.8, 0.9, 20.0), (-0.5, 0.5, 5.0), (2.5, 3.5, 1.0),
           (-1.2, -3.4, 2.5), (0.1, 0.15, 7.25)]
    df = spark.createDataFrame(pts, "lat double, lon double, v double")
    got = {
        (r["cell_lat"], r["cell_lon"]): (r["n"], r["centroid_lat"], r["centroid_lon"], r["total"])
        for r in grid_density(df, "lat", "lon", 1.0, value_col="v").collect()
    }
    con = _con_with([f"({a}, {b}, {c})" for a, b, c in pts], "lat DOUBLE, lon DOUBLE, v DOUBLE")
    mirror = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            """
SELECT CAST(floor(lat / 1.0) AS BIGINT) AS cell_lat,
       CAST(floor(lon / 1.0) AS BIGINT) AS cell_lon,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(round(lat, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6),
       round(CAST(sum(CAST(round(lon, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6),
       round(CAST(sum(CAST(v AS DECIMAL(20,4))) AS DOUBLE), 4)
FROM fixture GROUP BY 1, 2
"""
        ).fetchall()
    }
    assert mirror == got


def test_grouped_quantile_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        grouped_quantile_profile,
    )

    rows = [("a", float(i * 3 % 97)) for i in range(1, 80)] + [
        ("b", float(11 * i % 53)) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: (r["n"], r["q_25"], r["q_50"], r["q_75"], r["q_90"])
        for r in grouped_quantile_profile(df, ["g"], "x").collect()
    }
    con = _con_with([f"('{g}', {x})" for g, x in rows], "g VARCHAR, x DOUBLE")
    mirror = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            """
WITH rk AS (
  SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS r,
         count(*) OVER (PARTITION BY g) AS cnt
  FROM fixture
)
SELECT g, CAST(any_value(cnt) AS BIGINT) AS n,
       max(CASE WHEN r = CAST(ceil(0.25 * cnt) AS BIGINT) THEN x END) AS q_25,
       max(CASE WHEN r = CAST(ceil(0.50 * cnt) AS BIGINT) THEN x END) AS q_50,
       max(CASE WHEN r = CAST(ceil(0.75 * cnt) AS BIGINT) THEN x END) AS q_75,
       max(CASE WHEN r = CAST(ceil(0.90 * cnt) AS BIGINT) THEN x END) AS q_90
FROM rk GROUP BY 1
"""
        ).fetchall()
    }
    assert mirror == got


def test_neighborhood_jaccard_duckdb_mirror(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        neighborhood_jaccard,
    )

    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6), (2, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in neighborhood_jaccard(df, max_hub_degree=3).collect()
    }
    con = _con_with([f"({a}, {b})" for a, b in edges], "u BIGINT, v BIGINT")
    mirror = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            """
WITH e AS (
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
  FROM fixture WHERE u <> v
), bidir AS (
  SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
), deg AS (
  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY 1
), hubs AS (
  SELECT u FROM deg WHERE deg > 3
), wedge AS (
  SELECT b.u, b.v FROM bidir b WHERE b.v NOT IN (SELECT u FROM hubs)
), common AS (
  SELECT a.u AS ua, b.u AS ub, CAST(count(*) AS BIGINT) AS common
  FROM wedge a JOIN wedge b ON a.v = b.v AND a.u < b.u
  GROUP BY 1, 2
)
SELECT c.ua AS u, c.ub AS v, c.common,
       round(CAST(c.common AS DOUBLE) / (da.deg + db.deg - c.common), 6) AS jaccard
FROM common c JOIN deg da ON da.u = c.ua JOIN deg db ON db.u = c.ub
WHERE c.common >= 1
"""
        ).fetchall()
    }
    assert mirror == got
