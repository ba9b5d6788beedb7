"""Round-14 registrations (round 9, session 3) — twenty new oracled
queries across the analytics tiers:

- trend/monitoring: Bollinger bands (prior-window frame, breakout
  flag), Haar wavelet detail energies, PACF via Durbin–Levinson over
  the ACF query's rounded r-values, lag-1 Granger causality (nested
  closed-form OLS), the variance-to-mean dispersion index;
- attribution/sequence: time-decay and linear multi-touch attribution
  (completing the four-model family), event trigram mining + its
  keyed-state STREAMING twin, per-state Markov journey entropy;
- inference/eval: hash-deterministic percentile bootstrap CIs,
  split-conformal prediction intervals, the Hill tail index;
- spatial: geohash-5 occupancy via a per-dialect generated
  bit-interleave over integer micro-degrees;
- LLM-prep: winnowing/MOSS fingerprint dedup pairs, k-center greedy
  coreset selection, the Johnson–Lindenstrauss sign-projection
  distortion audit, a STREAMING count-min-sketch twin.

Registry conventions apply: exact DECIMAL folds wherever a sum crosses
engines, integer DIV for bucketing and key decodes past 2^53 (never
float ratios on a floor boundary), explicit ``floor()`` for any
scale-reducing narrowing (Spark HALF_UP vs DuckDB truncate), ``+ 0.0``
after rounds that can yield IEEE −0.0, identical IEEE expression
shapes on both sides for every float, unique window tie-breaks,
matching column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..streaming.staging import pin_staging_mtimes
from .registry import register
from ..lineage import lineage_cut

# ---------------------------------------------------------------------------
# Bollinger bands over daily event values per type. Day key is a string;
# the daily sum narrows to DECIMAL(18,2) so x·x stays inside Spark's
# 38-digit decimal ceiling (overflow would silently round — the
# pricing_summary_rollup lesson).
# ---------------------------------------------------------------------------

_BOLL_WINDOW = 7
_BOLL_K = 2.0

_BOLL_BASE_CTE = """
SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS t,
       CAST(sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS x
FROM events GROUP BY 1, 2
"""


def _boll_oracle() -> str:
    from ..operators.trend import bollinger_oracle_sql

    return bollinger_oracle_sql(
        _BOLL_BASE_CTE, window=_BOLL_WINDOW, k=_BOLL_K, key_name="event_type"
    )


@register("bollinger_daily_event_value", oracle=_boll_oracle(), tags=("trend", "A11", "DQ"))
def bollinger_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import bollinger_bands

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"), F.date_format("ts", "yyyy-MM-dd").alias("t")
        )
        .agg(
            F.sum(F.round("value", 2).cast("decimal(14,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    return bollinger_bands(
        daily, ["event_type"], "t", "x", window=_BOLL_WINDOW, k=_BOLL_K
    )


# ---------------------------------------------------------------------------
# Time-decay attribution: purchase conversions, view/click touches, 6 h
# qualification window, 1 h half-life (so ages span 0..6 buckets and the
# binary-reciprocal weights genuinely differentiate). Rollup grain is the
# (touch_event, age bucket) matrix — the decay curve made visible.
# ---------------------------------------------------------------------------

_TD_WITHIN_S = 21_600
_TD_HALF_LIFE_S = 3_600

_TIME_DECAY_ORACLE = f"""
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS us, CAST(event_id AS VARCHAR) AS tb,
         event_type AS ev
  FROM events WHERE event_type IN ('purchase', 'view', 'click')
), tagged AS (
  SELECT *, min(CASE WHEN ev = 'purchase'
                     THEN lpad(CAST(us AS VARCHAR), 20, '0') || '|' || tb END)
    OVER (PARTITION BY u ORDER BY us DESC, tb DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
  FROM ev
), touches AS (
  SELECT u, us, tb, ev, ck, CAST(substr(ck, 1, 20) AS BIGINT) AS conv_us
  FROM tagged WHERE ev <> 'purchase' AND ck IS NOT NULL
), fit AS (
  SELECT *, least((conv_us - us) // {_TD_HALF_LIFE_S * 1_000_000}, 62) AS age
  FROM touches WHERE conv_us - us <= {_TD_WITHIN_S * 1_000_000}
), weighted AS (
  SELECT ev, age,
         1.0 / CAST(1::BIGINT << age AS DOUBLE) AS w,
         sum(1.0 / CAST(1::BIGINT << age AS DOUBLE))
           OVER (PARTITION BY u, ck) AS sw
  FROM fit
), credit AS (
  SELECT ev, age, CAST(round(w / sw, 9) AS DECIMAL(20,9)) AS c FROM weighted
)
SELECT ev AS touch_event, CAST(age AS BIGINT) AS age_units,
       CAST(count(*) AS BIGINT) AS n_touches,
       round(CAST(sum(c) AS DOUBLE), 6) AS total_credit
FROM credit GROUP BY 1, 2
"""


@register(
    "attribution_time_decay_purchases",
    oracle=_TIME_DECAY_ORACLE,
    tags=("attribution", "W3", "sequence"),
)
def attribution_time_decay_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import time_decay_attribution

    ev = load_table(spark, sf_dir, "events")
    rows = time_decay_attribution(
        ev,
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=_TD_WITHIN_S,
        tiebreak_col="event_id",
        half_life_seconds=_TD_HALF_LIFE_S,
    )
    return rows.groupBy("touch_event", "age_units").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(
            F.sum(F.col("credit").cast("decimal(20,9)")).cast("double"), 6
        ).alias("total_credit"),
    )


# ---------------------------------------------------------------------------
# Event-sequence trigram mining: the full support table (the pattern
# alphabet is |event_type|³ — metadata-sized), ranked deterministically.
# ---------------------------------------------------------------------------

_TRIGRAM_ORACLE = """
WITH seq AS (
  SELECT user_id AS u, event_type AS e1,
    lead(event_type, 1) OVER w AS e2,
    lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
), grams AS (
  SELECT * FROM seq WHERE e3 IS NOT NULL
), counts AS (
  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS support,
         CAST(count(DISTINCT u) AS BIGINT) AS n_users
  FROM grams GROUP BY 1, 2, 3
)
SELECT e1, e2, e3, support, n_users,
  CAST(row_number() OVER (ORDER BY support DESC, e1 ASC, e2 ASC, e3 ASC) AS BIGINT) AS pattern_rank
FROM counts
"""


@register("event_trigram_mining", oracle=_TRIGRAM_ORACLE, tags=("sequence", "W3"))
def event_trigram_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import sequence_ngrams

    ev = load_table(spark, sf_dir, "events")
    return sequence_ngrams(
        ev, "user_id", "ts", "event_type", n=3, tiebreak_col="event_id"
    )


# ---------------------------------------------------------------------------
# Geohash occupancy: integer micro-degree synthetic coordinates (the
# haversine/spatial fixture-coordinate precedent) through the generated
# bit-interleave + base32 expression — the SAME Python generator emits
# both engines' expressions, so the cell assignment is identical by
# construction (validated against published geohash values in tests).
# ---------------------------------------------------------------------------


def _geohash_oracle() -> str:
    from ..functions.geo import geohash_expr, synthetic_micro_coords

    lat, lon = synthetic_micro_coords("user_id", "duck")
    gh = geohash_expr(lat, lon, chars=5, dialect="duck")
    return f"""
SELECT {gh} AS cell, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


@register("geohash_event_occupancy", oracle=_geohash_oracle(), tags=("F20", "spatial"))
def geohash_event_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geo import geohash_expr, synthetic_micro_coords

    lat, lon = synthetic_micro_coords("user_id", "spark")
    gh = geohash_expr(lat, lon, chars=5, dialect="spark")
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return ev.select(F.expr(gh).alias("cell"), "user_id").groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprint pairs over the documents corpus: k=3 token
# grams, w=4 windows, robust rightmost-tie selection encoded into one
# integer min-key; pairs share >= 2 selected fingerprints, boilerplate
# fingerprints df-capped at 1000 before the self-join (the minhash
# quadratic guard).
# ---------------------------------------------------------------------------

_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"

_WINNOW_ORACLE = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
grams0 AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks) - 2, 0)),
    i -> struct_pack(pos := i - 1,
                     g := toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
  )) AS s
  FROM toks
),
keyed AS (
  SELECT doc_id, s.pos AS pos,
         ('0x' || substr(md5(s.g), 1, 8))::BIGINT * 67108864
           + (67108863 - s.pos) AS key
  FROM grams0
),
sel AS (
  SELECT doc_id, pos,
    min(key) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mkey,
    count(*) OVER (PARTITION BY doc_id) AS n,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM keyed
),
fp AS (
  SELECT DISTINCT doc_id, mkey // 67108864 AS fp_hash
  FROM sel WHERE pos >= 3 OR rn = n
),
keep AS (
  SELECT fp_hash FROM fp GROUP BY 1 HAVING count(*) BETWEEN 2 AND 1000
),
j AS (SELECT f.doc_id, f.fp_hash FROM fp f JOIN keep k ON k.fp_hash = f.fp_hash)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM j a JOIN j b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


@register(
    "winnowing_fingerprint_pairs",
    oracle=_WINNOW_ORACLE,
    tags=("LLM", "dedup"),
    bench=True,
)
def winnowing_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.dedup import winnowing_pairs

    return winnowing_pairs(
        load_table(spark, sf_dir, "documents"), k=3, w=4, min_shared=2, max_df=1000
    )


# ---------------------------------------------------------------------------
# Modularity decomposition of the 2-round LPA partition on the co-purchase
# graph: exact integer pillar (4m·e_c − d_c²) next to the one-shape float
# contribution. Shares the capped-basket edge construction AND the
# unrolled label CTE with lpa_copurchase_communities.
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from .advanced import lpa_label_cte

    return (
        lpa_label_cte(2)
        + """,
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
members AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_members FROM l2 GROUP BY 1
),
degc AS (
  SELECT l.label, CAST(sum(d.deg) AS BIGINT) AS d
  FROM deg d JOIN l2 l ON l.node = d.u GROUP BY 1
),
internal AS (
  SELECT a.label, CAST(count(*) AS BIGINT) AS e
  FROM pairs p JOIN l2 a ON a.node = p.u JOIN l2 b ON b.node = p.v
  WHERE a.label = b.label GROUP BY 1
)
SELECT mem.label AS community, mem.n_members,
  CAST(coalesce(i.e, 0) AS BIGINT) AS internal_edges,
  CAST(coalesce(dc.d, 0) AS BIGINT) AS degree_sum,
  CAST(4 * m.m * coalesce(i.e, 0) - coalesce(dc.d, 0) * coalesce(dc.d, 0) AS BIGINT) AS q_num_4m2,
  round(CAST(coalesce(i.e, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
      - (CAST(coalesce(dc.d, 0) AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
        * (CAST(coalesce(dc.d, 0) AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))), 9) + 0.0 AS q_contrib
FROM members mem
LEFT JOIN degc dc ON dc.label = mem.label
LEFT JOIN internal i ON i.label = mem.label
CROSS JOIN m
"""
    )


@register(
    "modularity_lpa_copurchase",
    oracle=_modularity_oracle(),
    tags=("graph", "iterative"),
)
def modularity_lpa_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import community_modularity, label_propagation
    from .advanced import capped_copurchase_pairs

    pairs = capped_copurchase_pairs(spark, sf_dir)  # checkpointed inside
    labels = label_propagation(pairs, iters=2)
    return community_modularity(pairs, labels)


# ---------------------------------------------------------------------------
# Hash-deterministic percentile bootstrap for the daily-mean CI: the
# "random" draws are md5-derived (the CMS/HLL hash family), so both
# engines replay the identical resampling plan; resample sums fold as
# DECIMAL and the CI bounds are exact order statistics of those sums.
# ---------------------------------------------------------------------------

_BOOT_B = 200
_BOOT_LO = 5  # floor(0.025 * 200)
_BOOT_HI = _BOOT_B + 1 - _BOOT_LO

_BOOT_ORACLE = f"""
WITH daily AS (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS t,
         sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS v
  FROM events GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT k, row_number() OVER (PARTITION BY k ORDER BY t ASC) - 1 AS i,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n, v
  FROM daily
),
grid AS (
  SELECT base.k, base.n, base.i AS j, g.b
  FROM base CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) g
),
drawn AS (
  SELECT k, b,
    ('0x'||substr(md5('boot_' || CAST(b AS VARCHAR) || '_' ||
                      CAST(j AS VARCHAR) || '_' || k), 1, 8))::BIGINT % n AS tgt
  FROM grid
),
sums AS (
  SELECT d.k, d.b, sum(v2.v) AS s, CAST(count(*) AS BIGINT) AS n
  FROM drawn d JOIN base v2 ON v2.k = d.k AND v2.i = d.tgt
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY s ASC, b ASC) AS r
  FROM sums
),
stats AS (
  SELECT k, max(n) AS n,
    min(CASE WHEN r = {_BOOT_LO} THEN s END) AS slo,
    min(CASE WHEN r = {_BOOT_HI} THEN s END) AS shi,
    sum(CAST(s AS DECIMAL(18,2))) AS ss,
    sum(CAST(s AS DECIMAL(19,2)) * CAST(s AS DECIMAL(18,2))) AS ss2
  FROM ranked GROUP BY 1
),
point AS (
  SELECT k, sum(v) AS pt, CAST(count(*) AS BIGINT) AS n_obs FROM daily GROUP BY 1
)
SELECT p.k AS event_type, p.n_obs, CAST({_BOOT_B} AS BIGINT) AS n_boot,
  round(CAST(p.pt AS DOUBLE) / CAST(p.n_obs AS DOUBLE), 6) AS point_mean,
  round(CAST(s.slo AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS ci_lo,
  round(CAST(s.shi AS DOUBLE) / CAST(s.n AS DOUBLE), 6) AS ci_hi,
  round(sqrt(greatest((CAST(s.ss2 AS DOUBLE)
      - CAST(s.ss AS DOUBLE) * CAST(s.ss AS DOUBLE) / {float(_BOOT_B)!r})
      / {float(_BOOT_B - 1)!r}, 0.0)) / CAST(s.n AS DOUBLE), 6) AS se_boot
FROM point p JOIN stats s ON s.k = p.k
"""


def _daily_value_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("k"),
            F.date_format("ts", "yyyy-MM-dd").alias("t"),
        )
        .agg(F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("v"))
    )


@register(
    "bootstrap_ci_daily_event_value", oracle=_BOOT_ORACLE, tags=("A11", "eval")
)
def bootstrap_ci_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import bootstrap_mean_ci

    daily = _daily_value_decimal(spark, sf_dir)
    out = bootstrap_mean_ci(daily, ["k"], "t", "v", n_boot=_BOOT_B, alpha=0.05)
    return out.withColumnRenamed("k", "event_type")


# ---------------------------------------------------------------------------
# Haar wavelet detail energies over the first 16 days of each event
# type's daily values — which time scales carry the variation (the
# time-domain sibling of the periodogram / ACF). Un-normalized ±1
# transform keeps every coefficient exact DECIMAL; 1/2^level scales the
# final energies only.
# ---------------------------------------------------------------------------


def _haar_oracle() -> str:
    from ..operators.trend import haar_oracle_sql

    return haar_oracle_sql(_BOLL_BASE_CTE, levels=4, key_name="event_type")


@register("haar_energy_daily_event_value", oracle=_haar_oracle(), tags=("trend", "A11"))
def haar_energy_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import haar_detail_energy

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"), F.date_format("ts", "yyyy-MM-dd").alias("t")
        )
        .agg(
            F.sum(F.round("value", 2).cast("decimal(14,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    out = haar_detail_energy(daily, ["event_type"], "t", "x", levels=4)
    return out


# ---------------------------------------------------------------------------
# STREAMING count-min sketch: the token stream arrives file-by-file and
# the d×w counter grid accumulates as a streaming aggregate (counters
# are additive — the sketch IS streaming state); the final grid feeds
# the same broadcast estimate + top-k as the batch query, so the oracle
# is literally the batch query's oracle. Stream ≡ batch ≡ DuckDB.
# ---------------------------------------------------------------------------


def _cms_stream_oracle() -> str:
    from .llmprep import _CMS_ORACLE

    return _CMS_ORACLE


@register(
    "cms_stream_heavy_hitters",
    oracle=_cms_stream_oracle(),
    tags=("T2", "stream", "sketch"),
)
def cms_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..llmprep.sketches import cms_build, cms_estimate
    from ..llmprep.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    sink = "cms_stream_heavy_hitters_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="cms_stream_src_")
    try:
        for b in (0, 1):  # two shards -> two triggers: counters must merge
            (
                docs.filter(F.col("doc_id") % 2 == b)
                .select(F.explode(tokens("text")).alias("tok"))
                .filter(F.col("tok") != "")
                .coalesce(1)
                .write.parquet(os.path.join(staging, f"b{b}"))
            )
        stream = (
            spark.readStream.schema("tok string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging + "/b*")
        )
        q = (
            cms_build(stream, "tok", depth=4, width=256)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # update-mode emissions are monotone per cell: the final grid is the max
    grid = spark.table(sink).groupBy("rw", "cl").agg(F.max("cnt").alias("cnt"))
    cands = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    est = cms_estimate(grid, cands, "tok", depth=4, width=256)
    return est.orderBy(F.col("cms_count").desc(), F.col("tok").asc()).limit(20)


# ---------------------------------------------------------------------------
# Split-conformal intervals around the seasonal-naive forecaster: the
# day<=22 pairs calibrate |residual| exactly (DECIMAL differences, rank
# by integer-ceiling index), day>22 pairs audit the empirical coverage.
# ---------------------------------------------------------------------------

_CONFORMAL_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, CAST(strftime(ts, '%d') AS BIGINT) AS t,
         CAST(sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS DECIMAL(24,6)) AS v
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT a.k, a.t, a.v - f.v AS r
  FROM daily a JOIN daily f ON f.k = a.k AND f.t = a.t - 7
), ar AS (
  SELECT k, t, CASE WHEN r < 0 THEN -r ELSE r END AS ar FROM paired
), cal AS (
  SELECT k, ar,
    row_number() OVER (PARTITION BY k ORDER BY ar ASC, t ASC) AS rk,
    count(*) OVER (PARTITION BY k) AS n
  FROM ar WHERE t <= 22
), qh AS (
  SELECT k, CAST(max(n) AS BIGINT) AS n_cal,
    min(CASE WHEN rk = (9 * (n + 1) + 9) // 10 THEN ar END) AS q
  FROM cal GROUP BY 1
), test AS (SELECT k, ar FROM ar WHERE t > 22)
SELECT t.k AS event_type, q.n_cal, CAST(count(*) AS BIGINT) AS n_test,
  round(CAST(q.q AS DOUBLE), 6) AS q_hat,
  CASE WHEN q.q IS NOT NULL
       THEN CAST(coalesce(sum(CASE WHEN t.ar <= q.q THEN 1 END), 0) AS BIGINT)
  END AS covered,
  CASE WHEN q.q IS NOT NULL
       THEN round(CAST(coalesce(sum(CASE WHEN t.ar <= q.q THEN 1 END), 0) AS DOUBLE)
            / CAST(count(*) AS DOUBLE), 6)
  END AS coverage,
  0.9 AS target_cov
FROM test t LEFT JOIN qh q ON q.k = t.k
GROUP BY 1, 2, q.q
"""


@register(
    "conformal_naive7_event_values", oracle=_CONFORMAL_ORACLE, tags=("eval", "trend")
)
def conformal_naive7_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.features import split_conformal_interval

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
    out = split_conformal_interval(
        paired, ["k"], "t", "a", "f", split_t=22, coverage_num=9, coverage_den=10
    )
    return out.withColumnRenamed("k", "event_type")


# ---------------------------------------------------------------------------
# PACF at lags 1..3 (Durbin–Levinson on the ACF query's own rounded
# r-values — both engines recurse over identical inputs).
# ---------------------------------------------------------------------------


def _pacf_oracle() -> str:
    from ..operators.trend import pacf_oracle_sql
    from .round8 import _ACF_ORACLE

    return pacf_oracle_sql(_ACF_ORACLE, key_name="event_type")


@register("pacf_daily_event_value", oracle=_pacf_oracle(), tags=("A11", "trend"))
def pacf_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import pacf_profile

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.round("value", 2).cast("decimal(12,2)")).alias("v"))
    )
    return pacf_profile(daily, ["event_type"], "day", "v")


# ---------------------------------------------------------------------------
# Hill tail index of order totals per market segment — how heavy the
# spend tail is, next to the Gini/Pareto/Benford profiles.
# ---------------------------------------------------------------------------

_HILL_K = 50

_HILL_ORACLE = f"""
WITH base AS (
  SELECT c.c_mktsegment AS k, CAST(o.o_totalprice AS DECIMAL(12,2)) AS x,
         o.o_orderkey AS tb
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE CAST(o.o_totalprice AS DECIMAL(12,2)) > 0
), ranked AS (
  SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY x DESC, tb ASC) AS rk
  FROM base
), xk AS (
  SELECT k, x AS xv FROM ranked WHERE rk = {_HILL_K}
), terms AS (
  SELECT r.k, x2.xv,
    CAST(round(ln(CAST(r.x AS DOUBLE) / CAST(x2.xv AS DOUBLE)), 9)
         AS DECIMAL(28,9)) AS lt
  FROM ranked r JOIN xk x2 ON x2.k = r.k WHERE r.rk < {_HILL_K}
)
SELECT k AS segment, CAST({_HILL_K} AS BIGINT) AS k,
  CAST(count(*) AS BIGINT) AS n_terms,
  round(max(CAST(xv AS DOUBLE)), 6) AS x_k,
  round(CAST(sum(lt) AS DOUBLE), 6) AS sum_log,
  CASE WHEN sum(lt) > 0
       THEN round(CAST(count(*) AS DOUBLE) / CAST(sum(lt) AS DOUBLE), 6)
  END AS hill_alpha
FROM terms GROUP BY 1
"""


@register("hill_tail_index_order_prices", oracle=_HILL_ORACLE, tags=("A11", "DQ"))
def hill_tail_index_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import hill_tail_index

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(12,2)").alias("x"), "o_orderkey"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"), "x", "o_orderkey"
    )
    return hill_tail_index(base, ["segment"], "x", "o_orderkey", k=_HILL_K)


# ---------------------------------------------------------------------------
# Linear attribution completes the four-model family (last-touch,
# U-shaped, time-decay, linear): same kernel, equal 1/k credit; the
# rollup adds credit share per touch type so the models are comparable.
# ---------------------------------------------------------------------------

_LINEAR_ATTR_ORACLE = f"""
WITH ev AS (
  SELECT user_id AS u, epoch_us(ts) AS us, CAST(event_id AS VARCHAR) AS tb,
         event_type AS ev
  FROM events WHERE event_type IN ('purchase', 'view', 'click')
), tagged AS (
  SELECT *, min(CASE WHEN ev = 'purchase'
                     THEN lpad(CAST(us AS VARCHAR), 20, '0') || '|' || tb END)
    OVER (PARTITION BY u ORDER BY us DESC, tb DESC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck
  FROM ev
), touches AS (
  SELECT u, us, tb, ev, ck, CAST(substr(ck, 1, 20) AS BIGINT) AS conv_us
  FROM tagged WHERE ev <> 'purchase' AND ck IS NOT NULL
), fit AS (
  SELECT * FROM touches WHERE conv_us - us <= {_TD_WITHIN_S * 1_000_000}
), sized AS (
  SELECT ev, CAST(count(*) OVER (PARTITION BY u, ck) AS BIGINT) AS k
  FROM fit
), credit AS (
  SELECT ev, CAST(round(1.0 / CAST(k AS DOUBLE), 9) AS DECIMAL(20,9)) AS c
  FROM sized
)
SELECT ev AS touch_event, CAST(count(*) AS BIGINT) AS n_touches,
       round(CAST(sum(c) AS DOUBLE), 6) AS total_credit
FROM credit GROUP BY 1
"""


@register(
    "attribution_linear_purchases",
    oracle=_LINEAR_ATTR_ORACLE,
    tags=("attribution", "W3", "sequence"),
)
def attribution_linear_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import linear_attribution

    ev = load_table(spark, sf_dir, "events")
    rows = linear_attribution(
        ev,
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=_TD_WITHIN_S,
        tiebreak_col="event_id",
    )
    return rows.groupBy("touch_event").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.round(
            F.sum(F.col("credit").cast("decimal(20,9)")).cast("double"), 6
        ).alias("total_credit"),
    )


# ---------------------------------------------------------------------------
# Markov entropy of user journeys: per-state next-event entropy + the
# stationary-weighted entropy-rate terms — the information-theoretic
# summary of the transition matrix.
# ---------------------------------------------------------------------------

_MARKOV_ENTROPY_ORACLE = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) ASC, event_id ASC) AS dst
  FROM events
), pairs AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
), cells AS (
  SELECT src, n,
         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS t,
         CAST(sum(n) OVER () AS BIGINT) AS total
  FROM pairs
), terms AS (
  SELECT src, n, t, total,
    CAST(round(-(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
         * ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)), 9) AS DECIMAL(28,9)) AS term
  FROM cells
), agg AS (
  SELECT src, max(t) AS n_transitions, CAST(count(*) AS BIGINT) AS n_next_states,
         sum(term) AS h, max(total) AS tot
  FROM terms GROUP BY 1
)
SELECT src AS state, n_transitions, n_next_states,
  round(CAST(h AS DOUBLE), 6) + 0.0 AS h_nats,
  round(CAST(n_transitions AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight,
  round((CAST(n_transitions AS DOUBLE) / CAST(tot AS DOUBLE))
        * CAST(h AS DOUBLE), 6) + 0.0 AS rate_term
FROM agg
"""


@register(
    "markov_entropy_user_journeys",
    oracle=_MARKOV_ENTROPY_ORACLE,
    tags=("sequence", "A11", "W3"),
)
def markov_entropy_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import markov_transition_entropy

    ev = load_table(spark, sf_dir, "events")
    return markov_transition_entropy(
        ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
    )


# ---------------------------------------------------------------------------
# STREAMING trigram mining (streaming/ngrams.py): per-user keyed state
# holds the two most recent events; each arrival completes a trigram.
# The support/rank rollup over the emitted rows is the batch aggregate,
# so the batch trigram oracle gates the stream row-for-row. Same staging
# recipe as the other sequence streams: day-split parquet, one file per
# trigger, availableNow.
# ---------------------------------------------------------------------------


@register(
    "trigram_stream_mining",
    oracle=_TRIGRAM_ORACLE,
    tags=("T2", "T4", "stream", "sequence"),
)
def trigram_stream_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..streaming.ngrams import trigram_stream

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id"),
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("string").alias("tb"),
        F.col("event_type").alias("ev"),
        F.date_format("ts", "dd").cast("int").alias("_d"),
    )
    sink = "trigram_stream_mining_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="trigram_stream_src_")
    try:
        cols = ["user_id", "us", "tb", "ev"]
        ev.filter(F.col("_d") <= 15).select(*cols).coalesce(1).write.parquet(
            os.path.join(staging, "b0")
        )
        ev.filter(F.col("_d") > 15).select(*cols).coalesce(1).write.parquet(
            os.path.join(staging, "b1")
        )
        pin_staging_mtimes(staging, 2)  # deterministic trigger order
        stream = (
            spark.readStream.schema("user_id long, us long, tb string, ev string")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging + "/b*")
        )
        q = (
            trigram_stream(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    counts = spark.table(sink).groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("support"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    rank_w = Window.orderBy(
        F.col("support").desc(),
        F.col("e1").asc(),
        F.col("e2").asc(),
        F.col("e3").asc(),
    )
    return counts.withColumn(
        "pattern_rank", F.row_number().over(rank_w).cast("long")
    )


# ---------------------------------------------------------------------------
# k-center greedy coreset over the embeddings table: farthest-point
# traversal, 8 centers. The oracle unrolls the identical greedy rounds
# (MATERIALIZED per round — DuckDB otherwise re-inlines the whole prefix
# into every union branch); distances share the cosine queries' proven
# left-fold dot-product shape.
# ---------------------------------------------------------------------------

_KCENTER_K = 8


def _kcenter_oracle(k: int = _KCENTER_K) -> str:
    parts = [
        """WITH pts AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), base AS MATERIALIZED (
  SELECT vec_id, v, list_dot_product(v, v) AS sq FROM pts
),
c1 AS (SELECT vec_id, v, sq FROM base ORDER BY vec_id ASC LIMIT 1),
d1 AS MATERIALIZED (
  SELECT p.vec_id, p.v, p.sq,
    round(greatest(p.sq + c.sq - 2.0 * list_dot_product(p.v, c.v), 0.0), 6) AS mind
  FROM base p CROSS JOIN c1 c
)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f""",
c{r} AS (SELECT vec_id, v, sq, mind FROM d{r - 1}
        ORDER BY mind DESC, vec_id ASC LIMIT 1)"""
        )
        if r < k:
            parts.append(
                f""",
d{r} AS MATERIALIZED (
  SELECT p.vec_id, p.v, p.sq,
    least(p.mind,
          round(greatest(p.sq + c.sq - 2.0 * list_dot_product(p.v, c.v), 0.0), 6)
    ) AS mind
  FROM d{r - 1} p CROSS JOIN c{r} c
)"""
            )
    branches = [
        "SELECT CAST(1 AS INTEGER) AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS dist2 FROM c1"
    ] + [
        f"SELECT CAST({r} AS INTEGER), vec_id, mind FROM c{r}" for r in range(2, k + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(branches))
    return "".join(parts)


@register(
    "coreset_kcenter_embeddings",
    oracle=_kcenter_oracle(),
    tags=("LLM", "similarity", "sampling", "iterative"),
)
def coreset_kcenter_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.similarity import kcenter_greedy

    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, k=_KCENTER_K)


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss distortion audit: the ±1 projection matrix is
# md5-derived IN PYTHON and embedded as literals in both engines
# (Achlioptas signs; random draws are what an oracle-checked engine
# can't have); scale 1/√16 = 0.25 is exact. Original and projected
# distances both fold left-to-right (the proven dot shape).
# ---------------------------------------------------------------------------

_JL_OUT = 16


def _jl_oracle() -> str:
    from ..llmprep.projections import jl_sign_matrix

    mat = jl_sign_matrix(64, _JL_OUT)
    cols = ",\n    ".join(
        "list_dot_product(v, ["
        + ", ".join(f"{x!r}" for x in row)
        + f"]) * 0.25 AS p{j}"
        for j, row in enumerate(mat)
    )
    proj_d2 = " + ".join(
        f"(a.p{j} - b.p{j}) * (a.p{j} - b.p{j})" for j in range(_JL_OUT)
    )
    return f"""
WITH pts AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
proj AS MATERIALIZED (
  SELECT vec_id, v,
    {cols}
  FROM pts
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_dot_product(
      list_transform(list_zip(a.v, b.v), s -> s[1] - s[2]),
      list_transform(list_zip(a.v, b.v), s -> s[1] - s[2])
    ) AS orig_d2,
    {proj_d2} AS proj_d2
  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
)
SELECT id_a, id_b, round(orig_d2, 6) AS orig_d2, round(proj_d2, 6) AS proj_d2,
  CASE WHEN orig_d2 > 0 THEN round(proj_d2 / orig_d2, 6) END AS distortion
FROM pairs
"""


@register(
    "jl_distortion_pairs", oracle=_jl_oracle(), tags=("LLM", "similarity")
)
def jl_distortion_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llmprep.projections import jl_distortion_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return jl_distortion_pairs(emb, in_dims=64, out_dims=_JL_OUT)


# ---------------------------------------------------------------------------
# Granger lag-1 causality: does daily event VOLUME's past improve the
# prediction of daily event VALUE beyond value's own past, per type?
# Both nested OLS models solve from one exact decimal sum set.
# ---------------------------------------------------------------------------

_GRANGER_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS t,
         sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS yv,
         CAST(count(*) AS BIGINT) AS xv
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT k, yv AS yraw,
         lag(yv) OVER (PARTITION BY k ORDER BY t ASC) AS ylag,
         lag(xv) OVER (PARTITION BY k ORDER BY t ASC) AS xlag
  FROM daily
), rows_ AS (
  SELECT k, CAST(ylag AS DECIMAL(16,4)) AS x1, CAST(xlag AS DECIMAL(16,4)) AS x2,
         CAST(yraw AS DECIMAL(18,4)) AS y
  FROM lagged WHERE ylag IS NOT NULL AND xlag IS NOT NULL
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
    sum(CAST(CAST(x1 AS DECIMAL(19,4)) * x1 AS DECIMAL(38,8))) AS s11,
    sum(CAST(CAST(x2 AS DECIMAL(19,4)) * x2 AS DECIMAL(38,8))) AS s22,
    sum(CAST(CAST(x1 AS DECIMAL(19,4)) * x2 AS DECIMAL(38,8))) AS s12,
    sum(CAST(CAST(x1 AS DECIMAL(19,4)) * y AS DECIMAL(38,8))) AS s1y,
    sum(CAST(CAST(x2 AS DECIMAL(19,4)) * y AS DECIMAL(38,8))) AS s2y,
    sum(CAST(CAST(y AS DECIMAL(19,4)) * y AS DECIMAL(38,8))) AS syy
  FROM rows_ GROUP BY 1
), d AS (
  SELECT k, n,
    CAST(n AS DOUBLE) AS nd,
    CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
    CAST(floor(s11) AS DOUBLE) AS s11,
    CAST(floor(s22) AS DOUBLE) AS s22,
    CAST(floor(s12) AS DOUBLE) AS s12,
    CAST(floor(s1y) AS DOUBLE) AS s1y,
    CAST(floor(s2y) AS DOUBLE) AS s2y,
    CAST(floor(syy) AS DOUBLE) AS syy
  FROM agg
), m AS (
  SELECT k, n, nd, s1, s2, sy, s1y, s2y, syy,
    nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2) AS det,
    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y) AS det0,
    nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2) AS det1,
    nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2) AS det2,
    nd * s11 - s1 * s1 AS detr
  FROM d
), fit AS (
  SELECT k, n, nd, det, det1, det2, detr,
    syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y) AS sse_u,
    syy - ((sy - ((nd * s1y - s1 * sy) / detr) * s1) / nd) * sy
        - ((nd * s1y - s1 * sy) / detr) * s1y AS sse_r
  FROM m
)
SELECT k AS event_type, n AS n_obs,
  round(CASE WHEN n >= 4 AND det <> 0 AND detr <> 0 THEN det1 / det END, 6) AS b1_y,
  round(CASE WHEN n >= 4 AND det <> 0 AND detr <> 0 THEN det2 / det END, 6) AS b2_x,
  round(CASE WHEN n >= 4 AND det <> 0 AND detr <> 0 THEN sse_u END, 6) + 0.0 AS sse_u,
  round(CASE WHEN n >= 4 AND det <> 0 AND detr <> 0 THEN sse_r END, 6) + 0.0 AS sse_r,
  round(CASE WHEN n >= 4 AND det <> 0 AND detr <> 0 AND sse_u > 0
        THEN (sse_r - sse_u) / (sse_u / (nd - 3.0)) END, 6) + 0.0 AS f_stat
FROM fit
"""


@register(
    "granger_volume_causes_value", oracle=_GRANGER_ORACLE, tags=("trend", "A11")
)
def granger_volume_causes_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import granger_lag1

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("k"),
            F.date_format("ts", "yyyy-MM-dd").alias("t"),
        )
        .agg(
            F.sum(F.round("value", 2).cast("decimal(14,2)")).alias("yv"),
            F.count(F.lit(1)).cast("long").alias("xv"),
        )
    )
    out = granger_lag1(daily, ["k"], "t", "yv", "xv")
    return out.withColumnRenamed("k", "event_type")


# ---------------------------------------------------------------------------
# Index of dispersion over daily event counts per type: the Poisson-ness
# check the volume monitors implicitly assume.
# ---------------------------------------------------------------------------

_DISPERSION_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, strftime(ts, '%Y-%m-%d') AS t,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
  FROM daily GROUP BY 1
)
SELECT k AS event_type, n_obs,
  round(CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE), 6) AS mean_count,
  round(CASE WHEN n_obs >= 2 AND s > 0
        THEN (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n_obs AS DOUBLE)) / (CAST(n_obs AS DOUBLE) - 1.0) END, 6)
    + 0.0 AS var_count,
  round(CASE WHEN n_obs >= 2 AND s > 0
        THEN ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
               / CAST(n_obs AS DOUBLE)) / (CAST(n_obs AS DOUBLE) - 1.0))
             / (CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE)) END, 6)
    + 0.0 AS dispersion_index,
  round(CASE WHEN n_obs >= 2 AND s > 0
        THEN (CAST(n_obs AS DOUBLE) - 1.0)
             * ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n_obs AS DOUBLE)) / (CAST(n_obs AS DOUBLE) - 1.0))
             / (CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE)) END, 6)
    + 0.0 AS chi2,
  CASE WHEN n_obs >= 2 AND s > 0
       THEN ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              / CAST(n_obs AS DOUBLE)) / (CAST(n_obs AS DOUBLE) - 1.0))
            / (CAST(s AS DOUBLE) / CAST(n_obs AS DOUBLE)) > 1.0
  END AS overdispersed
FROM agg
"""


@register(
    "dispersion_index_daily_counts", oracle=_DISPERSION_ORACLE, tags=("DQ", "A11")
)
def dispersion_index_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..quality.monitors import dispersion_index

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type"), F.date_format("ts", "yyyy-MM-dd").alias("t")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return dispersion_index(daily, ["event_type"], "c")


# ---------------------------------------------------------------------------
# Pinball-loss scorecard of the seasonal-naive forecaster at q=0.1/0.5/
# 0.9 — asymmetric over/under-forecast grading next to MASE + conformal.
# ---------------------------------------------------------------------------

_PINBALL_ORACLE = """
WITH daily AS (
  SELECT event_type AS k, CAST(strftime(ts, '%d') AS BIGINT) AS t,
         CAST(sum(CAST(round(value, 2) AS DECIMAL(14,2))) AS DECIMAL(24,6)) AS v
  FROM events GROUP BY 1, 2
), paired AS (
  SELECT a.k, a.v - f.v AS r
  FROM daily a JOIN daily f ON f.k = a.k AND f.t = a.t - 7
), parts AS (
  SELECT k,
    CAST(CASE WHEN r > 0 THEN r ELSE 0 END AS DOUBLE) AS over_,
    CAST(CASE WHEN r < 0 THEN -r ELSE 0 END AS DOUBLE) AS under_
  FROM paired
), agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
    sum(CAST(round(0.1 * over_ + 0.9 * under_, 9) AS DECIMAL(28,9))) AS l0,
    sum(CAST(round(0.5 * over_ + 0.5 * under_, 9) AS DECIMAL(28,9))) AS l1,
    sum(CAST(round(0.9 * over_ + 0.09999999999999998 * under_, 9) AS DECIMAL(28,9))) AS l2
  FROM parts GROUP BY 1
)
SELECT k AS event_type, q, n_pairs,
       round(CAST(l AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6) AS pinball_loss
FROM (
  SELECT k, CAST(0.1 AS DOUBLE) AS q, n_pairs, l0 AS l FROM agg
  UNION ALL SELECT k, CAST(0.5 AS DOUBLE), n_pairs, l1 FROM agg
  UNION ALL SELECT k, CAST(0.9 AS DOUBLE), n_pairs, l2 FROM agg
)
"""


@register(
    "pinball_naive7_event_values", oracle=_PINBALL_ORACLE, tags=("eval", "trend")
)
def pinball_naive7_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.trend import pinball_loss_scorecard

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
    ).select("k", F.col("v").alias("a"), "f")
    out = pinball_loss_scorecard(paired, ["k"], "a", "f", quantiles=(0.1, 0.5, 0.9))
    return out.withColumnRenamed("k", "event_type")
