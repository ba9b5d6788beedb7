"""Round-14 registrations (round 9, session 3): volatility bands,
recency-decayed attribution, and sequential-pattern mining.

- Bollinger bands (``operators/trend.py::bollinger_bands``) — trailing
  mean ± k·σ with a breakout flag, the variance-adaptive sibling of the
  fixed-band WMA/EWMA monitors (reference parity: the dbt volume-anomaly
  threshold shape, ``assert_row_count_anomaly.sql``, with a local-σ band);
- time-decay multi-touch attribution
  (``operators/windows.py::time_decay_attribution``) — exponential
  half-life credit over the same next-conversion kernel as last-touch /
  U-shaped, completing the standard attribution-model trio;
- event-sequence n-gram mining (``operators/windows.py::sequence_ngrams``)
  — trigram support table over per-user ordered journeys, the n>1
  generalization of the first-order transition matrix.

Registry conventions apply: exact DECIMAL folds wherever a sum crosses
engines, integer DIV for bucketing (never float ratios on a floor
boundary), identical IEEE expression shapes on both sides for every
float, unique window tie-breaks, matching column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

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
    "winnowing_fingerprint_pairs", oracle=_WINNOW_ORACLE, tags=("LLM", "dedup")
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
  dc.d AS degree_sum,
  CAST(4 * m.m * coalesce(i.e, 0) - dc.d * dc.d AS BIGINT) AS q_num_4m2,
  round(CAST(coalesce(i.e, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
      - (CAST(dc.d AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
        * (CAST(dc.d AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))), 9) + 0.0 AS q_contrib
FROM members mem
JOIN degc dc ON dc.label = mem.label
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

    pairs = capped_copurchase_pairs(spark, sf_dir).localCheckpoint(eager=False)
    labels = label_propagation(pairs, iters=2)
    return community_modularity(pairs, labels)
