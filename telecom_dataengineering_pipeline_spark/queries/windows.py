"""Window-function queries (SURVEY.md §2.5 W1–W4 batch forms).

W1 lives in relational.py (``latest_event_per_user_type``); here are the
lag/sliding-window shapes that back the fraud rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import sliding_count_by_time, with_prev_event
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# W3: per-key previous-event lookup via lag (Flink ValueState analog,
# fraud_detection.py:85-93) — inter-event deltas per user.
# ---------------------------------------------------------------------------

_DELTAS_ORACLE = """
SELECT user_id, event_id,
       prev_event_id,
       CAST(CASE WHEN prev_us IS NULL THEN NULL
            ELSE (us - prev_us) // 1000000 END AS BIGINT) AS seconds_since_prev,
       round(value - prev_value, 2) AS value_delta,
       (us - prev_us < 600 * 1000000) AS within_10min
FROM (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(event_id) OVER w AS prev_event_id,
         lag(epoch_us(ts)) OVER w AS prev_us,
         lag(value) OVER w AS prev_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
"""


@register("user_event_deltas", oracle=_DELTAS_ORACLE, tags=("W3",))
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    prev = with_prev_event(
        ev, key="user_id", ts_col="ts", cols=["event_id", "us", "value"], tie_break="event_id"
    )
    dt_us = F.col("us") - F.col("prev_us")
    return prev.select(
        "user_id",
        "event_id",
        "prev_event_id",
        F.floor(dt_us / 1_000_000).cast("long").alias("seconds_since_prev"),
        F.round(F.col("value") - F.col("prev_value"), 2).alias("value_delta"),
        (dt_us < 600 * 1_000_000).alias("within_10min"),
    )


# ---------------------------------------------------------------------------
# W4: trailing time-window count per key (Flink ListState sliding window,
# fraud_detection.py:95-100) — events per user in the trailing 24 h.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
SELECT user_id, event_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS events_in_window
FROM events
"""


@register("user_sliding_window_counts", oracle=_SLIDING_ORACLE, tags=("W4",), bench=True)
def user_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counted = sliding_count_by_time(
        ev, key="user_id", ts_col="ts", window_seconds=86400
    )
    return counted.select("user_id", "event_id", "events_in_window")


# ---------------------------------------------------------------------------
# Sessionization: lag(ts) + cumulative-sum-on-gap (30-minute inactivity
# gap). The canonical event-analytics session builder — two window passes
# over one per-key shuffle.
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800

_SESSION_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_S} * 1000000
                 THEN 1 ELSE 0 END AS is_new_session
  FROM seq
)
SELECT user_id, event_id,
       CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq,
       (is_new_session = 1) AS is_session_start
FROM marked
"""


@register("user_sessionization", oracle=_SESSION_ORACLE, tags=("W3", "sessionization"))
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "is_new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > SESSION_GAP_S * 1_000_000),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return marked.select(
        "user_id",
        "event_id",
        F.sum("is_new_session").over(cum).cast("long").alias("session_seq"),
        (F.col("is_new_session") == 1).alias("is_session_start"),
    )


_SESSION_STATS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_S} * 1000000
                 THEN 1 ELSE 0 END AS is_new_session
  FROM seq
), sess AS (
  SELECT *, sum(is_new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_seconds,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_seq
"""


@register("session_stats_rollup", oracle=_SESSION_STATS_ORACLE, tags=("W3", "A1", "sessionization"))
def session_stats_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = user_sessionization(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    joined = ev.join(sessions.select("event_id", "session_seq"), "event_id")
    return joined.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor((F.max("us") - F.min("us")) / 1_000_000).cast("long").alias("duration_seconds"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
    )


# ---------------------------------------------------------------------------
# Pivot: per-user event-type counts as columns (explicit value list so the
# output schema is deterministic); oracle via conditional aggregation.
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
"""


@register("event_type_pivot", oracle=_PIVOT_ORACLE, tags=("pivot",))
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["signup", "click", "view", "purchase", "error"]
    pivoted = ev.groupBy("user_id").pivot("event_type", kinds).count()
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds]
    )


# ---------------------------------------------------------------------------
# Trailing moving average over a date RANGE frame: daily revenue with its
# 7-day trailing mean — the classic KPI-smoothing window, RANGE-framed so
# gaps in the calendar widen the lookback correctly (unlike ROWS frames).
# ---------------------------------------------------------------------------

_MOVAVG_ORACLE = """
WITH daily AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
         CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1, 2
)
SELECT day, revenue,
       round(avg(revenue) OVER (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS revenue_7d_avg
FROM daily
"""


@register("daily_revenue_moving_avg", oracle=_MOVAVG_ORACLE, tags=("W4", "A5"))
def daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("day_num"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("revenue"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day", "revenue", F.round(F.avg("revenue").over(w), 6).alias("revenue_7d_avg")
    )


# ---------------------------------------------------------------------------
# The REAL stateful streaming sessionizer (applyInPandasWithState,
# streaming/sessions.py) run to completion with availableNow and checked
# value-exact against the batch lag/cumsum sessionization. A far-future
# sentinel event per user closes every REAL session inside the gap rule, so
# the stream's output is deterministic and complete (the sentinel's own
# open session is never emitted).
# ---------------------------------------------------------------------------

_SESSION_STREAM_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), marked AS (
  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {SESSION_GAP_S} * 1000000
                 THEN 1 ELSE 0 END AS new_s
  FROM seq
), numbered AS (
  SELECT *, CAST(sum(new_s) OVER (
      PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING
    ) AS BIGINT) AS session_seq
  FROM marked
)
SELECT user_id, session_seq,
       min(us) AS start_us, max(us) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS session_value
FROM numbered GROUP BY user_id, session_seq
"""


@register(
    "session_stream_availablenow",
    oracle=_SESSION_STREAM_ORACLE,
    tags=("T1", "T2", "T3", "sessionization"),
)
def session_stream_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization end-to-end: events staged to parquet, read
    back as a file stream, sessionized by the keyed-state operator, flushed
    by per-user sentinels, collected from a memory sink — the driver's
    oracle checks the stateful streaming path itself."""
    import os
    import shutil
    import tempfile

    from ..streaming.sessions import session_stream

    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("us", F.unix_micros("ts"))
        .select("ts", "us", "user_id", "event_id", "value")
    )
    # one sentinel per user, two gaps past that user's last event: closes the
    # final real session via the in-batch gap rule (no watermark race)
    sentinel = (
        ev.groupBy("user_id")
        .agg(F.max("us").alias("_mx"))
        .select(
            F.timestamp_micros(F.col("_mx") + 2 * SESSION_GAP_S * 1_000_000).alias("ts"),
            (F.col("_mx") + 2 * SESSION_GAP_S * 1_000_000).alias("us"),
            "user_id",
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(0.0).alias("value"),
        )
    )
    staged = ev.unionByName(sentinel)
    sink = "session_stream_availablenow_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="session_stream_src_")
    try:
        src = os.path.join(staging, "events")
        staged.write.parquet(src)
        stream = (
            spark.readStream.schema(staged.schema)
            .parquet(src)
            .withWatermark("ts", "30 seconds")
        )
        sessions = session_stream(stream, gap_s=SESSION_GAP_S)
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # The final watermark can time out and flush sentinel-only sessions for
    # users whose sentinel precedes the GLOBAL max event time; drop them by
    # their known (user, start) coordinates — a sentinel can never co-session
    # with a real event (it sits two gaps past the user's last one).
    return (
        spark.table(sink)
        .join(
            sentinel.select("user_id", F.col("us").alias("start_us")),
            ["user_id", "start_us"],
            "left_anti",
        )
        .select(
            "user_id", "session_seq", "start_us", "end_us", "n_events", "session_value"
        )
    )


# ---------------------------------------------------------------------------
# Rank-family windows over the order book: ntile deciles + percent_rank,
# tie-broken deterministically so both engines agree row-for-row.
# ---------------------------------------------------------------------------

_DECILE_ORACLE = """
WITH ranked AS (
  SELECT o_orderpriority AS priority,
         ntile(10) OVER w AS decile,
         percent_rank() OVER w AS pr,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) ASC, o_orderkey ASC)
)
SELECT priority, decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(price) AS DOUBLE) AS decile_min,
       CAST(max(price) AS DOUBLE) AS decile_max,
       round(max(pr), 6) AS max_percent_rank
FROM ranked GROUP BY 1, 2
"""


@register("order_price_deciles", oracle=_DECILE_ORACLE, tags=("W3", "A11"))
def order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    w = Window.partitionBy("o_orderpriority").orderBy(
        price.asc(), F.col("o_orderkey").asc()
    )
    ranked = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        price.alias("price"),
    )
    return ranked.groupBy("priority", "decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("price").cast("double").alias("decile_min"),
        F.max("price").cast("double").alias("decile_max"),
        F.round(F.max("pr"), 6).alias("max_percent_rank"),
    )


# ---------------------------------------------------------------------------
# T1 driven end-to-end through the driver gate: watermarked tumbling-window
# streaming aggregation in append mode (windows emit only when the
# watermark closes them), flushed by a far-future sentinel, value-checked
# against the batch date_trunc oracle.
# ---------------------------------------------------------------------------

_WINCOUNT_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events
GROUP BY 1, 2
"""


@register("windowed_counts_stream", oracle=_WINCOUNT_ORACLE, tags=("T1", "streaming"))
def windowed_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type over the event stream:
    counts plus min/max value (order-independent, so exact under any
    micro-batching). Append mode means a window row is emitted exactly
    once, when the watermark passes its end — the sentinel two days past
    the last event closes every real window before the stream ends."""
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    sentinel = ev.agg(
        (F.timestamp_micros(F.unix_micros(F.max("ts")) + 2 * 86400 * 1_000_000)).alias("ts")
    ).select("ts", F.lit("__flush__").alias("event_type"), F.lit(0.0).alias("value"))
    staged = ev.unionByName(sentinel)
    sink = "windowed_counts_stream_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="wincount_stream_src_")
    try:
        src = os.path.join(staging, "events")
        staged.write.parquet(src)
        stream = (
            spark.readStream.schema(staged.schema)
            .parquet(src)
            .withWatermark("ts", "30 seconds")
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min("value"), 6).alias("vmin"),
            F.round(F.max("value"), 6).alias("vmax"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return (
        spark.table(sink)
        .filter(F.col("event_type") != "__flush__")
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "vmin",
            "vmax",
        )
    )


# ---------------------------------------------------------------------------
# Gap fill + forward fill (operators/gapfill.py): dense per-user daily
# series with locf-carried aggregates — the TimescaleDB
# time_bucket_gapfill + locf shape over the reference's KPI-rollup grain.
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH obs AS (
  SELECT user_id, date_trunc('day', ts) AS bucket,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value,
         CAST(count(*) AS BIGINT) AS day_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM obs GROUP BY 1
), spine AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
  FROM bounds
)
SELECT s.user_id,
       strftime(s.bucket, '%Y-%m-%d') AS day,
       o.day_events IS NULL AS is_gap,
       last_value(o.day_value  IGNORE NULLS) OVER w AS day_value,
       last_value(o.day_events IGNORE NULLS) OVER w AS day_events
FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.bucket = o.bucket
WINDOW w AS (PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("events_gap_fill_ffill", oracle=_GAPFILL_ORACLE, tags=("W4", "A6", "gapfill"))
def events_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily activity per user with forward-filled aggregates: the
    spine is generated per key AFTER aggregation (|users| × days rows, the
    raw events are touched exactly once), the fill is one window — no
    as-of self-join, no correlated subquery."""
    from ..functions.decimals import dec
    from ..operators.gapfill import gap_fill_ffill

    ev = load_table(spark, sf_dir, "events")
    out = gap_fill_ffill(
        ev,
        key="user_id",
        bucket=F.date_trunc("day", "ts"),
        values=[
            ("day_value", F.sum(dec("value", 18, 2)).cast("double")),
            ("day_events", F.count(F.lit(1)).cast("long")),
        ],
        step="interval 1 day",
    )
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "is_gap",
        "day_value",
        "day_events",
    )


# ---------------------------------------------------------------------------
# Ranking-function completion: cume_dist / first_value / nth_value over a
# deterministically ordered partition (tie-break on the unique key — the
# registry's window convention). Complements order_price_deciles
# (ntile/percent_rank) so the full ANSI ranking surface is oracle-covered.
# ---------------------------------------------------------------------------

_POSITIONS_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       round(cume_dist() OVER w, 6) AS price_cume,
       first_value(o_orderkey) OVER w AS cheapest_key,
       nth_value(o_orderkey, 10) OVER w AS tenth_cheapest_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register("order_price_positions", oracle=_POSITIONS_ORACLE, tags=("W1", "O1"))
def order_price_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    # cume_dist pins its own RANGE frame in Spark (frame-independent by
    # definition); the value lookups run over the explicit running frame.
    w_rank = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.cume_dist().over(w_rank), 6).alias("price_cume"),
        F.first("o_orderkey").over(w_run).alias("cheapest_key"),
        F.nth_value("o_orderkey", 10).over(w_run).alias("tenth_cheapest_key"),
    )


# ---------------------------------------------------------------------------
# Streaming dedup-within-watermark through the driver gate: the W1/T5
# at-least-once story in its STREAMING form. Duplicates are injected as
# EXACT row copies, so whichever arrival the stream's keep-first state
# keeps, the surviving values are identical — the output is deterministic
# under any micro-batching, and the batch oracle is a plain DISTINCT.
# ---------------------------------------------------------------------------

_STREAM_DEDUP_ORACLE = """
WITH staged AS (
  SELECT event_id, user_id, event_type, value, ts FROM events
  UNION ALL
  SELECT event_id, user_id, event_type, value, ts FROM events WHERE user_id % 7 = 0
)
SELECT DISTINCT event_id, user_id, event_type,
       round(value, 6) AS value,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM staged
"""


@register("stream_dedup_availablenow", oracle=_STREAM_DEDUP_ORACLE, tags=("W2", "T5", "stream"))
def stream_dedup_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream with ~14% duplicate injection, deduplicated by
    ``dropDuplicates("event_id")`` under an event-time watermark (bounded
    state: a key's dedup entry expires once the watermark passes it — the
    production at-least-once ingest shape). availableNow drains the stage
    to a memory sink; values survive exactly because dups are exact."""
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    staged = ev.unionByName(ev.filter(F.col("user_id") % 7 == 0))
    sink = "stream_dedup_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="stream_dedup_src_")
    try:
        src = os.path.join(staging, "events")
        staged.write.parquet(src)
        stream = (
            spark.readStream.schema(staged.schema)
            .parquet(src)
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return spark.table(sink).select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    )
