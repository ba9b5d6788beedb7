"""Fraud-detection rules — batch analogs of the reference's Flink job
(``streaming/flink_jobs/fraud_detection.py``), per SURVEY.md §7 Phase 4.

The streaming versions (applyInPandasWithState) live in
``telecom_dataengineering_pipeline_spark/streaming/fraud.py``; these batch window queries are the
semantic oracle the stream is tested against.

Events carry no coordinates, so each event is assigned a deterministic
synthetic "tower": ``tower_id = event_id % 14`` (the reference producer has 14
towers, cdr_producer.py:38-53) with fixed per-tower lat/lon. All rule logic —
haversine, speed, thresholds, severity escalation — matches
fraud_detection.py:55-59,126-195 semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import haversine_km
from ..operators.windows import sliding_count_by_time, with_prev_event
from ..sources.catalog import load_table
from .registry import register

N_TOWERS = 14
# Scaled-down thresholds for the driver's sparse event data; the reference's
# production values (500 km / 600 km/h / 25 calls per 30 min) are the
# defaults in streaming/fraud.py.
MIN_DISTANCE_KM = 500.0
SPEED_ALERT_KMH = 600.0
SPEED_HIGH_KMH = 2000.0
VELOCITY_WINDOW_S = 86400
VELOCITY_ALERT = 4
VELOCITY_HIGH = 6


def _with_towers(ev: DataFrame) -> DataFrame:
    tower = F.col("event_id") % N_TOWERS
    return ev.withColumns(
        {
            "tower_id": tower,
            "lat": F.lit(-35.0) + tower * 5.5,
            "lon": F.lit(-160.0) + tower * 22.0,
        }
    )


_TRAVEL_ORACLE = f"""
WITH located AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         event_id % {N_TOWERS} AS tower_id,
         -35 + (event_id % {N_TOWERS}) * 5.5  AS lat,
         -160 + (event_id % {N_TOWERS}) * 22.0 AS lon
  FROM events
), seq AS (
  SELECT *,
         lag(event_id) OVER w AS prev_event_id,
         lag(us)  OVER w AS prev_us,
         lag(lat) OVER w AS prev_lat,
         lag(lon) OVER w AS prev_lon
  FROM located
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), dist AS (
  SELECT *,
         2 * 6371.0 * asin(sqrt(
           sin(radians(lat - prev_lat) / 2) * sin(radians(lat - prev_lat) / 2)
           + cos(radians(prev_lat)) * cos(radians(lat))
             * sin(radians(lon - prev_lon) / 2) * sin(radians(lon - prev_lon) / 2)
         )) AS distance_km,
         (us - prev_us) / 3600000000.0 AS hours_elapsed
  FROM seq WHERE prev_event_id IS NOT NULL
)
SELECT user_id, event_id, prev_event_id,
       round(distance_km, 3) AS distance_km,
       round(CASE WHEN us - prev_us > 0 THEN distance_km / ((us - prev_us) / 3600000000.0) END, 3) AS speed_kmh,
       (us - prev_us > 0 AND distance_km / ((us - prev_us) / 3600000000.0) >= {SPEED_ALERT_KMH}) AS is_alert,
       CASE
         WHEN us - prev_us > 0 AND distance_km / ((us - prev_us) / 3600000000.0) >= {SPEED_HIGH_KMH} THEN 'HIGH'
         WHEN us - prev_us > 0 AND distance_km / ((us - prev_us) / 3600000000.0) >= {SPEED_ALERT_KMH} THEN 'MEDIUM'
         ELSE 'LOW'
       END AS severity,
       concat('IMP_TRAVEL_', CAST(event_id AS VARCHAR)) AS alert_id
FROM dist
WHERE distance_km >= {MIN_DISTANCE_KM}
"""


@register("fraud_impossible_travel", oracle=_TRAVEL_ORACLE, tags=("W3", "F20", "F24", "T4"), bench=True)
def fraud_impossible_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive same-user events ≥500 km apart, with implied speed and the
    reference's severity escalation (fraud_detection.py:126-161)."""
    ev = _with_towers(load_table(spark, sf_dir, "events")).withColumn(
        "us", F.unix_micros("ts")
    )
    seq = with_prev_event(
        ev, key="user_id", ts_col="ts", cols=["event_id", "us", "lat", "lon"], tie_break="event_id"
    ).filter(F.col("prev_event_id").isNotNull())
    dist = haversine_km(F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon"))
    dt_us = F.col("us") - F.col("prev_us")
    hours = dt_us / 3.6e9
    speed = dist / hours
    has_dt = dt_us > 0
    return (
        seq.withColumn("distance_km_raw", dist)
        .filter(F.col("distance_km_raw") >= MIN_DISTANCE_KM)
        .select(
            "user_id",
            "event_id",
            "prev_event_id",
            F.round("distance_km_raw", 3).alias("distance_km"),
            F.round(F.when(has_dt, speed), 3).alias("speed_kmh"),
            (has_dt & (speed >= SPEED_ALERT_KMH)).alias("is_alert"),
            F.when(has_dt & (speed >= SPEED_HIGH_KMH), "HIGH")
            .when(has_dt & (speed >= SPEED_ALERT_KMH), "MEDIUM")
            .otherwise("LOW")
            .alias("severity"),
            F.concat(F.lit("IMP_TRAVEL_"), F.col("event_id").cast("string")).alias("alert_id"),
        )
    )


_VELOCITY_ORACLE = f"""
WITH counted AS (
  SELECT user_id, event_id,
         CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {VELOCITY_WINDOW_S * 1_000_000 - 1} PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS events_in_window
  FROM events
)
SELECT user_id, event_id, events_in_window,
       CASE WHEN events_in_window >= {VELOCITY_HIGH} THEN 'HIGH' ELSE 'MEDIUM' END AS severity,
       concat('VELOCITY_', CAST(event_id AS VARCHAR)) AS alert_id
FROM counted WHERE events_in_window >= {VELOCITY_ALERT}
"""


@register("fraud_velocity_alerts", oracle=_VELOCITY_ORACLE, tags=("W4", "T4", "F24"))
def fraud_velocity_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule (fraud_detection.py:167-195): alert when a user's
    trailing-window event count crosses the threshold; HIGH at 1.5×."""
    ev = load_table(spark, sf_dir, "events")
    counted = sliding_count_by_time(ev, "user_id", "ts", VELOCITY_WINDOW_S)
    return counted.filter(F.col("events_in_window") >= VELOCITY_ALERT).select(
        "user_id",
        "event_id",
        "events_in_window",
        F.when(F.col("events_in_window") >= VELOCITY_HIGH, "HIGH").otherwise("MEDIUM").alias("severity"),
        F.concat(F.lit("VELOCITY_"), F.col("event_id").cast("string")).alias("alert_id"),
    )


_ALERT_STREAM_ORACLE = f"""
WITH located AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         -35 + (event_id % {N_TOWERS}) * 5.5  AS lat,
         -160 + (event_id % {N_TOWERS}) * 22.0 AS lon
  FROM events
), seq AS (
  SELECT *,
         lag(event_id) OVER w AS prev_event_id,
         lag(us)  OVER w AS prev_us,
         lag(lat) OVER w AS prev_lat,
         lag(lon) OVER w AS prev_lon
  FROM located
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), travel AS (
  SELECT user_id, event_id,
         2 * 6371.0 * asin(sqrt(
           sin(radians(lat - prev_lat) / 2) * sin(radians(lat - prev_lat) / 2)
           + cos(radians(prev_lat)) * cos(radians(lat))
             * sin(radians(lon - prev_lon) / 2) * sin(radians(lon - prev_lon) / 2)
         )) AS distance_km,
         (us - prev_us) AS dt_us
  FROM seq WHERE prev_event_id IS NOT NULL
), travel_alerts AS (
  SELECT 'IMPOSSIBLE_TRAVEL' AS alert_type,
         concat('IMP_TRAVEL_', CAST(event_id AS VARCHAR)) AS alert_id,
         user_id,
         CASE WHEN distance_km / (dt_us / 3600000000.0) >= {SPEED_HIGH_KMH} THEN 'HIGH' ELSE 'MEDIUM' END AS severity
  FROM travel
  WHERE distance_km >= {MIN_DISTANCE_KM} AND dt_us > 0
        AND distance_km / (dt_us / 3600000000.0) >= {SPEED_ALERT_KMH}
), vel AS (
  SELECT user_id, event_id,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {VELOCITY_WINDOW_S * 1_000_000 - 1} PRECEDING AND CURRENT ROW) AS n
  FROM events
), velocity_alerts AS (
  SELECT 'VELOCITY_FRAUD' AS alert_type,
         concat('VELOCITY_', CAST(event_id AS VARCHAR)) AS alert_id,
         user_id,
         CASE WHEN n >= {VELOCITY_HIGH} THEN 'HIGH' ELSE 'MEDIUM' END AS severity
  FROM vel WHERE n >= {VELOCITY_ALERT}
)
SELECT * FROM travel_alerts UNION ALL SELECT * FROM velocity_alerts
"""


@register("fraud_alert_stream", oracle=_ALERT_STREAM_ORACLE, tags=("T4", "U1"))
def fraud_alert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0..2 alerts per event, both rules unioned into one alert schema —
    the batch equivalent of the Flink job's output stream
    (fraud_detection.py:139-160,180-194)."""
    travel = fraud_impossible_travel(spark, sf_dir).filter(F.col("is_alert")).select(
        F.lit("IMPOSSIBLE_TRAVEL").alias("alert_type"),
        "alert_id",
        "user_id",
        F.col("severity"),
    )
    velocity = fraud_velocity_alerts(spark, sf_dir).select(
        F.lit("VELOCITY_FRAUD").alias("alert_type"),
        "alert_id",
        "user_id",
        "severity",
    )
    return travel.unionByName(velocity)


@register("fraud_stream_availablenow", oracle=_ALERT_STREAM_ORACLE, tags=("T1", "T2", "T3", "T4"))
def fraud_stream_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL stateful stream (applyInPandasWithState, streaming/fraud.py)
    run to completion with an availableNow trigger and returned as a batch
    DataFrame — so the driver's DuckDB oracle checks the Flink-equivalent
    stateful path itself, not just its batch twin ``fraud_alert_stream``.

    The located-events table is staged to parquet and read back as a file
    stream (the same stand-in for Kafka the ingest layer uses, S1); alerts
    land in a memory sink which is returned after termination.  Ordering
    parity with the RANGE-window oracle holds because event times are unique
    per user (asserted by the batch twin's green oracle row).
    """
    import os
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    tower = F.col("event_id") % N_TOWERS
    located = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.lit(-35.0) + tower * 5.5).alias("lat"),
        (F.lit(-160.0) + tower * 22.0).alias("lon"),
    )

    from ..streaming.fraud import FraudConfig, fraud_alerts_stream

    cfg = FraudConfig(
        min_distance_km=MIN_DISTANCE_KM,
        speed_alert_kmh=SPEED_ALERT_KMH,
        speed_high_kmh=SPEED_HIGH_KMH,
        velocity_window_s=VELOCITY_WINDOW_S,
        velocity_alert=VELOCITY_ALERT,
        velocity_high=VELOCITY_HIGH,
    )
    sink = "fraud_stream_availablenow_sink"
    spark.catalog.dropTempView(sink)
    staging = tempfile.mkdtemp(prefix="fraud_stream_src_")
    try:
        src = os.path.join(staging, "events")
        located.write.parquet(src)
        stream = spark.readStream.schema(located.schema).parquet(src)
        alerts = fraud_alerts_stream(stream, cfg)
        q = (
            alerts.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return spark.table(sink).select("alert_type", "alert_id", "user_id", "severity")
