"""Structured Streaming layer tests.

The key property (SURVEY.md §7 Phase 5): the stateful streaming fraud rules
must agree with the batch window queries — the batch results are the oracle.
The stream runs in multiple time-ordered micro-batches so per-key state
genuinely crosses batch boundaries.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.queries.fraud import (
    N_TOWERS,
    VELOCITY_ALERT,
    VELOCITY_HIGH,
    VELOCITY_WINDOW_S,
    fraud_impossible_travel,
    fraud_velocity_alerts,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.fraud import FraudConfig, fraud_alerts_stream
from telecom_dataengineering_pipeline_spark.streaming.ingest import bronze_ingest_stream, events_file_stream


def _located_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    tower = F.col("event_id") % N_TOWERS
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.lit(-35.0) + tower * 5.5).alias("lat"),
        (F.lit(-160.0) + tower * 22.0).alias("lon"),
        "ts",
    )


@pytest.fixture(scope="module")
def stream_alerts(spark, sf_smoke):
    """Run the fixture through the stateful stream in 3 time-ordered
    micro-batches; return collected alerts."""
    located = _located_events(spark, sf_smoke)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        # three time-range files → three micro-batches, state crosses batches
        bounds = ["2024-01-11", "2024-01-21"]
        parts = [
            located.filter(F.col("ts") < bounds[0]),
            located.filter((F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1])),
            located.filter(F.col("ts") >= bounds[1]),
        ]
        for i, p in enumerate(parts):
            p.coalesce(1).write.parquet(os.path.join(src, f"batch_{i}"))
        schema = located.schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/batch_*")
        )
        cfg = FraudConfig(
            min_distance_km=500.0,
            speed_alert_kmh=600.0,
            speed_high_kmh=2000.0,
            velocity_window_s=VELOCITY_WINDOW_S,
            velocity_alert=VELOCITY_ALERT,
            velocity_high=VELOCITY_HIGH,
        )
        alerts = fraud_alerts_stream(stream.drop("ts"), cfg)
        q = (
            alerts.writeStream.format("memory")
            .queryName("fraud_alerts_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        yield spark.sql("SELECT * FROM fraud_alerts_test").collect()


def test_stream_matches_batch_impossible_travel(spark, sf_smoke, stream_alerts):
    batch = {
        (r["alert_id"], r["severity"])
        for r in fraud_impossible_travel(spark, sf_smoke).filter("is_alert").collect()
    }
    stream = {
        (r["alert_id"], r["severity"])
        for r in stream_alerts
        if r["alert_type"] == "IMPOSSIBLE_TRAVEL"
    }
    assert stream == batch


def test_stream_matches_batch_velocity(spark, sf_smoke, stream_alerts):
    batch = {
        (r["alert_id"], r["severity"])
        for r in fraud_velocity_alerts(spark, sf_smoke).collect()
    }
    stream = {
        (r["alert_id"], r["severity"]) for r in stream_alerts if r["alert_type"] == "VELOCITY_FRAUD"
    }
    assert stream == batch


def test_bronze_ingest_stream_layout_and_exactly_once(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    with tempfile.TemporaryDirectory() as d:
        src, out, ckpt = (os.path.join(d, x) for x in ("src", "out", "ckpt"))
        ev.coalesce(2).write.parquet(src)
        schema = spark.read.parquet(src).schema

        def run_once():
            stream = events_file_stream(spark, src, schema)
            q = bronze_ingest_stream(
                stream, out, ckpt, topic="events", ts_col="ts", available_now=True
            )
            q.awaitTermination(300)

        run_once()
        landed = spark.read.parquet(out)
        assert landed.count() == ev.count()
        assert {"_kafka_topic", "_source_file", "_bronze_ingested_at"} <= set(landed.columns)
        assert landed.filter(F.col("_kafka_topic") != "events").count() == 0
        # hive layout present
        assert any(p.startswith("year=") for p in os.listdir(out))
        # T6 exactly-once: re-running against the same checkpoint must be a
        # no-op (no re-ingestion of already-committed files)
        run_once()
        assert spark.read.parquet(out).count() == ev.count()
