"""Streaming funnel parity: the keyed-state stream must reproduce the
batch ``sequence_funnel`` exactly — including the greedy window-open
semantics — when events arrive in multiple micro-batches (state carries
depth + window start across batches)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.windows import sequence_funnel
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.funnel import funnel_stream
import pytest

STEPS = ["signup", "click", "purchase"]
WINDOW_S = 3600


def test_stream_funnel_matches_batch(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    batch = {
        r["user_id"]: (r["funnel_depth"], r["window_start_us"])
        for r in sequence_funnel(
            ev,
            user_col="user_id",
            ts_col="ts",
            event_col="event_type",
            steps=STEPS,
            within_seconds=WINDOW_S,
            tiebreak_col="event_id",
        ).collect()
    }
    assert batch and any(d > 0 for d, _ in batch.values())

    projected = ev.filter(F.col("event_type").isin(STEPS)).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("string").alias("tb"),
        F.col("event_type").alias("ev"),
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        # two time-split files -> two micro-batches: the funnel state
        # (depth + window start) must survive the batch boundary
        projected.filter(F.col("us") < F.unix_micros(F.lit("2024-01-16").cast("timestamp"))).coalesce(1).write.parquet(os.path.join(src, "b0"))
        projected.filter(F.col("us") >= F.unix_micros(F.lit("2024-01-16").cast("timestamp"))).coalesce(1).write.parquet(os.path.join(src, "b1"))
        stream = (
            spark.readStream.schema(projected.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        out = funnel_stream(stream, STEPS, within_seconds=WINDOW_S)
        q = (
            out.writeStream.format("memory")
            .queryName("stream_funnel")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # depth is monotone and the window start is fixed once opened:
        # the max-depth snapshot per user is the final funnel state
        got = {
            r["user_id"]: (r["funnel_depth"], r["window_start_us"])
            for r in spark.sql(
                """SELECT user_id, max(funnel_depth) AS funnel_depth,
                          max(window_start_us) AS window_start_us
                   FROM stream_funnel GROUP BY user_id"""
            ).collect()
        }
    assert got == batch


@pytest.mark.slow
def test_stream_funnel_window_expiry_across_batches(spark):
    """A step-2 event in a LATER batch past the window must not advance
    the funnel (the window opened by batch-1's signup has expired), and a
    user completing across batches must reach full depth."""
    rows_b0 = [
        (1, 1_000_000, "a", "signup"),
        (2, 1_000_000, "b", "signup"),
        (2, 2_000_000, "c", "click"),
    ]
    rows_b1 = [
        # user 1: click arrives 2h after signup with a 1h window -> stuck at 1
        (1, 1_000_000 + 7_200_000_000, "d", "click"),
        # user 2: purchase inside the window -> depth 3
        (2, 3_000_000, "e", "purchase"),
    ]
    schema = "user_id long, us long, tb string, ev string"
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(rows_b0, schema).coalesce(1).write.parquet(
            os.path.join(src, "b0")
        )
        spark.createDataFrame(rows_b1, schema).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        out = funnel_stream(stream, ["signup", "click", "purchase"], within_seconds=3600)
        q = (
            out.writeStream.format("memory")
            .queryName("stream_funnel_expiry")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            r["user_id"]: (r["funnel_depth"], r["window_start_us"])
            for r in spark.sql(
                """SELECT user_id, max(funnel_depth) AS funnel_depth,
                          max(window_start_us) AS window_start_us
                   FROM stream_funnel_expiry GROUP BY user_id"""
            ).collect()
        }
    assert got == {1: (1, 1_000_000), 2: (3, 1_000_000)}
