"""T1 event-time watermark + windowed aggregation, and T7 streaming
MERGE/upsert refresh via foreachBatch."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.merge import merge_upsert
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_watermarked_window_agg_matches_batch(spark, sf_smoke):
    """Stream a static event set through withWatermark + window() in append
    mode; finalized windows must equal the batch groupBy(window) result."""
    ev = load_table(spark, sf_smoke, "events").select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        # two time-ordered files → watermark advances between batches
        ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(os.path.join(src, "b0"))
        ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(os.path.join(src, "b1"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        agg = (
            stream.withWatermark("ts", "30 seconds")  # T1: bounded out-of-orderness
            .groupBy(F.window("ts", "1 day"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("day"), "event_type", "n")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("windowed_counts")
            .outputMode("append")  # append emits only watermark-finalized windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["day"], r["event_type"]): r["n"]
            for r in spark.sql("SELECT * FROM windowed_counts").collect()
        }
    batch = {
        (r["day"], r["event_type"]): r["n"]
        for r in ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("day"), "event_type", "n")
        .collect()
    }
    # append-mode can hold back windows still within the final watermark —
    # everything emitted must match batch, and coverage must be near-total
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert batch[k] == v
    assert len(got) >= len(batch) - 10  # only the tail day may be pending


def test_foreachbatch_merge_refresh(spark, sf_smoke):
    """T7: incremental MERGE refresh of an aggregate table from a stream —
    writeStream.foreachBatch(merge) with keep-latest semantics."""
    ev = load_table(spark, sf_smoke, "events").select("ts", "user_id", "value", "event_id")
    with tempfile.TemporaryDirectory() as d:
        src, target, ckpt = (os.path.join(d, x) for x in ("src", "target", "ckpt"))
        ev.filter(F.col("event_id") < 500).coalesce(1).write.parquet(os.path.join(src, "b0"))
        ev.filter(F.col("event_id") >= 500).coalesce(1).write.parquet(os.path.join(src, "b1"))
        stream = (
            spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src + "/b*")
        )

        def merge_batch(batch_df, batch_id: int):
            # per-user rollup of this micro-batch, merged into the target by
            # key with batch-version-wins ordering (M1 via union+keep-latest)
            rollup = batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"), F.max("event_id").alias("max_event")
            ).withColumn("_v", F.lit(batch_id))
            try:
                target_df = spark.read.parquet(target)
            except Exception:
                target_df = None
            if target_df is None:
                merged = rollup
            else:
                # additive merge: counts accumulate across batches
                merged = (
                    target_df.unionByName(rollup)
                    .groupBy("user_id")
                    .agg(F.sum("n").alias("n"), F.max("max_event").alias("max_event"), F.max("_v").alias("_v"))
                )
            merged.write.mode("overwrite").parquet(target + "_tmp")
            spark.read.parquet(target + "_tmp").write.mode("overwrite").parquet(target)

        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = spark.read.parquet(target)
        batch_truth = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.max("event_id").alias("max_event")
        )
        got = {r["user_id"]: (r["n"], r["max_event"]) for r in final.collect()}
        want = {r["user_id"]: (r["n"], r["max_event"]) for r in batch_truth.collect()}
        assert got == want


def test_streaming_session_window_matches_batch(spark, sf_smoke):
    """Native session_window in a stream (dynamic-gap session aggregation
    with watermark) must finalize the same sessions as the batch
    session_window aggregation on the same input."""
    ev = load_table(spark, sf_smoke, "events").select("ts", "user_id", "value")
    gap = "10 minutes"

    def sessionize(df):
        return (
            df.groupBy(F.session_window("ts", gap), F.col("user_id"))
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total"))
            .select(
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "user_id",
                "n_events",
            )
        )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(os.path.join(src, "b0"))
        ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(os.path.join(src, "b1"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = (
            sessionize(stream.withWatermark("ts", "30 seconds"))
            .writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
            for r in spark.sql("SELECT * FROM stream_sessions").collect()
        }
    batch = {
        (r["session_start"], r["session_end"], r["user_id"]): r["n_events"]
        for r in sessionize(ev).collect()
    }
    assert got, "no finalized sessions emitted"
    for k, v in got.items():
        assert batch[k] == v
    # at most the sessions still open at the final watermark may be pending
    assert len(got) >= len(batch) - len({u for (_, _, u) in batch})
