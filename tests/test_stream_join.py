"""Stream-stream interval join: streaming result must equal the batch
analog of the same function (purchase → error within 1 h per user)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.joins import interval_join_streams
import pytest


def _sides(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    errors = ev.filter("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    return purchases, errors


@pytest.mark.slow
def test_stream_interval_join_matches_batch(spark, sf_smoke):
    purchases, errors = _sides(spark, sf_smoke)
    batch = interval_join_streams(
        purchases, errors, key="user_id", left_ts="purchase_ts", right_ts="error_ts",
        lower_seconds=0, upper_seconds=3600,
    )
    want = {(r["purchase_id"], r["error_id"]) for r in batch.collect()}
    assert want, "fixture should produce at least one purchase→error pair"

    with tempfile.TemporaryDirectory() as d:
        psrc, esrc = os.path.join(d, "p"), os.path.join(d, "e")
        purchases.coalesce(2).write.parquet(psrc)
        errors.coalesce(2).write.parquet(esrc)
        p_stream = spark.readStream.schema(purchases.schema).parquet(psrc)
        e_stream = spark.readStream.schema(errors.schema).parquet(esrc)
        joined = interval_join_streams(
            p_stream, e_stream, key="user_id", left_ts="purchase_ts", right_ts="error_ts",
            lower_seconds=0, upper_seconds=3600,
            left_watermark="2 hours", right_watermark="2 hours",
        )
        q = (
            joined.select("purchase_id", "error_id")
            .writeStream.format("memory")
            .queryName("stream_join_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["purchase_id"], r["error_id"])
            for r in spark.sql("SELECT * FROM stream_join_out").collect()
        }
    assert got == want


def test_stream_interval_left_outer_matches_batch(spark, sf_smoke):
    """Left-outer stream-stream join: unmatched left rows emit with NULL
    right side once the watermark passes their interval — requires the
    watermark to actually advance past every real event, which a
    far-future sentinel on each side forces (availableNow ends the stream
    at max(ts) − delay otherwise, stranding the tail's outer results)."""
    purchases, errors = _sides(spark, sf_smoke)
    batch = interval_join_streams(
        purchases, errors, key="user_id", left_ts="purchase_ts", right_ts="error_ts",
        lower_seconds=0, upper_seconds=3600, how="left_outer",
    )
    want = {(r["purchase_id"], r["error_id"]) for r in batch.collect()}
    assert any(e is None for _, e in want), "fixture should have unmatched purchases"

    far = purchases.agg(
        (F.max("purchase_ts") + F.expr("INTERVAL 30 DAYS")).alias("ts")
    ).first()["ts"]
    p_sent = spark.createDataFrame([(-1, -1, far)], purchases.schema)
    e_sent = spark.createDataFrame([(-1, -1, far)], errors.schema)

    with tempfile.TemporaryDirectory() as d:
        psrc, esrc = os.path.join(d, "p"), os.path.join(d, "e")
        purchases.unionByName(p_sent).coalesce(2).write.parquet(psrc)
        errors.unionByName(e_sent).coalesce(2).write.parquet(esrc)
        p_stream = spark.readStream.schema(purchases.schema).parquet(psrc)
        e_stream = spark.readStream.schema(errors.schema).parquet(esrc)
        joined = interval_join_streams(
            p_stream, e_stream, key="user_id", left_ts="purchase_ts", right_ts="error_ts",
            lower_seconds=0, upper_seconds=3600,
            left_watermark="2 hours", right_watermark="2 hours",
            how="left_outer",
        )
        q = (
            joined.select("purchase_id", "error_id")
            .writeStream.format("memory")
            .queryName("stream_left_join_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["purchase_id"], r["error_id"])
            for r in spark.sql(
                "SELECT * FROM stream_left_join_out WHERE purchase_id != -1"
            ).collect()
        }
    assert got == want
