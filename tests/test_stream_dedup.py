"""Streaming exact-dedup (dropDuplicatesWithinWatermark) parity: a
duplicated at-least-once delivery stream must come out exactly-once."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.ingest import dedup_stream

KEYS = ["user_id", "ts", "event_type"]


def test_stream_dedup_matches_batch(spark, sf_smoke):
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("ts") < "2024-01-16")
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        # simulate at-least-once redelivery: every record arrives twice,
        # the replay in a later micro-batch but inside the watermark window
        ev.coalesce(1).write.parquet(os.path.join(src, "b0"))
        ev.coalesce(1).write.parquet(os.path.join(src, "b1"))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = (
            dedup_stream(stream, KEYS, ts_col="ts", watermark="2 days")
            .writeStream.format("memory")
            .queryName("deduped_events")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "availableNow stream did not finish in 300s"
        got = spark.sql("SELECT * FROM deduped_events")
        n_got = got.count()
        assert got.groupBy(*KEYS).count().filter(F.col("count") > 1).count() == 0
    # batch path of the same callable = plain dropDuplicates
    n_batch = dedup_stream(ev.union(ev), KEYS).count()
    assert n_got == n_batch == ev.distinct().count()
