"""Streaming growth-accounting parity: the keyed-state stream must
reproduce the batch operator's new/retained/resurrected classification
exactly across micro-batch splits, and replayed (user, step) activity
must be idempotent. Churn is batch-only by design (absence is not
observable per key in an event-driven operator)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.windows import growth_accounting
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.growth import (
    growth_stream,
    growth_tracker,
)


@pytest.mark.slow
def test_stream_growth_matches_batch(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select(
        F.col("user_id").alias("u"), F.date_format("ts", "dd").cast("long").alias("t")
    ).distinct()
    batch = {
        r["step"]: (r["active"], r["new_users"], r["retained"], r["resurrected"])
        for r in growth_accounting(ev, "u", "t").collect()
    }
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ev.filter(F.col("t") <= 10).coalesce(1).write.parquet(os.path.join(src, "b0"))
        ev.filter((F.col("t") > 10) & (F.col("t") <= 20)).coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        ev.filter(F.col("t") > 20).coalesce(1).write.parquet(os.path.join(src, "b2"))
        stream = (
            spark.readStream.schema("u long, t long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        q = (
            growth_stream(stream)
            .writeStream.format("memory")
            .queryName("growth_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        r["step"]: (r["active"], r["new_users"], r["retained"], r["resurrected"])
        for r in spark.table("growth_sink")
        .groupBy(F.col("t").alias("step"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active"),
            F.sum((F.col("cls") == "new").cast("int")).cast("long").alias("new_users"),
            F.sum((F.col("cls") == "retained").cast("int")).cast("long").alias("retained"),
            F.sum((F.col("cls") == "resurrected").cast("int")).cast("long").alias("resurrected"),
        )
        .collect()
    }
    assert got == batch


def test_growth_tracker_idempotent_replay_and_order():
    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    b1 = pd.DataFrame({"u": [7, 7, 7], "t": [3, 1, 3]})  # unordered + dup
    out1 = pd.concat(list(growth_tracker((7,), iter([b1]), st)), ignore_index=True)
    assert list(zip(out1["t"], out1["cls"])) == [(1, "new"), (3, "resurrected")]
    # replayed step 3 and an already-seen step 1: both skipped
    b2 = pd.DataFrame({"u": [7, 7, 7], "t": [3, 1, 4]})
    out2 = pd.concat(list(growth_tracker((7,), iter([b2]), st)), ignore_index=True)
    assert list(zip(out2["t"], out2["cls"])) == [(4, "retained")]
    # gap after 4 -> resurrected
    b3 = pd.DataFrame({"u": [7], "t": [9]})
    out3 = pd.concat(list(growth_tracker((7,), iter([b3]), st)), ignore_index=True)
    assert list(zip(out3["t"], out3["cls"])) == [(9, "resurrected")]
