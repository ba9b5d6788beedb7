"""Streaming dwell-time parity: the keyed-state stream must reproduce the
batch ``dwell_time_profile`` exactly — same (µs, tie-break) ordering, same
last-event censoring — when events arrive in multiple micro-batches (the
held (prev_us, prev_tb, prev_state) state carries across batches)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.windows import dwell_time_profile
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.dwell import (
    dwell_stream,
    make_dwell_tracker,
)


def _run_stream(spark, projected, src_dir, splits):
    cols = ["user_id", "us", "tb", "state"]
    lo = None
    for i, hi in enumerate([*splits, None]):
        part = projected
        if lo is not None:
            part = part.filter(F.col("us") >= lo)
        if hi is not None:
            part = part.filter(F.col("us") < hi)
        part.select(*cols).coalesce(1).write.parquet(os.path.join(src_dir, f"b{i}"))
        lo = hi
    stream = (
        spark.readStream.schema("user_id long, us long, tb string, state string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/b*")
    )
    q = (
        dwell_stream(stream)
        .writeStream.format("memory")
        .queryName("stream_dwell")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stream_dwell")


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stream_dwell_matches_batch(spark, sf_smoke, n_batches):
    ev = load_table(spark, sf_smoke, "events")
    batch = {
        r["state"]: (
            r["n_dwells"],
            r["mean_dwell_s"],
            r["max_dwell_s"],
            r["total_dwell_s"],
        )
        for r in dwell_time_profile(
            ev, "user_id", "ts", "event_type", tiebreak_col="event_id"
        ).collect()
    }
    assert batch and sum(v[0] for v in batch.values()) > 0

    projected = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("string").alias("tb"),
        F.col("event_type").alias("state"),
    )
    us = sorted(r["us"] for r in projected.select("us").collect())
    splits = (
        [] if n_batches == 1 else [us[len(us) // 3], us[2 * len(us) // 3]]
    )
    with tempfile.TemporaryDirectory() as d:
        emitted = _run_stream(spark, projected, os.path.join(d, "src"), splits)
        us_per_s = F.lit(1_000_000.0)
        got = {
            r["state"]: (
                r["n_dwells"],
                r["mean_dwell_s"],
                r["max_dwell_s"],
                r["total_dwell_s"],
            )
            for r in emitted.groupBy("state")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_dwells"),
                F.round(
                    F.sum("dwell_us").cast("double")
                    / F.count(F.lit(1)).cast("double")
                    / us_per_s,
                    6,
                ).alias("mean_dwell_s"),
                F.round(F.max("dwell_us").cast("double") / us_per_s, 6).alias(
                    "max_dwell_s"
                ),
                F.round(F.sum("dwell_us").cast("double") / us_per_s, 6).alias(
                    "total_dwell_s"
                ),
            )
            .collect()
        }
    assert got == batch


def test_dwell_tracker_censoring_and_cross_batch_state():
    """Directed semantics: within one batch, dwells close in (us, tb)
    order; the final event is held, not emitted; the next batch closes it;
    ties on us break by tb."""
    import pandas as pd

    track = make_dwell_tracker()

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
    b1 = pd.DataFrame(
        {
            "user_id": [1] * 3,
            "us": [2_000_000, 1_000_000, 1_000_000],
            "tb": ["c", "b", "a"],
            "state": ["x", "y", "z"],
        }
    )
    out1 = pd.concat(list(track((1,), iter([b1]), st)), ignore_index=True)
    # order: (1e6,'a')=z then (1e6,'b')=y then (2e6,'c')=x held
    assert list(out1["state"]) == ["z", "y"]
    assert list(out1["dwell_us"]) == [0, 1_000_000]
    assert st.get == (2_000_000, "c", "x")

    b2 = pd.DataFrame(
        {"user_id": [1], "us": [5_000_000], "tb": ["d"], "state": ["w"]}
    )
    out2 = pd.concat(list(track((1,), iter([b2]), st)), ignore_index=True)
    # the held event from batch 1 closes with the cross-batch gap
    assert list(out2["state"]) == ["x"]
    assert list(out2["dwell_us"]) == [3_000_000]
    assert st.get == (5_000_000, "d", "w")
