"""Streaming last-touch attribution parity: the keyed-state stream must
reproduce the batch ``last_touch_attribution`` exactly — same
(µs, tie-break) ordering, same strictly-preceding-touch frame, same
within-window null-out — when events arrive in multiple micro-batches
(the (touch_event, touch_us) state carries across batches)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.windows import (
    last_touch_attribution,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.attribution import (
    attribution_stream,
    make_attribution_tracker,
)

WITHIN_S = 21_600


def _run_stream(spark, projected, src_dir, splits):
    cols = ["user_id", "us", "tb", "ev"]
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
        spark.readStream.schema("user_id long, us long, tb string, ev string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/b*")
    )
    q = (
        attribution_stream(
            stream, conversion="purchase", touch_events=["view", "click"],
            within_seconds=WITHIN_S,
        )
        .writeStream.format("memory")
        .queryName("stream_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["conversion_us"], r["tb"]): (r["touch_event"], r["touch_us"])
        for r in spark.table("stream_attr").collect()
    }


@pytest.mark.parametrize("n_batches", [1, 3])
def test_stream_attribution_matches_batch(spark, sf_smoke, n_batches):
    ev = load_table(spark, sf_smoke, "events")
    batch = {
        (r["user_id"], r["conversion_us"], r["tb"]): (r["touch_event"], r["touch_us"])
        for r in last_touch_attribution(
            ev,
            "user_id",
            "ts",
            "event_type",
            conversion="purchase",
            touch_events=["view", "click"],
            within_seconds=WITHIN_S,
            tiebreak_col="event_id",
        ).collect()
    }
    assert batch and any(t != (None, None) for t in batch.values())
    assert any(t == (None, None) for t in batch.values())  # null path live

    projected = ev.filter(
        F.col("event_type").isin("purchase", "view", "click")
    ).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.col("event_id").cast("string").alias("tb"),
        F.col("event_type").alias("ev"),
    )
    us = sorted(r["us"] for r in projected.select("us").collect())
    splits = (
        [] if n_batches == 1
        else [us[len(us) // 3], us[2 * len(us) // 3]]
    )
    with tempfile.TemporaryDirectory() as d:
        got = _run_stream(spark, projected, os.path.join(d, "src"), splits)
    assert got == batch


def test_tracker_same_batch_ordering_and_window(spark):
    """Directed semantics: a touch and conversion in ONE batch resolve by
    (us, tb) order; a conversion preceding any touch gets NULL; a too-old
    touch nulls the credit but never un-emits the row; state carries the
    touch into the next batch."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401

    track = make_attribution_tracker("purchase", ["view"], within_seconds=10)

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
            "user_id": [1] * 4,
            "us": [5_000_000, 1_000_000, 2_000_000, 30_000_000],
            "tb": ["d", "a", "b", "e"],
            "ev": ["purchase", "purchase", "view", "purchase"],
        }
    )
    out = pd.concat(list(track((1,), iter([b1]), st)), ignore_index=True)
    # pandas renders a None in the int column as NaN; Arrow->Spark maps
    # both to SQL NULL (the three-SF oracle match pins that), so the
    # direct-tracker assertions normalize
    rows = {
        r.tb: (
            None if r.touch_event is None else r.touch_event,
            None if r.touch_us is None or pd.isna(r.touch_us) else int(r.touch_us),
        )
        for r in out.itertuples()
    }
    assert rows["a"] == (None, None)  # conversion before any touch
    assert rows["d"] == ("view", 2_000_000)  # same-batch preceding touch
    # 30s - 2s > 10s window: row emitted, credit nulled
    te, tu = rows["e"]
    assert te is None and (tu is None or pd.isna(tu))
    # state carried: a next-batch conversion within 10s of a NEW touch
    b2 = pd.DataFrame(
        {
            "user_id": [1, 1],
            "us": [31_000_000, 32_000_000],
            "tb": ["f", "g"],
            "ev": ["view", "purchase"],
        }
    )
    out2 = pd.concat(list(track((1,), iter([b2]), st)), ignore_index=True)
    assert list(out2.itertuples())[0].touch_us == 31_000_000


def test_conversion_in_touch_set_rejected():
    with pytest.raises(ValueError, match="cannot also be a touch"):
        make_attribution_tracker("view", ["view", "click"], None)
