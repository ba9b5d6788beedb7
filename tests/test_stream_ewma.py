"""Streaming EWMA parity: the keyed-state stream must reproduce the batch
``ewma_control_chart`` recurrence EXACTLY (bit-for-bit, not approximately)
across micro-batch boundaries — the state carries the running value, so
where the batch boundary falls is invisible to the fold."""

from __future__ import annotations

import os
import tempfile

import pytest

from telecom_dataengineering_pipeline_spark.operators.trend import ewma_control_chart
from telecom_dataengineering_pipeline_spark.streaming.monitors import (
    ewma_stream,
    make_ewma_tracker,
)

_LAM = 0.4
_SERIES = {
    "clicks": [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 14.0, 14.0, 14.0],
    "errors": [5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0],
}
_STEPS = [f"m{i}" for i in range(10)]


def _batch_chain(spark):
    rows = [
        (k, f"m{i}", x) for k, xs in _SERIES.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "g string, step string, x double")
    return {
        (r["g"], r["step"]): r["ewma"]
        for r in ewma_control_chart(df, ["g"], "step", "x", _STEPS, lam=_LAM).collect()
    }


@pytest.mark.slow
def test_stream_ewma_matches_batch_chain_across_batch_splits(spark):
    batch = _batch_chain(spark)
    # one point per (key, step); us encodes the step order; split into
    # three uneven micro-batches (3 / 4 / 3 points per key)
    pts = [
        (k, 1_000_000 * (i + 1), f"e{i}", x)
        for k, xs in _SERIES.items()
        for i, x in enumerate(xs)
    ]
    schema = "key string, us long, tb string, x double"
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        cuts = [(0, 3), (3, 7), (7, 10)]
        for bi, (lo, hi) in enumerate(cuts):
            chunk = [p for p in pts if lo < p[1] // 1_000_000 <= hi]
            spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
                os.path.join(src, f"b{bi}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
        )
        out = ewma_stream(stream, lam=_LAM)
        q = (
            out.writeStream.format("memory")
            .queryName("stream_ewma")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snaps = spark.sql(
            "SELECT * FROM stream_ewma ORDER BY key, n_points"
        ).collect()
    # each micro-batch snapshot equals the batch chain at that prefix:
    # after 3 points -> _e2 (step m2), after 7 -> m6, after 10 -> m9
    by_key = {}
    for r in snaps:
        by_key.setdefault(r["key"], []).append((r["n_points"], r["ewma"]))
    for k in _SERIES:
        assert [n for n, _ in by_key[k]] == [3, 7, 10]
        for n, ewma in by_key[k]:
            # batch rounds to 6 for the cross-engine gate; round the raw
            # stream value the same way — the underlying fold is the
            # identical IEEE op sequence
            assert round(ewma, 6) == batch[(k, f"m{n - 1}")], (k, n)


def test_stream_ewma_band_verdict_and_validation(spark):
    """With a configured baseline band the snapshot carries the excursion
    verdict; tracker parameters are validated eagerly."""
    import pandas as pd

    with pytest.raises(ValueError, match="lam"):
        make_ewma_tracker(0.0)

    # drive the tracker directly (unit level): shifted series escapes the
    # band, quiet one does not
    class _FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    track = make_ewma_tracker(0.5, center=10.0, halfwidth=2.0)
    pdf = pd.DataFrame(
        {"us": [1, 2, 3], "tb": ["a", "b", "c"], "x": [14.0, 14.0, 14.0]}
    )
    (out,) = track(("k",), iter([pdf]), _FakeState())
    assert bool(out["is_out"][0]) is True
    track2 = make_ewma_tracker(0.5, center=10.0, halfwidth=2.0)
    pdf2 = pd.DataFrame({"us": [1], "tb": ["a"], "x": [10.5]})
    (out2,) = track2(("k",), iter([pdf2]), _FakeState())
    assert bool(out2["is_out"][0]) is False
