"""Stateful streaming EWMA — the streaming twin of
``operators/trend.py::ewma_control_chart``'s recurrence, following the
codebase's batch≡stream discipline (fraud, sessions, dedup-ingest,
funnel): the same ``z_t = λ·x_t + (1−λ)·z_{t−1}`` fold, held as per-key
keyed state in ``applyInPandasWithState`` so the monitor advances
incrementally as series points arrive instead of re-pivoting history.

This is the reference's observability monitor
(``monitoring/pipeline_observability.py``) moved onto the stream: the
batch chart re-reads the whole series each run to draw retrospective
control limits; the streaming twin carries TWO SCALARS of state per
series key (current EWMA, points seen) and scores each new point on
arrival. Control limits need the center/σ of a BASELINE period — pass
them in (from the batch chart or any agg) and the stream flags
excursions immediately; omit them and it emits the smoothed level only.

Parity contract (pinned in tests): the streamed EWMA after consuming
steps 0..t equals the batch operator's ``_e{t}`` chain value bit-for-bit
— the fold performs the identical IEEE multiply/add sequence, and
micro-batch boundaries are invisible because the state carries the exact
running value across them. State store is O(keys), never O(points)."""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # workers must rebuild these closures without /root/repo on sys.path
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

# state: (current EWMA, number of points folded in)
EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)

EWMA_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ewma", DoubleType()),
        StructField("n_points", LongType()),
        StructField("last_us", LongType()),
        StructField("is_out", BooleanType()),
    ]
)


def make_ewma_tracker(
    lam: float,
    center: float | None = None,
    halfwidth: float | None = None,
):
    """Build the applyInPandasWithState function closed over λ and the
    (optional) baseline control band ``center ± halfwidth``. Emits one
    snapshot row per (batch, active key): the post-batch EWMA, how many
    points it has folded, the last event time, and the band verdict
    (NULL when no band was configured)."""
    lam = float(lam)
    if not 0.0 < lam <= 1.0:
        raise ValueError("lam must be in (0, 1]")
    one_minus = 1.0 - lam

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        ewma, n = state.get if state.exists else (0.0, 0)
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch pivot's step order: (µs, tb)
        batch = batch.sort_values(["us", "tb"])
        last_us = 0
        for ev in batch.itertuples(index=False):
            x = float(ev.x)
            # identical IEEE op sequence to the batch column chain:
            # first point initializes (z0 = x0), then mul/add per point
            ewma = x if n == 0 else lam * x + one_minus * ewma
            n += 1
            last_us = int(ev.us)
        state.update((ewma, n))
        out = None
        if center is not None and halfwidth is not None:
            out = bool(ewma > center + halfwidth or ewma < center - halfwidth)
        yield pd.DataFrame(
            {
                "key": [k],
                "ewma": [ewma],
                "n_points": [n],
                "last_us": [last_us],
                "is_out": [out],
            }
        )

    return track


def ewma_stream(
    series: DataFrame,
    lam: float = 0.3,
    center: float | None = None,
    halfwidth: float | None = None,
) -> DataFrame:
    """series(key string, us long, tb string, x double) stream → per-key
    EWMA snapshots. Callers pre-aggregate to the series grain upstream
    (one point per (key, step) — same contract as the batch chart's
    pivot) and project the ordering key: ``us`` event-time µs, ``tb``
    deterministic tie-break. Update output mode: one snapshot row per
    (micro-batch, active key)."""
    return series.groupBy("key").applyInPandasWithState(
        make_ewma_tracker(lam, center=center, halfwidth=halfwidth),
        EWMA_OUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
