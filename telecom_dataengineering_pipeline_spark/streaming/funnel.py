"""Stateful streaming funnel — the streaming twin of
``operators/windows.py::sequence_funnel`` (ClickHouse ``windowFunnel``
semantics), following the codebase's batch≡stream discipline (fraud,
sessions, dedup-ingest): the same greedy state machine, held as per-user
keyed state in ``applyInPandasWithState`` so funnel depths advance
incrementally as events arrive instead of re-scanning history.

State per user is two scalars (depth, window-open µs) — the stream's
state store stays O(users), never O(events). Each micro-batch sorts its
own rows by event time (bounded out-of-orderness within a batch); cross-
batch order is the file/Kafka source's time order, exactly like the
sessionization stream. Reference parity: the reference computes funnels
batch-side in its marts; this adds the Flink-shaped continuous variant.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

try:  # workers must rebuild these closures without /root/repo on sys.path
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

# state: (depth reached, µs of the step-1 match that opened the window)
FUNNEL_STATE_SCHEMA = StructType(
    [StructField("depth", IntegerType()), StructField("t0", LongType())]
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_depth", IntegerType()),
        StructField("window_start_us", LongType()),
    ]
)


def make_funnel_tracker(steps: Sequence[str], within_seconds: int | None):
    """Build the applyInPandasWithState function closed over the funnel
    definition. Emits the user's CURRENT (depth, window start) snapshot
    each batch the user appears in — depth is monotone and the window
    start is fixed once opened, so the latest (max-depth) row per user is
    the funnel result."""
    steps = list(steps)
    limit_us = None if within_seconds is None else within_seconds * 1_000_000

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        depth, t0 = state.get if state.exists else (0, 0)
        events = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch operator's struct sort: (µs, tb)
        events = events.sort_values(["us", "tb"])
        for ev in events.itertuples(index=False):
            if depth < len(steps) and ev.ev == steps[depth]:
                fits = (
                    depth == 0
                    or limit_us is None
                    or int(ev.us) - t0 <= limit_us
                )
                if fits:
                    if depth == 0:
                        t0 = int(ev.us)
                    depth += 1
        state.update((depth, t0))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "funnel_depth": [depth],
                "window_start_us": [t0 if depth > 0 else None],
            }
        )

    return track


def funnel_stream(
    events: DataFrame,
    steps: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """events(user_id, us, tb, ev) stream → per-user funnel snapshots.

    Callers pre-filter to the step names (a huge reduction — only funnel
    events shuffle to the state store) and project the ordering key:
    ``us`` = event-time µs, ``tb`` = the deterministic tie-break string
    (event id). Update output mode: one snapshot row per (batch, active
    user)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_funnel_tracker(steps, within_seconds),
        FUNNEL_OUT_SCHEMA,
        FUNNEL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
