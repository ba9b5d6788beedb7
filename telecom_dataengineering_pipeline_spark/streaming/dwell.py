"""Stateful streaming dwell-time tracking — the streaming twin of
``operators/windows.py::dwell_time_profile`` (VERDICT r8 item 9),
extending the batch≡stream≡oracle pattern to the time-in-state family
(funnel/sessions/attribution/growth already follow it).

The batch operator leads over each user's (µs, tie-break)-ordered event
sequence: every event's dwell is the µs until the SAME user's next event
(any state); the last event is censored (no successor, excluded). The
stream holds exactly that lead pointer as keyed state — ONE previous
event per user: (its µs, tie-break, state). When the next event arrives,
the held event's dwell closes and emits; the new event becomes the held
one. A user's final event simply never closes — identical censoring to
the batch exclusion, no timeout heuristics.

State is three scalars per user — O(users), never O(events). Each
micro-batch sorts its own rows by the batch operator's exact ordering
key (µs, tie-break); cross-batch order is the source's time order, as in
the sessionization/attribution streams. Emission is append-mode, 0..n
closed dwells per (batch, user) — the alert-emission contract (SURVEY §2
T4). The state-grain rollup (mean/max/total per state) is a plain batch
aggregation over the emitted rows, shared with the batch profile.

Reference parity: the dwell/latency view of the reference's call-event
sequences (``/root/reference/dbt_project/models/gold/facts/
fact_calls.sql`` orders per-caller events the same way); the streaming
shape mirrors its Flink keyed-state jobs
(``/root/reference/processing/streaming/``).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

# state: the held (not-yet-closed) event — its µs, tie-break, state label
DWELL_STATE_SCHEMA = StructType(
    [
        StructField("prev_us", LongType()),
        StructField("prev_tb", StringType()),
        StructField("prev_state", StringType()),
    ]
)

# one row per CLOSED dwell: the held event's identity plus its duration
DWELL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("state", StringType()),
        StructField("start_us", LongType()),
        StructField("tb", StringType()),
        StructField("dwell_us", LongType()),
    ]
)


def make_dwell_tracker():
    """applyInPandasWithState fn: close the held event's dwell on each
    arrival; the newest event replaces it and waits for its successor."""

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        p_us, p_tb, p_state = state.get if state.exists else (None, None, None)
        events = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch operator's window: (µs, tb)
        events = events.sort_values(["us", "tb"])
        out: list[tuple] = []
        for ev in events.itertuples(index=False):
            if p_us is not None:
                out.append((user_id, p_state, p_us, p_tb, int(ev.us) - p_us))
            p_us, p_tb, p_state = int(ev.us), ev.tb, ev.state
        state.update((p_us, p_tb, p_state))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in DWELL_OUT_SCHEMA.fields])

    return track


def dwell_stream(events: DataFrame) -> DataFrame:
    """events(user_id, us, tb, state) stream → appended closed-dwell rows.

    Callers project the ordering key up front: ``us`` = event-time µs,
    ``tb`` = the deterministic tie-break string (event id). Only the four
    needed columns shuffle to the state store."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_dwell_tracker(),
        DWELL_OUT_SCHEMA,
        DWELL_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
