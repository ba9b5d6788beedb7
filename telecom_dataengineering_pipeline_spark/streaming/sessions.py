"""Stateful streaming sessionization (SURVEY.md §2 T2/T3/T4 applied to the
session-window shape; batch analog: ``queries/windows.py::
user_sessionization`` / ``session_stats_rollup``).

One keyed state per user carries the OPEN session (start, last-seen, count,
decimal-exact value sum); an event farther than ``gap_s`` from the last one
closes the session — emitted downstream — and opens the next. Idle users'
final sessions close via EVENT-TIME TIMEOUT: when the watermark passes
last_seen + gap the state times out and the session flushes, so closure
needs no further traffic from that user (the semantics
``F.session_window`` provides for aggregations, here for arbitrary
per-session state — the reason to drop to ``applyInPandasWithState``).

Scale shape: state is one fixed-size row per user — the open session while
active, and a few-longs counter row after the timeout flush (the session
counter must survive idleness: dropping it would restart ``session_seq``
and emit duplicate keys when the user returns). Each micro-batch shuffles
only its own events by user. Value sums accumulate as integer cents, so
emitted totals are exact regardless of batch boundaries — a float
accumulator would drift between the streaming and batch paths.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# cloudpickle-by-value so consumers that only set driver sys.path still ship
# the closure to workers (same convention as streaming.fraud).
import sys as _sys

from pyspark import cloudpickle as _cp

_cp.register_pickle_by_value(_sys.modules[__name__])

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("session_value", DoubleType()),
    ]
)

# state: open session + how many sessions closed so far (for session_seq)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
        StructField("n_closed", LongType()),
    ]
)


def _half_up_cents(x: float) -> int:
    """round(x*100) with HALF-AWAY-FROM-ZERO ties — the rule both Spark's
    ``F.round`` and DuckDB's ``round`` apply; Python's built-in ``round``
    is half-even and would disagree on exact .5 boundaries."""
    import math

    v = x * 100.0
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def make_sessionizer(gap_s: int = 1800):
    """Build the applyInPandasWithState function closed over the gap."""
    gap_us = gap_s * 1_000_000

    def sessionize(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = list(SESSION_SCHEMA.fieldNames())

        if state.hasTimedOut:
            # Watermark passed last_us + gap: flush the open session but
            # KEEP a counter-only state row — removing it would restart
            # session_seq at 1 when the user returns, duplicating already-
            # emitted (user_id, session_seq) keys. The kept row is a few
            # longs per ever-seen user (no timeout re-armed: nothing left
            # to flush), the same footprint as any per-user counter.
            start_us, last_us, n_events, sum_cents, n_closed = state.get
            out = []
            if start_us is not None:
                n_closed += 1
                out.append(
                    (user_id, n_closed, start_us, last_us, n_events, sum_cents / 100.0)
                )
            state.update((None, None, 0, 0, n_closed))
            yield pd.DataFrame(out, columns=cols)
            return

        if state.exists:
            start_us, last_us, n_events, sum_cents, n_closed = state.get
        else:
            start_us = last_us = None
            n_events = sum_cents = n_closed = 0

        rows = []
        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values(["us", "event_id"])
        for ev in events.itertuples(index=False):
            us = int(ev.us)
            cents = _half_up_cents(float(ev.value))
            if start_us is None:
                start_us, last_us, n_events, sum_cents = us, us, 1, cents
            elif us - last_us > gap_us:
                n_closed += 1
                rows.append(
                    (user_id, n_closed, start_us, last_us, n_events, sum_cents / 100.0)
                )
                start_us, last_us, n_events, sum_cents = us, us, 1, cents
            else:
                last_us, n_events, sum_cents = us, n_events + 1, sum_cents + cents

        state.update((start_us, last_us, n_events, sum_cents, n_closed))
        # close the open session when the event-time watermark passes
        # last_us + gap (ms granularity)
        state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        yield pd.DataFrame(rows, columns=cols)

    return sessionize


def session_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events(user_id, event_id, us, value) stream (watermarked upstream on
    its event-time column) → closed-session stream."""
    return events.groupBy(col("user_id")).applyInPandasWithState(
        make_sessionizer(gap_s),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
