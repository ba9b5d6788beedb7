"""Stateful streaming last-touch attribution — the streaming twin of
``operators/windows.py::last_touch_attribution`` (VERDICT r7 item 9),
following the batch≡stream discipline of the funnel/sessions/EWMA/JSD
streams: the same strictly-preceding-touch semantics, held as per-user
keyed state in ``applyInPandasWithState`` so conversions credit their
touch the moment they arrive instead of re-scanning history.

State per user is two scalars (last touch event name, its µs) — O(users),
never O(events). Each micro-batch sorts its own rows by the batch
operator's exact ordering key (µs, tie-break), so a touch and a
conversion landing in the same batch resolve identically to the batch
window's ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`` frame;
cross-batch order is the file/Kafka source's time order, exactly like the
sessionization stream. The ``within_seconds`` cut is applied at emission
(the batch operator's CASE shape): a too-old touch nulls the credit, it
is never replaced retroactively.

Emission is append-mode, 0..n conversion rows per (batch, user) — the
alert-emission contract (SURVEY §2 T4).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator, Sequence
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

# state: (last touch event name, its event-time µs)
ATTR_STATE_SCHEMA = StructType(
    [StructField("touch_event", StringType()), StructField("touch_us", LongType())]
)

ATTR_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("conversion_us", LongType()),
        StructField("tb", StringType()),
        StructField("touch_event", StringType()),
        StructField("touch_us", LongType()),
    ]
)


def make_attribution_tracker(
    conversion: str, touch_events: Sequence[str], within_seconds: int | None
):
    """Build the applyInPandasWithState function closed over the
    attribution definition. Emits one row per conversion event as it
    arrives, credited to the most recent strictly-preceding touch."""
    touches = set(touch_events)
    if conversion in touches:
        raise ValueError("the conversion event cannot also be a touch event")
    limit_us = None if within_seconds is None else within_seconds * 1_000_000

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t_ev, t_us = state.get if state.exists else (None, None)
        events = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch operator's window: (µs, tb)
        events = events.sort_values(["us", "tb"])
        out: list[tuple] = []
        for ev in events.itertuples(index=False):
            if ev.ev == conversion:
                fits = t_us is not None and (
                    limit_us is None or int(ev.us) - t_us <= limit_us
                )
                out.append(
                    (
                        user_id,
                        int(ev.us),
                        ev.tb,
                        t_ev if fits else None,
                        t_us if fits else None,
                    )
                )
            elif ev.ev in touches:
                t_ev, t_us = ev.ev, int(ev.us)
        state.update((t_ev, t_us))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in ATTR_OUT_SCHEMA.fields])

    return track


def attribution_stream(
    events: DataFrame,
    conversion: str,
    touch_events: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """events(user_id, us, tb, ev) stream → appended conversion rows.

    Callers pre-filter to the conversion + touch names (a huge reduction
    — only attribution events shuffle to the state store) and project
    the ordering key: ``us`` = event-time µs, ``tb`` = the deterministic
    tie-break string (event id)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_attribution_tracker(conversion, touch_events, within_seconds),
        ATTR_OUT_SCHEMA,
        ATTR_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
