"""Stateful streaming growth accounting — the streaming twin of
``operators/windows.py::growth_accounting`` for the stream-computable
states: a user's activity at step t classifies as NEW (never seen),
RETAINED (seen at t−1) or RESURRECTED (seen before, but not t−1) the
moment it arrives, off one scalar of keyed state (the user's last active
step). CHURN is deliberately NOT emitted: "active at t−1 and absent at
t" needs future knowledge of absence, which an event-driven operator
cannot observe per key — the batch operator owns that column (the same
division of labor as sessionization's is_open).

State per user: one LONG. Each micro-batch processes its rows in step
order; duplicate (user, step) activity across or within batches is
ignored (t <= last-seen), so replays are idempotent at the step grain.
Emission is append-mode, one row per (user, first-activity-at-step).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

try:  # workers must rebuild these closures without /root/repo on sys.path
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

GROWTH_STATE_SCHEMA = StructType([StructField("last_t", LongType())])

GROWTH_OUT_SCHEMA = StructType(
    [
        StructField("u", LongType()),
        StructField("t", LongType()),
        StructField("cls", StringType()),
    ]
)


def growth_tracker(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (u,) = key
    last = state.get[0] if state.exists else None
    rows = pd.concat(list(pdf_iter), ignore_index=True)
    out: list[tuple] = []
    for t in sorted(set(int(x) for x in rows["t"])):
        if last is not None and t <= last:
            continue  # replayed/duplicate step: idempotent skip
        if last is None:
            cls = "new"
        elif t == last + 1:
            cls = "retained"
        else:
            cls = "resurrected"
        out.append((u, t, cls))
        last = t
    state.update((last,))
    if out:
        yield pd.DataFrame(out, columns=["u", "t", "cls"])


def growth_stream(activity: DataFrame) -> DataFrame:
    """activity(u, t) stream → appended (u, t, cls) classification rows.
    Callers project the distinct-enough activity grain (exact dedup is
    handled in-state) and keep cross-batch step order (file-source time
    order, the sessionization contract)."""
    return activity.groupBy("u").applyInPandasWithState(
        growth_tracker,
        GROWTH_OUT_SCHEMA,
        GROWTH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
