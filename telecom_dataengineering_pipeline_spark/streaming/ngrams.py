"""Stateful streaming n-gram (trigram) mining — the streaming twin of
``operators/windows.py::sequence_ngrams``, extending the
batch≡stream≡oracle pattern to the sequential-pattern family
(funnel/sessions/attribution/growth/dwell already follow it).

The batch operator leads twice over each user's (µs, tie-break)-ordered
event stream: every run of three consecutive events is one pattern
occurrence. The stream holds exactly that lead window as keyed state —
the TWO most recent events per user: when an event arrives, the pair of
held events plus the arrival complete a trigram (emitted), and the held
pair slides forward. A user's final two events never complete — the same
censoring as the batch filter on the second lead being non-null.

State is two event labels (plus ordering keys) per user — O(users),
never O(events). Each micro-batch sorts its rows by the batch operator's
exact ordering key (µs, tie-break); cross-batch order is the source's
time order (day-split staging), as in the other sequence streams.
Emission is append-mode, 0..n trigram rows per (batch, user) — the
alert-emission contract (SURVEY §2 T4). The corpus-wide support/rank
rollup over the emitted rows is the batch query's own aggregate, so the
batch oracle gates the stream row-for-row.

Reference parity: the per-caller ordered sequences of
``/root/reference/dbt_project/models/gold/facts/fact_calls.sql``; the
streaming shape mirrors the Flink keyed-state jobs under
``/root/reference/processing/streaming/``.
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

# state: the two most recent events (oldest first) — label + ordering key
NGRAM_STATE_SCHEMA = StructType(
    [
        StructField("us1", LongType()),
        StructField("tb1", StringType()),
        StructField("ev1", StringType()),
        StructField("us2", LongType()),
        StructField("tb2", StringType()),
        StructField("ev2", StringType()),
    ]
)

# one row per completed trigram occurrence
NGRAM_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("e1", StringType()),
        StructField("e2", StringType()),
        StructField("e3", StringType()),
    ]
)


def make_trigram_tracker():
    """applyInPandasWithState fn: each arrival completes a trigram with
    the two held events (if both exist) and slides the held pair."""

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            us1, tb1, ev1, us2, tb2, ev2 = state.get
        else:
            us1 = tb1 = ev1 = us2 = tb2 = ev2 = None
        events = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch operator's window: (µs, tb)
        events = events.sort_values(["us", "tb"])
        out: list[tuple] = []
        for e in events.itertuples(index=False):
            if ev1 is not None and ev2 is not None:
                out.append((user_id, ev1, ev2, e.ev))
            us1, tb1, ev1 = us2, tb2, ev2
            us2, tb2, ev2 = int(e.us), e.tb, e.ev
        state.update((us1, tb1, ev1, us2, tb2, ev2))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in NGRAM_OUT_SCHEMA.fields])

    return track


def trigram_stream(events: DataFrame) -> DataFrame:
    """events(user_id, us, tb, ev) stream → appended trigram rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_trigram_tracker(),
        NGRAM_OUT_SCHEMA,
        NGRAM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
