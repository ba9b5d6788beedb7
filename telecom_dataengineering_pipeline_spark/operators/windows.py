"""Window operators — batch analogs of the reference's Flink keyed state.

W3 — previous-event lookup per key (Flink ValueState,
``fraud_detection.py:85-93``) → ``F.lag`` over an event-time window.

W4 — trailing time-window count per key (Flink ListState pruned to 30 min,
``fraud_detection.py:95-100``) → ``rangeBetween`` over epoch-microseconds.

Both are one shuffle on the key; Spark sorts within partitions — exactly the
shape a 1000-executor cluster wants (no driver-side state, skew handled by
AQE only for joins, so extremely hot keys would need salting — telecom
customer keys are near-uniform).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_prev_event(
    df: DataFrame,
    key: str,
    ts_col: str,
    cols: Sequence[str],
    tie_break: str,
    prefix: str = "prev_",
) -> DataFrame:
    """Add ``prev_<c>`` for each requested column = value on the key's previous
    event ordered by (ts, tie_break)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tie_break))
    out = df
    for c in cols:
        out = out.withColumn(prefix + c, F.lag(c).over(w))
    return out


def sliding_count_by_time(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_seconds: int,
    count_col: str = "events_in_window",
) -> DataFrame:
    """Trailing-window event count per key: count of the key's events with
    ts in (current - window, current]. Uses microsecond epochs so Spark and
    any nanosecond-precision oracle agree after truncation."""
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key)
        .orderBy(us)
        .rangeBetween(-(window_seconds * 1_000_000 - 1), 0)
    )
    return df.withColumn(count_col, F.count(F.lit(1)).over(w))
