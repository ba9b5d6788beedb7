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


def quantile_bucket_scores(
    df,
    metric_cols,
    k: int = 4,
    accuracy: int = 10000,
    suffix: str = "_bucket",
):
    """Quantile bucket (quartile/decile) scores WITHOUT a global window —
    the 100 TB replacement for ``ntile(k) OVER (ORDER BY metric)``, which
    funnels every row through one partition. One scalar aggregate
    computes k−1 approx-percentile cutoffs per metric, broadcasts the
    single cutoff row, and assigns buckets by comparison: zero global
    sorts, zero single-partition exchanges, cost = one extra map stage.

    The trade (stated, not hidden): boundaries come from a sketch
    (``accuracy`` trades memory for error), so bucket POPULATIONS are
    approximately equal instead of exactly equal, and ties land in one
    bucket together instead of splitting. Ascending convention: bucket 1
    holds the smallest values; NULL metrics get NULL buckets."""
    from pyspark.sql import functions as F

    probs = [i / k for i in range(1, k)]
    cuts = df.agg(
        *[
            F.percentile_approx(
                F.col(c), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"__cuts_{c}")
            for c in metric_cols
        ]
    )
    out = df.crossJoin(F.broadcast(cuts))
    for c in metric_cols:
        b = F.lit(1)
        for i in range(1, k):
            b = b + (F.col(c) > F.element_at(F.col(f"__cuts_{c}"), i)).cast("int")
        out = out.withColumn(
            f"{c}{suffix}", F.when(F.col(c).isNotNull(), b).cast("int")
        )
    return out.drop(*[f"__cuts_{c}" for c in metric_cols])
