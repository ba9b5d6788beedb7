"""Trend baselines over ordered series: weighted moving average + banded
anomaly flags.

The reference's volume anomaly test compares today against a flat 7-day
mean (``assert_row_count_anomaly.sql:4-33``, A6) and its observability
monitor against a z-score (A8). The natural next baseline for drifting
series is a RECENCY-WEIGHTED average — but a true EWMA is an infinite
recurrence whose float accumulation is neither order-independent nor
engine-reproducible. The production-honest compromise: a finite weighted
window (Σ wₖ·lag(x,k)), which is an EWMA truncated at k lags, expressed as
pure window expressions.

Determinism discipline (registry conventions): weights are DECIMAL
literals and the series values DECIMAL, so the weighted sum is exact
arithmetic — no float accumulation anywhere; the anomaly bands multiply
decimals and compare exactly. One window pass, no self-join; at scale this
rides whatever partitioning the series already has (partitionBy key, or a
single ordered partition for a global daily series whose cardinality is
days, not events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weighted_moving_avg(
    df: DataFrame,
    order_col: str,
    value_col: str,
    weights: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Adds ``wma`` = Σ weights[k] · lag(value, k+1): a baseline built from
    the k rows BEFORE each row (never including the row itself, so the
    comparison is out-of-sample). ``weights`` are decimal strings (e.g.
    ``("0.4", "0.3", "0.2", "0.1")``) — exact arithmetic by construction.
    Rows with insufficient history get NULL (no partial-window guesses)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    terms: list[Column] = []
    for k, wt in enumerate(weights, start=1):
        terms.append(
            F.lit(wt).cast("decimal(4,3)") * F.lag(F.col(value_col), k).over(w)
        )
    wma = terms[0]
    for t in terms[1:]:
        wma = wma + t
    return df.withColumn("wma", wma)


def band_anomaly_flags(
    df: DataFrame,
    value_col: str,
    baseline_col: str = "wma",
    low: str = "0.5",
    high: str = "2.0",
) -> DataFrame:
    """Adds ``is_drop`` / ``is_spike``: value outside [low·baseline,
    high·baseline]. Decimal multiplication keeps the band edges exact;
    NULL baseline (warm-up rows) flags nothing."""
    lo = F.lit(low).cast("decimal(4,2)") * F.col(baseline_col)
    hi = F.lit(high).cast("decimal(4,2)") * F.col(baseline_col)
    return df.withColumn(
        "is_drop", F.when(F.col(baseline_col).isNotNull(), F.col(value_col) < lo)
    ).withColumn(
        "is_spike", F.when(F.col(baseline_col).isNotNull(), F.col(value_col) > hi)
    )
