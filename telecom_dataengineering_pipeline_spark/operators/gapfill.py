"""Time-series gap filling + forward fill (hypertable-rollup adjacent).

The reference's KPI rollups (`agg_tower_hourly_utilization.sql:32-81`)
aggregate to an hourly grain but leave silent hours ABSENT — a dashboard
or SLO evaluator then needs a dense series with carried-forward values
(TimescaleDB's ``time_bucket_gapfill`` + ``locf``). This module produces
that dense series engine-side:

1. Per key, the observed [min, max] time bounds collapse to ONE row via a
   grouped aggregate (map-side combinable).
2. ``F.sequence(min, max, interval)`` + ``explode`` generates the dense
   per-key spine — rows are generated AFTER the aggregate, so the spine
   costs |keys| × span, never touches the raw events again, and inherits
   the aggregate's partitioning (no extra shuffle for the join key).
3. A left join pins observed grain-values onto the spine.
4. Forward fill = ``last(value, ignorenulls=True)`` over
   ``partitionBy(key).orderBy(grain).rowsBetween(unboundedPreceding,
   currentRow)`` — one window, no self-join, no correlated subquery
   (the naive as-of formulation is quadratic per key).

At 100 TB the spine size is bounded by |keys| × buckets-per-span, which is
orders of magnitude below the event count; every step is a standard
shuffle-on-key operation with no driver participation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_spine(
    df: DataFrame,
    key: str,
    bucket: Column,
    step: str = "interval 1 day",
) -> DataFrame:
    """(key, bucket) rows for EVERY step between each key's first and last
    observed bucket. ``bucket`` must already be truncated to the grain
    (e.g. ``F.date_trunc('day', 'ts')``)."""
    bounds = df.select(F.col(key), bucket.alias("_b")).groupBy(key).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    return bounds.select(
        key,
        F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias("bucket"),
    )


def gap_fill_ffill(
    df: DataFrame,
    key: str,
    bucket: Column,
    values: Sequence[tuple[str, Column]],
    step: str = "interval 1 day",
) -> DataFrame:
    """Dense per-key series with forward-filled aggregates.

    ``values``: (output_name, aggregate_expression) pairs evaluated per
    (key, bucket) group on the observed data; absent buckets carry the
    most recent observed value forward (locf), NULL before the first
    observation. Adds ``is_gap`` marking synthesized rows.
    """
    observed = (
        df.withColumn("bucket", bucket)
        .groupBy(key, "bucket")
        .agg(*[expr.alias(name) for name, expr in values])
    )
    spine = dense_spine(df, key, bucket, step)
    joined = spine.join(observed, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        "is_gap", F.col(values[0][0]).isNull()
    )
    for name, _ in values:
        out = out.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return out
