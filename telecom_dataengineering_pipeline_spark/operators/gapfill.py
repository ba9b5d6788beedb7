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
from ..lineage import lineage_cut


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


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Dense per-key series with LINEAR interpolation across gaps — the
    numeric upgrade of :func:`gap_fill_ffill` (locf steps; interpolation
    draws the line): for each missing integer step between two observed
    points, v = v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev).
    Steps before the first / after the last observation stay NULL (no
    extrapolation — that's a forecast, see the trend tier).

    Shape: the integer spine explodes per key from min/max bounds
    (metadata-sized against the fact table), ONE keyed sort window
    carries the four carries (prev/next value and step — two frames of
    the same window spec: one exchange, one sort), and the blend is a
    projection. Exact inputs recommended; the interpolated value is one
    fixed-shape double rounded to 6. Adds ``is_gap``. ``t_col`` must be
    integral. Returns (*key_cols, t, value, is_gap)."""
    kcols = [F.col(c) for c in key_cols]
    # lineage cut: bounds and the spine join both read obs — without it
    # the fact derivation runs once per branch
    obs = df.select(
        *kcols, F.col(t_col).cast("long").alias("t"), F.col(value_col).alias("_v")
    ).transform(lineage_cut)
    bounds = obs.groupBy(*key_cols).agg(
        F.min("t").alias("_lo"), F.max("t").alias("_hi")
    )
    spine = bounds.select(
        *key_cols, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("t")
    )
    joined = spine.join(obs, [*key_cols, "t"], "left")
    wo = Window.partitionBy(*kcols).orderBy(F.col("t").asc())
    wp = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = wo.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    known_t = F.when(F.col("_v").isNotNull(), F.col("t"))
    cur = (
        joined.withColumn("_pv", F.last("_v", ignorenulls=True).over(wp))
        .withColumn("_pt", F.last(known_t, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(wn))
        .withColumn("_nt", F.first(known_t, ignorenulls=True).over(wn))
    )
    frac = (F.col("t") - F.col("_pt")).cast("double") / (
        F.col("_nt") - F.col("_pt")
    ).cast("double")
    interp = F.col("_pv").cast("double") + (
        F.col("_nv").cast("double") - F.col("_pv").cast("double")
    ) * frac
    value = F.when(F.col("_v").isNotNull(), F.round(F.col("_v").cast("double"), 6)).otherwise(
        F.when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(), F.round(interp, 6)
        )
    )
    return cur.select(
        *key_cols,
        "t",
        value.alias("value"),
        F.col("_v").isNull().alias("is_gap"),
    )
