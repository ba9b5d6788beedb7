"""Mergeable histogram quantile sketch (A11 at scale).

Exact percentiles need a global sort or a full value multiset per group —
neither survives 100 TB. The standard production answer is a one-pass
mergeable sketch; this is the equi-width-histogram member of that family
(the deterministic cousin of t-digest/KLL): bucket counts over a fixed
[lo, hi) domain, quantiles recovered by cumulative interpolation.

Why this shape scales:

- **build** is a single map-side-combined hash aggregate — one pass, no
  sort, partials collapse before the (tiny) shuffle;
- **merge** across shards/days/partitions is union + re-aggregate
  (counters are additive), so per-partition sketches roll up to any grain
  — the same property the CMS and HLL tiers rely on;
- **estimate** reads only the ``groups × buckets`` cell table.

Error is bounded by bucket width ((hi−lo)/n_buckets per estimate);
unlike sampled approaches the answer is deterministic, and every
arithmetic step is plain IEEE double — DuckDB reproduces the estimates
bit-exactly, which makes the sketch oracle-checkable end-to-end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group bucket counts: ``(*group_cols, bucket, n)``. Out-of-range
    values clamp into the edge buckets (they count, with edge-bucket
    accuracy); NULLs are excluded."""
    width = (hi - lo) / n_buckets
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        )
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_histogram_sketches(
    sketches: Sequence[DataFrame], group_cols: Sequence[str] = ()
) -> DataFrame:
    """Union + re-aggregate: the shard-merge that makes the sketch
    distributable (counters are additive)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bucket").agg(
        F.sum("n").cast("long").alias("n")
    )


def quantile_estimates(
    sketch: DataFrame,
    probs: Sequence[float],
    lo: float,
    hi: float,
    n_buckets: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates from a sketch: for each probability p, locate the
    bucket where the cumulative count crosses ``p × total`` and linearly
    interpolate inside it. Output: ``(*group_cols, prob, quantile_est)``.

    The sparse cell table never densifies: ``cum − n`` is the cumulative
    count BEFORE a bucket regardless of gaps, so empty buckets cost
    nothing. All arithmetic is double with a final round(6) — identical
    expression shape in the DuckDB oracle."""
    spark = sketch.sparkSession
    width = (hi - lo) / n_buckets
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("bucket")
    wt = Window.partitionBy(*[F.col(c) for c in group_cols])
    c = sketch.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    p_df = spark.createDataFrame([(float(p),) for p in probs], "prob DOUBLE")
    j = c.crossJoin(F.broadcast(p_df))
    target = F.col("prob") * F.col("total")
    prev = F.col("cum") - F.col("n")
    est = F.lit(float(lo)) + F.lit(width) * (
        F.col("bucket") + (target - prev) / F.col("n")
    )
    return (
        j.filter((prev < target) & (target <= F.col("cum")))
        .select(*group_cols, "prob", F.round(est, 6).alias("quantile_est"))
    )
