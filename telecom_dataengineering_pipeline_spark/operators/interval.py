"""Bucketized interval-overlap join.

``range_join`` (asof.py) handles the keyed point-in-range case — its equi
key carries the hash join and the BETWEEN is a cheap residual. The missing
(and dangerous) case is interval × interval OVERLAP with no selective equi
key: expressed naively (``l.start <= r.end AND r.start <= l.end``) Spark
has no equi condition at all and falls back to a broadcast-nested-loop /
cartesian product — O(|L|·|R|) comparisons, a non-starter at 100 TB.

The classic fix (the same idea behind Databricks' range-join binning and
the interval trees in single-node engines): quantize time into fixed-width
buckets, explode every interval onto the buckets it covers, hash-join on
the bucket (plus any equi key), and keep each matching pair exactly ONCE by
electing a canonical bucket — the bucket containing ``max(l_start,
r_start)``, i.e. the first bucket where the two intervals coexist — instead
of a distinct() over the duplicated pairs. One shuffle, no product, no
dedup exchange.

Reference parity: the reference joins CDR sessions to tariff/maintenance
windows with Trino range predicates (``dbt_project/models/marts``); this is
that operation with an explicit scale-safe physical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _buckets(start: Column, end: Column, width: int) -> Column:
    return F.sequence(
        F.floor(start / F.lit(width)), F.floor(end / F.lit(width))
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket_width: int,
    keys: tuple[str, str] | None = None,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED intervals overlap:
    ``l_start <= r_end AND r_start <= l_end``. Bounds are numeric (µs
    epochs, versions, positions). Column names must be disjoint between
    the two sides except the optional equi ``keys``.

    ``bucket_width`` trades explode fan-out against join selectivity —
    pick it near the TYPICAL interval length so most intervals land in
    1-2 buckets. ``max_buckets_per_interval`` is the skew/abuse guard: an
    interval spanning more than that many buckets (a year-long interval
    under second-wide buckets — or an end < start bug) fails loudly
    instead of exploding a hidden cross product into the shuffle.

    Returns the joined rows (left columns then right columns), one row
    per overlapping pair."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    ls, le = left_range
    rs, re_ = right_range
    shared = set(left.columns) & set(right.columns)
    if shared:
        # enforce what the docstring requires: the overlap/canonical
        # filters resolve columns by NAME on the joined relation, so a
        # shared name would be ambiguous (or silently wrong) — fail here
        raise ValueError(
            f"left/right column names must be disjoint; shared: {sorted(shared)}"
        )
    guard_l = F.floor(F.col(le) / F.lit(bucket_width)) - F.floor(
        F.col(ls) / F.lit(bucket_width)
    )
    guard_r = F.floor(F.col(re_) / F.lit(bucket_width)) - F.floor(
        F.col(rs) / F.lit(bucket_width)
    )
    # assert_true evaluates per row on the executors — no driver collect;
    # it is woven into the exploded bucket column itself (a dropped helper
    # column would be pruned by Catalyst and the guard would never run).
    msg = (
        f"interval spans more than {max_buckets_per_interval} buckets of "
        f"width {bucket_width} (or end < start); raise bucket_width or fix "
        "the interval"
    )

    def _bucketed(df: DataFrame, guard: Column, start: str, end: str) -> DataFrame:
        ok = (F.col(end) >= F.col(start)) & (guard < max_buckets_per_interval)
        b = _buckets(F.col(start), F.col(end), bucket_width)
        return df.withColumn(
            "__bucket",
            F.explode(
                F.when(F.assert_true(ok, msg).isNull(), b)
            ),
        )

    lb = _bucketed(left, guard_l, ls, le)
    rb = _bucketed(right, guard_r, rs, re_)
    cond = lb["__bucket"] == rb["__bucket"]
    if keys is not None:
        cond = cond & (lb[keys[0]] == rb[keys[1]])
    joined = lb.join(rb, cond)
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    # canonical-bucket election: the pair is emitted only from the bucket
    # holding max(l_start, r_start) — every overlapping pair shares that
    # bucket exactly once, so no distinct()/window dedup is needed
    canonical = lb["__bucket"] == F.floor(
        F.greatest(F.col(ls), F.col(rs)) / F.lit(bucket_width)
    )
    return joined.filter(overlap & canonical).drop(lb["__bucket"]).drop(
        rb["__bucket"]
    )
