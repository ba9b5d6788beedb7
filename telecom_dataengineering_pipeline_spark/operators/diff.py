"""Snapshot diff: row-level compare of two keyed table states.

The plain-DataFrame cousin of the txnlog change feed (``table_changes``
derives deltas from commit metadata; this computes them by content when
all you have is two snapshots — yesterday's landing vs today's, a
migration source vs its target, a backfill vs production). One full outer
join on the key, null-safe struct equality for change detection: at
100 TB both sides shuffle once on the key and nothing else moves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``(*keys, change_type)`` with change_type ∈ added | removed |
    changed; unchanged rows are dropped. ``compare_cols`` defaults to all
    non-key columns shared by both sides. Comparison is null-safe (NULL ==
    NULL is "unchanged", NULL vs value is "changed") via struct ``<=>``.

    Assumes one row per key on each side (the usual snapshot contract);
    duplicate keys compare pairwise-ambiguously — dedup upstream.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    # Presence markers BEFORE the join: after a full outer join every column
    # of a missing side is NULL, including keys — a literal tag column is
    # the only reliable existence test (a NULL data key must not read as
    # "row absent").
    # Alias-qualified references: the two snapshots often share lineage
    # (slices of one table), where unqualified Column objects are ambiguous
    # in a self-join.
    o = old.withColumn("_present_o", F.lit(1)).alias("_do")
    n = new.withColumn("_present_n", F.lit(1)).alias("_dn")
    ocol = lambda c: F.col(f"_do.{c}")  # noqa: E731
    ncol = lambda c: F.col(f"_dn.{c}")  # noqa: E731
    cond = None
    for k in keys:
        e = ocol(k) == ncol(k)
        cond = e if cond is None else cond & e
    j = o.join(n, cond, "full")
    o_struct = F.struct(*[ocol(c) for c in compare_cols])
    n_struct = F.struct(*[ncol(c) for c in compare_cols])
    change = (
        F.when(ocol("_present_o").isNull(), F.lit("added"))
        .when(ncol("_present_n").isNull(), F.lit("removed"))
        .when(~o_struct.eqNullSafe(n_struct), F.lit("changed"))
    )
    return j.select(
        *[F.coalesce(ncol(k), ocol(k)).alias(k) for k in keys],
        change.alias("change_type"),
    ).filter(F.col("change_type").isNotNull())
