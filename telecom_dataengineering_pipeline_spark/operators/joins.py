"""Join operators.

J1 — fact→dim star join with broadcast hints and 'UNKNOWN' sentinels
(reference ``fact_calls.sql:92-95`` + ``:58-60``). Dimensions are broadcast
explicitly: at 100 TB the fact side must never shuffle for a kilobyte-scale
dim, and an explicit ``F.broadcast`` documents intent even when AQE would pick
it anyway.

J3 — left-join-then-NOT-NULL-filter (net inner; preserved quirk from
``agg_customer_monthly_summary.sql:99-101``).

J6 — referential-integrity anti-join (dbt ``relationships`` test).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Sequence[str] | Column, str]],
) -> DataFrame:
    """LEFT-join each ``(dim, on, how)`` onto the fact, broadcasting the dim."""
    out = fact
    for dim, on, how in dims:
        out = out.join(F.broadcast(dim), on=on, how=how)
    return out


def collapse_dim_snowflake(
    base: DataFrame,
    chain: Sequence[tuple[DataFrame, Sequence[str] | Column, str]],
    keep: Sequence[str],
) -> DataFrame:
    """Pre-join a dim CHAIN (customer→nation→region) into one flat dim.

    A snowflake joined dim-by-dim makes every FACT row probe one hash table
    per level; collapsing first runs the chain at DIM cardinality (thousands
    of rows) and the fact then probes a single broadcast — at 100 TB that is
    N-1 fewer probe passes over the fact and one broadcast instead of N.
    Semantics are unchanged when each level's join key is unique on its
    right side (true for normalized dim chains): left-join composition is
    then associative and row counts never fan out."""
    out = base
    for dim, on, how in chain:
        out = out.join(F.broadcast(dim), on=on, how=how)
    return out.select(*keep)


def coalesce_unknown(col: Column, sentinel: str = "UNKNOWN") -> Column:
    return F.coalesce(col, F.lit(sentinel))


def left_join_nonnull_filter(
    left: DataFrame, right: DataFrame, on: Sequence[str], nonnull_col: str
) -> DataFrame:
    """LEFT JOIN then WHERE right.col IS NOT NULL — semantically INNER; kept
    as written in the reference."""
    return left.join(right, on=list(on), how="left").filter(
        F.col(nonnull_col).isNotNull()
    )


def anti_join_violations(
    child: DataFrame, parent: DataFrame, fk: Mapping[str, str]
) -> DataFrame:
    """Rows in ``child`` whose FK has no match in ``parent`` (must be empty
    for the relationships test to pass). fk maps child column -> parent column."""
    cond = None
    for c, p in fk.items():
        e = child[c] == parent[p]
        cond = e if cond is None else (cond & e)
    return child.join(parent, on=cond, how="left_anti")
