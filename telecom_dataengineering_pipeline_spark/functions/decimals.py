"""Exact-arithmetic aggregation helpers.

Floating-point SUM/AVG is order-dependent, and Spark's task/partition ordering
is not DuckDB's. Every money/KPI aggregate in this engine therefore:

1. casts the input to DECIMAL (exact, associative, order-independent — and
   what the reference itself does for money, e.g. ``silver_calls.sql:101``
   DECIMAL(12,4)),
2. aggregates in decimal,
3. casts the *final* value to DOUBLE so the output schema is
   engine-neutral (Spark and DuckDB widen decimal sums to different
   precisions, which would otherwise fail schema comparison).

Derived ratios divide those exact values with a fixed expression shape so
both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """SUM over decimal-cast input, emitted as DOUBLE."""
    return F.sum(dec(col, 18, scale)).cast("double")


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """AVG = exact decimal sum cast double, divided by count — both engines
    evaluate double(sum)/bigint(count) identically."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, 18, scale)).cast("double") / F.count(c)


def safe_ratio(num: Column, den: Column) -> Column:
    """NULL-safe num/den (NULL when den = 0) in double space."""
    return F.when(den != 0, num.cast("double") / den).otherwise(F.lit(None).cast("double"))


def pct_of(num: Column, den: Column, digits: int = 4) -> Column:
    """Percentage with the reference's null-safe shape
    (``agg_tower_hourly_utilization.sql:123-127``)."""
    return F.round(F.when(den > 0, num.cast("double") * 100 / den), digits)
