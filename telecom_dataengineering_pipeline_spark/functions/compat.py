"""Trino-dialect → Spark translation helpers.

The reference's SQL models are Trino dialect; these helpers centralize the
dialect gotchas so their semantics live (and are unit-tested) in one place:

- ``DATE_FORMAT(ts, '%Y%m%d')`` — MySQL-style % patterns
  (reference ``dbt_project/models/gold/dims/dim_date.sql:22-37``)
  → Java SimpleDateFormat patterns.
- 3-arg ``DATE_ADD(unit, n, ts)`` / ``DATE_DIFF(unit, a, b)``
  (reference ``silver_calls.sql:34``, ``silver_customers.sql:61-64``)
  → unit-specific Spark functions.
- ``SPLIT_PART(s, sep, n)`` (reference ``dim_customers.sql:48``).

All return Column expressions built from JVM built-ins — no UDFs, so every
call stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Trino/MySQL % pattern → Java DateTimeFormatter pattern.
_PATTERN_MAP = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%i", "mm"),
    ("%s", "ss"),
    ("%A", "EEEE"),  # full weekday name (Trino %W is weekday too)
    ("%W", "EEEE"),
    ("%a", "EEE"),
    ("%B", "MMMM"),  # full month name
    ("%b", "MMM"),
    ("%j", "DDD"),
]


def translate_format(trino_pattern: str) -> str:
    """'%Y-%m-%d %H:%i' -> 'yyyy-MM-dd HH:mm'. Literal text passes through."""
    out = trino_pattern
    for t, j in _PATTERN_MAP:
        out = out.replace(t, j)
    return out


def date_format_trino(col: Column, trino_pattern: str) -> Column:
    return F.date_format(col, translate_format(trino_pattern))


def date_add_unit(unit: str, n: int, col: Column) -> Column:
    """Trino DATE_ADD(unit, n, x). Negative n subtracts."""
    unit = unit.lower().rstrip("s")
    if unit == "day":
        return F.date_add(col, n)
    if unit == "month":
        return F.add_months(col, n)
    if unit == "year":
        return F.add_months(col, 12 * n)
    if unit == "week":
        return F.date_add(col, 7 * n)
    if unit in ("hour", "minute", "second"):
        return col + F.expr(f"INTERVAL {n} {unit.upper()}")
    raise ValueError(f"unsupported DATE_ADD unit: {unit}")


def date_diff_unit(unit: str, start: Column, end: Column) -> Column:
    """Trino DATE_DIFF(unit, a, b) = b - a in whole units."""
    unit = unit.lower().rstrip("s")
    if unit == "day":
        return F.datediff(end, start)
    if unit == "week":
        return F.floor(F.datediff(end, start) / 7).cast("int")
    if unit == "month":
        return F.floor(F.months_between(end, start)).cast("int")
    if unit == "year":
        return F.floor(F.months_between(end, start) / 12).cast("int")
    if unit in ("hour", "minute", "second"):
        secs = {"hour": 3600, "minute": 60, "second": 1}[unit]
        return ((end.cast("long") - start.cast("long")) / secs).cast("long")
    raise ValueError(f"unsupported DATE_DIFF unit: {unit}")


def split_part(col: Column, sep: str, n: int) -> Column:
    """Trino SPLIT_PART (1-based; empty string when out of range)."""
    return F.coalesce(F.split(col, _regex_escape(sep)).getItem(n - 1), F.lit(""))


def _regex_escape(sep: str) -> str:
    out = []
    for ch in sep:
        out.append("\\" + ch if ch in r"\.[]{}()*+-?^$|" else ch)
    return "".join(out)
