"""Query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI/DuckDB oracle SQL run by the driver's correctness harness.

Cross-engine determinism conventions (every query follows these so the
order-insensitive value-hash comparison is exact, not approximate):

- **No raw doubles out of aggregations.** Sums aggregate over
  ``DECIMAL``-cast inputs (exact, order-independent) and are cast to DOUBLE at
  the end in *both* engines; averages/ratios are derived from those exact sums
  with the *same* double expression shape on both sides.
- **No raw timestamps in output.** The driver's ``events.ts`` is
  nanosecond-precision parquet which Spark truncates to microseconds; output
  time keys are strings (``date_format`` / ``strftime``) or DATEs, and any
  oracle arithmetic on ``ts`` goes through microsecond epochs
  (``epoch_us(ts)`` in DuckDB == ``unix_micros(ts)`` in Spark — both floor).
- **Deterministic order within window ties** — every ``ORDER BY`` inside a
  window includes a unique tie-break key.
- **Column names match** between Spark output and oracle SQL (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items() if s.bench}
