"""Catalog over the driver's deterministic parquet tables.

Mirrors the reference's "Bronze view" idea (pass-through projections over
immutable landed data — dbt bronze models, reference
``dbt_project/models/bronze/bronze_call_events.sql:1-37``): every query in the
engine starts from these loaders, and ``register_views`` exposes them under
their table names for ``spark.sql`` entry points.

Scale note: these are plain parquet scans — Catalyst gets predicate pushdown,
column pruning and (for partitioned layouts written by our writers) partition
pruning for free. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; normalizes the ``events.ts`` nanosecond column.

    ``events.parquet`` stores INT64 TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` we read raw nanos and convert via
    *integer* division (``div``) — a double division would lose precision on
    1.7e18-scale epochs. The resulting TimestampType is microsecond-truncated;
    the DuckDB oracle truncates to microseconds on its side to match.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Defense in depth for sessions where inferTimestampNTZ is immutable:
    # naive parquet timestamps must surface as TIMESTAMP (session tz is UTC,
    # so the cast is instant-preserving and matches DuckDB's epoch_us).
    ntz_cols = [n for n, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Temp view per table (reference bronze models are exactly such views)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
