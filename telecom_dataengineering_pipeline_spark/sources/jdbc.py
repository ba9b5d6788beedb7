"""JDBC source/sink (SURVEY.md §2.1 S13).

The reference federates a PostgreSQL catalog through Trino
(``infrastructure/docker/trino/etc/catalog/postgresql.properties:1-4``).
Spark's native JDBC relation covers the same surface: partitioned parallel
reads (``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
— each partition becomes one executor task with a range predicate appended
to its query), predicate pushdown into the remote WHERE clause, and column
pruning into the remote SELECT list.

No network database exists in this environment, so the live test target is
**embedded Apache Derby** — a real JDBC engine that ships on Spark's own
classpath (it backs the Hive metastore). The same ``read_jdbc`` call with a
``jdbc:postgresql://`` URL and driver jar is the production path; nothing
here is Derby-specific except the tiny dialect notes below.

Scale notes (the parts that matter at a 1000-executor fan-in):

- Always pass a ``partition_column`` for big tables — otherwise the whole
  table arrives through ONE connection on one task.
- Partition bounds don't filter; rows outside them all land in the first /
  last partition. Derive bounds from the remote min/max, not guesses.
- ``fetchsize`` matters more than parallelism past ~16 connections; the
  remote database's connection limit is the real ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def derby_url(db_path: str) -> str:
    """Embedded-Derby JDBC URL (creates the database on first connect)."""
    return f"jdbc:derby:{db_path};create=true"


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC read with pushdown left to Spark's JDBC relation.

    Filters applied to the returned DataFrame are pushed into the remote
    WHERE clause and selected columns into the remote SELECT list
    (visible as ``PushedFilters`` / the scan's column list in the plan).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column requires lower/upper bounds and num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    column_types: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """JDBC sink. ``column_types`` overrides the dialect's DDL mapping
    (e.g. ``"name VARCHAR(64)"`` — Derby's default StringType mapping is
    CLOB, which can't be compared/pushed down; Postgres is fine with the
    default TEXT)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).option(
        "batchsize", str(batchsize)
    ).mode(mode)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.save()
