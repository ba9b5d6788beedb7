"""Bucketed tables for shuffle-free co-located joins (SURVEY.md §4 "use
bucketing for co-located joins").

Writing both sides of a high-frequency join bucketed by the join key (same
bucket count) lets Spark execute the join with ZERO exchanges — each task
reads matching buckets from both tables. At 100 TB this converts the
biggest recurring shuffle (fact ⋈ fact, or fact ⋈ big-dim) into a local
merge per bucket; it is the plain-Spark equivalent of the reference's
Iceberg clustering + Trino co-located execution.

Bucketing requires the session catalog (``saveAsTable``); tests point
``spark.sql.warehouse.dir`` at a temp dir.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """``path`` makes it an external table (useful when the session's
    warehouse dir is fixed — it is a static conf)."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def analyze_table(spark: SparkSession, table: str, columns: Sequence[str] | None = None) -> None:
    """A12: ANALYZE ... COMPUTE STATISTICS (the reference's dbt post-hook,
    dbt_project.yml:49) — feeds Catalyst CBO row-count/NDV estimates."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
