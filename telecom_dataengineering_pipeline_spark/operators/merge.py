"""Write-side MERGE/upsert semantics (SURVEY.md §2.10).

The reference's dbt ``incremental_strategy: merge`` (dbt_project.yml:29-32)
runs MERGE INTO on Iceberg. On plain Parquet there is no MERGE, so M1 is
expressed exactly the way the reference itself deduplicates at-least-once
data (silver_calls.sql:40-55): union target+source, keep the winning row per
key by a version/recency ordering, overwrite. The API is shaped so a
Delta/Iceberg ``MERGE INTO`` can slot in behind the same signature.

At scale: union is free (no shuffle); the keep-latest window is one hash
exchange on the merge key — the same cost MERGE itself pays for the join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_keep_latest


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT, resolved by keeping the
    first row per key under ``order_by`` (pass source-wins ordering, e.g. a
    version or ingestion timestamp descending)."""
    unioned = target.unionByName(source, allowMissingColumns=False)
    return dedup_keep_latest(unioned, keys=keys, order_by=order_by)


def scd2_close_and_insert(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    hash_col: str,
    start_col: str = "effective_start_date",
    end_col: str = "effective_end_date",
    current_col: str = "is_current",
) -> DataFrame:
    """True SCD2 upgrade of the reference's SCD2-shaped dim
    (dim_customers.sql:84-89 stores the columns but snapshots Type-1):
    close changed rows (end = new start, is_current = false) and insert the
    new versions."""
    # Change detection against the OPEN version only: a key's closed history
    # rows must neither match (their hash may equal an old update's) nor be
    # rewritten.  One row per key so the close join can't fan out.
    open_rows = current.filter(F.col(current_col))
    changed = (
        open_rows.alias("c")
        .join(updates.alias("u"), on=key, how="inner")
        .filter(F.col(f"c.{hash_col}") != F.col(f"u.{hash_col}"))
        .groupBy(key)
        .agg(F.min(F.col(f"u.{start_col}")).alias("_new_start"))
    )
    close_me = F.col("_new_start").isNotNull() & F.col(current_col)
    closed = (
        current.join(F.broadcast(changed), on=key, how="left")
        .withColumn(end_col, F.when(close_me, F.col("_new_start")).otherwise(F.col(end_col)))
        .withColumn(current_col, F.col("_new_start").isNull() & F.col(current_col))
        .drop("_new_start")
    )
    new_rows = updates.join(
        open_rows.select(key, F.col(hash_col).alias("_cur_hash")), on=key, how="left"
    ).filter(
        F.col("_cur_hash").isNull() | (F.col("_cur_hash") != F.col(hash_col))
    ).drop("_cur_hash")
    return closed.unionByName(new_rows)
