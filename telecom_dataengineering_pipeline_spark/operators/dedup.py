"""Deduplication operators.

W1 — keep-latest via row_number (the reference's canonical at-least-once dedup,
``silver_calls.sql:40-55``): one shuffle on the key, then a per-partition sort;
at 100 TB this is a single hash-partitioned exchange — no driver involvement,
and AQE handles key skew.

W2 — unordered key dedup (``bronze_compaction.py:105-107``): Spark's
``dropDuplicates`` keeps an arbitrary row; use only where any row is correct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    rn_col: str = "_rn",
) -> DataFrame:
    """Keep the first row per key under ``order_by`` (pass ``.desc()`` columns
    for keep-latest). Callers must make the ordering total (include a unique
    tie-break column) when the primary order key can tie.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col)
    )


def drop_duplicates_on_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    return df.dropDuplicates(list(keys))
