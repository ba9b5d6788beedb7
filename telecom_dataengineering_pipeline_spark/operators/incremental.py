"""Incremental / watermark-driven batch ingestion (SURVEY.md §2.1 S12,
§2.2 P4, §2.9 T5).

The reference's CRM ingestor persists a last-run watermark, pulls only
``updated_at > watermark`` records, and advances the watermark after a
successful write (``crm_batch_ingestor.py:52-62,139-167``); dbt models add a
3-day lookback for late data (``dbt_project.yml:53``). Both are pipeline
patterns, not Spark features, so they live here as small composable pieces:

- ``WatermarkStore``: durable high-water mark (a one-line JSON file; swap
  for a table/metastore in production).
- ``incremental_slice``: watermark + lookback filter — a plain predicate,
  so it pushes down to the parquet/JDBC scan.
- ``run_incremental``: slice → transform → MERGE into the target →
  advance watermark only on success (the reference's commit-after-write
  ordering, kafka_to_bronze.py:149).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class WatermarkStore:
    def __init__(self, path: str):
        self.path = path

    def read(self) -> str | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f).get("watermark")

    def write(self, value: str) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"watermark": value}, f)


def incremental_slice(
    df: DataFrame, ts_col: str, watermark: str | None, lookback: Column | None = None
) -> DataFrame:
    """Rows newer than the watermark (minus an optional late-data lookback
    interval, e.g. ``F.expr("INTERVAL 3 DAYS")``)."""
    if watermark is None:
        return df
    bound = F.lit(watermark).cast("timestamp")
    if lookback is not None:
        bound = bound - lookback
    return df.filter(F.col(ts_col) > bound)


def run_incremental(
    source: DataFrame,
    ts_col: str,
    store: WatermarkStore,
    apply_batch: Callable[[DataFrame], None],
    lookback: Column | None = None,
) -> str | None:
    """One incremental run: slice, hand the batch to ``apply_batch`` (which
    merges/writes), then advance the watermark to the batch max — only after
    the write succeeded."""
    batch = incremental_slice(source, ts_col, store.read(), lookback)
    mx = batch.agg(F.max(ts_col).cast("string")).collect()[0][0]
    if mx is None:
        return store.read()  # nothing new; watermark unchanged
    apply_batch(batch)
    store.write(mx)
    return mx
