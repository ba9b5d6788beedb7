"""Streaming observability: per-batch progress capture.

The reference watches its Flink jobs through external dashboards; Spark
exposes the same signals in-process as ``StreamingQueryProgress``. This
module harvests ``query.recentProgress`` into a queryable DataFrame of
per-batch metrics (rows in, processed rate, batch duration, state rows) —
the feed for throughput SLOs, backpressure alerts, and the freshness tier,
with no external system.

Harvest, not listener: the asynchronous ``StreamingQueryListener`` bridge
does not deliver events to Python callbacks in this runtime, while
``recentProgress`` is synchronous, complete for finished ``availableNow``
runs, and bounded (``spark.sql.streaming.numRecentProgressUpdates``,
default 100 — raise it for long-running queries, or harvest periodically
and append to a txnlog table for unbounded retention).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = (
    "query_id STRING, run_id STRING, batch_id LONG, timestamp STRING, "
    "num_input_rows LONG, processed_rows_per_second DOUBLE, "
    "batch_duration_ms LONG, state_rows LONG"
)


def harvest_progress(query) -> list[tuple]:
    """One record per retained micro-batch of a (running or finished)
    StreamingQuery, parsed from the progress JSON (stable across PySpark
    progress-object API changes)."""
    records = []
    for p in query.recentProgress:
        j = json.loads(p.json) if hasattr(p, "json") else dict(p)
        state_rows = sum(
            int(s.get("numRowsTotal") or 0) for s in j.get("stateOperators", [])
        )
        records.append(
            (
                str(j.get("id")),
                str(j.get("runId")),
                int(j.get("batchId", -1)),
                str(j.get("timestamp")),
                int(j.get("numInputRows", 0)),
                float(j.get("processedRowsPerSecond") or 0.0),
                int((j.get("durationMs") or {}).get("triggerExecution", 0)),
                state_rows,
            )
        )
    return records


def progress_df(spark: SparkSession, records: list[tuple]) -> DataFrame:
    return spark.createDataFrame(records or [], _SCHEMA)


def throughput_summary(metrics: DataFrame) -> DataFrame:
    """Per query-run: batches, total rows, mean rate, max batch duration —
    the row a streaming SLO dashboard plots."""
    return metrics.groupBy("query_id", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("num_input_rows").cast("long").alias("total_rows"),
        F.round(F.avg("processed_rows_per_second"), 2).alias("mean_rows_per_s"),
        F.max("batch_duration_ms").cast("long").alias("max_batch_ms"),
    )
