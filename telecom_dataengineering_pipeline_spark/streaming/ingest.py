"""Streaming ingest: the Kafka→Bronze path as Structured Streaming.

The reference's consumer (``processing/bronze/kafka_to_bronze.py``) polls
Kafka, stamps provenance columns, buffers 10 k records / 300 s per topic,
writes snappy parquet in a ``year=/month=/day=`` layout, and commits offsets
only after a successful flush (at-least-once → effectively-once).

Structured Streaming gives every one of those semantics natively:

- micro-batch trigger ≈ the buffer flush cadence
  (``trigger(processingTime="5 minutes")`` in production; ``availableNow``
  in tests),
- checkpointing ≈ the manual offset commit — a batch is only marked done
  after its sink write commits (T6),
- ``partitionBy`` on the sink ≈ the hive layout (S5),
- provenance ≈ metadata columns (for Kafka: topic/partition/offset come
  free; for the file source: ``_metadata.file_path`` + batch id).

A real Kafka source is config-swap away (``format("kafka")`` + the same
downstream graph); tests drive the identical graph from a file source, which
is also the replay path in production incident recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def events_file_stream(
    spark: SparkSession, source_dir: str, schema: StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream (the test/replay stand-in for the Kafka source)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def with_provenance(df: DataFrame, topic: str) -> DataFrame:
    """Provenance columns the reference stamps per record
    (kafka_to_bronze.py:125-129)."""
    return (
        df.withColumn("_kafka_topic", F.lit(topic))
        .withColumn("_source_file", F.col("_metadata.file_path"))
        .withColumn("_bronze_ingested_at", F.current_timestamp())
    )


def bronze_ingest_stream(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    topic: str,
    ts_col: str,
    available_now: bool = True,
    processing_time: str = "300 seconds",
) -> StreamingQuery:
    """Land the stream as hive-partitioned snappy parquet with exactly-once
    sink semantics via checkpointing."""
    enriched = (
        with_provenance(stream, topic)
        .withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )
    writer = (
        enriched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .option("compression", "snappy")
        .partitionBy("year", "month", "day")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming exact-dedup: drop repeat deliveries of the same logical
    record (at-least-once upstream → exactly-once downstream rows).

    ``dropDuplicatesWithinWatermark`` keys the dedup state on ``keys`` and
    evicts each key once the event-time watermark passes it — state is
    bounded by (arrival rate × watermark), never by corpus size, which is
    what makes this viable on an unbounded 100 TB/day firehose where plain
    ``dropDuplicates`` would accrete state forever. On a batch DataFrame the
    same callable degrades to ``dropDuplicates(keys)`` so stream-vs-batch
    parity is testable with one code path.
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
