"""Kafka source/sink surface for the streaming layer (S1/S2).

The reference consumes CDR topics with a configured consumer
(``processing/bronze/kafka_to_bronze.py:90-131``: bootstrap servers, topic
subscription, offset handling, poll bounds) and produces JSON-serialized
records keyed by msisdn (``streaming/producers/cdr_producer.py:176-220``).
On Spark both directions are the built-in ``kafka`` data source; what the
engine owns is (a) the OPTION SURFACE — exact spelling of the options the
source/sink consume — and (b) the WIRE CODECS — column expressions mapping
the Kafka frame (``key``/``value`` binary, ``topic``, ``partition``,
``offset``, ``timestamp``) to and from typed rows.

No broker exists in this environment, so ``reader()``/``writer()`` are the
one untestable seam (a ``format("kafka")`` + options call); everything else
— option dicts, JSON decode/encode, provenance stamping — is plain column
logic, unit-tested in batch mode on synthetic wire frames. The downstream
graph (``bronze_ingest_stream``, fraud scoring, sessionization) is source-
agnostic and already runs under the file-source stand-in.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Columns every Kafka source row carries (the wire frame Spark exposes).
KAFKA_WIRE_COLUMNS = (
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
)


@dataclass(frozen=True)
class KafkaSourceConfig:
    """Typed builder for the Spark Kafka *source* options.

    Field → option mapping (the exact keys ``format("kafka")`` consumes):
    ``bootstrap_servers`` → ``kafka.bootstrap.servers``; ``subscribe`` →
    ``subscribe`` (comma-separated topics); ``starting_offsets`` →
    ``startingOffsets`` (``earliest``/``latest``/per-partition JSON);
    ``max_offsets_per_trigger`` → ``maxOffsetsPerTrigger`` (the per-batch
    rate bound standing in for the reference's poll/buffer limits);
    ``fail_on_data_loss`` → ``failOnDataLoss`` (False tolerates expired
    offsets after retention, the reference's auto-reset behavior). Keys in
    ``consumer_overrides`` are passed through with the ``kafka.`` prefix
    (e.g. ``group.id``, ``max.poll.records``)."""

    bootstrap_servers: str
    subscribe: str
    starting_offsets: str = "latest"
    max_offsets_per_trigger: int | None = None
    fail_on_data_loss: bool = True
    consumer_overrides: Mapping[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.subscribe,
            "startingOffsets": self.starting_offsets,
            "failOnDataLoss": "true" if self.fail_on_data_loss else "false",
        }
        if self.max_offsets_per_trigger is not None:
            out["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        for k, v in self.consumer_overrides.items():
            out[f"kafka.{k}"] = str(v)
        return out

    def reader(self, spark: SparkSession) -> DataFrame:
        """The production source: one ``format("kafka")`` swap from the
        file-source stand-in; untestable without a broker."""
        return spark.readStream.format("kafka").options(**self.options()).load()


@dataclass(frozen=True)
class KafkaSinkConfig:
    """Typed builder for the Spark Kafka *sink* options: ``topic`` →
    ``topic``, ``bootstrap_servers`` → ``kafka.bootstrap.servers``, plus
    ``kafka.``-prefixed producer passthrough (acks, compression — the
    knobs the reference's producer sets)."""

    bootstrap_servers: str
    topic: str
    producer_overrides: Mapping[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }
        for k, v in self.producer_overrides.items():
            out[f"kafka.{k}"] = str(v)
        return out

    def writer(self, df: DataFrame, checkpoint_dir: str):
        """The production sink (expects ``key``/``value`` columns — see
        ``encode_json_value``); untestable without a broker."""
        return (
            df.writeStream.format("kafka")
            .options(**self.options())
            .option("checkpointLocation", checkpoint_dir)
        )


def decode_json_value(frames: DataFrame, value_schema: StructType) -> DataFrame:
    """Kafka wire frame → typed rows: parse the JSON ``value`` against
    ``value_schema`` and keep the broker provenance the reference stamps
    per record (topic/partition/offset — its manual bookkeeping comes free
    as source columns here). Pure column expressions, so the same codec is
    testable in batch and identical under streaming."""
    return frames.select(
        F.col("key").cast("string").alias("_kafka_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v"),
        F.col("topic").alias("_kafka_topic"),
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
    ).select("_v.*", "_kafka_key", "_kafka_topic", "_kafka_partition", "_kafka_offset")


def encode_json_value(df: DataFrame, key_col: str) -> DataFrame:
    """Typed rows → Kafka producer frame: ``key`` from ``key_col`` (the
    reference keys CDRs by msisdn so a subscriber's events share a
    partition), ``value`` = JSON of the FULL record — the key rides in the
    payload too, so the value alone round-trips through
    ``decode_json_value`` without consulting the key."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
