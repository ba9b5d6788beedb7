"""Kafka option surface + wire codecs (S1/S2). No broker exists in this
environment, so these tests pin (a) the exact option keys the Spark Kafka
source/sink consume — a typo'd key silently no-ops at runtime, which is
precisely the risk of an untested config swap — and (b) the JSON
decode/encode codecs, driven in batch mode over synthetic wire frames
(they are pure column expressions, identical under streaming)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from telecom_dataengineering_pipeline_spark.streaming.kafka import (
    KafkaSinkConfig,
    KafkaSourceConfig,
    decode_json_value,
    encode_json_value,
)

CDR_SCHEMA = StructType(
    [
        StructField("msisdn", StringType()),
        StructField("event_type", StringType()),
        StructField("duration_sec", LongType()),
        StructField("charge", DoubleType()),
    ]
)


def test_source_options_exact_keys():
    cfg = KafkaSourceConfig(
        bootstrap_servers="broker1:9092,broker2:9092",
        subscribe="cdr.voice,cdr.sms",
        starting_offsets="earliest",
        max_offsets_per_trigger=10_000,
        fail_on_data_loss=False,
        consumer_overrides={"group.id": "bronze-ingest", "max.poll.records": "500"},
    )
    assert cfg.options() == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "cdr.voice,cdr.sms",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "10000",
        "failOnDataLoss": "false",
        "kafka.group.id": "bronze-ingest",
        "kafka.max.poll.records": "500",
    }


def test_source_options_defaults_omit_rate_bound():
    opts = KafkaSourceConfig(bootstrap_servers="b:9092", subscribe="t").options()
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    assert "maxOffsetsPerTrigger" not in opts


def test_sink_options_exact_keys():
    cfg = KafkaSinkConfig(
        bootstrap_servers="b:9092",
        topic="fraud.alerts",
        producer_overrides={"acks": "all", "compression.type": "lz4"},
    )
    assert cfg.options() == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "fraud.alerts",
        "kafka.acks": "all",
        "kafka.compression.type": "lz4",
    }


def _wire_frames(spark, payloads):
    """Synthetic Kafka wire frames: the exact columns the source exposes."""
    rows = [
        (
            k.encode(),
            v.encode(),
            "cdr.voice",
            p,
            o,
        )
        for (k, v, p, o) in payloads
    ]
    return spark.createDataFrame(
        rows,
        "key BINARY, value BINARY, topic STRING, partition INT, offset LONG",
    )


def test_decode_json_value_typed_columns_and_provenance(spark):
    frames = _wire_frames(
        spark,
        [
            ("447700900001", '{"msisdn":"447700900001","event_type":"voice","duration_sec":62,"charge":0.35}', 0, 41),
            ("447700900002", '{"msisdn":"447700900002","event_type":"sms","duration_sec":0,"charge":0.05}', 1, 7),
        ],
    )
    out = decode_json_value(frames, CDR_SCHEMA)
    rows = {r["msisdn"]: r for r in out.collect()}
    assert rows["447700900001"]["duration_sec"] == 62
    assert rows["447700900001"]["_kafka_partition"] == 0
    assert rows["447700900001"]["_kafka_offset"] == 41
    assert rows["447700900002"]["_kafka_topic"] == "cdr.voice"
    assert rows["447700900002"]["charge"] == 0.05
    # malformed value → typed nulls, not a crash (PERMISSIVE from_json)
    bad = decode_json_value(_wire_frames(spark, [("k", "not json", 0, 1)]), CDR_SCHEMA)
    assert bad.count() == 1 and bad.collect()[0]["msisdn"] is None


def test_encode_decode_roundtrip(spark):
    src = spark.createDataFrame(
        [("447700900001", "voice", 62, 0.35)],
        "msisdn STRING, event_type STRING, duration_sec LONG, charge DOUBLE",
    )
    framed = encode_json_value(src, key_col="msisdn")
    assert framed.columns == ["key", "value"]  # the producer frame contract
    wire = framed.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit("cdr.voice").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
    )
    back = decode_json_value(wire, CDR_SCHEMA).collect()[0]
    assert (back["msisdn"], back["event_type"], back["duration_sec"], back["charge"]) == (
        "447700900001",
        "voice",
        62,
        0.35,
    )
    assert back["_kafka_key"] == "447700900001"  # msisdn keying preserved
