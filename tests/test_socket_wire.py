"""Real bytes across a real TCP socket through the Kafka JSON codecs:
encode_json_value's producer payloads stream over Spark's socket source
and decode back to the exact typed rows — the wire layer proven end to
end with only the broker stubbed (S1/S2)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.kafka import encode_json_value
from telecom_dataengineering_pipeline_spark.streaming.socket_wire import (
    SocketProducer,
    socket_json_source,
)


def test_kafka_frames_round_trip_over_tcp(spark, sf_smoke):
    ev = (
        load_table(spark, sf_smoke, "events")
        .filter(F.col("event_id") < 40)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 6).alias("value"),
        )
    )
    want = {tuple(r) for r in ev.collect()}
    schema = StructType.fromJson(ev.schema.jsonValue())

    # the EXACT producer frames the Kafka sink would carry
    payloads = [r["value"] for r in encode_json_value(ev, "user_id").collect()]
    assert len(payloads) == len(want) > 0

    with SocketProducer(payloads) as prod:
        typed = socket_json_source(spark, prod.host, prod.port, schema)
        q = (
            typed.writeStream.format("memory")
            .queryName("socket_sink")
            .outputMode("append")
            .start()
        )
        try:
            assert prod.wait_sent(30), "producer never sent"
            deadline = time.time() + 60
            while time.time() < deadline:
                q.processAllAvailable()
                if spark.table("socket_sink").count() >= len(want):
                    break
                time.sleep(0.5)
            got = {tuple(r) for r in spark.table("socket_sink").collect()}
        finally:
            q.stop()
    assert got == want  # bytes -> socket -> micro-batches -> typed rows
