"""A REAL wire path for the streaming tier — Spark's socket source fed
by an in-process TCP producer, carrying the SAME JSON frames the Kafka
codecs (`streaming/kafka.py::encode_json_value`/`decode_json_value`)
produce and parse.

Why this exists: the reference produces to and consumes from an actual
Kafka broker (``streaming/producers/cdr_producer.py``,
``processing/bronze/kafka_to_bronze.py``); this sandbox has no broker, so
S1/S2 previously rested on a file-source stand-in — identical downstream
graph, but no bytes ever crossed a network. Spark ships a socket source
(``format("socket")``) that reads newline-delimited UTF-8 off a real TCP
connection; pairing it with a producer that writes the Kafka value
payloads verbatim proves the wire layer end to end: encode → bytes on a
socket → Spark micro-batches → decode → typed rows, with only the broker
itself stubbed. On a cluster with a broker, ``KafkaSourceConfig.reader``
replaces the socket reader and the codecs are untouched.

The socket source is NOT fault-tolerant (no offsets — Spark's own
documentation restricts it to tests); that is exactly its role here.
"""

from __future__ import annotations

import socket
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class SocketProducer:
    """One-shot TCP producer: binds an ephemeral localhost port, accepts
    ONE consumer, writes every payload newline-delimited, then HOLDS the
    connection open until :meth:`close` (the socket source treats EOF as
    stream end mid-query). Use as a context manager in tests."""

    def __init__(self, payloads: list[str], host: str = "127.0.0.1"):
        self._payloads = list(payloads)
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, 0))
        self._srv.listen(1)
        self.host, self.port = self._srv.getsockname()
        self._done = threading.Event()
        self._sent = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        conn, _ = self._srv.accept()
        try:
            data = "".join(p + "\n" for p in self._payloads).encode("utf-8")
            conn.sendall(data)
            self._sent.set()
            self._done.wait(timeout=120)
        finally:
            conn.close()
            self._srv.close()

    def wait_sent(self, timeout: float = 30.0) -> bool:
        return self._sent.wait(timeout)

    def close(self) -> None:
        self._done.set()

    def __enter__(self) -> "SocketProducer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def socket_json_source(
    spark: SparkSession, host: str, port: int, value_schema: StructType
) -> DataFrame:
    """readStream over a TCP socket, decoding each line as one Kafka
    value frame (the payloads ``encode_json_value`` emits). Returns the
    typed rows — the same projection ``decode_json_value`` yields minus
    the broker provenance columns a socket has none of."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return lines.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v")
    ).select("_v.*")
