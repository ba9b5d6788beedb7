"""Stateful streaming sessionization: closed sessions from the stream must
match the batch lag/cumsum sessionization exactly; idle sessions close via
event-time timeout."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.streaming.sessions import session_stream
import pytest

GAP_S = 1800


def _batch_sessions(ev):
    """Ground truth: lag/cumsum sessionization + per-session rollup with the
    same integer-cents value accumulation the stream uses."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > GAP_S * 1_000_000),
            1,
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    seq = marked.withColumn("session_seq", F.sum("new_s").over(cum).cast("long"))
    return seq.groupBy("user_id", "session_seq").agg(
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
        ).alias("session_value"),
    )


def test_stream_sessions_match_batch(spark, sf_smoke):
    ev = (
        load_table(spark, sf_smoke, "events")
        .withColumn("us", F.unix_micros("ts"))
        .select("ts", "us", "user_id", "event_id", "value")
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ev.filter(F.col("ts") < "2024-01-16").coalesce(1).write.parquet(
            os.path.join(src, "b0")
        )
        ev.filter(F.col("ts") >= "2024-01-16").coalesce(1).write.parquet(
            os.path.join(src, "b1")
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/b*")
            .withWatermark("ts", "30 seconds")
        )
        out = session_stream(stream, gap_s=GAP_S)
        q = (
            out.writeStream.format("memory")
            .queryName("stream_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["user_id"], r["session_seq"]): (
                r["start_us"],
                r["end_us"],
                r["n_events"],
                round(r["session_value"], 2),
            )
            for r in spark.sql("SELECT * FROM stream_sessions").collect()
        }

    want = {
        (r["user_id"], r["session_seq"]): (
            r["start_us"],
            r["end_us"],
            r["n_events"],
            round(r["session_value"], 2),
        )
        for r in _batch_sessions(ev).collect()
    }
    assert got, "no sessions emitted"
    # every emitted session must be exactly a batch session
    for k, v in got.items():
        assert want[k] == v, (k, v, want[k])
    # the final watermark can hold back at most each user's LAST session
    n_users = len({u for (u, _) in want})
    assert len(got) >= len(want) - n_users
    # timeout-based closure DID fire: some users' final sessions emitted
    last_per_user = {
        u: max(s for (uu, s) in want if uu == u) for (u, _) in want
    }
    assert any((u, s) in got for u, s in last_per_user.items())


@pytest.mark.slow
def test_session_seq_survives_timeout_flush(spark, tmp_path):
    """A user who goes idle (session flushed by event-time timeout) and
    later returns must CONTINUE session_seq — dropping the counter with the
    state would re-emit (user, 1) for a different session."""
    H = 3_600_000_000  # 1h in us
    T0 = 1_700_000_000_000_000

    def _batch(rows, name):
        spark.createDataFrame(
            [(r[0], r[1], r[2], r[3], float(r[4])) for r in rows],
            "us LONG, user_id LONG, event_id LONG, _o LONG, value DOUBLE",
        ).select(
            F.timestamp_micros(F.col("us")).alias("ts"),
            "us",
            "user_id",
            "event_id",
            "value",
        ).coalesce(1).write.parquet(str(tmp_path / "src" / name))

    _batch([(T0, 1, 10, 0, 1.0), (T0 + 10_000_000, 1, 11, 0, 2.0)], "b0")
    _batch([(T0 + 2 * H, 2, 20, 0, 1.0)], "b1")      # watermark advances
    _batch([(T0 + 2 * H + 1, 2, 21, 0, 1.0)], "b2")  # user 1 absent: timeout fires
    _batch([(T0 + 4 * H, 1, 12, 0, 3.0)], "b3")      # user 1 returns
    _batch([(T0 + 8 * H, 2, 22, 0, 1.0)], "b4")      # flush user 1's second session

    schema = "ts TIMESTAMP, us LONG, user_id LONG, event_id LONG, value DOUBLE"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src" / "b*"))
        .withWatermark("ts", "30 seconds")
    )
    q = (
        session_stream(stream, gap_s=GAP_S)
        .writeStream.format("memory")
        .queryName("seq_continuity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    u1 = {
        r["session_seq"]: (r["n_events"], r["session_value"])
        for r in spark.sql(
            "SELECT * FROM seq_continuity WHERE user_id = 1"
        ).collect()
    }
    assert u1 == {1: (2, 3.0), 2: (1, 3.0)}, u1
