"""Progress harvesting: per-batch metrics from a real availableNow run,
rolled into the throughput summary."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from telecom_dataengineering_pipeline_spark.streaming.metrics import (
    harvest_progress,
    progress_df,
    throughput_summary,
)


@pytest.mark.slow
def test_harvest_captures_batches_rows_and_state(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(0, 1000).select("id", (F.col("id") % 5).alias("k"))
    df.filter("id < 400").coalesce(1).write.parquet(src)
    df.filter("id >= 400").coalesce(1).write.mode("append").parquet(src)

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("metrics_probe_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    records = harvest_progress(q)
    m = progress_df(spark, records)
    rows = m.collect()
    assert sum(r["num_input_rows"] for r in rows) == 1000
    assert len({r["batch_id"] for r in rows if r["num_input_rows"] > 0}) >= 2
    assert all(r["batch_duration_ms"] >= 0 for r in rows)
    assert any(r["state_rows"] > 0 for r in rows)  # the stateful agg reports

    s = throughput_summary(m).collect()
    assert len(s) == 1 and s[0]["total_rows"] == 1000 and s[0]["n_batches"] >= 2
