"""Partition retention (O5): expire_old_partitions drops old Hive partitions
without touching survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table
from telecom_dataengineering_pipeline_spark.sources.writers import expire_old_partitions


def test_expire_old_partitions(spark, sf_smoke, tmp_path):
    path = str(tmp_path / "events_by_date")
    events = load_table(spark, sf_smoke, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    events.write.mode("overwrite").partitionBy("event_date").parquet(path)
    dates = sorted(r.event_date for r in events.select("event_date").distinct().collect())
    assert len(dates) > 2
    cutoff = dates[1]  # keep dates[1:], expire dates[0]

    preview = expire_old_partitions(spark, path, "event_date", cutoff, dry_run=True)
    assert preview == [f"event_date={dates[0]}"]
    assert spark.read.parquet(path).select("event_date").distinct().count() == len(dates)

    removed = expire_old_partitions(spark, path, "event_date", cutoff)
    assert removed == preview
    left = spark.read.parquet(path)
    remaining = sorted(  # partition values re-infer as DATE on read
        r.d for r in left.select(F.col("event_date").cast("string").alias("d")).distinct().collect()
    )
    assert remaining == dates[1:]
    # survivors still prune: a filter on the partition column reads one dir
    plan = (
        left.filter(F.col("event_date") == dates[1])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan

    # idempotent second call
    assert expire_old_partitions(spark, path, "event_date", cutoff) == []
