"""Health rollup policy + incremental medallion refresh."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.plans.health import HealthReport
from telecom_dataengineering_pipeline_spark.plans.medallion import MedallionPipeline
from telecom_dataengineering_pipeline_spark.sources.generators import call_events
from telecom_dataengineering_pipeline_spark.sources.writers import write_partitioned


def test_health_rollup_policy():
    r = HealthReport()
    assert r.status == "HEALTHY"
    r.add("null_rate", "silver.calls", "INFO", "rate 0.001")
    assert r.status == "HEALTHY"
    r.add("cardinality", "silver.calls", "WARNING", "drift 25%")
    assert r.status == "DEGRADED"
    r.add("schema", "bronze.call_events", "CRITICAL", "column removed: tower_id")
    assert r.status == "BLOCKED"
    assert r.blocked_tables() == {"bronze.call_events"}
    assert r.summary()["status"] == "BLOCKED"


def test_health_impact_via_lineage(spark):
    with tempfile.TemporaryDirectory() as d:
        p = MedallionPipeline(spark, d, n_events=100, n_customers=20)
        dag = p.dag()
        r = HealthReport()
        r.add("freshness", "silver.calls", "CRITICAL", "3h SLA breached")
        impacted = r.impacted_downstream(dag)
        assert {"gold.fact_calls", "gold.agg_tower_hourly", "gold.agg_customer_monthly"} <= impacted


@pytest.mark.slow
def test_incremental_silver_refresh(spark):
    with tempfile.TemporaryDirectory() as d:
        p = MedallionPipeline(spark, d, n_events=3000, n_customers=200)
        p.ingest_bronze()
        p.build_silver_calls()
        silver0 = spark.read.parquet(p.path("silver", "calls"))
        n0 = silver0.count()

        # late batch: 500 brand-new events (offset ids + later ingest times)
        late = call_events(spark, n=500, dup_fraction_mod=10, start_ts="2024-01-28 00:00:00")
        late = (
            late.withColumn("event_id", F.concat(F.lit("LATE-"), F.col("event_id")))
            .withColumn("_bronze_ingested_at", F.col("_bronze_ingested_at") + F.expr("INTERVAL 40 DAY"))
        )
        write_partitioned(late, p.path("bronze", "call_events"), mode="append")

        p.incremental_silver_calls(lookback_days=3)
        silver1 = spark.read.parquet(p.path("silver", "calls"))
        # all original rows retained + 500 distinct new ids, still unique
        assert silver1.count() == n0 + 500
        assert silver1.groupBy("call_id").count().filter("count > 1").count() == 0
        assert silver1.filter(F.col("call_id").startswith("LATE-")).count() == 500
