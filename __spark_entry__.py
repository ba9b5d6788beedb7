"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``telecom_dataengineering_pipeline_spark.queries`` — the
engine's named-query registry. Each registered query is a Spark callable
``(spark, sf_dir) -> DataFrame`` paired (where SQL-expressible) with DuckDB
oracle SQL; see ``telecom_dataengineering_pipeline_spark/queries/registry.py``
for the cross-engine determinism conventions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from telecom_dataengineering_pipeline_spark import queries as _q
from telecom_dataengineering_pipeline_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Hourly usage rollup: scan → validity filter → broadcast dim join →
    hour bucketing → multi-measure hash agg with conditional counts →
    null-safe derived ratio (the reference's agg_tower_hourly_utilization
    shape, SURVEY.md §2.4 A1/A3/A5 + §2.3 J1).
    """
    apply_runtime_confs(spark)
    return _q.REGISTRY["hourly_usage_rollup"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted => rows-only check)."""
    return _q.oracle_sql()
