"""Every registered query must match its DuckDB oracle at sf0.001.

This replicates the driver's t2 gate (row count + schema + order-insensitive
values). The full sf0.01 check runs via
``python -m telecom_dataengineering_pipeline_spark.oracle_check`` (slower; used
per-milestone rather than per-test-run).
"""

from __future__ import annotations

import pytest

from telecom_dataengineering_pipeline_spark.oracle_check import check_query
from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_smoke, name):
    res = check_query(spark, name, sf_smoke)
    assert res.ok, res.detail
