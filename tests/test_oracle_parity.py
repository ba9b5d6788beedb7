"""Every registered query must match its DuckDB oracle at sf0.001.

This replicates the driver's t2 gate (row count + schema + order-insensitive
values). The full sf0.01 check runs via
``python -m telecom_dataengineering_pipeline_spark.oracle_check`` (slower; used
per-milestone rather than per-test-run).
"""

from __future__ import annotations

import pytest

from telecom_dataengineering_pipeline_spark.oracle_check import check_query
from telecom_dataengineering_pipeline_spark.queries.registry import (
    REGISTRY,
    bench_queries,
)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_smoke, name):
    """Full-registry parity — slow tier (~12 min): per-round coverage of
    all 344 queries also lands in the committed SWEEP artifacts and the
    driver's own oracle gate; the default run keeps the bench-set twin
    below."""
    res = check_query(spark, name, sf_smoke)
    assert res.ok, res.detail


_PARITY_HEAVY = {
    # covered by the slow-tier full sweep, the per-round SWEEP artifacts
    # and the driver's own gate; their sf0.001 parity runs cost 7-15 s
    # each, which the default driver-budget tier cannot afford
    "dedup_incremental_lsh_probe",
    "dedup_minhash_lsh_pairs",
    "training_set_summary",
    "dedup_jaccard_pairs",
}


@pytest.mark.parametrize(
    "name", sorted(set(bench_queries()) - _PARITY_HEAVY)
)
def test_bench_query_matches_oracle(spark, sf_smoke, name):
    """Default-run representative subset: the bench queries (every
    operator family the bench exercises) minus the four heavyweight
    dedup-parity runs stay oracle-checked on every plain `pytest tests/`
    run."""
    res = check_query(spark, name, sf_smoke)
    assert res.ok, res.detail
