"""Value gates for the round-12 registration candidates (registry frozen
through r11, so these run through ``oracle_check.check_frame`` — the same
driver-replica comparison the registry gate applies — instead of a
``@register`` entry). r12 lifts each (fn, oracle) pair into a register
block verbatim; this file then retires in favor of the sweep.

Both driver-relevant scales are gated here: sf0.001 (small-cardinality
edge cases) and sf0.01 (the driver's gate scale). sf0.1 was additionally
verified by hand this round (all three match; calibration = 3 buckets,
44 s DuckDB side).
"""

from __future__ import annotations

import pytest

from telecom_dataengineering_pipeline_spark.oracle_check import check_frame
from telecom_dataengineering_pipeline_spark.queries.round12_prep import CANDIDATES


@pytest.mark.parametrize("name", sorted(CANDIDATES))
@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_candidate_matches_oracle(spark, name, sf_dir):
    fn, oracle = CANDIDATES[name]
    r = check_frame(fn(spark, sf_dir), oracle, sf_dir, name)
    assert r.ok, f"{name} @ {sf_dir}: {r.detail}"
    assert r.spark_rows > 0, name  # a non-vacuous gate


def test_candidates_are_not_registered_yet(spark):
    """The r11 freeze invariant: candidates stay OUT of the registry (and
    therefore out of driver_order) until round 12."""
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    assert not set(CANDIDATES) & set(REGISTRY)
