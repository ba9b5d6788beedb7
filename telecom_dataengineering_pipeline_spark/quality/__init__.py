from .checks import (
    CheckResult,
    expect_accepted_values,
    expect_expression,
    expect_not_null,
    expect_relationships,
    expect_unique,
    run_checks,
)
from .monitors import (
    cardinality_drift,
    freshness,
    null_rate_drift,
    schema_drift,
    volume_zscore,
)

__all__ = [
    "CheckResult",
    "expect_accepted_values",
    "expect_expression",
    "expect_not_null",
    "expect_relationships",
    "expect_unique",
    "run_checks",
    "cardinality_drift",
    "freshness",
    "null_rate_drift",
    "schema_drift",
    "volume_zscore",
]
