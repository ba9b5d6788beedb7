"""Registry/doc reconciliation pin (VERDICT r7 item 4).

COVERAGE.md's headline registry tally drifted from the importable truth in
round 7 (doc said 258/257, ``len(REGISTRY)`` said 255/254 — a
double-count of the session-4 late additions). This pin makes that class
of drift impossible: the LAST ``Registry: **N queries / M oracles**``
line in COVERAGE.md must equal the importable registry, exactly.
"""

from __future__ import annotations

import os
import re

from telecom_dataengineering_pipeline_spark.queries.registry import (
    REGISTRY,
    oracle_sql,
    queries,
)

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_coverage_doc_tally_matches_importable_registry():
    text = open(os.path.join(_ROOT, "COVERAGE.md")).read()
    claims = re.findall(
        r"Registry:\s*\*\*(\d+)\s+queries\s*/\s*(\d+)\s+oracles\*\*", text
    )
    assert claims, "COVERAGE.md must state a machine-parsable registry tally"
    n_q, n_o = map(int, claims[-1])
    assert n_q == len(REGISTRY), (
        f"COVERAGE.md claims {n_q} queries; importable registry has "
        f"{len(REGISTRY)} — reconcile the doc"
    )
    assert n_o == len(oracle_sql()), (
        f"COVERAGE.md claims {n_o} oracles; importable registry has "
        f"{len(oracle_sql())} — reconcile the doc"
    )


def test_registry_internal_consistency():
    qs = queries()
    os_ = oracle_sql()
    # every oracle belongs to a registered query
    assert set(os_) <= set(qs)
    # rows-only (no-oracle) entries are the sanctioned set only
    rows_only = set(qs) - set(os_)
    assert rows_only <= {"pca_embedding_projection"}, (
        f"unsanctioned rows-only queries: {rows_only - {'pca_embedding_projection'}}"
    )
