"""The composed-medallion gate query (VERDICT r8 item 3): structural
non-vacuity beyond the three-SF value parity — the injected redelivery,
invalid-duration, and ghost-caller rows must actually exercise the silver
dedup, validity filter, and UNKNOWN star-join sentinel, and the three gold
surfaces must reconcile with each other."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.queries.round12 import (
    _bronze_call_events,
    medallion_fact_build,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gate_rows(spark):
    return medallion_fact_build(spark, SF).collect()


def test_bronze_injections_are_non_vacuous(spark):
    bronze = _bronze_call_events(spark, SF)
    n_total = bronze.count()
    n_distinct = bronze.select("event_id").distinct().count()
    assert n_total > n_distinct, "duplicate redelivery must be injected"
    assert bronze.filter(F.col("duration_seconds") < 0).count() > 0, (
        "invalid durations must be injected"
    )
    assert bronze.filter(F.col("caller_customer_id") == "CUST-GHOST").count() > 0


def test_unknown_sentinel_group_present(gate_rows):
    recon = {(r["k1"], r["k2"], r["k3"]): r for r in gate_rows if r["grain"] == "fact_recon"}
    assert ("UNKNOWN", "KNOWN", "KNOWN") in recon, "ghost callers must hit the UNKNOWN path"
    assert ("KNOWN", "KNOWN", "KNOWN") in recon
    assert all(k[1] == "KNOWN" and k[2] == "KNOWN" for k in recon), (
        "every tower is seeded and every event date is inside the 2024 spine"
    )


def test_gold_surfaces_reconcile(gate_rows):
    """The hourly rollup and the fact-grain recon are two independent
    aggregations of the same silver relation — totals must agree."""
    hourly = [r for r in gate_rows if r["grain"] == "tower_hour"]
    recon = [r for r in gate_rows if r["grain"] == "fact_recon"]
    assert sum(r["calls"] for r in hourly) == sum(r["calls"] for r in recon)
    assert sum(r["successes"] for r in hourly) == sum(r["successes"] for r in recon)
    assert sum(r["aux_long"] for r in hourly) == sum(r["aux_long"] for r in recon)
    assert sum(r["revenue"] for r in hourly) == pytest.approx(
        sum(r["revenue"] for r in recon)
    )


def test_monthly_grain_excludes_ghosts(gate_rows):
    monthly = [r for r in gate_rows if r["grain"] == "customer_month"]
    assert monthly, "customer-month grain must be populated"
    assert all(r["k1"] != "CUST-GHOST" for r in monthly), (
        "ghost callers have no dim row and must drop from the dim-anchored rollup"
    )
    assert all(r["k3"] is not None for r in monthly), "plan_tier rides the dim join"


def test_driver_order_rotation_invariants():
    """Round-independent rotation contract (VERDICT r9 item 2).

    The emission order must be derived from the committed CORRECTNESS_r*.json
    evidence at call time — never from a frozen round number. We assert the
    structural invariants the implementation promises, computed from the same
    evidence glob it uses, so this test stays green as new rounds land:

    1. ``driver_order()`` is a permutation of the registry.
    2. The window head is never-driver-checked names (up to the slot cap),
       in registration order.
    3. Refresh slots inside the window go to the stalest checked tier: no
       checked name inside the window is fresher than any checked name
       outside it.
    4. Never-checked overflow (beyond the cap) queues contiguously right
       after the window, ahead of all fresher refresh names.
    """
    from telecom_dataengineering_pipeline_spark.queries.registry import (
        DRIVER_WINDOW,
        NEW_NAME_SLOT_CAP,
        REGISTRY,
        _latest_driver_round,
        driver_order,
    )

    order = driver_order()
    assert sorted(order) == sorted(REGISTRY)
    assert "medallion_fact_build" in order

    seen = _latest_driver_round()
    never = [n for n in REGISTRY if n not in seen]
    head_len = min(NEW_NAME_SLOT_CAP, len(never))
    assert order[:head_len] == never[:head_len], (
        "window head must be the never-checked names in registration order"
    )

    in_window_checked = [seen[n] for n in order[:DRIVER_WINDOW] if n in seen]
    out_window_checked = [seen[n] for n in order[DRIVER_WINDOW:] if n in seen]
    if in_window_checked and out_window_checked:
        assert max(in_window_checked) <= min(out_window_checked), (
            "refresh slots must drain the stalest driver-evidence tier first"
        )

    overflow = never[head_len:]
    if overflow:
        assert order[DRIVER_WINDOW : DRIVER_WINDOW + len(overflow)] == overflow, (
            "never-checked overflow queues immediately after the window"
        )
