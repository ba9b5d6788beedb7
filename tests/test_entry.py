"""Smoke-test the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import pytest
import os

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(spec and entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "total_events" in df.columns


def test_queries_and_oracles_consistent():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"


def test_driver_window_is_computed_and_complete():
    """The driver verifies the first 50 queries() entries per round; the
    order is COMPUTED from the committed CORRECTNESS files (VERDICT r8
    item 10 — the hand-maintained DRIVER_ORDER list drifted twice and is
    gone). Pin the structural properties: the order is a permutation of
    the registry, deterministic, and never-checked names head the window
    up to the 30-slot cap in registration order."""
    from telecom_dataengineering_pipeline_spark.queries.registry import (
        NEW_NAME_SLOT_CAP,
        REGISTRY,
        _latest_driver_round,
        driver_order,
    )

    order = driver_order()
    assert order == driver_order(), "order must be deterministic"
    assert sorted(order) == sorted(REGISTRY), "order must be a registry permutation"
    seen = _latest_driver_round()
    never = [n for n in REGISTRY if n not in seen]
    window = order[:50]
    expected_head = never[:NEW_NAME_SLOT_CAP]
    assert window[: len(expected_head)] == expected_head, (
        "never-checked names head the window in registration order"
    )


@pytest.mark.slow
def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} returned no columns"
