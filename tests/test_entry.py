"""Smoke-test the driver contract in __spark_entry__.py."""

from __future__ import annotations

import importlib.util
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


def test_driver_window_covers_round1_unchecked():
    """The driver verifies the first 50 queries() entries per round.

    Round 1 left the llmprep/writeside layer (+ the quality tail) outside
    that window; DRIVER_ORDER rotates them in.  Pin the invariant so a new
    registration can't silently push them back out.
    """
    from telecom_dataengineering_pipeline_spark.queries.registry import (
        DRIVER_ORDER,
        REGISTRY,
    )

    window = list(entry_mod.queries())[:50]
    must_be_in_window = DRIVER_ORDER[:22]  # the 22 without a round-1 driver row
    missing = [n for n in must_be_in_window if n not in window]
    assert not missing, f"round-1-unchecked queries outside driver window: {missing}"
    # Every name in DRIVER_ORDER is either registered or a planned round-2 query.
    unregistered = set(DRIVER_ORDER) - set(REGISTRY)
    planned = {"fraud_stream_availablenow", "dedup_connected_groups_star", "jdbc_source_contract"}
    assert unregistered <= planned, f"typo in DRIVER_ORDER: {unregistered - planned}"


def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} returned no columns"
