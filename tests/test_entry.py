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


def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} returned no columns"
