"""replace_where atomic region overwrite + the idempotent partition
backfill loop built on it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.plans.backfill import backfill_partitions
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "day STRING, id LONG, amt LONG")


def test_replace_where_is_one_atomic_commit_with_pruning(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("day",))
    t.create_or_replace(_df(spark, [("d1", 1, 10), ("d1", 2, 20)]).coalesce(1))
    t.append(_df(spark, [("d2", 3, 30)]).coalesce(1))
    t.append(_df(spark, [("d3", 4, 40)]).coalesce(1))
    before_files = t.snapshot_files()
    v_before = t.version()

    v = t.replace_where(
        spark, [("day", "=", "d2")], _df(spark, [("d2", 3, 99), ("d2", 9, 1)])
    )
    assert v == v_before + 1  # delete+insert in ONE commit
    got = {(r["day"], r["id"]): r["amt"] for r in t.read(spark).collect()}
    assert got == {("d1", 1): 10, ("d1", 2): 20, ("d2", 3): 99, ("d2", 9): 1, ("d3", 4): 40}
    after = set(t.snapshot_files())
    # only the d2 file was rewritten; d1/d3 carried over by reference
    assert before_files[0] in after and before_files[2] in after
    assert before_files[1] not in after
    # the previous version still reads the old d2 rows
    assert {r["amt"] for r in t.read(spark, version=v - 1).filter("day='d2'").collect()} == {30}

    # rows outside the declared region are rejected loudly
    with pytest.raises(ValueError, match="outside the declared region"):
        t.replace_where(spark, [("day", "=", "d1")], _df(spark, [("d9", 8, 8)]))


def test_backfill_converges_and_reruns_noop(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "bf"), stat_cols=("day",))
    t.create_or_replace(
        _df(spark, [("d1", 1, 1), ("d2", 2, 2), ("d3", 3, 3)]).coalesce(1)
    )

    def recompute(spark_, day):
        return _df(spark_, [(day, 100, 1000), (day, 101, 1001)])

    out = backfill_partitions(spark, t, "day", ["d1", "d2"], recompute, run_id="r7")
    assert [o["applied"] for o in out] == [True, True]
    got = {(r["day"], r["id"]) for r in t.read(spark).collect()}
    assert got == {("d1", 100), ("d1", 101), ("d2", 100), ("d2", 101), ("d3", 3)}

    # the whole run replayed (crash-recovery shape): every partition no-ops
    v = t.version()
    out2 = backfill_partitions(spark, t, "day", ["d1", "d2"], recompute, run_id="r7")
    assert [o["applied"] for o in out2] == [False, False]
    assert t.version() == v

    # a NEW run id re-applies (restatement with fresh data is a new run)
    out3 = backfill_partitions(spark, t, "day", ["d1"], recompute, run_id="r8")
    assert out3[0]["applied"] is True
