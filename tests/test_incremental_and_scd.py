"""Incremental watermark ingestion (S12) and true SCD2 close-and-insert."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.functions.keys import record_hash
from telecom_dataengineering_pipeline_spark.operators.asof import asof_join, range_join
from telecom_dataengineering_pipeline_spark.operators.incremental import (
    WatermarkStore,
    incremental_slice,
    run_incremental,
)
from telecom_dataengineering_pipeline_spark.operators.merge import merge_upsert, scd2_close_and_insert


def test_watermark_store_roundtrip(tmp_path):
    ws = WatermarkStore(os.path.join(tmp_path, "wm", "calls.json"))
    assert ws.read() is None
    ws.write("2024-01-05 00:00:00")
    assert ws.read() == "2024-01-05 00:00:00"


def test_incremental_run_advances_only_on_new_data(spark, tmp_path):
    ws = WatermarkStore(os.path.join(tmp_path, "wm.json"))
    src = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 10:00:00"), (3, "2024-01-03 10:00:00")],
        ["id", "updated_at"],
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))

    seen: list[int] = []

    def apply_batch(batch):
        seen.extend(r["id"] for r in batch.collect())

    wm = run_incremental(src, "updated_at", ws, apply_batch)
    assert sorted(seen) == [1, 2, 3] and wm == "2024-01-03 10:00:00"

    # second run: nothing new → no apply, watermark unchanged
    seen.clear()
    wm2 = run_incremental(src, "updated_at", ws, apply_batch)
    assert seen == [] and wm2 == wm

    # late-data lookback re-pulls the tail without moving the watermark back
    sliced = incremental_slice(src, "updated_at", ws.read(), lookback=F.expr("INTERVAL 1 DAY"))
    assert {r["id"] for r in sliced.collect()} == {3}


def test_scd2_close_and_insert(spark):
    schema = (
        "customer_id string, plan string, effective_start_date string, "
        "effective_end_date string, is_current boolean"
    )
    cur = spark.createDataFrame(
        [
            ("C1", "plan_A", "2024-01-01", None, True),
            ("C2", "plan_B", "2024-01-01", None, True),
        ],
        schema,
    ).withColumn("_record_hash", record_hash("plan"))
    upd = spark.createDataFrame(
        [
            ("C1", "plan_A2", "2024-02-01", None, True),  # changed → close + insert
            ("C2", "plan_B", "2024-02-01", None, True),  # unchanged → ignored
            ("C3", "plan_C", "2024-02-01", None, True),  # new key → insert
        ],
        schema,
    ).withColumn("_record_hash", record_hash("plan"))

    out = scd2_close_and_insert(cur, upd, key="customer_id", hash_col="_record_hash")
    rows = {(r["customer_id"], r["plan"]): r for r in out.collect()}
    assert len(rows) == 4  # C1 old+new, C2 current, C3 new
    c1_old = rows[("C1", "plan_A")]
    assert c1_old["is_current"] is False and c1_old["effective_end_date"] == "2024-02-01"
    assert rows[("C1", "plan_A2")]["is_current"] is True
    assert rows[("C2", "plan_B")]["is_current"] is True
    assert rows[("C3", "plan_C")]["is_current"] is True
    # history query: as-of via the range pattern returns exactly one version
    versions = out.filter(F.col("customer_id") == "C1")
    jan = versions.filter(
        (F.lit("2024-01-15") >= F.col("effective_start_date"))
        & (F.lit("2024-01-15") < F.coalesce(F.col("effective_end_date"), F.lit("9999-12-31")))
    )
    assert [r["plan"] for r in jan.collect()] == ["plan_A"]


def test_scd2_close_and_insert_with_full_history(spark):
    """`current` holding closed historical versions must leave them untouched:
    only the open row is compared, closed, or used for duplicate-insert checks
    — even when the update's hash equals an OLD version's hash (plan flip-back)."""
    schema = (
        "customer_id string, plan string, effective_start_date string, "
        "effective_end_date string, is_current boolean"
    )
    cur = spark.createDataFrame(
        [
            ("C1", "plan_A", "2024-01-01", "2024-02-01", False),  # closed history
            ("C1", "plan_B", "2024-02-01", None, True),  # open version
        ],
        schema,
    ).withColumn("_record_hash", record_hash("plan"))
    upd = spark.createDataFrame(
        [("C1", "plan_A", "2024-03-01", None, True)],  # flip back to plan_A
        schema,
    ).withColumn("_record_hash", record_hash("plan"))

    out = scd2_close_and_insert(cur, upd, key="customer_id", hash_col="_record_hash")
    rows = sorted(
        (r["plan"], r["effective_start_date"], r["effective_end_date"], r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        ("plan_A", "2024-01-01", "2024-02-01", False),  # history untouched
        ("plan_A", "2024-03-01", None, True),  # flip-back inserted
        ("plan_B", "2024-02-01", "2024-03-01", False),  # open version closed
    ]


def test_asof_join_handles_missing_and_ties(spark):
    left = spark.createDataFrame(
        [(1, 5, "e1"), (1, 15, "e2"), (2, 10, "e3")], ["k", "ts", "name"]
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 3, 50.0), (3, 1, 9.9)], ["k", "ts", "px"]
    )
    out = asof_join(left, right, key="k", left_ts="ts", right_ts="ts", value_cols=["px"])
    got = {r["name"]: r["px"] for r in out.collect()}
    assert got == {"e1": 50.0, "e2": 100.0, "e3": None}
    # exact-timestamp tie: right row at ts == left ts IS visible (<=)
    left2 = spark.createDataFrame([(1, 10, "same")], ["k", "ts", "name"])
    out2 = asof_join(left2, right, key="k", left_ts="ts", right_ts="ts", value_cols=["px"])
    assert out2.collect()[0]["px"] == 100.0


def test_range_join_open_interval(spark):
    fact = spark.createDataFrame([("A", 5), ("A", 20)], ["k", "d"])
    dim = spark.createDataFrame(
        [("A", 0, 9, "v1"), ("A", 10, None, "v2")], ["k", "lo", "hi", "ver"]
    )
    out = range_join(
        fact, dim, key=("k", "k"), point="d", lower="lo", upper="hi",
        open_upper_sentinel=F.lit(10**9),
    )
    got = {r["d"]: r["ver"] for r in out.collect()}
    assert got == {5: "v1", 20: "v2"}


def test_snapshot_diff_null_semantics_and_shapes(spark):
    """operators/diff.py: added/removed/changed detection with null-safe
    compare — NULL==NULL is unchanged (dropped), NULL vs value is changed;
    same-lineage inputs (slices of one frame) must not trip the ambiguous
    self-join analyzer."""
    from telecom_dataengineering_pipeline_spark.operators.diff import snapshot_diff

    base = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, "d"), (5, None)],
        "k LONG, v STRING",
    )
    old = base.filter(F.col("k") <= 4)
    new = (
        base.filter(F.col("k") >= 2)
        .withColumn("v", F.when(F.col("k") == 3, "c2")
                    .when(F.col("k") == 4, F.lit(None).cast("string"))
                    .otherwise(F.col("v")))
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: "removed",   # only in old
        3: "changed",   # c -> c2
        4: "changed",   # d -> NULL (null-safe: different)
        5: "added",     # only in new
    }  # k=2: NULL == NULL -> unchanged, dropped
