"""Incremental materialized-view maintenance: feed-folded rollup equals a
full recompute across inserts, updates (delete+insert pairs), group birth,
group death (tombstone), and retried refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.matview import IncrementalRollup
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable
import pytest


def _df(spark, rows):
    from decimal import Decimal

    rows = [(i, g, v, Decimal(str(a))) for i, g, v, a in rows]
    return spark.createDataFrame(rows, "id LONG, grp STRING, version INT, amt DECIMAL(12,2)")


def _mk(spark, tmp_path):
    base = TxnLogTable(str(tmp_path / "base"), stat_cols=("id",))
    view = IncrementalRollup(
        TxnLogTable(str(tmp_path / "view"), stat_cols=("grp",)),
        group_cols=["grp"],
        sum_cols=["amt"],
    )
    return base, view


def _assert_view_matches_base(spark, base, view):
    want = {
        (r["grp"], r["n"], str(r["s"]))
        for r in base.read(spark)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("amt").cast("decimal(38,6)")).cast("decimal(38,6)").alias("s"),
        )
        .collect()
    }
    got = {
        (r["grp"], r["n_rows"], str(r["sum_amt"]))
        for r in view.read(spark).collect()
    }
    assert got == want


@pytest.mark.slow
def test_feed_folding_matches_recompute_through_group_birth_and_death(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    base.create_or_replace(_df(spark, [(1, "a", 1, 10.00), (2, "a", 1, 5.50), (3, "b", 1, 7.25)]))
    view.full_refresh(base.read(spark, version=0), refresh_v=0)
    _assert_view_matches_base(spark, base, view)

    # append births group c and grows a
    base.append(_df(spark, [(4, "c", 1, 1.00), (5, "a", 1, 2.00)]))
    view.apply_changes(spark, base.table_changes(spark, 0, 1), refresh_v=1)
    _assert_view_matches_base(spark, base, view)

    # update moves row 3 OUT of group b (b dies -> tombstone) into group a
    base.merge_keep_latest(
        spark,
        _df(spark, [(3, "a", 2, 7.25)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    view.apply_changes(spark, base.table_changes(spark, 1, 2), refresh_v=2)
    _assert_view_matches_base(spark, base, view)
    assert "b" not in {r["grp"] for r in view.read(spark).collect()}
    # the tombstone row physically remains (n_rows=0) until compaction
    stored = {r["grp"]: r["n_rows"] for r in view.view.read(spark).collect()}
    assert stored["b"] == 0

    # a pure price update inside one group nets count 0, sum +delta
    base.merge_keep_latest(
        spark,
        _df(spark, [(1, "a", 3, 110.00)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    view.apply_changes(spark, base.table_changes(spark, 2, 3), refresh_v=3)
    _assert_view_matches_base(spark, base, view)


@pytest.mark.slow
def test_retried_refresh_is_a_noop(spark, tmp_path):
    base, view = _mk(spark, tmp_path)
    base.create_or_replace(_df(spark, [(1, "a", 1, 10.00)]))
    view.full_refresh(base.read(spark, version=0), refresh_v=0)
    base.append(_df(spark, [(2, "a", 1, 3.00)]))
    feed = base.table_changes(spark, 0, 1)
    view.apply_changes(spark, feed, refresh_v=1)
    before = [(r["grp"], r["n_rows"], str(r["sum_amt"])) for r in view.read(spark).collect()]
    view.apply_changes(spark, feed, refresh_v=1)  # at-least-once redelivery
    after = [(r["grp"], r["n_rows"], str(r["sum_amt"])) for r in view.read(spark).collect()]
    assert before == after


@pytest.mark.slow
def test_streaming_rollup_loop_with_crash_recovery(spark, tmp_path):
    """foreachBatch streaming IVM: three micro-batches ingest + fold; a
    batch retried after its append committed (crash before the view merge)
    is recovered by catch-up, and out-of-band base commits fold too."""
    import os
    import shutil

    from pyspark.sql.types import StructType

    from telecom_dataengineering_pipeline_spark.operators.matview import (
        StreamingRollupLoop,
    )

    schema_str = "id LONG, grp STRING, version INT, amt DECIMAL(12,2)"
    batches = [
        [(1, "a", 1, 10.00), (2, "b", 1, 4.00)],
        [(3, "a", 1, 6.00)],
        [(4, "c", 1, 2.50), (5, "b", 1, 1.50)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        shutil.rmtree(stage)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)

    base, rollup = _mk(spark, tmp_path)
    loop = StreamingRollupLoop(base, rollup)
    q = (
        spark.readStream.schema(StructType.fromDDL(schema_str))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(loop.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _assert_view_matches_base(spark, base, rollup)
    assert rollup.last_refreshed_version() == base.version() == 2

    # retry of a committed batch: append no-ops, catch-up finds nothing
    loop.process_batch(_df(spark, batches[2]), 2)
    _assert_view_matches_base(spark, base, rollup)
    assert base.version() == 2

    # crash shape: base gains a commit with NO view refresh (out-of-band
    # writer / crash between commit and merge) — the next batch's catch-up
    # folds it
    base.append(_df(spark, [(6, "a", 1, 100.00)]))
    assert rollup.last_refreshed_version() == 2 and base.version() == 3
    loop.process_batch(_df(spark, [(7, "d", 1, 0.25)]), 3)
    _assert_view_matches_base(spark, base, rollup)
    assert rollup.last_refreshed_version() == base.version() == 4


@pytest.mark.slow
def test_cursor_driven_catch_up_crash_and_grown_replay(spark, tmp_path):
    """catch_up_cursor: the shared ChangeFeedCursor is the resume
    mechanism. Exact replay (ack lost) is a txn-id no-op; a GROWN replay
    (new base commits land before the re-poll) must not double-apply the
    already-folded prefix; a DELETED cursor file re-seeds from the view's
    high-water mark without a skip or double-apply."""
    import json
    import os

    from telecom_dataengineering_pipeline_spark.streaming.cdf_consume import (
        ChangeFeedCursor,
    )

    base, view = _mk(spark, tmp_path)
    cpath = str(tmp_path / "mv_cursor.json")
    base.create_or_replace(_df(spark, [(1, "a", 1, 10.00), (2, "b", 1, 4.00)]))
    cur = ChangeFeedCursor(base, cpath, start_version=-1)
    view.catch_up_cursor(cur, spark)
    _assert_view_matches_base(spark, base, view)

    # Exact replay: rewind the cursor to simulate a lost ack AFTER the
    # view merged — re-applying the same range is a txn-id no-op.
    base.append(_df(spark, [(3, "a", 1, 6.00)]))
    view.catch_up_cursor(cur, spark)
    _assert_view_matches_base(spark, base, view)
    with open(cpath, "w") as f:
        json.dump({"version": 0}, f)
    view.catch_up_cursor(cur, spark)
    _assert_view_matches_base(spark, base, view)

    # Grown replay: rewind the ack AND land a new base commit first — the
    # re-poll covers 0->latest, whose prefix (0->1) is already folded; the
    # high-water guard re-derives the feed from hw, so nothing doubles.
    with open(cpath, "w") as f:
        json.dump({"version": 0}, f)
    base.append(_df(spark, [(4, "c", 1, 2.50)]))
    view.catch_up_cursor(cur, spark)
    _assert_view_matches_base(spark, base, view)

    # Deleted cursor file: a fresh loop re-seeds from the view's own
    # high-water mark — no skip, no double-apply.
    os.remove(cpath)
    base.append(_df(spark, [(5, "b", 1, 1.50)]))
    cur2 = ChangeFeedCursor(base, cpath, start_version=view.last_refreshed_version())
    view.catch_up_cursor(cur2, spark)
    _assert_view_matches_base(spark, base, view)


@pytest.mark.slow
def test_streaming_rollup_loop_through_cursor(spark, tmp_path):
    """StreamingRollupLoop with cursor_path: ingest + IVM resume through
    the shared cursor; a retried batch stays exactly-once."""
    from telecom_dataengineering_pipeline_spark.operators.matview import (
        StreamingRollupLoop,
    )

    base, rollup = _mk(spark, tmp_path)
    loop = StreamingRollupLoop(base, rollup, cursor_path=str(tmp_path / "c.json"))
    loop.process_batch(_df(spark, [(1, "a", 1, 10.00), (2, "b", 1, 4.00)]), 0)
    loop.process_batch(_df(spark, [(3, "a", 1, 6.00)]), 1)
    _assert_view_matches_base(spark, base, rollup)
    # retried batch: append no-ops by txn id, cursor has nothing to poll
    loop.process_batch(_df(spark, [(3, "a", 1, 6.00)]), 1)
    _assert_view_matches_base(spark, base, rollup)
    assert base.version() == 1
    # out-of-band base commit folds through the cursor on the next batch
    base.append(_df(spark, [(6, "a", 1, 100.00)]))
    loop.process_batch(_df(spark, [(7, "d", 1, 0.25)]), 2)
    _assert_view_matches_base(spark, base, rollup)
