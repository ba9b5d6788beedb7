"""Incremental materialized-view maintenance: feed-folded rollup equals a
full recompute across inserts, updates (delete+insert pairs), group birth,
group death (tombstone), and retried refreshes."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.matview import IncrementalRollup
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


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
