"""Shallow clone (Delta CLONE semantics) on the transaction-log table
format: zero-copy fork, copy-on-write divergence, mutual isolation,
stats transfer, vacuum safety."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, payload STRING, version INT")


def _parquet_under(root: str) -> set[str]:
    return set(glob.glob(os.path.join(root, "data", "*", "*.parquet")))


@pytest.fixture()
def source_table(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "src"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(i, f"p{i}", 1) for i in range(100)]).repartition(4))
    return t


def test_clone_is_zero_copy_and_content_equal(spark, tmp_path, source_table):
    clone = source_table.clone_shallow(str(tmp_path / "dst"))
    assert clone.read(spark).count() == 100
    assert sorted(r["id"] for r in clone.read(spark).collect()) == list(range(100))
    # No parquet was copied: the clone root holds metadata only.
    assert _parquet_under(clone.path) == set()
    # The clone's snapshot references the source's files by absolute path.
    assert all(os.path.isabs(f) for f in clone.snapshot_files())
    assert clone.history()[-1]["operation"] == "clone"


def test_clone_diverges_cow_without_touching_source(spark, tmp_path, source_table):
    before = _parquet_under(source_table.path)
    clone = source_table.clone_shallow(str(tmp_path / "dst"))
    clone.merge_keep_latest(
        spark,
        _df(spark, [(5, "updated", 2), (200, "new", 2)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    rows = {r["id"]: r for r in clone.read(spark).collect()}
    assert rows[5]["payload"] == "updated" and rows[200]["payload"] == "new"
    assert len(rows) == 101
    # Source bytes and snapshot are untouched by the clone's merge.
    assert _parquet_under(source_table.path) == before
    src = {r["id"]: r for r in source_table.read(spark).collect()}
    assert len(src) == 100 and src[5]["payload"] == "p5"
    # Divergent files landed under the CLONE's root.
    assert _parquet_under(clone.path)


def test_source_writes_do_not_move_the_clone(spark, tmp_path, source_table):
    clone = source_table.clone_shallow(str(tmp_path / "dst"))
    source_table.append(_df(spark, [(1000, "late", 1)]))
    assert clone.read(spark).count() == 100  # clone pinned to clone-time snapshot
    assert source_table.read(spark).count() == 101


def test_time_travel_clone(spark, tmp_path, source_table):
    source_table.append(_df(spark, [(500, "v1", 1)]))
    clone0 = source_table.clone_shallow(str(tmp_path / "dst0"), version=0)
    assert clone0.read(spark).count() == 100  # pre-append snapshot


def test_clone_carries_file_stats_for_skipping(spark, tmp_path, source_table):
    # Cluster by id so per-file ranges are disjoint and prunable.
    source_table.optimize(spark, cluster_by=("id",), target_files=4)
    clone = source_table.clone_shallow(str(tmp_path / "dst"))
    total = clone.scan_file_count()
    pruned = clone.scan_file_count(where=[("id", "<", 10)])
    assert pruned < total
    assert clone.read(spark, where=[("id", "<", 10)]).count() == 10


def test_clone_vacuum_cannot_damage_source(spark, tmp_path, source_table):
    src_files = _parquet_under(source_table.path)
    clone = source_table.clone_shallow(str(tmp_path / "dst"))
    clone.merge_keep_latest(
        spark,
        _df(spark, [(5, "updated", 2)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    removed = clone.vacuum(retention_seconds=0.0)
    assert removed == []  # every clone-root file is referenced by a commit
    assert _parquet_under(source_table.path) == src_files
    assert all(os.path.isfile(f) for f in src_files)


def test_reclone_replaces_destination(spark, tmp_path, source_table):
    dst = str(tmp_path / "dst")
    clone = source_table.clone_shallow(dst)
    clone.append(_df(spark, [(999, "local", 1)]))
    assert clone.read(spark).count() == 101
    # Re-clone resets the destination to the source's current snapshot.
    source_table.clone_shallow(dst)
    assert TxnLogTable(dst).read(spark).count() == 100


def test_clone_onto_itself_rejected(tmp_path, source_table):
    with pytest.raises(ValueError, match="must differ"):
        source_table.clone_shallow(source_table.path)
