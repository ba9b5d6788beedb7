"""Column mapping for the txnlog format (Delta column-mapping mode):
RENAME/DROP COLUMN as metadata-only commits — physical parquet names
never change, so historical files, per-file stats, blooms, and deletion
vectors keep working under any later logical naming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _table(spark, path):
    t = TxnLogTable(str(path), stat_cols=("k",))
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") % 7).cast("long").alias("v")
    )
    t.create_or_replace(df.repartitionByRange(3, "k").sortWithinPartitions("k"))
    return t


def test_rename_is_metadata_only_and_everything_keeps_working(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    files0 = set(t.snapshot_files())
    v0 = t.version()
    t.rename_column("v", "value")
    t.rename_column("k", "key")
    # No data moved; logical schema renamed; time travel shows old names.
    assert set(t.snapshot_files()) == files0
    assert t.read(spark).columns == ["key", "value"]
    assert t.read(spark, version=v0).columns == ["k", "v"]
    # Stats recorded under the physical name still prune via the NEW name.
    assert t.scan_file_count(where=[("key", "<", 5)]) == 1
    assert sorted(r["key"] for r in t.read(spark, where=[("key", "<", 5)]).collect()) == [0, 1, 2, 3, 4]
    # Every DML path works through the mapping: append under new names,
    # MOR delete/update, COW merge — and mixed old/new files coexist.
    t.append(spark.createDataFrame([(100, 9)], "key long, value long"))
    t.delete_where_mor(spark, [("key", "=", 100)])
    t.update_where_mor(spark, [("key", "=", 3)], {"value": F.lit(77)})
    t.merge_keep_latest(
        spark,
        spark.createDataFrame([(0, 999), (200, 1)], "key long, value long"),
        keys=("key",),
        order_by=[F.col("value").desc()],
    )
    got = {r["key"]: r["value"] for r in t.read(spark).collect()}
    assert got[0] == 999 and got[3] == 77 and got[200] == 1 and 100 not in got
    assert len(got) == 61
    # OPTIMIZE rewrites under the mapping and the result stays readable.
    t.optimize(spark, target_files=1, cluster_by=("key",))
    assert t.read(spark).count() == 61


def test_rename_guards_conflicts_and_constraints(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("v", "k")  # collision
    t.add_constraint(spark, "v_small", "v < 1000")
    with pytest.raises(ValueError):
        t.rename_column("v", "value")  # constraint still binds old name
    t.drop_constraint("v_small")
    t.rename_column("v", "value")
    assert t.read(spark).columns == ["k", "value"]
    # A writer holding the PRE-RENAME logical schema fails loudly instead
    # of silently undoing the rename (evolution guard re-checked per try).
    with pytest.raises(ValueError):
        t.append(spark.createDataFrame([(1, 1)], "k long, v long"))


def test_drop_column_hides_tombstones_and_time_travels(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    v0 = t.version()
    t.drop_column("v")
    assert t.read(spark).columns == ["k"]
    assert t.read(spark, version=v0).columns == ["k", "v"]  # bytes still there
    # True resurrection blocked: re-adding the SAME physical name would
    # surface pre-drop values out of old files.
    with pytest.raises(ValueError):
        t.append(spark.createDataFrame([(999, 1)], "k long, v long"))
    # ...but a renamed-then-dropped column's LOGICAL name is reusable: its
    # physical name differs, old files simply backfill NULL.
    t2 = _table(spark, tmp_path / "t2")
    t2.rename_column("v", "value")
    t2.drop_column("value")  # tombstones physical 'v', not 'value'
    t2.append(spark.createDataFrame([(999, 5)], "k long, value long"))
    got = {r["k"]: r["value"] for r in t2.read(spark).collect()}
    assert got[999] == 5 and got[0] is None  # old rows: NULL, never old 'v'
    # The last remaining column can never be dropped.
    t2.drop_column("value")
    with pytest.raises(ValueError):
        t2.drop_column("k")


def test_mapping_survives_checkpoint_and_clone(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("k",), checkpoint_interval=2)
    t.create_or_replace(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, v long").coalesce(1)
    )
    t.rename_column("v", "value")
    t.append(spark.createDataFrame([(3, 30)], "k long, value long"))
    t.append(spark.createDataFrame([(4, 40)], "k long, value long"))
    assert t._checkpoint_info() is not None
    fresh = TxnLogTable(str(tmp_path / "t"), stat_cols=("k",))
    assert fresh.read(spark).columns == ["k", "value"]
    assert {r["k"]: r["value"] for r in fresh.read(spark).collect()} == {
        1: 10, 2: 20, 3: 30, 4: 40,
    }
    clone = t.clone_shallow(str(tmp_path / "dst"))
    assert clone.read(spark).columns == ["k", "value"]
    assert clone.read(spark).count() == 4


def test_restore_rolls_mapping_back_and_collision_guard(spark, tmp_path):
    """Second-review regression pins: (1) RESTORE across a rename/drop
    restores the MAPPING with the schema (else the restored logical name
    resolves to a physical that no file has and silently reads NULL);
    (2) evolution cannot add a column whose name is the physical storage
    name behind a rename; (3) concurrent metadata commits conflict rather
    than silently stomping each other."""
    from telecom_dataengineering_pipeline_spark.sources.txnlog import (
        CommitConflict,
    )

    t = _table(spark, tmp_path / "t")
    t.rename_column("v", "w")
    v_renamed = t.version()
    t.drop_column("w")
    t.restore(v_renamed)
    got = {r["k"]: r["w"] for r in t.read(spark).collect()}
    assert got[0] == 0 and got[8] == 1  # real values, not a NULL column
    # (2) appending a new column named after the occupied physical 'v'
    # must be refused with the guard's error, not a deep Spark failure.
    with pytest.raises(ValueError, match="physical storage name"):
        t.append(
            spark.createDataFrame([(999, 1, 2)], "k long, w long, v long")
        )
    # (3) a rename racing another metadata commit conflicts.
    rv = t.version()
    t.rename_column("w", "w2")
    with pytest.raises(CommitConflict):
        t.commit(
            adds=[], removes=[], operation="rename_column",
            schema_json=t.snapshot_schema().json(), colmap={}, read_version=rv,
        )


def test_in_predicate_reads_and_deletes_with_skipping(spark, tmp_path):
    t = _table(spark, tmp_path / "t")  # 3 range-clustered files over k
    got = sorted(
        r["k"] for r in t.read(spark, where=[("k", "in", [3, 41, 59])]).collect()
    )
    assert got == [3, 41, 59]
    # All probe values in one file's range: the other two files skip.
    assert t.scan_file_count(where=[("k", "in", [1, 5, 9])]) == 1
    assert t.scan_file_count(where=[("k", "in", [])]) == 0
    t.delete_where_mor(spark, [("k", "in", [3, 41, 59])])
    assert t.read(spark).count() == 57
