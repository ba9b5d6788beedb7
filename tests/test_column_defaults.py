"""ALTER TABLE ADD COLUMN [...] DEFAULT on the txnlog format: metadata-only
add, existsDefault on historical files, fill-on-omit / DEFAULT-on-NULL on
every write path, literal-only validation, and survival through rename /
drop / restore / checkpoint / clone — the same interaction matrix the
generated-column and clustering features are held to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _mk(spark, tmp_path, rows=((1, 10), (2, 20))):
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    t.create_or_replace(spark.createDataFrame(list(rows), "id long, amount long"))
    return t


def test_add_column_default_backfills_history_and_fills_writes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.version()
    t.add_column(spark, "region", "string", "'emea'")
    # metadata-only: no data files were written by the add
    assert t.version() == v_before + 1
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    assert got == {1: "emea", 2: "emea"}  # existsDefault on old files
    # time travel to before the add: the column does not exist
    assert "region" not in t.read(spark, v_before).columns

    # append OMITTING the column: filled
    t.append(spark.createDataFrame([(3, 30)], "id long, amount long"))
    # append with explicit value: kept; with explicit NULL: DEFAULT-on-NULL
    t.append(
        spark.createDataFrame(
            [(4, 40, "apac"), (5, 50, None)],
            "id long, amount long, region string",
        )
    )
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    assert got == {1: "emea", 2: "emea", 3: "emea", 4: "apac", 5: "emea"}


def test_add_column_rejects_non_literal_duplicate_and_tombstoned(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="literal"):
        t.add_column(spark, "bad", "long", "amount + 1")  # column reference
    with pytest.raises(ValueError, match="already exists"):
        t.add_column(spark, "amount", "long", "0")
    t.add_column(spark, "gone", "long", "7")
    t.drop_column("gone")
    with pytest.raises(ValueError, match="previously dropped"):
        t.add_column(spark, "gone", "long", "8")  # resurrection guard


def test_default_through_dml_rewrites_and_optimize(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column(spark, "score", "long", "5")
    # MOR update of another column must not disturb the default view
    t.update_where_mor(spark, [("id", "=", 1)], {"amount": F.col("amount") + 1})
    # explicit update TO NULL reads back as the default (DEFAULT-on-NULL)
    t.update_where_mor(spark, [("id", "=", 2)], {"score": F.lit(None).cast("long")})
    t.optimize(spark, target_files=1)
    got = {r["id"]: (r["amount"], r["score"]) for r in t.read(spark).collect()}
    assert got == {1: (11, 5), 2: (20, 5)}
    # merge: source omitting the column gets the fill; keep-latest resolves
    t.merge_keep_latest_mor(
        spark,
        spark.createDataFrame([(2, 99), (6, 60)], "id long, amount long"),
        keys=("id",),
        order_by=[F.col("amount").desc()],
    )
    got = {r["id"]: (r["amount"], r["score"]) for r in t.read(spark).collect()}
    assert got == {1: (11, 5), 2: (99, 5), 6: (60, 5)}


def test_default_follows_rename_dies_with_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_column(spark, "tier", "string", "'bronze'")
    t.rename_column("tier", "level")
    assert t.column_defaults() == {"level": "'bronze'"}
    got = {r["id"]: r["level"] for r in t.read(spark).collect()}
    assert got == {1: "bronze", 2: "bronze"}
    t.drop_column("level")
    assert t.column_defaults() == {}
    assert "level" not in t.read(spark).columns


def test_default_survives_checkpoint_restore_clone(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_plain = t.version()
    t.add_column(spark, "region", "string", "'emea'")
    t.append(spark.createDataFrame([(3, 30)], "id long, amount long"))
    t.checkpoint()
    # reconstruction THROUGH the checkpoint keeps the default
    t2 = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    assert t2.column_defaults() == {"region": "'emea'"}
    got = {r["id"]: r["region"] for r in t2.read(spark).collect()}
    assert got == {1: "emea", 2: "emea", 3: "emea"}
    # clone carries the default with the snapshot
    c = t2.clone_shallow(str(tmp_path / "c"))
    assert c.column_defaults() == {"region": "'emea'"}
    assert {r["id"]: r["region"] for r in c.read(spark).collect()} == got
    # restore to the pre-add version rolls the default (and column) back
    t2.restore(v_plain)
    assert t2.column_defaults() == {}
    assert "region" not in t2.read(spark).columns
    # ... and restoring forward again brings both back
    t2.restore(v_plain + 2)
    assert t2.column_defaults() == {"region": "'emea'"}


def test_append_conflicts_on_concurrent_add_column_default(spark, tmp_path):
    """An append racing an ADD COLUMN DEFAULT must not publish files that
    lack the column-fill it never saw: the commit conflicts, the retry
    re-reads the fresh defaults set and rewrites."""
    t = _mk(spark, tmp_path)
    path = str(tmp_path / "t")

    calls = {"n": 0}
    orig = t._write_data

    def racy(df, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            # another writer lands the ADD COLUMN between this append's
            # snapshot read and its commit
            TxnLogTable(path, stat_cols=("id",)).add_column(
                spark, "region", "string", "'emea'"
            )
        return orig(df, **kw)

    t._write_data = racy
    t.append(spark.createDataFrame([(7, 70)], "id long, amount long"))
    assert calls["n"] >= 2  # the retry really re-filled and rewrote
    got = {r["id"]: r["region"] for r in t.read(spark).collect()}
    assert got == {1: "emea", 2: "emea", 7: "emea"}


def test_cdf_surfaces_default_not_null_for_pre_add_rows(spark, tmp_path):
    """table_changes must agree with reads at each endpoint version: a
    pre-add row's change rows carry the DEFAULT (what every read showed),
    not the physical NULL — and the default follows a rename in the feed
    exactly as it does on the read path."""
    t = _mk(spark, tmp_path)  # ids 1, 2 — written BEFORE the column exists
    v1 = t.version()
    t.add_column(spark, "region", "string", "'emea'")
    t.append(spark.createDataFrame([(3, 30)], "id long, amount long"))
    v2 = t.version()
    t.delete_where(spark, [("id", "=", 1)])  # deletes a PRE-ADD row
    v3 = t.version()
    cdf = {
        (r["id"], r["_change_type"]): r["region"]
        for r in t.table_changes(spark, v2, v3).collect()
    }
    assert cdf == {(1, "delete"): "emea"}  # not None

    # across the rename boundary the feed uses the AFTER name and the
    # default still fills pre-add physical NULLs
    t.rename_column("region", "zone")
    t.append(spark.createDataFrame([(4, 40)], "id long, amount long"))
    v4 = t.version()
    cdf = {
        (r["id"], r["_change_type"]): r["zone"]
        for r in t.table_changes(spark, v3, v4).collect()
    }
    assert cdf == {(4, "insert"): "emea"}

    # a span whose FROM version predates the column: the before side
    # genuinely had no such column, so its delete rows read NULL — the
    # same answer a read at v1 gave
    cdf = {
        (r["id"], r["_change_type"]): r["zone"]
        for r in t.table_changes(spark, v1, v4).collect()
    }
    assert cdf[(1, "delete")] is None
    assert cdf[(3, "insert")] == "emea" and cdf[(4, "insert")] == "emea"


def test_dv_delete_composes_with_defaults_in_read_and_cdf(spark, tmp_path):
    """VERDICT r7 item 7: the symmetric hole of the r7 NULL-vs-DEFAULT
    fix — a PRE-ADD row deleted via MOR deletion vectors AFTER an
    ``add_column ... DEFAULT``. ``_apply_dvs`` and ``_apply_defaults``
    must compose on both the read and CDF paths: live reads fill the
    default over the vectored file, and the delete image carries the
    FROM-version read value (NULL when the span starts before the column
    existed, the default once it did)."""
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("k",))
    t.create_or_replace(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    )
    v0 = t.version()
    t.add_column(spark, "d", "long", "7")
    v1 = t.version()
    t.delete_where_mor(spark, [("k", "=", 2)])
    v2 = t.version()

    # read path: the surviving pre-add rows fill the default THROUGH the
    # deletion vector
    assert sorted((r["k"], r["v"], r["d"]) for r in t.read(spark).collect()) == [
        (1, 10, 7),
        (3, 30, 7),
    ]
    # CDF: span starting BEFORE the column existed → delete image reads
    # NULL (what a read at v0 said); span starting AFTER → the default
    assert [
        (r["k"], r["_change_type"], r["d"])
        for r in t.table_changes(spark, v0, v2).collect()
    ] == [(2, "delete", None)]
    assert [
        (r["k"], r["_change_type"], r["d"])
        for r in t.table_changes(spark, v1, v2).collect()
    ] == [(2, "delete", 7)]


def test_drop_then_readd_different_default_with_dv_deletes(spark, tmp_path):
    """Drop the defaulted column, re-add under a DIFFERENT name/default
    (a brand-new physical column), then DV-delete a pre-everything row:
    reads fill the NEW default; the delete image shows the new default
    for spans after the re-add and NULL for spans from before the
    original column existed — never the dropped column's value."""
    t = TxnLogTable(str(tmp_path / "t2"), stat_cols=("k",))
    t.create_or_replace(
        spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    )
    v0 = t.version()
    t.add_column(spark, "d", "long", "7")
    t.delete_where_mor(spark, [("k", "=", 2)])
    t.drop_column("d")
    t.add_column(spark, "d2", "long", "9")
    v3 = t.version()
    t.delete_where_mor(spark, [("k", "=", 1)])
    v4 = t.version()

    assert sorted((r["k"], r["v"], r["d2"]) for r in t.read(spark).collect()) == [
        (3, 30, 9)
    ]
    assert "d" not in t.read(spark).columns
    # span after the re-add: pre-everything row reads d2=9 at v3 (same
    # physical column as now), so its delete image carries 9
    assert [
        (r["k"], r["_change_type"], r["d2"])
        for r in t.table_changes(spark, v3, v4).collect()
    ] == [(1, "delete", 9)]
    # span from v0: neither d nor d2 existed — both delete images NULL,
    # emitted under the AFTER schema (d2, not d)
    rows = t.table_changes(spark, v0, v4).collect()
    assert sorted((r["k"], r["_change_type"], r["d2"]) for r in rows) == [
        (1, "delete", None),
        (2, "delete", None),
    ]
    assert "d" not in rows[0].asDict()
