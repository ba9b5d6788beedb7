"""Generated columns (Delta GENERATED ALWAYS AS, re-derived) and
clustering-spec evolution (Iceberg partition-spec evolution / Delta ALTER
CLUSTER BY) on the txnlog table format: fill-on-omit, validate-on-provide,
recompute-on-update, metadata survival (checkpoint/restore/clone), and
mixed-generation layouts pruning correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import (
    CommitConflict,
    ConstraintViolation,
    TxnLogTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, amount LONG, tag STRING")


def _mk(spark, tmp_path, name="t"):
    t = TxnLogTable(str(tmp_path / name), stat_cols=("id",))
    t.create_or_replace(
        _df(spark, [(1, 10, "a10"), (2, 20, "a20")]).coalesce(1)
    )
    return t


def test_generated_column_fill_validate_and_reject(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    assert t.generated_columns() == {"tag": "concat('a', cast(amount as string))"}
    # omit the column on append: it is computed
    t.append(spark.createDataFrame([(3, 30)], "id long, amount long"))
    got = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert got[3] == "a30"
    # provide it consistently: accepted
    t.append(_df(spark, [(4, 40, "a40")]))
    # provide it inconsistently: rejected before any commit
    v = t.version()
    with pytest.raises(ConstraintViolation):
        t.append(_df(spark, [(5, 50, "WRONG")]))
    assert t.version() == v
    # declaring over rows that violate the rule is rejected
    with pytest.raises(ConstraintViolation):
        t.set_generated_column(spark, "id", "amount * 100")
    # unknown column is rejected
    with pytest.raises(ValueError):
        t.set_generated_column(spark, "nope", "amount")


def test_generated_column_merge_and_update_recompute(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    # COW merge source without the generated column: filled
    t.merge_keep_latest(
        spark,
        spark.createDataFrame([(1, 111), (9, 90)], "id long, amount long"),
        keys=("id",),
        order_by=[F.col("amount").desc()],
    )
    got = {r["id"]: (r["amount"], r["tag"]) for r in t.read(spark).collect()}
    assert got[1] == (111, "a111") and got[9] == (90, "a90")
    # MOR merge too
    t.merge_keep_latest_mor(
        spark,
        spark.createDataFrame([(2, 222)], "id long, amount long"),
        keys=("id",),
        order_by=[F.col("amount").desc()],
    )
    got = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert got[2] == "a222"
    # UPDATE of a generation input recomputes the derived value
    t.update_where_mor(spark, [("id", "=", 9)], {"amount": F.lit(99)})
    got = {r["id"]: (r["amount"], r["tag"]) for r in t.read(spark).collect()}
    assert got[9] == (99, "a99")
    # directly setting a generated column is refused
    with pytest.raises(ValueError):
        t.update_where_mor(spark, [("id", "=", 9)], {"tag": F.lit("x")})
    # replace_where fills the column and validates the region
    t.replace_where(
        spark,
        [("id", ">=", 100)],
        spark.createDataFrame([(100, 7)], "id long, amount long"),
    )
    got = {r["id"]: r["tag"] for r in t.read(spark).collect()}
    assert got[100] == "a7"


def test_generated_rules_survive_checkpoint_restore_clone(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.version()
    t.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    t.checkpoint()
    fresh = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    assert list(fresh.generated_columns()) == ["tag"]
    with pytest.raises(ConstraintViolation):
        fresh.append(_df(spark, [(5, 50, "WRONG")]))
    # clone carries the rule (and constraints travel with it)
    c = fresh.clone_shallow(str(tmp_path / "clone"))
    assert list(c.generated_columns()) == ["tag"]
    with pytest.raises(ConstraintViolation):
        c.append(_df(spark, [(6, 60, "NOPE")]))
    # restore to the pre-rule version rolls the rule back
    fresh.restore(v_before)
    assert fresh.generated_columns() == {}
    fresh.append(_df(spark, [(7, 70, "anything")]))  # no rule: accepted
    # rename/drop of involved columns is guarded while a rule exists
    t2 = _mk(spark, tmp_path, "t2")
    t2.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    with pytest.raises(ValueError):
        t2.rename_column("amount", "amt")
    with pytest.raises(ValueError):
        t2.drop_column("amount")
    # dropping the generated column itself drops its rule
    t2.drop_column("tag")
    assert t2.generated_columns() == {}
    # drop_generated_column_rule leaves the column as plain writable
    t3 = _mk(spark, tmp_path, "t3")
    t3.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    t3.drop_generated_column_rule("tag")
    t3.append(_df(spark, [(8, 80, "free")]))
    assert {r["tag"] for r in t3.read(spark).collect()} >= {"free"}


def test_append_conflicts_on_concurrent_set_generated(spark, tmp_path):
    """Same race class as ADD CONSTRAINT: a generation rule committed
    between an append's validation and its commit must re-trip validation."""
    t = _mk(spark, tmp_path)
    rv = t.version()
    t.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    with pytest.raises(CommitConflict):
        t.commit(adds=[], removes=[], operation="append", read_version=rv)


def test_clustering_spec_evolution_and_pruning(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "tc"), stat_cols=("id",))
    rows = [(i, i * 2, f"t{i}") for i in range(100)]
    t.create_or_replace(_df(spark, rows).coalesce(1))
    assert t.clustering() == []
    n_before = len(t.snapshot_files())
    # evolve the spec: only NEW files cluster by id
    t.set_clustering(["id"])
    assert t.clustering() == ["id"]
    # AQE coalesces a 100-row clustered shuffle into one partition; turn
    # coalescing off for the append so the spread is observable at test
    # scale (at real scale file sizing does this job).
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        t.append(_df(spark, [(i, i * 2, f"t{i}") for i in range(100, 200)]))
    finally:
        spark.conf.set(coalesce_key, prev)
    files_after = t.snapshot_files()
    assert len(files_after) > n_before + 1  # new generation actually spread
    # pruning: an equality probe in the NEW generation's range scans fewer
    # files than the total (old single file + a subset of new ones)
    assert t.scan_file_count(where=[("id", "=", 150)]) < len(files_after)
    got = [r["id"] for r in t.read(spark, where=[("id", "=", 150)]).collect()]
    assert got == [150]
    # old generation files untouched by the evolution
    assert set(t.snapshot_files()) >= set(
        f for f in files_after if f in t.snapshot_files()
    )
    # unknown clustering column rejected; rename remaps; restore rolls back
    with pytest.raises(ValueError):
        t.set_clustering(["nope"])
    v_spec = t.version()
    t.rename_column("id", "key_id")
    assert t.clustering() == ["key_id"]
    t.restore(v_spec)
    assert t.clustering() == ["id"]
    # clone carries the spec
    c = t.clone_shallow(str(tmp_path / "tc_clone"))
    assert c.clustering() == ["id"]


def test_drop_generated_rule_survives_concurrent_add(spark, tmp_path):
    """Replace-semantics clobber guard (same class as drop_constraint):
    a rule-drop built from a stale snapshot must conflict on a
    concurrently-added rule instead of silently wiping it."""
    t = _mk(spark, tmp_path)
    t.set_generated_column(spark, "tag", "concat('a', cast(amount as string))")
    rv = t.version()
    # a second rule lands concurrently
    t2 = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    t2.set_generated_column(spark, "id", "id")  # self-rule: trivially valid
    # commit-level: the stale drop conflicts
    with pytest.raises(CommitConflict):
        t.commit(
            adds=[], removes=[], operation="drop_generated",
            generated={}, read_version=rv,
        )
    # public API converges: drop 'tag', keep the concurrent 'id' rule
    t.drop_generated_column_rule("tag")
    assert list(t.generated_columns()) == ["id"]


def test_set_clustering_conflicts_on_concurrent_rename(spark, tmp_path):
    """A spec validated against a stale schema must not publish past a
    rename: commit-level conflict; the API retry re-validates (and
    errors loudly when the column is truly gone)."""
    t = _mk(spark, tmp_path)
    rv = t.version()
    t.rename_column("amount", "amt")
    with pytest.raises(CommitConflict):
        t.commit(
            adds=[], removes=[], operation="set_clustering",
            clustering=["amount"], read_version=rv,
        )
    # and the reverse direction: rename conflicts on intervening spec
    rv2 = t.version()
    t.set_clustering(["amt"])
    with pytest.raises(CommitConflict):
        t.commit(
            adds=[], removes=[], operation="rename_column",
            schema_json=t.snapshot_schema().json(), colmap={},
            read_version=rv2,
        )


def test_append_rewrites_when_generated_rules_change_mid_flight(spark, tmp_path):
    """A generated rule landing between an append's file write and its
    commit must not publish files computed under the superseded rule set
    — the retry rewrites them under the fresh rules."""
    path = str(tmp_path / "tr")
    t = TxnLogTable(path)
    t.create_or_replace(_df(spark, [(1, 10, "a10")]))
    writer = TxnLogTable(path)
    orig = writer._enforce_constraints
    calls = {"n": 0}

    def racy(df, constraints):
        orig(df, constraints)
        calls["n"] += 1
        if calls["n"] == 1:
            TxnLogTable(path).set_generated_column(
                spark, "tag", "concat('a', cast(amount as string))"
            )

    writer._enforce_constraints = racy
    # the append OMITS tag values consistent with... nothing: the frame
    # carries a WRONG tag for the new rule, so the retry must re-validate
    # and reject (first attempt's files are never published)
    with pytest.raises(ConstraintViolation):
        writer.append(_df(spark, [(2, 20, "WRONG")]))
    assert {r["id"] for r in t.read(spark).collect()} == {1}
    # a full-schema frame whose values happen to satisfy the incoming
    # rule: the first attempt's files were written under NO rules; the
    # commit conflicts on the intervening rule, and the retry detects
    # written_under != fresh generated set and REWRITES the files under
    # the fresh rules before publishing (the rewrite branch itself).
    path2 = str(tmp_path / "tr2")
    t2 = TxnLogTable(path2)
    t2.create_or_replace(_df(spark, [(1, 10, "b10")]))
    writer2 = TxnLogTable(path2)
    orig2 = writer2._enforce_constraints
    calls2 = {"n": 0}

    def racy2(df, constraints):
        orig2(df, constraints)
        calls2["n"] += 1
        if calls2["n"] == 1:
            TxnLogTable(path2).set_generated_column(
                spark, "tag", "concat('b', cast(amount as string))"
            )

    writer2._enforce_constraints = racy2
    writer2.append(_df(spark, [(3, 30, "b30")]))
    assert calls2["n"] >= 2  # the retry really re-validated
    got = {r["id"]: r["tag"] for r in t2.read(spark).collect()}
    assert got == {1: "b10", 3: "b30"}
    # and a frame that OMITS a still-unruled column fails the evolution
    # guard loudly (retryable) rather than publishing a half-schema file
    with pytest.raises(ValueError):
        t2_w = TxnLogTable(path2)
        t2_w.drop_generated_column_rule("tag")
        t2_w.append(spark.createDataFrame([(4, 40)], "id long, amount long"))


def test_create_or_replace_explicit_empty_cluster_and_spec_pruning(spark, tmp_path):
    """cluster_by=[] overrides the table spec (unclustered write), and a
    replace whose new schema lacks spec columns prunes the stored spec so
    later appends cannot crash on a vanished column."""
    t = TxnLogTable(str(tmp_path / "tcc"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, 10, "x"), (2, 20, "y")]).coalesce(1))
    t.set_clustering(["tag"])
    # explicit [] must not fall back to the spec
    t.create_or_replace(_df(spark, [(3, 30, "z")]), cluster_by=[])
    assert t.clustering() == ["tag"]  # spec itself survives
    # replace with a schema that DROPS the spec column: spec prunes
    t.create_or_replace(spark.createDataFrame([(4, 40)], "id long, amount long"))
    assert t.clustering() == []
    t.append(spark.createDataFrame([(5, 50)], "id long, amount long"))
    assert {r["id"] for r in t.read(spark).collect()} == {4, 5}
