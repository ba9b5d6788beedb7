"""Transaction-log table format (S7/M1): atomic versioned commits,
file-granular copy-on-write MERGE, time travel, exactly-once by txn id,
conflict detection, compaction, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import (
    CommitConflict,
    TxnLogSink,
    TxnLogTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, payload STRING, version INT")


def test_create_append_read_and_versions(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t1"))
    assert not t.exists()
    v0 = t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    v1 = t.append(_df(spark, [(3, "c", 1)]))
    assert (v0, v1) == (0, 1)
    got = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create_or_replace", "append"]


def test_merge_rewrites_only_hit_files(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t2"))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(10, "x", 1), (11, "y", 1)]).coalesce(1))
    files_before = t.snapshot_files()
    assert len(files_before) == 2
    untouched = files_before[1]  # the appended file: ids 10/11, no match below

    t.merge_keep_latest(
        spark,
        _df(spark, [(2, "b2", 2), (5, "e", 2)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    got = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b2", 5: "e", 10: "x", 11: "y"}
    after = set(t.snapshot_files())
    # the file without matched keys carried over BY REFERENCE
    assert untouched in after
    # the hit file was rewritten out of the snapshot
    assert files_before[0] not in after


def test_time_travel_and_history(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t3"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.merge_keep_latest(
        spark, _df(spark, [(1, "a2", 2)]), keys=["id"],
        order_by=[F.col("version").desc()],
    )
    assert t.read(spark, version=0).collect()[0]["payload"] == "a"
    assert t.read(spark, version=1).collect()[0]["payload"] == "a2"
    with pytest.raises(ValueError, match="does not exist"):
        t.read(spark, version=9)


def test_exactly_once_by_txn_id(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t4"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 1)]), app_txn_id="batch-7")
    t.append(_df(spark, [(2, "b", 1)]), app_txn_id="batch-7")  # duplicate delivery
    assert t.read(spark).count() == 2
    assert len(t.history()) == 2


def test_write_write_conflict_detected(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t5"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))
    rv = t.version()
    victim = t.snapshot_files()[0]
    t.optimize(spark, target_files=1)  # concurrent winner removes `victim`
    with pytest.raises(CommitConflict):
        t.commit(adds=[], removes=[victim], operation="merge", read_version=rv)


def test_optimize_compacts_and_keeps_history(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t6"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(3, "c", 1)]).coalesce(1))
    pre = t.version()
    t.optimize(spark, target_files=1)
    assert len(t.snapshot_files()) == 1
    assert t.read(spark).count() == 3
    # pre-compaction snapshot still resolves its own files
    assert t.read(spark, version=pre).count() == 3


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t7"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    orphans, _ = t._write_data(_df(spark, [(9, "z", 1)]))  # aborted writer
    removed = t.vacuum(retention_seconds=0.0)
    # every orphan goes; vacuum may ALSO sweep zero-row part files that
    # _write_data excluded from adds (they are unreferenced by design)
    assert set(orphans) <= set(removed)
    assert not any(f in removed for f in t.snapshot_files())
    assert t.read(spark).count() == 1  # committed data untouched


def test_vacuum_retention_protects_inflight_writers(spark, tmp_path):
    """Default retention: unreferenced-but-fresh directories survive — a
    writer that finished _write_data but hasn't published its commit yet
    must not lose its files to a concurrent vacuum."""
    t = TxnLogTable(str(tmp_path / "t7b"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    inflight, stats = t._write_data(_df(spark, [(9, "z", 2)]))
    assert t.vacuum() == []  # default 1 h retention: nothing deleted
    # the in-flight writer can still publish and its files resolve
    t.commit(adds=inflight, removes=[], operation="append", stats=stats)
    assert t.read(spark).count() == 2


def test_stray_log_file_does_not_brick_table(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t7c"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    with open(os.path.join(t.log_dir, "metadata.json"), "w") as f:
        f.write("{}")  # hand-dropped artifact, not a version file
    assert t.read(spark).count() == 1
    assert t.append(_df(spark, [(2, "b", 1)])) == 1


def test_schema_evolution_backfills_null(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t8"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    wide = spark.createDataFrame(
        [(2, "b", 1, "extra")], "id LONG, payload STRING, version INT, note STRING"
    )
    t.append(wide)
    rows = {r["id"]: r["note"] for r in t.read(spark).collect()}
    assert rows == {1: None, 2: "extra"}


def test_txnlog_sink_contract(spark, tmp_path):
    """The S7 TableSink contract driven end-to-end by the log-backed
    implementation — same scenario the ParquetDirSink contract test runs."""
    table = str(tmp_path / "orders_t")
    sink = TxnLogSink()
    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 2)], "id long, payload string, version int"
    )
    sink.create_or_replace(base, table)
    updates = spark.createDataFrame(
        [(2, "b2", 2), (4, "d", 1)], "id long, payload string, version int"
    )
    sink.merge_keep_latest(
        spark, table, updates, keys=["id"], order_by=[F.col("version").desc()]
    )
    got = {r["id"]: r["payload"] for r in sink.read(spark, table).collect()}
    assert got == {1: "a", 2: "b2", 3: "c", 4: "d"}
    # the log is the source of truth: no staging/retired directories at all
    assert os.path.isdir(os.path.join(table, "_txnlog"))
    assert not os.path.exists(table + "__staging")


def test_streaming_foreachbatch_exactly_once_into_txnlog(spark, tmp_path):
    """T6 ∘ S7: a streaming foreachBatch sink committing each micro-batch
    with an epoch-derived txn id — redelivered batches (at-least-once
    upstream) land exactly once in the log."""
    src, ckpt, table = (str(tmp_path / x) for x in ("src", "ckpt", "t_stream"))
    df = spark.range(0, 100).select("id", (F.col("id") % 7).alias("k"))
    df.filter("id < 50").coalesce(1).write.parquet(src + "/b0")
    df.filter("id >= 50").coalesce(1).write.parquet(src + "/b1")
    t = TxnLogTable(table)
    batches = []

    def commit_batch(bdf, bid):
        batches.append(bid)
        t.append(bdf, app_txn_id=f"epoch-{bid}")
        t.append(bdf, app_txn_id=f"epoch-{bid}")  # simulated redelivery

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
        .writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert t.read(spark).count() == 100  # no duplicated rows
    assert len(t.history()) == len(batches)  # one commit per epoch


def test_merge_prunes_files_by_key_stats(spark, tmp_path):
    """Data skipping: with stat_cols on, a file whose recorded [min, max]
    key range is disjoint from the source's key range is excluded from the
    MERGE scan entirely — and the merge result is still exact."""
    t = TxnLogTable(str(tmp_path / "t9"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(100, "x", 1), (101, "y", 1)]).coalesce(1))
    files = t.snapshot_files()
    stats = t._file_stats()
    assert stats[files[0]]["id"] == [1, 2]
    assert stats[files[1]]["id"] == [100, 101]

    source = _df(spark, [(2, "b2", 2), (3, "c", 2)])
    # the high-range file is pruned before any scan happens
    assert t._prune_by_stats(files, source, ["id"]) == [files[0]]

    t.merge_keep_latest(spark, source, keys=["id"], order_by=[F.col("version").desc()])
    got = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b2", 3: "c", 100: "x", 101: "y"}
    assert files[1] in set(t.snapshot_files())  # untouched by reference


def test_merge_fully_pruned_becomes_pure_insert(spark, tmp_path):
    """Source keys entirely outside every file's range: zero files scanned
    or rewritten — the MERGE degenerates to an insert commit."""
    t = TxnLogTable(str(tmp_path / "t10"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    before = set(t.snapshot_files())
    t.merge_keep_latest(
        spark, _df(spark, [(50, "z", 2)]), keys=["id"],
        order_by=[F.col("version").desc()],
    )
    assert before <= set(t.snapshot_files())  # nothing rewritten
    got = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    assert got == {1: "a", 50: "z"}


def test_concurrent_append_conflicts_with_merge(spark, tmp_path):
    """A replacing commit (MERGE) built on a stale snapshot must conflict
    when ANY intervening commit changed the file set — a concurrent append
    may hold rows for keys the merge already resolved."""
    t = TxnLogTable(str(tmp_path / "t11"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    rv = t.version()
    victim = t.snapshot_files()[0]
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))  # concurrent append wins
    with pytest.raises(CommitConflict, match="changed the file set"):
        t.commit(adds=[], removes=[victim], operation="merge", read_version=rv)
    # blind appends are unaffected by the same interleaving
    t.append(_df(spark, [(3, "c", 1)]))
    assert t.read(spark).count() == 3


@pytest.mark.slow
def test_checkpoint_reconstruction_matches_full_replay(spark, tmp_path):
    """A checkpoint + tail replay must reconstruct the identical snapshot a
    full log replay would: files, stats, schema, txn ids."""
    t = TxnLogTable(str(tmp_path / "c1"), stat_cols=("id",), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    for i in range(2, 6):
        t.append(_df(spark, [(i, f"p{i}", 1)]).coalesce(1), app_txn_id=f"b{i}")
    full = t._state()
    t.checkpoint()
    t.append(_df(spark, [(9, "tail", 1)]).coalesce(1))  # commit after the checkpoint

    fresh = TxnLogTable(str(tmp_path / "c1"), stat_cols=("id",))
    assert fresh._checkpoint_info() is not None
    state = fresh._state()
    assert list(state["active"])[:-1] == list(full["active"])
    assert state["schema"] == full["schema"]
    assert state["txn_ids"] == full["txn_ids"] == {f"b{i}" for i in range(2, 6)}
    got = {r["id"]: r["payload"] for r in fresh.read(spark).collect()}
    assert got == {1: "a", 2: "p2", 3: "p3", 4: "p4", 5: "p5", 9: "tail"}
    # stats survived the checkpoint round-trip (data skipping still works)
    assert all("id" in s for s in state["stats"].values())
    assert len(state["stats"]) == len(state["active"])


def test_auto_checkpoint_every_interval(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "c2"), checkpoint_interval=3)
    t.create_or_replace(_df(spark, [(0, "a", 1)]))
    assert t._checkpoint_info() is None
    for i in range(1, 4):
        t.append(_df(spark, [(i, "x", 1)]))
    cp = t._checkpoint_info()
    assert cp is not None and cp[0] == 3
    for i in range(4, 7):
        t.append(_df(spark, [(i, "x", 1)]))
    assert t._checkpoint_info()[0] == 6  # pointer advanced to the next one


def test_exactly_once_survives_log_expiry(spark, tmp_path):
    """The txn-id set rides the checkpoint: a duplicate delivery whose
    original commit JSON was expired is STILL a no-op."""
    t = TxnLogTable(str(tmp_path / "c3"), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 1)]), app_txn_id="epoch-1")
    t.checkpoint()
    expired = t.expire_log()
    assert expired == [0]
    t.append(_df(spark, [(2, "b", 1)]), app_txn_id="epoch-1")  # redelivery
    assert t.read(spark).count() == 2


def test_expired_time_travel_raises_but_tail_versions_work(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "c4"), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 1)]))
    t.append(_df(spark, [(3, "c", 1)]))
    t.checkpoint(2)
    t.expire_log()
    t.append(_df(spark, [(4, "d", 1)]))
    assert t.read(spark, version=2).count() == 3  # checkpoint version itself
    assert t.read(spark, version=3).count() == 4  # checkpoint + tail
    with pytest.raises(ValueError, match="expired"):
        t.read(spark, version=1)


def test_vacuum_keeps_checkpoint_referenced_files_after_expiry(spark, tmp_path):
    """Files whose adding commit was expired are referenced only through
    the checkpoint's active list — vacuum must keep them."""
    t = TxnLogTable(str(tmp_path / "c5"), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 1)]))
    t.checkpoint()
    t.expire_log()
    assert t.vacuum(retention_seconds=0.0) == []  # nothing falsely orphaned
    assert t.read(spark).count() == 2


def test_corrupt_checkpoint_pointer_degrades_to_replay(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "c6"), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.checkpoint()
    with open(os.path.join(t.log_dir, "_last_checkpoint"), "w") as f:
        f.write("not json")
    assert t.read(spark).count() == 1  # full replay still works


def test_table_changes_insert_update_delete_shapes(spark, tmp_path):
    """CDF between versions: an upserted key surfaces as delete+insert, a
    new key as insert; untouched rows in carried-over files never appear."""
    t = TxnLogTable(str(tmp_path / "cdc1"))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(10, "x", 1)]).coalesce(1))  # separate file, no matches
    t.merge_keep_latest(
        spark,
        _df(spark, [(2, "b2", 2), (5, "e", 2)]),
        keys=["id"],
        order_by=[F.col("version").desc()],
    )
    changes = {
        (r["id"], r["_change_type"]): r["payload"]
        for r in t.table_changes(spark, 1, 2).collect()
    }
    # id=1 was rewritten unchanged into the merge's new file (COW carry-over
    # inside a touched file): the multiset diff cancels it out of the feed.
    assert changes == {
        (2, "delete"): "b",  # old image of the updated key
        (2, "insert"): "b2",  # new image
        (5, "insert"): "e",  # pure insert
    }
    # the appended-only window is a pure insert feed
    assert {
        (r["id"], r["_change_type"]) for r in t.table_changes(spark, 0, 1).collect()
    } == {(10, "insert")}


def test_table_changes_optimize_is_a_noop_feed(spark, tmp_path):
    """Compaction rewrites files but changes no rows — the multiset diff
    cancels and the change feed is empty."""
    t = TxnLogTable(str(tmp_path / "cdc2"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))
    v_pre = t.version()
    t.optimize(spark, target_files=1)
    assert t.table_changes(spark, v_pre, t.version()).count() == 0


def test_optimize_tolerates_concurrent_append(spark, tmp_path):
    """Compaction is row-preserving: a concurrent blind append must NOT
    conflict it (Delta's OPTIMIZE-vs-append rule) — the appended file simply
    carries over."""
    t = TxnLogTable(str(tmp_path / "t12"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))
    rv = t.version()
    files = t.snapshot_files()
    t.append(_df(spark, [(3, "c", 1)]).coalesce(1))  # concurrent append
    # replay optimize's commit against the stale snapshot: succeeds
    df = spark.read.schema(t.snapshot_schema(rv)).parquet(
        *[str(tmp_path / "t12" / f) for f in files]
    ).coalesce(1)
    adds, stats = t._write_data(df)
    t.commit(adds=adds, removes=files, operation="optimize", read_version=rv, stats=stats)
    got = {r["id"]: r["payload"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_read_skips_files_by_stats(spark, tmp_path):
    """READ-path data skipping: a range predicate prunes files whose
    recorded [min, max] cannot satisfy it — fewer files scanned, identical
    values to filtering a full scan."""
    t = TxnLogTable(str(tmp_path / "t13"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(100, "x", 1), (101, "y", 1)]).coalesce(1))
    t.append(_df(spark, [(200, "p", 1), (201, "q", 1)]).coalesce(1))
    assert t.scan_file_count() == 3

    where = [("id", ">=", 100), ("id", "<", 200)]
    assert t.scan_file_count(where=where) == 1
    pruned = t.read(spark, where=where)
    # the scan truly opens only the one surviving file
    assert len(pruned.inputFiles()) == 1
    full = t.read(spark).filter((F.col("id") >= 100) & (F.col("id") < 200))
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in full.collect()
    ) == [100, 101]

    # equality predicate; and a file with no stats is always kept
    assert t.scan_file_count(where=[("id", "=", 2)]) == 1
    t2 = TxnLogTable(str(tmp_path / "t13b"))  # no stat_cols: nothing prunable
    t2.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    assert t2.scan_file_count(where=[("id", "=", 99)]) == 1
    assert t2.read(spark, where=[("id", "=", 99)]).count() == 0  # residual filter


def test_optimize_cluster_by_tightens_stats_and_pruning(spark, tmp_path):
    """OPTIMIZE+zorder composition: interleaved key ranges across files mean
    a range probe prunes nothing; after optimize(cluster_by) the rewritten
    files hold disjoint key slices, so the same probe prunes most files."""
    t = TxnLogTable(str(tmp_path / "t14"), stat_cols=("id",))
    # every file spans the whole key range -> no pruning possible
    t.create_or_replace(_df(spark, [(1, "a", 1), (900, "z", 1)]).coalesce(1))
    t.append(_df(spark, [(2, "b", 1), (901, "y", 1)]).coalesce(1))
    t.append(_df(spark, [(3, "c", 1), (902, "x", 1)]).coalesce(1))
    probe = [("id", "<=", 3)]
    assert t.scan_file_count(where=probe) == 3

    v = t.optimize(spark, target_files=3, cluster_by=["id"])
    assert t.snapshot_files() and t.version() == v
    after = t.scan_file_count(where=probe)
    assert after < 3  # clustering made the probe selective
    got = {r["id"]: r["payload"] for r in t.read(spark, where=probe).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # row set unchanged by the rewrite
    assert t.read(spark).count() == 6
    # time travel to the pre-optimize layout still works
    assert t.read(spark, version=v - 1).count() == 6


def test_optimize_morton_prunes_on_every_dimension(spark, tmp_path):
    """True z-order vs linear clustering: after linear cluster_by=(x, y) a
    y-only probe prunes nothing (every x-slice spans all y); after Morton
    clustering the same probe prunes files, and x probes still prune too."""
    rows = [(x, y, x * 32 + y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x INT, y INT, pk INT")

    lin = TxnLogTable(str(tmp_path / "lin"), stat_cols=("x", "y"))
    lin.create_or_replace(df)
    lin.optimize(spark, target_files=16, cluster_by=["x", "y"])
    zor = TxnLogTable(str(tmp_path / "zor"), stat_cols=("x", "y"))
    zor.create_or_replace(df)
    zor.optimize(spark, target_files=16, cluster_by=["x", "y"], morton=True)

    y_probe = [("y", "<", 4)]
    lin_files, zor_files = lin.scan_file_count(), zor.scan_file_count()
    assert lin.scan_file_count(where=y_probe) == lin_files  # no pruning
    assert zor.scan_file_count(where=y_probe) < zor_files / 2
    # leading-dimension probes prune under BOTH layouts
    x_probe = [("x", "<", 4)]
    assert lin.scan_file_count(where=x_probe) < lin_files
    assert zor.scan_file_count(where=x_probe) < zor_files
    # values are layout-independent
    got = sorted(r["pk"] for r in zor.read(spark, where=y_probe).collect())
    want = sorted(x * 32 + y for x in range(32) for y in range(4))
    assert got == want


def test_morton_key_bit_interleave_exact(spark):
    """Spot-check the interleave arithmetic against hand-computed codes on
    an identity quantization range [0, 65535]."""
    from telecom_dataengineering_pipeline_spark.sources.writers import morton_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a INT, b INT"
    )
    bounds = {"a": (0, 65535), "b": (0, 65535)}
    got = [
        r["z"]
        for r in df.select(morton_key(["a", "b"], bounds).alias("z")).collect()
    ]

    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]


def test_append_rejects_incompatible_schema_evolution(spark, tmp_path):
    """M4 discipline: appends may ADD nullable columns (null-backfill) but a
    type change or dropped column would corrupt reads of old files under
    the as-of schema — rejected loudly, create_or_replace is the rewrite
    path."""
    t = TxnLogTable(str(tmp_path / "t15"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="type change"):
        t.append(
            spark.createDataFrame(
                [("2", "b", 1)], "id STRING, payload STRING, version INT"
            )
        )
    with pytest.raises(ValueError, match="drop column"):
        t.append(spark.createDataFrame([(2, "b")], "id LONG, payload STRING"))
    # additive evolution still works (and replace may retype freely)
    t.append(
        spark.createDataFrame(
            [(2, "b", 1, "x")], "id LONG, payload STRING, version INT, extra STRING"
        )
    )
    assert t.read(spark).count() == 2
    t.create_or_replace(
        spark.createDataFrame([("9", "z", 1)], "id STRING, payload STRING, version INT")
    )
    assert t.read(spark).collect()[0]["id"] == "9"


@pytest.mark.slow
def test_maintenance_plan_flags_small_files_log_tail_and_orphans(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t16"), checkpoint_interval=3)
    for i in range(5):  # five tiny single-file commits
        t.append(_df(spark, [(i, "x", 1)]).coalesce(1))
    # orphan: a written-but-never-committed data dir
    t._write_data(_df(spark, [(99, "orphan", 1)]).coalesce(1))
    plan = {p["action"]: p for p in t.maintenance_plan()}
    assert plan["optimize"]["n_small"] == 5
    assert plan["expire_log"]["n_expirable"] >= 1  # commits predate the auto-checkpoint
    assert plan["vacuum"]["n_orphans"] >= 1
    # acting on the plan clears it
    t.optimize(spark, target_files=1)
    t.expire_log()
    t.vacuum(retention_seconds=0)
    actions = {p["action"] for p in t.maintenance_plan()}
    assert "vacuum" not in actions and "expire_log" not in actions


def test_delete_where_rewrites_only_candidate_files(spark, tmp_path):
    """COW DELETE: files whose stats exclude the predicate carry over BY
    REFERENCE; only candidates are rewritten without their matches; a
    provably-empty delete is a version no-op."""
    t = TxnLogTable(str(tmp_path / "t17"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    t.append(_df(spark, [(100, "x", 1), (101, "y", 1)]).coalesce(1))
    t.append(_df(spark, [(200, "p", 1), (201, "q", 1)]).coalesce(1))
    before = t.snapshot_files()

    v = t.delete_where(spark, [("id", ">=", 100), ("id", "<", 200)])
    after = set(t.snapshot_files())
    assert before[0] in after and before[2] in after  # untouched by reference
    assert before[1] not in after  # the candidate file was rewritten away
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == [1, 2, 200, 201]
    # time travel still sees the deleted rows
    assert t.read(spark, version=v - 1).count() == 6
    # the change feed records exactly the deletions
    feed = t.table_changes(spark, v - 1, v).collect()
    assert sorted((r["id"], r["_change_type"]) for r in feed) == [
        (100, "delete"),
        (101, "delete"),
    ]
    # predicate provably outside every file: no new version
    assert t.delete_where(spark, [("id", ">=", 10_000)]) == v


def test_delete_conflicts_with_concurrent_append(spark, tmp_path):
    """Serializability: a concurrent append may add rows matching the
    predicate — replaying the delete against its stale snapshot must
    conflict, like MERGE."""
    t = TxnLogTable(str(tmp_path / "t18"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    rv = t.version()
    files = t.snapshot_files()
    t.append(_df(spark, [(2, "b", 1)]).coalesce(1))  # concurrent append
    kept = t.read(spark, version=rv).filter(F.col("id") != 1)
    adds, stats = t._write_data(kept)
    with pytest.raises(CommitConflict):
        t.commit(adds=adds, removes=files, operation="delete", read_version=rv, stats=stats)


@pytest.mark.slow
def test_concurrent_appenders_all_land_exactly_once(spark, tmp_path):
    """Optimistic-concurrency stress: many threads blind-append with
    version-collision retries; every row lands exactly once, versions are
    contiguous, and every historical snapshot stays readable."""
    import threading

    t = TxnLogTable(str(tmp_path / "t19"), checkpoint_interval=5)
    t.create_or_replace(_df(spark, [(0, "seed", 1)]).coalesce(1))
    errors = []

    def worker(wid: int):
        try:
            # each worker its own handle (no shared commit cache needed,
            # but same-process sharing must also be safe)
            h = TxnLogTable(str(tmp_path / "t19"))
            for j in range(3):
                rid = 100 * wid + j
                h.append(
                    _df(spark, [(rid, f"w{wid}", 1)]).coalesce(1),
                    app_txn_id=f"w{wid}-{j}",
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(6)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    ids = sorted(r["id"] for r in t.read(spark).collect())
    assert ids == sorted([0] + [100 * w + j for w in range(6) for j in range(3)])
    # 1 create + 18 appends, contiguous versions
    assert t.version() == 18
    # duplicate redelivery of every txn id is a global no-op
    for w in range(6):
        t.append(_df(spark, [(999, "dup", 1)]).coalesce(1), app_txn_id=f"w{w}-0")
    assert t.read(spark).count() == 19
    # historical snapshots (pre- and post-checkpoint) reconstruct
    assert t.read(spark, version=0).count() == 1
    assert t.read(spark, version=9).count() == 10


def test_change_feed_replicates_table_exactly(spark, tmp_path):
    """CDC replication: applying each version's table_changes to a replica
    (insert images added, delete images subtracted as a multiset) keeps the
    replica row-identical to the base through create/append/merge/delete —
    the downstream-sync contract the change feed exists for."""
    base = TxnLogTable(str(tmp_path / "cdc_base"), stat_cols=("id",))
    base.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    base.append(_df(spark, [(3, "c", 1)]).coalesce(1))
    base.merge_keep_latest(
        spark, _df(spark, [(2, "b2", 2), (4, "d", 2)]), keys=["id"],
        order_by=[F.col("version").desc()],
    )
    base.delete_where(spark, [("id", "=", 1)])

    replica = None  # maintained purely from feeds
    for v in range(0, base.version() + 1):
        feed = base.table_changes(spark, max(v - 1, 0) if v else -1, v)
        ins = feed.filter("_change_type = 'insert'").drop("_change_type")
        dels = feed.filter("_change_type = 'delete'").drop("_change_type")
        replica = ins if replica is None else replica.unionByName(ins).exceptAll(dels)

    want = sorted(map(tuple, base.read(spark).collect()))
    got = sorted(map(tuple, replica.collect()))
    assert got == want


def test_merge_with_empty_or_null_key_source_scans_nothing(spark, tmp_path):
    """NULL source key bounds (empty source or all-null keys) prove no file
    can match: zero candidates, zero scans, and the merge degenerates to
    inserting whatever non-matching rows exist."""
    t = TxnLogTable(str(tmp_path / "t20"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    files = t.snapshot_files()

    empty = spark.createDataFrame([], "id LONG, payload STRING, version INT")
    assert t._prune_by_stats(files, empty, ["id"]) == []
    t.merge_keep_latest(spark, empty, keys=["id"], order_by=[F.col("version").desc()])
    assert set(files) <= set(t.snapshot_files())  # nothing rewritten
    assert t.read(spark).count() == 2

    nullkeys = spark.createDataFrame(
        [(None, "n", 9)], "id LONG, payload STRING, version INT"
    )
    assert t._prune_by_stats(t.snapshot_files(), nullkeys, ["id"]) == []


def test_restore_rolls_back_by_reference_and_keeps_history(spark, tmp_path):
    """RESTORE: a historical version's file set becomes active again as a
    NEW commit — no data copied, bad versions stay readable, stats travel
    with the re-added files, and a redundant restore is a no-op."""
    t = TxnLogTable(str(tmp_path / "t21"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))
    good = t.version()
    t.merge_keep_latest(  # the "bad" write
        spark, _df(spark, [(1, "CORRUPT", 2)]), keys=["id"],
        order_by=[F.col("version").desc()],
    )
    bad = t.version()
    v = t.restore(good)
    assert v == bad + 1  # a new commit, not history rewriting
    assert {r["payload"] for r in t.read(spark).collect()} == {"a", "b"}
    # forensics: the bad version still reads
    assert "CORRUPT" in {r["payload"] for r in t.read(spark, version=bad).collect()}
    # stats came back with the re-added file: a disjoint probe prunes it
    assert t.scan_file_count(where=[("id", ">=", 100)]) == 0
    # vacuum keeps every referenced file; all versions still read
    t.vacuum(retention_seconds=0)
    assert t.read(spark, version=good).count() == 2
    assert t.read(spark, version=bad).count() == 2
    # idempotent: restoring to where we already are is a version no-op
    assert t.restore(v) == v
    assert t.restore(good) == v


def test_null_count_stats_skip_isnull_predicates(spark, tmp_path):
    """nullCount skipping: IS NULL prunes files with zero nulls; IS NOT
    NULL prunes all-null files; results stay exact via the residual
    filter."""
    t = TxnLogTable(str(tmp_path / "t22"), stat_cols=("payload",))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 1)]).coalesce(1))  # 0 nulls
    t.append(_df(spark, [(3, None, 1), (4, None, 1)]).coalesce(1))  # all null
    t.append(_df(spark, [(5, "c", 1), (6, None, 1)]).coalesce(1))  # mixed

    assert t.scan_file_count() == 3
    assert t.scan_file_count(where=[("payload", "isnull")[0:2] + (None,)]) == 2
    assert t.scan_file_count(where=[("payload", "isnotnull", None)]) == 2
    got = sorted(r["id"] for r in t.read(spark, where=[("payload", "isnull", None)]).collect())
    assert got == [3, 4, 6]
    got = sorted(r["id"] for r in t.read(spark, where=[("payload", "isnotnull", None)]).collect())
    assert got == [1, 2, 5]
    # range skipping still works alongside (min/max ignore nulls)
    assert t.scan_file_count(where=[("payload", ">=", "c")]) == 1


def test_timestamp_time_travel(spark, tmp_path):
    """Delta's timestampAsOf: resolve the snapshot a reader at time T saw
    — the last commit at-or-before T."""
    t = TxnLogTable(str(tmp_path / "tt"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.append(_df(spark, [(2, "b", 1)]))
    t.append(_df(spark, [(3, "c", 1)]))
    hist = t.history()
    ts1 = hist[1]["timestamp"]  # just after the first append
    assert t.version_at_timestamp(ts1) == 1
    got = {r["id"] for r in t.read(spark, as_of_timestamp=ts1).collect()}
    assert got == {1, 2}
    # Far future resolves to the latest; before creation raises.
    assert t.version_at_timestamp(hist[-1]["timestamp"] + 10**9) == 2
    with pytest.raises(ValueError):
        t.version_at_timestamp(hist[0]["timestamp"] - 1)
    with pytest.raises(ValueError):
        t.read(spark, version=1, as_of_timestamp=ts1)


def test_check_constraints_enforced_on_every_write_path(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.txnlog import (
        ConstraintViolation,
    )

    t = TxnLogTable(str(tmp_path / "tc"))
    t.create_or_replace(_df(spark, [(1, "a", 1), (2, "b", 2)]))
    t.add_constraint(spark, "version_positive", "version > 0")
    assert list(t.constraints()) == ["version_positive"]
    # ADD CONSTRAINT validates existing rows first.
    with pytest.raises(ConstraintViolation):
        t.add_constraint(spark, "impossible", "version > 100")
    # Every write path validates: append, merge (COW + MOR), replace_where,
    # update; a passing write goes through untouched.
    with pytest.raises(ConstraintViolation):
        t.append(_df(spark, [(3, "c", 0)]))
    with pytest.raises(ConstraintViolation):
        t.merge_keep_latest(
            spark, _df(spark, [(1, "a2", -1)]), keys=("id",),
            order_by=[F.col("version").desc()],
        )
    with pytest.raises(ConstraintViolation):
        t.merge_keep_latest_mor(
            spark, _df(spark, [(1, "a2", -1)]), keys=("id",),
            order_by=[F.col("version").desc()],
        )
    with pytest.raises(ConstraintViolation):
        t.replace_where(
            spark, [("id", ">=", 2)], _df(spark, [(2, "b2", 0)])
        )
    with pytest.raises(ConstraintViolation):
        t.update_where_mor(spark, [("id", "=", 1)], {"version": F.lit(-5)})
    t.append(_df(spark, [(3, "c", 3)]))
    assert t.read(spark).count() == 3
    # SQL CHECK semantics: NULL predicate result passes, FALSE violates.
    t2 = TxnLogTable(str(tmp_path / "tnull"))
    t2.create_or_replace(
        spark.createDataFrame([(1, None)], "id long, v string")
    )
    t2.add_constraint(spark, "v_short", "length(v) < 5")  # NULL passes
    t2.append(spark.createDataFrame([(2, None)], "id long, v string"))
    with pytest.raises(ConstraintViolation):
        t2.append(spark.createDataFrame([(3, "toolong")], "id long, v string"))
    # Constraints survive checkpoint + fresh-instance reconstruction and
    # create_or_replace; drop removes enforcement.
    t.checkpoint()
    fresh = TxnLogTable(str(tmp_path / "tc"))
    with pytest.raises(ConstraintViolation):
        fresh.create_or_replace(_df(spark, [(9, "z", 0)]))
    fresh.drop_constraint("version_positive")
    fresh.append(_df(spark, [(4, "d", 0)]))
    assert fresh.read(spark).count() == 4


# ---------------------------------------------------------------------------
# Round-5 concurrency + typing hardening (ADVICE r4): bloom type guard,
# append-vs-ADD-CONSTRAINT race, drop_constraint clobber, restore rollback
# of the constraint set.
# ---------------------------------------------------------------------------


def test_bloom_index_skips_non_int_string_columns(spark, tmp_path):
    """A bloom over a double column would hash Spark's cast-to-string
    ('57.0') while an int probe hashes '57' — falsely proving absence and
    silently pruning files that DO match. The write side therefore refuses
    to index non-int/string columns at all; min/max stats still prune."""
    t = TxnLogTable(
        str(tmp_path / "tb"),
        stat_cols=("d", "k"),
        bloom_cols=("d", "k"),  # d is double: must be skipped structurally
    )
    t.create_or_replace(
        spark.createDataFrame([(57.0, 57), (3.5, 3)], "d double, k long").coalesce(1)
    )
    stats = t._file_stats()
    for fs in stats.values():
        blooms = fs.get("__bloom") or {}
        assert "d" not in blooms  # double: never indexed
        assert "k" in blooms  # long: indexed
    # And the read path still finds the row by its double value.
    got = t.read(spark, where=[("d", "=", 57.0)]).collect()
    assert [r["k"] for r in got] == [57]


def test_append_conflicts_on_concurrent_add_constraint(spark, tmp_path):
    """The race ADVICE r4 flagged: a constraint committed between append's
    validation snapshot and its commit must fail the append's first commit
    attempt (its rows were never validated against the new predicate) —
    the retry then re-validates and REJECTS violating rows instead of
    silently publishing them."""
    path = str(tmp_path / "tr")
    t = TxnLogTable(path)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))

    # Interleave deterministically: the first _enforce_constraints call
    # (append's pre-write validation) lands a concurrent ADD CONSTRAINT
    # right after validating against the OLD (empty) set.
    writer = TxnLogTable(path)
    orig = writer._enforce_constraints
    calls = {"n": 0}

    def racy(df, constraints):
        orig(df, constraints)
        calls["n"] += 1
        if calls["n"] == 1:
            TxnLogTable(path).add_constraint(spark, "pos", "version > 0")

    writer._enforce_constraints = racy
    from telecom_dataengineering_pipeline_spark.sources.txnlog import (
        ConstraintViolation,
    )

    with pytest.raises(ConstraintViolation):
        writer.append(_df(spark, [(2, "b", -1)]))  # violates the new check
    # Nothing published: the table still holds only the original row.
    assert {r["id"] for r in t.read(spark).collect()} == {1}
    # A NON-violating append retries through the same conflict and lands.
    calls["n"] = 0
    writer2 = TxnLogTable(path)
    orig2 = writer2._enforce_constraints

    def racy2(df, constraints):
        orig2(df, constraints)
        calls["n"] += 1
        if calls["n"] == 1:
            TxnLogTable(path).add_constraint(spark, "id_pos", "id > 0")

    writer2._enforce_constraints = racy2
    writer2.append(_df(spark, [(3, "c", 3)]))
    assert {r["id"] for r in t.read(spark).collect()} == {1, 3}


def test_append_commit_level_constraint_conflict(spark, tmp_path):
    """Commit-layer pin: an 'append' commit with a stale read_version
    conflicts when a constraints-carrying commit intervened."""
    t = TxnLogTable(str(tmp_path / "tcl"))
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    rv = t.version()
    t.add_constraint(spark, "pos", "version > 0")
    with pytest.raises(CommitConflict):
        t.commit(adds=[], removes=[], operation="append", read_version=rv)


def test_drop_constraint_survives_concurrent_add(spark, tmp_path):
    """drop_constraint re-applies the drop to the FRESH set on conflict:
    a concurrently-added constraint is preserved, not clobbered."""
    path = str(tmp_path / "tdc")
    t = TxnLogTable(path)
    t.create_or_replace(_df(spark, [(1, "a", 1)]))
    t.add_constraint(spark, "c1", "version > 0")
    rv = t.version()
    t.add_constraint(spark, "c2", "id > 0")
    # Commit-layer: stale drop conflicts instead of clobbering c2.
    with pytest.raises(CommitConflict):
        t.commit(
            adds=[], removes=[], operation="drop_constraint",
            constraints={}, read_version=rv,
        )
    # The public API converges: c1 drops, c2 survives.
    t.drop_constraint("c1")
    assert list(t.constraints()) == ["c2"]


def test_restore_rolls_back_constraints(spark, tmp_path):
    """RESTORE across a constraint change rolls the constraint set back
    with the snapshot (Delta restores table metadata): the restored rows
    are governed by the constraints they were written under."""
    t = TxnLogTable(str(tmp_path / "trc"))
    t.create_or_replace(_df(spark, [(1, "a", 0)]))  # version == 0 row
    v0 = t.version()
    # The v0 row violates this, so it must be added AFTER a delete.
    t.delete_where(spark, [("version", "=", 0)])
    t.add_constraint(spark, "pos", "version > 0")
    assert list(t.constraints()) == ["pos"]
    # Restore to v0: the row with version==0 comes back, and the
    # constraint that would reject it rolls back with the snapshot.
    t.restore(v0)
    assert t.constraints() == {}
    assert {r["id"] for r in t.read(spark).collect()} == {1}
    # A later write is validated against the RESTORED (empty) set.
    t.append(_df(spark, [(2, "b", 0)]))
    assert t.read(spark).count() == 2
    # No-op detection counts constraints: restoring to a version that
    # differs ONLY in constraints still publishes a commit.
    t2 = TxnLogTable(str(tmp_path / "trc2"))
    t2.create_or_replace(_df(spark, [(1, "a", 1)]))
    t2.add_constraint(spark, "pos", "version > 0")
    v_before = t2.version()
    t2.restore(0)
    assert t2.version() == v_before + 1
    assert t2.constraints() == {}


@pytest.mark.slow
def test_commit_cache_lru_bounded(spark, tmp_path):
    """A long-lived driver scanning many versions keeps O(cap) parsed
    commits in memory, evicting least-recently-touched first."""
    t = TxnLogTable(str(tmp_path / "lru"), checkpoint_interval=0)
    t.create_or_replace(_df(spark, [(1, "a", 1)]).coalesce(1))
    for i in range(7):
        t.append(_df(spark, [(10 + i, "x", 1)]).coalesce(1))
    fresh = TxnLogTable(str(tmp_path / "lru"), checkpoint_interval=0)
    fresh._commit_cache_cap = 4
    fresh.history()  # touches every version
    assert len(fresh._commit_cache) <= 4
    # Most-recent touches survive; reads still work for evicted versions.
    assert 0 not in fresh._commit_cache
    assert fresh._read_commit(0)["operation"] == "create_or_replace"
    assert {r["id"] for r in fresh.read(spark, version=1).collect()} == {1, 10}
