"""Iceberg-format interop without the Iceberg package: the exporter
writes REAL v2 metadata (Avro manifest + manifest list via the JVM's
bundled avro library, metadata.json, version-hint), the reader replays
it, the validator enforces the spec against the bytes on disk with
pyarrow as the foreign parquet reader."""

from __future__ import annotations

import json
import os

import pytest

from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
    IcebergMetadataInvalid,
    _avro_read,
    _avro_write,
    _MANIFEST_FILE_SCHEMA,
    export_iceberg_snapshot,
    read_iceberg_snapshot,
    validate_iceberg_metadata,
)
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _source_table(spark, tmp_path):
    """Logical view diverges maximally from the physical files: renamed
    column, filled default, vectored-out row — same fixture discipline
    as the Delta interop tests."""
    t = TxnLogTable(str(tmp_path / "src"), stat_cols=("id",))
    t.create_or_replace(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "id long, v long, s string"
        )
    )
    t.rename_column("v", "amount")
    t.add_column(spark, "region", "string", "'emea'")
    t.delete_where_mor(spark, [("id", "=", 2)])
    return t


def test_export_validate_read_round_trip(spark, tmp_path):
    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice")
    man = export_iceberg_snapshot(t, spark, dest)
    assert man["n_rows"] == 2 and man["n_files"] >= 1

    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_rows"] == 2 and summary["n_manifests"] == 1

    got = {
        (r["id"], r["amount"], r["s"], r["region"])
        for r in read_iceberg_snapshot(spark, dest).collect()
    }
    want = {(r["id"], r["amount"], r["s"], r["region"]) for r in t.read(spark).collect()}
    assert got == want

    # Delete-free fast path: a clean snapshot reads as a PLAIN pruned
    # parquet scan — no _metadata (__fp/__pos) capture, no anti-join
    # machinery in the plan (those belong only to snapshots that carry
    # delete files; the shared live-row kernel still captures them there).
    plan = (
        read_iceberg_snapshot(spark, dest)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__fp" not in plan and "__pos" not in plan
    assert "row_index" not in plan
    assert "Join" not in plan


def test_manifest_carries_spec_field_ids_and_metadata(spark, tmp_path):
    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_ids")
    export_iceberg_snapshot(t, spark, dest)
    meta_dir = os.path.join(dest, "metadata")
    md = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    assert md["format-version"] == 2
    lschema, manifests, _ = _avro_read(spark, md["snapshots"][0]["manifest-list"])
    ids = {f["name"]: f["field-id"] for f in lschema["fields"]}
    assert ids["manifest_path"] == 500 and ids["added_snapshot_id"] == 503
    eschema, entries, mmeta = _avro_read(spark, manifests[0]["manifest_path"])
    assert mmeta["format-version"] == "2" and mmeta["content"] == "data"
    # the embedded iceberg schema uses the CURRENT logical names
    names = [f["name"] for f in json.loads(mmeta["schema"])["fields"]]
    assert names == ["id", "amount", "s", "region"]
    dids = {
        f["name"]: f["field-id"]
        for f in next(f for f in eschema["fields"] if f["name"] == "data_file")["type"]["fields"]
    }
    assert dids["file_path"] == 100 and dids["record_count"] == 103
    assert dids["content"] == 134


def test_validator_rejects_corruptions(spark, tmp_path):
    t = _source_table(spark, tmp_path)

    # missing data file — the victim must be a REFERENCED add (the
    # exporter can leave unreferenced empty part files behind, and
    # deleting one of those is not a corruption; picking from listdir
    # made this order-dependent under the full suite's partition config)
    d1 = str(tmp_path / "c1")
    export_iceberg_snapshot(t, spark, d1)
    md1 = json.load(open(os.path.join(d1, "metadata", "v1.metadata.json")))
    _, m1, _ = _avro_read(spark, md1["snapshots"][0]["manifest-list"])
    _, e1, _ = _avro_read(spark, m1[0]["manifest_path"])
    os.remove(e1[0]["data_file"]["file_path"])
    with pytest.raises(IcebergMetadataInvalid, match="missing|mismatches"):
        validate_iceberg_metadata(d1, spark)

    # unresolved current-snapshot-id
    d2 = str(tmp_path / "c2")
    export_iceberg_snapshot(t, spark, d2)
    mp = os.path.join(d2, "metadata", "v1.metadata.json")
    md = json.load(open(mp))
    md["current-snapshot-id"] = 777
    json.dump(md, open(mp, "w"))
    with pytest.raises(IcebergMetadataInvalid, match="current-snapshot-id"):
        validate_iceberg_metadata(d2, spark)

    # manifest_length lies after the manifest grows
    d3 = str(tmp_path / "c3")
    export_iceberg_snapshot(t, spark, d3)
    md = json.load(open(os.path.join(d3, "metadata", "v1.metadata.json")))
    _, manifests, _ = _avro_read(spark, md["snapshots"][0]["manifest-list"])
    with open(manifests[0]["manifest_path"], "ab") as fh:
        fh.write(b"x")
    with pytest.raises(IcebergMetadataInvalid, match="manifest_length"):
        validate_iceberg_metadata(d3, spark)


def test_reader_rejects_mislabeled_delete_manifest(spark, tmp_path):
    """A manifest-list row claiming content=1 while its entries carry
    data files (content=0) is spec-corrupt: the reader must refuse it,
    not silently treat the data files as deletes (or vice versa)."""
    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_del")
    export_iceberg_snapshot(t, spark, dest)
    md_path = os.path.join(dest, "metadata", "v1.metadata.json")
    md = json.load(open(md_path))
    _, manifests, _ = _avro_read(spark, md["snapshots"][0]["manifest-list"])
    row = dict(manifests[0])
    row["content"] = 1  # claims to be a delete manifest
    fake_list = os.path.join(dest, "metadata", "snap-fake.avro")
    _avro_write(spark, _MANIFEST_FILE_SCHEMA, [row], {"format-version": "2"}, fake_list)
    md["snapshots"][0]["manifest-list"] = fake_list
    json.dump(md, open(md_path, "w"))
    with pytest.raises(IcebergMetadataInvalid, match="data file in a delete manifest"):
        read_iceberg_snapshot(spark, dest)


def test_reader_refuses_delete_typed_file_in_data_manifest(spark, tmp_path):
    """A delete-typed data_file (content=2) inside a DATA manifest is a
    spec violation the reader refuses loudly (equality deletes are only
    legal in delete manifests, where the reader now APPLIES them)."""
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        _MANIFEST_ENTRY_SCHEMA,
        IcebergMetadataInvalid,
    )

    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_eq")
    export_iceberg_snapshot(t, spark, dest)
    md_path = os.path.join(dest, "metadata", "v1.metadata.json")
    md = json.load(open(md_path))
    list_path = md["snapshots"][0]["manifest-list"]
    _, manifests, _ = _avro_read(spark, list_path)
    mp = manifests[0]["manifest_path"]
    eschema, entries, mmeta = _avro_read(spark, mp)
    bad = json.loads(json.dumps(entries[0]))
    bad["data_file"]["content"] = 2  # EQUALITY_DELETES in a data manifest
    bad["data_file"]["equality_ids"] = {"array": [1]}
    _avro_write(spark, _MANIFEST_ENTRY_SCHEMA, [bad], mmeta, mp)
    with pytest.raises(IcebergMetadataInvalid, match="delete file in a data manifest"):
        read_iceberg_snapshot(spark, dest)


def test_export_decimal_and_temporal_types(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "typed"), stat_cols=("id",))
    t.create_or_replace(
        spark.sql(
            "SELECT id, CAST(id * 1.5 AS DECIMAL(12,2)) AS amt, "
            "DATE'2024-01-02' AS d, TIMESTAMP'2024-01-02 03:04:05' AS ts, "
            "id % 2 = 0 AS flag FROM range(5)"
        )
    )
    dest = str(tmp_path / "ice_typed")
    export_iceberg_snapshot(t, spark, dest)
    md = json.load(open(os.path.join(dest, "metadata", "v1.metadata.json")))
    types = {f["name"]: f["type"] for f in md["schemas"][0]["fields"]}
    assert types["amt"] == "decimal(12, 2)"
    assert types["d"] == "date" and types["ts"] == "timestamptz"
    assert types["flag"] == "boolean"
    validate_iceberg_metadata(dest, spark)
    got = {
        (r["id"], str(r["amt"]), str(r["d"]), r["flag"])
        for r in read_iceberg_snapshot(spark, dest).collect()
    }
    assert len(got) == 5


def test_append_snapshot_chain_and_time_travel(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        append_iceberg_snapshot,
    )

    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_chain")
    export_iceberg_snapshot(t, spark, dest)
    extra = spark.createDataFrame(
        [(9, 90, "z", "apac"), (10, 100, "w", "apac")],
        "id long, amount long, s string, region string",
    )
    man = append_iceberg_snapshot(extra, spark, dest)
    assert man["version"] == 2 and man["snapshot_id"] == 2 and man["n_rows"] == 2

    # the chain validates end to end (two manifests in the new list)
    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_manifests"] == 2 and summary["n_rows"] == 4
    md = json.load(open(os.path.join(dest, "metadata", "v2.metadata.json")))
    snap2 = next(s for s in md["snapshots"] if s["snapshot-id"] == 2)
    assert snap2["parent-snapshot-id"] == 1
    assert md["snapshot-log"][-1]["snapshot-id"] == 2

    # current read sees both commits; time travel sees only the first
    now = {r["id"] for r in read_iceberg_snapshot(spark, dest).collect()}
    assert now == {1, 3, 9, 10}
    old = {r["id"] for r in read_iceberg_snapshot(spark, dest, snapshot_id=1).collect()}
    assert old == {1, 3}
    with pytest.raises(ValueError, match="no snapshot 99"):
        read_iceberg_snapshot(spark, dest, snapshot_id=99)

    # schema mismatch refused
    bad = spark.createDataFrame([(1, "x")], "id long, wrong string")
    with pytest.raises(ValueError, match="append schema"):
        append_iceberg_snapshot(bad, spark, dest)


def test_positional_delete_commit_read_validate(spark, tmp_path):
    """The v2 MOR DELETE surface (VERDICT r8 item 4): delete_iceberg_rows
    writes REAL position-delete parquet + a delete manifest; the reader
    applies them; the validator accepts the chain and counts them; time
    travel to the pre-delete snapshot still sees every row."""
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        append_iceberg_snapshot,
        delete_iceberg_rows,
    )

    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_posdel")
    export_iceberg_snapshot(t, spark, dest)           # snapshot 1: ids 1,3
    append_iceberg_snapshot(                          # snapshot 2: +ids 4,5
        spark.createDataFrame(
            [(4, 40, "d", "apac"), (5, 50, "e", "apac")],
            "id long, amount long, s string, region string",
        ),
        spark,
        dest,
    )
    info = delete_iceberg_rows(spark, dest, "id IN (3, 4)")  # snapshot 3
    assert info["n_deleted_rows"] == 2 and info["snapshot_id"] == 3

    live = {r["id"] for r in read_iceberg_snapshot(spark, dest).collect()}
    assert live == {1, 5}
    # time travel: pre-delete snapshots are untouched
    assert {r["id"] for r in read_iceberg_snapshot(spark, dest, snapshot_id=2).collect()} == {1, 3, 4, 5}
    assert {r["id"] for r in read_iceberg_snapshot(spark, dest, snapshot_id=1).collect()} == {1, 3}

    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_delete_files"] >= 1
    assert summary["n_position_deletes"] == 2
    # the delete files carry the reserved spec field-ids in their parquet schema
    import glob

    import pyarrow.parquet as pq

    dfiles = glob.glob(os.path.join(dest, "data", "deletes-*", "*.parquet"))
    assert dfiles
    sch = pq.ParquetFile(dfiles[0]).schema_arrow
    fid = lambda name: sch.field(name).metadata.get(b"PARQUET:field_id")
    assert fid("file_path") == b"2147483546"
    assert fid("pos") == b"2147483545"


def test_positional_delete_sequence_rule(spark, tmp_path):
    """A delete file applies only to data files whose sequence number is
    <= its own: rows appended AFTER the delete survive even when they
    would match the deleted positions' key."""
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        append_iceberg_snapshot,
        delete_iceberg_rows,
    )

    t = TxnLogTable(str(tmp_path / "src2"), stat_cols=("id",))
    t.create_or_replace(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    dest = str(tmp_path / "ice_seq")
    export_iceberg_snapshot(t, spark, dest)             # seq 1: ids 1,2
    delete_iceberg_rows(spark, dest, "id = 2")          # seq 2 delete
    append_iceberg_snapshot(                            # seq 3: id 2 re-added
        spark.createDataFrame([(2, "b2")], "id long, s string"), spark, dest
    )
    rows = {(r["id"], r["s"]) for r in read_iceberg_snapshot(spark, dest).collect()}
    assert rows == {(1, "a"), (2, "b2")}, "post-delete append must not be re-deleted"


def test_delete_refuses_empty_match(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        delete_iceberg_rows,
    )

    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_empty")
    export_iceberg_snapshot(t, spark, dest)
    with pytest.raises(ValueError, match="matched no rows"):
        delete_iceberg_rows(spark, dest, "id = 999")
    # the refused commit must not have bumped the chain
    assert open(os.path.join(dest, "metadata", "version-hint.text")).read().strip() == "1"


def test_delete_refuses_already_dead_rows(spark, tmp_path):
    """Double-delete of the same key: the match scan sees LIVE rows only,
    so the second DELETE (which matches nothing alive) must raise instead
    of committing a redundant delete file — the falsifying example the
    multiset property test found (ops=[('delete', k), ('delete', k)])."""
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        delete_iceberg_rows,
        read_iceberg_snapshot,
    )

    t = _source_table(spark, tmp_path)
    dest = str(tmp_path / "ice_double_del")
    export_iceberg_snapshot(t, spark, dest)
    before = read_iceberg_snapshot(spark, dest).count()
    delete_iceberg_rows(spark, dest, "id = 1")
    assert read_iceberg_snapshot(spark, dest).count() == before - 1
    hint = os.path.join(dest, "metadata", "version-hint.text")
    v_after_first = open(hint).read().strip()
    with pytest.raises(ValueError, match="matched no rows"):
        delete_iceberg_rows(spark, dest, "id = 1")
    # the refused re-delete must not bump the chain or change the rows
    assert open(hint).read().strip() == v_after_first
    assert read_iceberg_snapshot(spark, dest).count() == before - 1


# ---------------------------------------------------------------------------
# equality deletes (v2 content=2): write, validate, apply with the
# strictly-less sequence rule
# ---------------------------------------------------------------------------


def _eq_table(spark, tmp_path, name="eqsrc"):
    t = TxnLogTable(str(tmp_path / name), stat_cols=("id",))
    t.create_or_replace(
        spark.createDataFrame(
            [(i, i * 10, "g" if i % 2 == 0 else "h") for i in range(1, 7)],
            "id long, v long, grp string",
        )
    )
    return t


def test_equality_delete_write_validate_read(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        delete_iceberg_rows_equality,
    )

    t = _eq_table(spark, tmp_path)
    dest = str(tmp_path / "ice_eqd")
    export_iceberg_snapshot(t, spark, dest)
    res = delete_iceberg_rows_equality(spark, dest, "grp = 'g'", ["id"])
    assert res["n_equality_keys"] == 3  # ids 2, 4, 6
    assert res["equality_ids"] == [1]  # id is schema field 1

    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_equality_delete_files"] == 1
    assert summary["n_equality_keys"] == 3
    assert summary["n_rows"] == 6  # data files untouched (MOR)

    got = {r["id"] for r in read_iceberg_snapshot(spark, dest).collect()}
    assert got == {1, 3, 5}
    # time travel to the pre-delete snapshot still sees every row
    md = json.load(open(os.path.join(dest, "metadata", "v2.metadata.json")))
    first = min(s["snapshot-id"] for s in md["snapshots"])
    assert {
        r["id"] for r in read_iceberg_snapshot(spark, dest, snapshot_id=first).collect()
    } == {1, 2, 3, 4, 5, 6}


def test_equality_delete_strictly_less_rule(spark, tmp_path):
    """Rows appended AFTER the equality delete survive even under
    matching keys — the spec's strict seq < rule, the property CDC
    upserts rely on (delete old key, append new row, same key)."""
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        append_iceberg_snapshot,
        delete_iceberg_rows_equality,
    )

    t = _eq_table(spark, tmp_path)
    dest = str(tmp_path / "ice_eqseq")
    export_iceberg_snapshot(t, spark, dest)
    delete_iceberg_rows_equality(spark, dest, "id IN (2, 4)", ["id"])
    # re-insert id 2 with a new value: the upsert's append half
    append_iceberg_snapshot(
        spark.createDataFrame([(2, 999, "g")], "id long, v long, grp string"),
        spark,
        dest,
    )
    got = {(r["id"], r["v"]) for r in read_iceberg_snapshot(spark, dest).collect()}
    assert (2, 999) in got  # appended after -> survives
    assert (2, 20) not in got and (4, 40) not in got  # pre-delete rows gone
    assert {i for i, _ in got} == {1, 2, 3, 5, 6}
    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_equality_delete_files"] == 1


def test_equality_delete_multi_column_key_and_position_mix(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        delete_iceberg_rows,
        delete_iceberg_rows_equality,
    )

    t = _eq_table(spark, tmp_path)
    dest = str(tmp_path / "ice_eqmix")
    export_iceberg_snapshot(t, spark, dest)
    # position delete id=1, then equality delete on the composite key
    delete_iceberg_rows(spark, dest, "id = 1")
    delete_iceberg_rows_equality(spark, dest, "id = 6 AND grp = 'g'", ["id", "grp"])
    got = {r["id"] for r in read_iceberg_snapshot(spark, dest).collect()}
    assert got == {2, 3, 4, 5}
    summary = validate_iceberg_metadata(dest, spark)
    assert summary["n_delete_files"] == 1 and summary["n_equality_delete_files"] == 1


def test_equality_delete_refusals(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.iceberg_export import (
        delete_iceberg_rows_equality,
    )

    t = _eq_table(spark, tmp_path)
    dest = str(tmp_path / "ice_eqbad")
    export_iceberg_snapshot(t, spark, dest)
    with pytest.raises(ValueError, match="matched no rows"):
        delete_iceberg_rows_equality(spark, dest, "id > 999", ["id"])
    with pytest.raises(ValueError, match="not in the table schema"):
        delete_iceberg_rows_equality(spark, dest, "id = 1", ["nope"])
