"""Metadata tables over the transaction log: file manifest + detail."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, payload STRING")


def test_file_manifest_rows_and_stats(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(i, f"p{i}") for i in range(50)]).repartition(4))
    m = t.file_manifest(spark)
    rows = m.collect()
    assert len(rows) == len(t.snapshot_files())
    assert sum(r["n_rows"] for r in rows) == 50
    assert all(r["size_bytes"] > 0 for r in rows)
    # Per-file id bounds land in the manifest as queryable JSON.
    bounds = [json.loads(r["stats_json"]).get("id") for r in rows]
    assert all(b is not None and b[0] <= b[1] for b in bounds)
    # It is a real DataFrame: aggregates compose.
    assert m.agg(F.sum("n_rows")).collect()[0][0] == 50


def test_detail_summary_tracks_commits(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "t"), stat_cols=("id",))
    t.create_or_replace(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    d = t.detail()
    assert d["version"] == 1
    assert d["num_files"] == 2
    assert d["num_rows"] == 2
    assert d["size_bytes"] > 0
    assert d["stat_cols"] == ["id"]
    # Time travel applies to the metadata tables too.
    assert t.detail(version=0)["num_files"] == 1


def test_manifest_on_shallow_clone_reports_source_files(spark, tmp_path):
    src = TxnLogTable(str(tmp_path / "src"), stat_cols=("id",))
    src.create_or_replace(_df(spark, [(i, "x") for i in range(10)]))
    clone = src.clone_shallow(str(tmp_path / "dst"))
    m = clone.file_manifest(spark).collect()
    assert len(m) == len(src.snapshot_files())
    assert all(r["size_bytes"] > 0 for r in m)  # absolute refs resolve
