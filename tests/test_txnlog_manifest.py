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


def test_bloom_index_prunes_point_lookups_minmax_cannot(spark, tmp_path):
    """Per-file bloom words (Delta bloomFilterIndex shape): a hash layout
    makes every file's [min, max] span the whole key range — min/max
    skipping is useless for point probes — but the bloom proves absence
    per file, and the probe is pure metadata (no Spark job)."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable

    t = TxnLogTable(
        str(tmp_path / "t"), stat_cols=("k",), bloom_cols=("k",)
    )
    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.create_or_replace(df.repartition(3, "k"))  # hash: ranges all overlap
    assert len(t.snapshot_files()) == 3
    # min/max alone keeps all 3 files for any in-range point probe...
    probe = [("k", "=", 57)]
    st = t._file_stats()
    assert all("__bloom" in (st[f] or {}) for f in t.snapshot_files())
    # ...the bloom narrows it to the one file actually holding the key.
    assert t.scan_file_count(where=probe) == 1
    got = t.read(spark, where=probe).collect()
    assert [(r["k"], r["v"]) for r in got] == [(57, 114)]
    # A key outside the table proves absent in EVERY file: zero-file read.
    assert t.scan_file_count(where=[("k", "=", 10_000)]) == 0
    assert t.read(spark, where=[("k", "=", 10_000)]).count() == 0
    # Range predicates ignore the bloom (min/max territory), stay exact.
    assert t.read(spark, where=[("k", ">=", 58)]).count() == 2
    # Blooms survive OPTIMIZE's stat re-collection and a MOR delete.
    t.delete_where_mor(spark, [("k", "=", 57)])
    assert t.read(spark, where=probe).count() == 0
    t.optimize(spark, target_files=2)
    assert all(
        "__bloom" in (s or {}) for s in t._file_stats().values()
    )
    assert t.read(spark, where=[("k", "=", 41)]).count() == 1
