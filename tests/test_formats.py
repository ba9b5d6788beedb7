"""Format seam (sources/formats.py): ORC/JSON/CSV roundtrips preserve
values, ORC gets pushdown + partition pruning like parquet, and
schema-less row-format reads are refused (no silent inference pass)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.formats import (
    read_table,
    write_table,
)

_SCHEMA = "id LONG, grp STRING, amt DOUBLE"


def _df(spark):
    return spark.createDataFrame(
        [(i, "ab"[i % 2], float(i) / 4) for i in range(100)], _SCHEMA
    )


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_roundtrip_preserves_values(spark, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_table(_df(spark), path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=_SCHEMA)
    want = sorted((r["id"], r["grp"], r["amt"]) for r in _df(spark).collect())
    got = sorted((r["id"], r["grp"], r["amt"]) for r in back.collect())
    assert got == want


def test_orc_pushdown_and_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "orc_part")
    write_table(_df(spark), path, fmt="orc", partition_by=["grp"])
    df = read_table(spark, path, fmt="orc").filter(
        (F.col("grp") == "a") & (F.col("id") > 50)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(id,50)" in plan
    assert "PartitionFilters" in plan  # grp=a pruned at the directory level
    assert df.count() == 24  # ids 52..98 even


def test_schemaless_row_format_read_refused(spark, tmp_path):
    path = str(tmp_path / "j")
    write_table(_df(spark), path, fmt="json")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, fmt="json")
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(_df(spark), path, fmt="avro")


def test_permissive_json_quarantines_corrupt_lines(spark, tmp_path):
    from telecom_dataengineering_pipeline_spark.sources.formats import (
        read_json_permissive,
    )

    p = tmp_path / "landing"
    p.mkdir()
    (p / "part1.json").write_text(
        '{"id": 1, "v": "ok"}\n'
        "{this is not json at all\n"
        '{"id": "not-a-number", "v": "type-mismatch"}\n'
        '{"id": 3, "v": "fine"}\n'
    )
    df = read_json_permissive(spark, str(p), "id LONG, v STRING")
    clean = df.filter(F.col("_corrupt_record").isNull())
    quarantined = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    bad = [r["_corrupt_record"] for r in quarantined.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)
    # quarantined rows carry NULL data columns, never partial garbage
    assert all(r["id"] is None for r in quarantined.collect())
