"""Columnar/row format dispatch beyond parquet (SURVEY §2.1 source tier).

The reference lands parquet only (its other inputs are Kafka frames and
CSV seeds); a drop-in engine additionally meets pipelines mid-migration,
so the write/read policies (compression, hive partitioning, explicit
schema on read) are format-parametric:

- **orc**: the second columnar format Spark ships natively — same
  predicate pushdown (SearchArguments), column pruning, and hive
  partition pruning as parquet; zlib compression by default (the ORC
  ecosystem norm).
- **json / csv**: row-oriented landing/interchange formats. ALWAYS read
  with an explicit schema here: schema inference scans the data once
  before the real read — a silent full extra pass at 100 TB — and infers
  unstable types across shards.

Parquet keeps its dedicated path in ``writers.py`` (hive layout,
compaction, clustering); this module covers the format seam itself.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_DEFAULT_COMPRESSION = {
    "parquet": "snappy",
    "orc": "zlib",
    "json": "gzip",
    "csv": "gzip",
}

FORMATS = tuple(_DEFAULT_COMPRESSION)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    w = df.write.mode(mode).format(fmt).option(
        "compression", compression or _DEFAULT_COMPRESSION[fmt]
    )
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {FORMATS})")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(
            f"{fmt} reads require an explicit schema: inference is a full "
            "extra pass over the data and type-unstable across shards"
        )
    if fmt == "csv":
        r = r.option("header", "true")
    return r.load(path)


def read_json_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Landing-zone JSON read that QUARANTINES malformed lines instead of
    failing the job or silently dropping them: PERMISSIVE mode parses what
    it can, and any line that doesn't parse (or doesn't match the schema)
    lands whole in ``corrupt_col`` with every data column NULL. Callers
    split on ``corrupt_col IS NULL`` — clean rows continue, quarantined
    raw lines go to a dead-letter sink for replay. At 100 TB of scraped
    or vendor-fed JSON, a single bad line must never kill a 6-hour job
    (FAILFAST) or vanish without audit (DROPMALFORMED)."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = schema.add(corrupt_col, "string")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
