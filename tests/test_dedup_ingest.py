"""End-to-end dedup-at-ingest: streaming foreachBatch probes each new
document batch against the txnlog-persisted LSH index, flags near-dups of
earlier batches, and extends the index by appending — the corpus text is
tokenized once, never rescanned, and retried batches are no-ops."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from telecom_dataengineering_pipeline_spark.streaming.dedup_ingest import DedupIngestLoop
import pytest

_SCHEMA = "doc_id LONG, text STRING"

_BASE = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"
_NEAR_DUP = _BASE.rsplit(" ", 1)[0] + " november"  # last token swapped

_BATCHES = [
    [(1, _BASE), (2, "one completely different sentence about topographic maps")],
    [(10, "unrelated middle batch text with enough tokens to shingle fine")],
    [(20, _NEAR_DUP), (21, "another unrelated closing document mentioning nothing shared")],
]


def _stage_source(spark, src_dir: str) -> None:
    """One parquet file per batch, mtimes ordered so maxFilesPerTrigger=1
    replays them as three micro-batches in order."""
    os.makedirs(src_dir, exist_ok=True)
    for i, rows in enumerate(_BATCHES):
        tmp = os.path.join(src_dir, f"_stage{i}")
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


@pytest.mark.slow
def test_stream_flags_cross_batch_near_dups_with_time_travel(spark, tmp_path):
    src = str(tmp_path / "src")
    _stage_source(spark, src)
    loop = DedupIngestLoop(str(tmp_path / "tables"), threshold=0.5)
    schema = StructType.fromDDL(_SCHEMA)
    q = loop.start(
        spark, src, schema, checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(120)

    # all docs admitted; index holds every doc's bands
    assert sorted(r["doc_id"] for r in loop.docs.read(spark).collect()) == [1, 2, 10, 20, 21]
    assert set(r["doc_id"] for r in loop.banded.read(spark).select("doc_id").distinct().collect()) == {1, 2, 10, 20, 21}

    # exactly the batch-3 near-dup of the batch-1 doc is flagged
    flags = loop.flags.read(spark).collect()
    assert [(r["batch_doc"], r["index_doc"], r["batch_id"]) for r in flags] == [(20, 1, 2)]
    assert flags[0]["jaccard"] >= 0.5

    # the index time-travels: version 0 is exactly the batch-1 state
    v0 = loop.banded.read(spark, version=0).select("doc_id").distinct().collect()
    assert set(r["doc_id"] for r in v0) == {1, 2}
    assert len(loop.banded.history()) == 3  # create + 2 appends

    # probing never touches corpus text: a fresh probe's scan list is the
    # narrow index tables only
    ix = loop.banded.read(spark)
    assert ix.inputFiles() and all("lsh_banded" in f for f in ix.inputFiles())

    # at-least-once retry of an already-committed batch is a per-table no-op
    before = (
        loop.flags.read(spark).count(),
        loop.banded.read(spark).count(),
        loop.shingles.read(spark).count(),
        loop.docs.read(spark).count(),
    )
    retry_df = spark.createDataFrame(_BATCHES[2], _SCHEMA)
    loop.process_batch(retry_df, 2)
    after = (
        loop.flags.read(spark).count(),
        loop.banded.read(spark).count(),
        loop.shingles.read(spark).count(),
        loop.docs.read(spark).count(),
    )
    assert before == after
