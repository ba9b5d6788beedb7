"""Dedup-at-ingest: the production loop the incremental LSH pieces were
built for (SURVEY.md §2 LLM tier; reference has no analog — its streaming
path stops at bronze landing, ``kafka_to_bronze.py``).

Each micro-batch of new documents is probed for near-duplicates against the
ALREADY-INGESTED corpus before being admitted, and the corpus's LSH index
is extended by exactly the batch's rows:

- The index is two narrow txnlog tables (banded ``(doc_id, n_shingles,
  band, bucket)`` buckets + hashed shingle stream) — each batch APPENDS its
  own rows, so a document is tokenized/hashed exactly once in its lifetime
  and no probe ever rescans corpus text. At 100 TB the per-batch cost is
  O(batch) hashing plus a hash join against the bucket table.
- Every table write in the batch carries the same ``app_txn_id`` derived
  from the streaming batch id, so foreachBatch's at-least-once retries
  degrade to no-ops per table (txnlog exactly-once) — a retried batch
  can't double-insert index rows, docs, or flags.
- The txnlog gives the index time travel for free: ``read(version=N)``
  reproduces the index exactly as any historical batch saw it (audit /
  replay).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..llmprep.dedup import _probe_verified_pairs, lsh_index_tables
from ..sources.txnlog import TxnLogTable
from ..lineage import lineage_cut

_FLAG_SCHEMA = "batch_doc LONG, index_doc LONG, jaccard DOUBLE, batch_id LONG"


class DedupIngestLoop:
    """State + per-batch logic for streaming ingest dedup over a txnlog
    root directory holding four tables: ``docs`` (admitted documents),
    ``lsh_banded`` + ``lsh_shingles`` (the persisted index), ``dup_flags``
    (near-dup findings per batch)."""

    def __init__(
        self,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n: int = 3,
        num_perm: int = 64,
        bands: int = 16,
        threshold: float = 0.5,
    ) -> None:
        self.docs = TxnLogTable(os.path.join(root, "docs"))
        self.banded = TxnLogTable(
            os.path.join(root, "lsh_banded"), stat_cols=("band",)
        )
        self.shingles = TxnLogTable(os.path.join(root, "lsh_shingles"))
        self.flags = TxnLogTable(os.path.join(root, "dup_flags"))
        self.text_col, self.id_col = text_col, id_col
        self.n, self.num_perm, self.bands = n, num_perm, bands
        self.threshold = threshold

    # -- per-batch ---------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Probes the batch against the persisted index,
        then appends batch rows to all four tables under one logical txn id
        (idempotent per table on retry)."""
        spark = batch_df.sparkSession
        txn = f"dedup-ingest-{batch_id}"
        b_banded, b_shingles = lsh_index_tables(
            batch_df, self.text_col, self.id_col, self.n, self.num_perm, self.bands
        )
        # The banded/shingle streams feed both the probe and the index
        # append — pin them so tokenize+minhash runs once, not twice.
        b_banded = b_banded.transform(lineage_cut)
        b_shingles = b_shingles.transform(lineage_cut)
        if self.banded.exists():
            pairs = _probe_verified_pairs(
                b_banded,
                b_shingles,
                self.banded.read(spark),
                self.shingles.read(spark),
                self.threshold,
            ).withColumn("batch_id", F.lit(batch_id).cast("long"))
        else:
            pairs = spark.createDataFrame([], _FLAG_SCHEMA)
        self._append(self.flags, pairs, txn)
        self._append(self.banded, b_banded, txn)
        self._append(self.shingles, b_shingles, txn)
        self._append(self.docs, batch_df, txn)

    @staticmethod
    def _append(table: TxnLogTable, df: DataFrame, txn: str) -> None:
        if table.exists():
            table.append(df, app_txn_id=txn)
        else:
            table.create_or_replace(df, app_txn_id=txn)

    # -- stream wiring -----------------------------------------------------

    def start(
        self,
        spark: SparkSession,
        source_dir: str,
        schema: StructType,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = 1,
        available_now: bool = True,
        processing_time: str = "60 seconds",
    ) -> StreamingQuery:
        """Run the loop over a file-source document stream (the Kafka
        stand-in — same ``format("kafka")`` config swap as bronze ingest)."""
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(source_dir)
        writer = stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()
