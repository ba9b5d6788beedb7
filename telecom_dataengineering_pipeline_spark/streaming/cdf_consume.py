"""Resumable change-data-feed consumption from a txnlog table — the
consumer half of the CDC story (the producer half is
``TxnLogTable.table_changes``). Delta exposes this as a streaming SOURCE
(``readStream.option("readChangeFeed", ...)``); PySpark cannot register
custom Source implementations, so the same semantics are delivered as the
poll/ack loop every foreachBatch-era consumer actually runs:

- ``poll()`` returns the row-level changes since the last ACKNOWLEDGED
  version (insert/delete images, updates as delete+insert pairs —
  including rows vectored out by merge-on-read deletes) plus a batch
  token.
- ``ack(token)`` durably advances the cursor (atomic rename of a tiny
  JSON file). Crash between poll and ack → the SAME batch is returned
  again — at-least-once delivery, which the downstream turns into
  exactly-once by writing under the token's ``app_txn_id`` (txnlog
  duplicate-txn no-op), the identical contract streaming foreachBatch
  sinks already use here.

Scale: each poll reads only the files (or deletion-vector assignments)
that changed in the polled version range — ``table_changes``'s cost
tracks the delta, not the table — and the cursor is O(1) metadata.
Reference parity slot: the reference's Iceberg tables feed downstream
dbt incrementals by timestamp column (``dbt_project`` incremental
models); this gives the same resume-from-where-I-left-off with row-level
precision instead of a freshness column.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sources.txnlog import TxnLogTable


@dataclass(frozen=True)
class ChangeBatch:
    """One polled slice of the feed: ``changes`` carries the table columns
    plus ``_change_type`` ∈ insert|delete; ``app_txn_id`` is the token the
    downstream should commit under AND pass back to :meth:`ack`."""

    changes: DataFrame
    from_version: int
    to_version: int
    app_txn_id: str


class ChangeFeedCursor:
    """Durable poll/ack cursor over one table's change feed.

    ``start_version``: consume changes AFTER this version (default: the
    table's current version at cursor creation — "new changes only";
    pass ``-1``... the earliest retained version for a full-history
    bootstrap, mirroring Delta's ``startingVersion=0``).
    """

    def __init__(
        self,
        table: TxnLogTable,
        cursor_path: str,
        start_version: int | None = None,
    ) -> None:
        self.table = table
        self.cursor_path = cursor_path
        if os.path.exists(cursor_path):
            return  # resuming: the durable cursor wins over start_version
        v = table.version() if start_version is None else start_version
        self._write_cursor(v)

    def _read_cursor(self) -> int:
        with open(self.cursor_path) as f:
            return int(json.load(f)["version"])

    def _write_cursor(self, version: int) -> None:
        os.makedirs(os.path.dirname(self.cursor_path) or ".", exist_ok=True)
        tmp = f"{self.cursor_path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self.cursor_path)  # atomic: a crash leaves old cursor

    def poll(self, spark: SparkSession) -> ChangeBatch | None:
        """Changes since the last acked version, or None when caught up.
        Does NOT advance the cursor — call :meth:`ack` after the batch is
        durably processed. Repeated polls without an ack return the same
        batch (deterministic token, so downstream dedup holds across a
        consumer restart too)."""
        last = self._read_cursor()
        latest = self.table.version()
        if latest <= last:
            return None
        changes = self.table.table_changes(spark, last, latest)
        # Token identity = FULL source path: two sources with the same
        # directory basename feeding one sink must not collide on txn ids
        # (a collision silently deduplicates the second feed away).
        src_id = os.path.abspath(self.table.path)
        token = f"cdf:{src_id}:{last}->{latest}"
        return ChangeBatch(
            changes=changes,
            from_version=last,
            to_version=latest,
            app_txn_id=token,
        )

    def ack(self, batch: ChangeBatch) -> None:
        """Durably mark ``batch`` consumed; the next poll starts after its
        ``to_version``. Acking an already-superseded batch is refused —
        that would silently skip the unconsumed gap."""
        last = self._read_cursor()
        if batch.from_version != last:
            raise ValueError(
                f"stale ack: cursor is at {last}, batch covered "
                f"{batch.from_version}->{batch.to_version}"
            )
        self._write_cursor(batch.to_version)

    def apply_to(
        self,
        spark: SparkSession,
        sink: TxnLogTable,
        keys: tuple[str, ...],
        max_batches: int = 100,
    ) -> int:
        """Drain the feed into another txnlog table (the materialized
        CDC-replica loop): per batch, upserts (insert images) merge with
        SOURCE-WINS precedence — every image carries the feed version it
        came from as ``_cdf_v``, and the merge orders by it, so a later
        batch's image always beats the replica's current row regardless of
        payload values — and delete images delete. Both commit under the
        batch token, so a replayed batch no-ops. Returns batches applied."""
        from pyspark.sql import functions as F

        applied = 0
        for _ in range(max_batches):
            batch = self.poll(spark)
            if batch is None:
                return applied
            ins = (
                batch.changes.filter(F.col("_change_type") == "insert")
                .drop("_change_type")
                .withColumn("_cdf_v", F.lit(batch.to_version).cast("long"))
            )
            dels = batch.changes.filter(F.col("_change_type") == "delete").drop(
                "_change_type"
            )
            # Upserts first, then deletes of keys with NO insert image in
            # the same batch (an update is delete+insert of the same key —
            # the insert wins; a pure delete has no insert image). The
            # anti-join is NULL-SAFE: an update of a NULL-key row carries
            # delete+insert images both keyed NULL, and a plain key-list
            # anti-join would never match them — the delete image would
            # survive as a "pure delete" and remove the row the upsert just
            # wrote.
            ikeys = ins.select(
                *[F.col(k).alias(f"__ik_{k}") for k in keys]
            ).distinct()
            anti = F.lit(True)
            for k in keys:
                anti = anti & dels[k].eqNullSafe(F.col(f"__ik_{k}"))
            pure_dels = dels.join(ikeys, anti, "left_anti")
            if not ins.isEmpty():
                sink.merge_keep_latest(
                    spark,
                    ins,
                    keys=keys,
                    order_by=[F.col("_cdf_v").desc()],
                    app_txn_id=batch.app_txn_id + ":upsert",
                )
            # One distributed merge-delete for the whole batch: the key
            # relation never touches the driver, composite keys and NULL
            # keys included — one scan, one commit, any key count. (A
            # delete against a not-yet-created sink has nothing to remove.)
            if sink.exists():
                sink.merge_delete_mor(
                    spark,
                    pure_dels,
                    keys=keys,
                    app_txn_id=batch.app_txn_id + ":del",
                )
            self.ack(batch)
            applied += 1
        return applied
