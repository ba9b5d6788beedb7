"""Transaction-log table format (SURVEY.md §2.1 S7, §2.10 M1) — a
from-scratch lakehouse commit protocol, since neither Delta nor Iceberg
runtimes exist in this environment. Implements the semantics the reference
delegates to Iceberg (``bronze_compaction.py:125-136`` ``writeTo(...)
.createOrReplace()``; dbt ``incremental_strategy: merge``) with the same
mechanics those formats use:

- **Versioned JSON log** (``_txnlog/<version>.json``): each commit records
  the parquet files it adds/removes plus the schema. A snapshot at version
  V is (Σ adds − Σ removes) over commits ≤ V — readers never list data
  directories.
- **Atomic, optimistic commits**: a commit is published by hard-linking a
  temp file to the next version number — ``os.link`` fails if the version
  exists (rename-without-overwrite, the same primitive Delta uses on HDFS).
  Losers re-read the log and retry; a retry whose removed files were
  already removed by the winner raises ``CommitConflict`` (true write-write
  conflict) instead of silently dropping data.
- **Exactly-once by txn id**: a commit carrying an ``app_txn_id`` already
  present in the log is a no-op — at-least-once callers (foreachBatch
  retries, S12 incremental re-runs) can re-commit blindly.
- **Copy-on-write MERGE at file granularity**: only data files that contain
  a matched key are rewritten; untouched files carry over by reference.
  File discovery here scans with ``input_file_name`` + a broadcast semi-join
  (exact); at 100 TB the log's per-file min/max key stats prune candidate
  files without a scan — the commit protocol is identical.
- **Time travel**: ``read(version=N)`` reconstructs any historical
  snapshot; ``history()`` lists commits.
- **OPTIMIZE-style compaction**: rewrite the active file set into fewer
  files as one add/remove commit — readers at older versions are
  unaffected.

Files are stored unpartitioned under per-commit directories: file-level
add/remove (plus, at scale, per-file column stats in the log) replaces
hive directory partitioning — the Delta/Iceberg layout. ``partition_by``
therefore clusters rows into files by the given columns (repartition before
write) so file-granular pruning and rewrite stay selective.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.merge import merge_upsert
from .table_format import TableSink

_LOG_DIR = "_txnlog"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """A concurrent commit removed one of the files this commit rewrites.
    The operation must be re-run from a fresh snapshot."""


class TxnLogTable:
    """One log-backed table rooted at ``path``."""

    def __init__(self, path: str) -> None:
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, _LOG_DIR)

    # -- log primitives ----------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for f in os.listdir(self.log_dir):
            if f.endswith(".json") and not f.startswith("."):
                out.append(int(f[: -len(".json")]))
        return sorted(out)

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _read_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as f:
            return json.load(f)

    def _commits(self, upto: int | None = None) -> list[dict]:
        return [
            self._read_commit(v)
            for v in self._versions()
            if upto is None or v <= upto
        ]

    def version(self) -> int:
        """Latest committed version, -1 for an empty/new table."""
        vs = self._versions()
        return vs[-1] if vs else -1

    def exists(self) -> bool:
        return self.version() >= 0

    # -- snapshot ----------------------------------------------------------

    def snapshot_files(self, version: int | None = None) -> list[str]:
        """Active data files (paths relative to the table root) at a
        version, in first-added order."""
        active: dict[str, None] = {}
        for c in self._commits(version):
            for f in c.get("removes", []):
                active.pop(f, None)
            for f in c.get("adds", []):
                active[f] = None
        return list(active)

    def snapshot_schema(self, version: int | None = None) -> StructType | None:
        schema = None
        for c in self._commits(version):
            if c.get("schema") is not None:
                schema = c["schema"]
        return StructType.fromJson(json.loads(schema)) if schema else None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot (or time-travel) read: the log's file list under the
        as-of schema — added columns backfill as NULL in older files, and
        data directories are never listed."""
        if version is not None and version > self.version():
            raise ValueError(
                f"version {version} does not exist (latest: {self.version()})"
            )
        schema = self.snapshot_schema(version)
        if schema is None:
            raise ValueError(f"no such table (empty log): {self.path}")
        files = self.snapshot_files(version)
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    def history(self) -> list[dict]:
        """Commit metadata, oldest first: version, operation, file deltas."""
        return [
            {
                "version": c["version"],
                "operation": c.get("operation", "?"),
                "n_added": len(c.get("adds", [])),
                "n_removed": len(c.get("removes", [])),
                "timestamp": c.get("timestamp"),
                "app_txn_id": c.get("app_txn_id"),
            }
            for c in self._commits()
        ]

    # -- write path --------------------------------------------------------

    def _write_data(self, df: DataFrame, cluster_by: Sequence[str] = ()) -> list[str]:
        """Write a new immutable file set for one commit; returns relative
        paths. Not visible until a commit references them."""
        rel_dir = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        out = os.path.join(self.path, rel_dir)
        w = df
        if cluster_by:
            w = df.repartition(*[F.col(c) for c in cluster_by])
        w.write.mode("overwrite").option("compression", "snappy").parquet(out)
        return sorted(
            os.path.join(rel_dir, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )

    def _txn_seen(self, app_txn_id: str | None) -> bool:
        return app_txn_id is not None and any(
            c.get("app_txn_id") == app_txn_id for c in self._commits()
        )

    def commit(
        self,
        adds: Sequence[str],
        removes: Sequence[str],
        operation: str,
        schema_json: str | None = None,
        app_txn_id: str | None = None,
        read_version: int | None = None,
    ) -> int:
        """Publish one atomic commit; returns the committed version.

        Optimistic concurrency: on a version collision the commit re-reads
        the log and retries. If a concurrent winner removed any file in
        ``removes`` (write-write conflict on the same data) or already
        committed ``app_txn_id`` (duplicate), the retry stops instead.
        """
        os.makedirs(self.log_dir, exist_ok=True)
        while True:
            if self._txn_seen(app_txn_id):
                return self.version()  # duplicate delivery: no-op
            v = self.version() + 1
            if read_version is not None and v > read_version + 1:
                # someone committed since our snapshot: validate removes
                still_active = set(self.snapshot_files())
                gone = [f for f in removes if f not in still_active]
                if gone:
                    raise CommitConflict(
                        f"files removed by a concurrent commit: {gone[:3]}"
                    )
            payload = {
                "version": v,
                "operation": operation,
                "adds": list(adds),
                "removes": list(removes),
                "schema": schema_json,
                "app_txn_id": app_txn_id,
                "timestamp": time.time_ns() // 1_000_000,
            }
            tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                json.dump(payload, f)
            try:
                os.link(tmp, self._commit_path(v))  # atomic create-no-overwrite
                return v
            except FileExistsError:
                if read_version is None:
                    read_version = v - 1  # force validation on the retry
                continue
            finally:
                os.unlink(tmp)

    def create_or_replace(
        self,
        df: DataFrame,
        cluster_by: Sequence[str] = (),
        app_txn_id: str | None = None,
    ) -> int:
        """Full-snapshot replace: add the new file set, remove every
        currently-active file, one commit."""
        rv = self.version()
        adds = self._write_data(df, cluster_by)
        return self.commit(
            adds=adds,
            removes=self.snapshot_files(),
            operation="create_or_replace",
            schema_json=df.schema.json(),
            app_txn_id=app_txn_id,
            read_version=rv,
        )

    def append(self, df: DataFrame, app_txn_id: str | None = None) -> int:
        """Blind append: always retry-safe (no removes to conflict on)."""
        adds = self._write_data(df)
        return self.commit(
            adds=adds,
            removes=[],
            operation="append",
            schema_json=df.schema.json(),
            app_txn_id=app_txn_id,
        )

    def merge_keep_latest(
        self,
        spark: SparkSession,
        source: DataFrame,
        keys: Sequence[str],
        order_by: Sequence[Column],
        app_txn_id: str | None = None,
    ) -> int:
        """Copy-on-write MERGE: rewrite ONLY the data files containing a
        matched key; every other active file carries over by reference.
        Matched rows resolve to the winner under ``order_by`` (keep-latest,
        the dbt merge semantics); unmatched source rows insert."""
        if not self.exists():
            return self.create_or_replace(source, app_txn_id=app_txn_id)
        rv = self.version()
        schema = self.snapshot_schema(rv)
        files = self.snapshot_files(rv)
        if not files:
            adds = self._write_data(source)
            return self.commit(
                adds, [], "merge", source.schema.json(), app_txn_id, rv
            )
        abs_of = {os.path.join(self.path, f): f for f in files}
        tgt = (
            spark.read.schema(schema)
            .parquet(*abs_of)
            .withColumn("_file", F.input_file_name())
        )
        key_set = source.select(*keys).distinct()
        hit_abs = [
            r["_file"]
            for r in tgt.join(F.broadcast(key_set), list(keys), "left_semi")
            .select("_file")
            .distinct()
            .collect()  # one row per FILE — bounded by file count, not rows
        ]
        hit_rel = [abs_of[p.removeprefix("file://")] for p in hit_abs]
        affected = (
            tgt.filter(F.col("_file").isin(hit_abs)).drop("_file")
            if hit_abs
            else spark.createDataFrame([], schema)
        )
        merged = merge_upsert(affected, source, keys=list(keys), order_by=list(order_by))
        adds = self._write_data(merged)
        return self.commit(
            adds=adds,
            removes=hit_rel,
            operation="merge",
            schema_json=merged.schema.json(),
            app_txn_id=app_txn_id,
            read_version=rv,
        )

    def optimize(self, spark: SparkSession, target_files: int = 1) -> int:
        """Compact the active file set into ``target_files`` files — one
        add/remove commit; time travel to pre-compaction versions still
        resolves the old files."""
        rv = self.version()
        files = self.snapshot_files(rv)
        if len(files) <= target_files:
            return rv
        df = self.read(spark, rv).coalesce(target_files)
        adds = self._write_data(df)
        return self.commit(
            adds=adds,
            removes=files,
            operation="optimize",
            schema_json=None,
            read_version=rv,
        )

    def vacuum(self) -> list[str]:
        """Delete data files no active OR historical version references
        (aborted writers' leftovers). Files referenced by any commit are
        kept so every version stays readable."""
        referenced: set[str] = set()
        for c in self._commits():
            referenced.update(c.get("adds", []))
        removed = []
        data_root = os.path.join(self.path, _DATA_DIR)
        if not os.path.isdir(data_root):
            return removed
        for d in os.listdir(data_root):
            rel_dir = os.path.join(_DATA_DIR, d)
            full = os.path.join(data_root, d)
            files = {
                os.path.join(rel_dir, f)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
            if files and not (files & referenced):
                for f in sorted(files):
                    os.unlink(os.path.join(self.path, f))
                    removed.append(f)
        return removed


class TxnLogSink(TableSink):
    """S7 ``TableSink`` backed by the transaction log — the real
    table-format implementation of the contract (``ParquetDirSink`` is the
    plain-directory fallback)."""

    def __init__(self, partition_by: Sequence[str] = ()) -> None:
        self.partition_by = tuple(partition_by)

    def create_or_replace(
        self, df: DataFrame, table: str, partition_by: Sequence[str] = ()
    ) -> None:
        TxnLogTable(table).create_or_replace(
            df, cluster_by=tuple(partition_by) or self.partition_by
        )

    def merge_keep_latest(
        self,
        spark: SparkSession,
        table: str,
        source: DataFrame,
        keys: Sequence[str],
        order_by: Sequence[Column],
    ) -> None:
        TxnLogTable(table).merge_keep_latest(spark, source, keys, order_by)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return TxnLogTable(table).read(spark)
