"""Cluster-scale lineage-cut policy (one config point for every cut site).

The engine truncates expensive shared subtrees and iterative-loop plans with
``localCheckpoint`` — the cheapest lineage cut (guide §5): blocks live on
executors with NO replication. That is the right local-mode default, but on a
real cluster a lost executor makes a local-checkpointed RDD unrecoverable and
fails the job. VERDICT r12 item 3 flagged the assumption; this module is the
escape hatch: every cut site in the engine routes through
:func:`lineage_cut`, and one session conf swaps the mechanism fleet-wide.

``spark.graft.lineage_cut``:

- ``localCheckpoint`` (default) — executor-local blocks, cheapest, fine for
  local mode / restartable batch jobs.
- ``checkpoint`` — reliable checkpoint to ``spark.graft.checkpoint_dir``
  (default ``<local tmp>/spark-graft-checkpoints``; point it at durable
  shared storage on a cluster). Survives executor loss; costs a write to the
  checkpoint filesystem. ``checkpoint`` is always EAGER in Spark's DataFrame
  API semantics when ``eager=True`` is requested; lazy callers keep lazy
  semantics (materialize on first action) either way.
- ``persist`` — ``MEMORY_AND_DISK_2`` (2-way replicated) persistence. Does
  NOT truncate the logical plan (planning cost stays), but runtime reuse +
  one-executor-loss recovery without a checkpoint filesystem.

Call sites use ``df.transform(lineage_cut)`` (lazy) or
``df.transform(lineage_cut_eager)`` (eager, inside iterative loops that
measure/probe each round).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_MODE_CONF = "spark.graft.lineage_cut"
_DIR_CONF = "spark.graft.checkpoint_dir"
_VALID = ("localCheckpoint", "checkpoint", "persist")


def _mode(df: DataFrame) -> str:
    try:
        m = df.sparkSession.conf.get(_MODE_CONF, "localCheckpoint")
    except Exception:
        m = "localCheckpoint"
    if m not in _VALID:
        raise ValueError(
            f"{_MODE_CONF}={m!r} — expected one of {', '.join(_VALID)}"
        )
    return m


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        d = df.sparkSession.conf.get(
            _DIR_CONF,
            os.path.join(tempfile.gettempdir(), "spark-graft-checkpoints"),
        )
        sc.setCheckpointDir(d)


def lineage_cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage per the session's ``spark.graft.lineage_cut``."""
    mode = _mode(df)
    if mode == "checkpoint":
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=eager)
    if mode == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)


def lineage_cut_eager(df: DataFrame) -> DataFrame:
    return lineage_cut(df, eager=True)
