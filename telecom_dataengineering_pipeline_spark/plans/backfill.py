"""Idempotent partition backfill over the transaction log.

The restatement loop every production pipeline eventually needs (the
reference replays Kafka topics into bronze by hand; an engine should make
replays safe): recompute a set of logical partitions and swap each into
the table ATOMICALLY via ``replace_where`` — one commit per partition, no
reader ever sees a partition missing, and each commit carries a txn id
derived from (run_id, partition) so a crashed or re-run backfill
converges: already-applied partitions no-op, the rest apply. Combine with
``run_managed`` for retries/SLA around the whole run.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..sources.txnlog import TxnLogTable


def backfill_partitions(
    spark: SparkSession,
    table: TxnLogTable,
    partition_col: str,
    values: Sequence,
    recompute: Callable[[SparkSession, object], DataFrame],
    run_id: str,
) -> list[dict]:
    """For each partition value: ``recompute(spark, value)`` produces the
    partition's replacement rows, and ``replace_where`` swaps them in
    atomically under txn id ``backfill-<run_id>-<value>``. Returns one
    outcome dict per partition (version committed, or skipped as already
    applied). Partition order is the caller's; partitions are independent
    commits, so a failure leaves earlier partitions applied and later ones
    untouched — re-running the same ``run_id`` finishes the job."""
    outcomes = []
    for v in values:
        txn = f"backfill-{run_id}-{v}"
        before = table.version()
        version = table.replace_where(
            spark,
            [(partition_col, "=", v)],
            recompute(spark, v),
            app_txn_id=txn,
        )
        outcomes.append(
            {
                "partition": v,
                "version": version,
                "applied": version > before,
            }
        )
    return outcomes
