"""Table service: the maintenance policy loop as a pipeline stage.

The reference schedules its Iceberg maintenance (compaction, snapshot
expiry) as DAG tasks (``bronze_compaction.py`` driven from
``cdr_pipeline_dag.py``); this is the same loop over the txnlog advisor —
``maintenance_plan`` decides, this executes, and the whole thing drops
into ``PipelineDAG.run_managed`` as a retried, SLA-tracked stage like any
other. Policy and mechanism stay separate: thresholds live in the
advisor, execution order here (compact first so expire/vacuum see the
post-compaction state), and every action taken is returned for the run
log."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.txnlog import TxnLogTable


def run_table_maintenance(
    spark: SparkSession,
    table: TxnLogTable,
    target_file_bytes: int = 256 * 1024 * 1024,
    min_compaction_files: int = 4,
    vacuum_retention_seconds: float = 3600.0,
) -> list[dict]:
    """Execute every action the advisor recommends, compaction first.
    Returns the findings annotated with what was done."""
    findings = table.maintenance_plan(
        target_file_bytes=target_file_bytes,
        min_compaction_files=min_compaction_files,
    )
    order = {"optimize": 0, "expire_log": 1, "vacuum": 2}
    executed = []
    for f in sorted(findings, key=lambda f: order.get(f["action"], 9)):
        if f["action"] == "optimize":
            v = table.optimize(spark, target_files=int(f["target_files"]))
            executed.append({**f, "result": f"committed v{v}"})
        elif f["action"] == "expire_log":
            gone = table.expire_log()
            executed.append({**f, "result": f"expired {len(gone)} commits"})
        elif f["action"] == "vacuum":
            gone = table.vacuum(retention_seconds=vacuum_retention_seconds)
            executed.append({**f, "result": f"deleted {len(gone)} files"})
    return executed
