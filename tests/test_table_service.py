"""Table service: the maintenance advisor's findings executed as a managed
pipeline stage; acting on the plan clears it."""

from __future__ import annotations

from telecom_dataengineering_pipeline_spark.plans.pipeline import PipelineDAG, Stage
from telecom_dataengineering_pipeline_spark.plans.table_service import (
    run_table_maintenance,
)
from telecom_dataengineering_pipeline_spark.sources.txnlog import TxnLogTable
import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "id LONG, payload STRING")


@pytest.mark.slow
def test_maintenance_stage_compacts_expires_and_vacuums(spark, tmp_path):
    t = TxnLogTable(str(tmp_path / "svc"), checkpoint_interval=3)
    for i in range(5):  # five tiny single-file commits -> fragmented
        t.append(_df(spark, [(i, "x")]).coalesce(1))
    t._write_data(_df(spark, [(99, "orphan")]).coalesce(1))  # aborted writer

    executed = []

    def maintain():
        executed.extend(
            run_table_maintenance(spark, t, vacuum_retention_seconds=0.0)
        )

    dag = PipelineDAG().add(
        Stage(name="table_service", inputs=[], outputs=["svc_table"], run=maintain)
    )
    run = dag.run_managed()
    assert [r.state for r in run.results] == ["success"]

    actions = {e["action"] for e in executed}
    assert actions == {"optimize", "expire_log", "vacuum"}
    # compaction happened, data intact, advisor satisfied
    assert len(t.snapshot_files()) == 1
    assert t.read(spark).count() == 5
    assert t.maintenance_plan() == []
