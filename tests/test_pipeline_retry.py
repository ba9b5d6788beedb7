"""Managed pipeline execution: retry with exponential backoff, SLA-miss
detection from pipeline start, downstream-of-failure skipping — the
Airflow task semantics the reference DAG configures
(cdr_pipeline_dag.py:48,117: retries=2, retry_exponential_backoff, 4 h SLA),
re-expressed as engine-side driver logic. Pure Python (no SparkSession):
clock and sleeper are injected, so these tests run in milliseconds."""

from __future__ import annotations

from telecom_dataengineering_pipeline_spark.plans.pipeline import (
    PipelineDAG,
    RetryPolicy,
    Stage,
)


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.t += s


def _dag(stages):
    d = PipelineDAG()
    for s in stages:
        d.add(s)
    return d


def test_retry_succeeds_after_transient_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")

    clock = FakeClock()
    run = _dag([Stage("s", [], ["t"], flaky, retry=RetryPolicy(retries=2))]).run_managed(
        clock=clock, sleeper=clock.sleep
    )
    assert run.ok
    assert run.results[0].attempts == 3
    assert len(calls) == 3


def test_exponential_backoff_delays():
    p = RetryPolicy(retries=3, backoff_seconds=2.0, max_backoff_seconds=7.0)
    assert [p.delay(a) for a in range(4)] == [2.0, 4.0, 7.0, 7.0]  # capped
    slept = []

    def always_fails():
        raise RuntimeError("boom")

    clock = FakeClock()

    def sleeper(s):
        slept.append(s)
        clock.sleep(s)

    run = _dag(
        [Stage("s", [], ["t"], always_fails, retry=RetryPolicy(retries=2, backoff_seconds=1.0))]
    ).run_managed(clock=clock, sleeper=sleeper)
    assert not run.ok
    assert slept == [1.0, 2.0]  # between attempts only, doubling
    assert run.results[0].attempts == 3
    assert "boom" in run.results[0].error


def test_failure_skips_dependents_but_not_independent_branches():
    ran = []

    def ok(name):
        return lambda: ran.append(name)

    def fails():
        raise RuntimeError("ingest down")

    dag = _dag(
        [
            Stage("ingest", [], ["bronze"], fails),
            Stage("silver", ["bronze"], ["silver_t"], ok("silver")),
            Stage("gold", ["silver_t"], ["gold_t"], ok("gold")),
            Stage("other", [], ["other_t"], ok("other")),  # independent branch
        ]
    )
    clock = FakeClock()
    run = dag.run_managed(clock=clock, sleeper=clock.sleep)
    states = {r.name: r.state for r in run.results}
    assert states == {
        "ingest": "failed",
        "silver": "upstream_failed",
        "gold": "upstream_failed",
        "other": "success",
    }
    assert ran == ["other"]  # dependents never attempted
    assert set(run.failed) == {"ingest", "silver", "gold"}


def test_sla_miss_fires_callback_and_run_continues():
    clock = FakeClock()

    def slow():
        clock.t += 100.0

    misses = []
    dag = _dag(
        [
            Stage("a", [], ["t1"], slow, sla_seconds=50.0),
            Stage("b", ["t1"], ["t2"], lambda: None, sla_seconds=500.0),
        ]
    )
    run = dag.run_managed(
        clock=clock, sleeper=clock.sleep, on_sla_miss=lambda n, e: misses.append((n, e))
    )
    assert run.ok  # SLA miss is an alert, not a failure (Airflow model)
    assert run.sla_misses == ["a"]
    assert misses == [("a", 100.0)]
    assert run.results[1].sla_missed is False


def test_sla_measured_from_pipeline_start_not_stage_start():
    """Airflow SLAs are DAG-start-relative: a fast stage late in a slow
    pipeline still misses its deadline."""
    clock = FakeClock()

    def takes(seconds):
        def f():
            clock.t += seconds

        return f

    dag = _dag(
        [
            Stage("slow_upstream", [], ["t1"], takes(100.0)),
            Stage("fast_late", ["t1"], ["t2"], takes(1.0), sla_seconds=60.0),
        ]
    )
    run = dag.run_managed(clock=clock, sleeper=clock.sleep)
    assert run.sla_misses == ["fast_late"]


def test_default_retry_policy_applies_when_stage_has_none():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 2:
            raise RuntimeError("once")

    clock = FakeClock()
    run = _dag([Stage("s", [], ["t"], flaky)]).run_managed(
        default_retry=RetryPolicy(retries=2), clock=clock, sleeper=clock.sleep
    )
    assert run.ok and run.results[0].attempts == 2
