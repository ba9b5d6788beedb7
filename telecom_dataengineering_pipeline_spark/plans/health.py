"""Pipeline health rollup (reference ``pipeline_observability.py:326-364``):
fold monitor results into HEALTHY / DEGRADED / BLOCKED.

Policy mirrored from the reference:
- any CRITICAL condition (schema column removed, freshness SLA breach on a
  gating table, volume anomaly beyond z-threshold) → BLOCKED;
- any WARNING (type change, drifted null-rate/cardinality, non-gating
  freshness breach) → DEGRADED;
- otherwise HEALTHY.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .pipeline import PipelineDAG


@dataclass
class MonitorFinding:
    monitor: str
    table: str
    severity: str  # CRITICAL | WARNING | INFO
    detail: str


@dataclass
class HealthReport:
    findings: list[MonitorFinding] = field(default_factory=list)

    def add(self, monitor: str, table: str, severity: str, detail: str) -> None:
        self.findings.append(MonitorFinding(monitor, table, severity, detail))

    @property
    def status(self) -> str:
        sevs = {f.severity for f in self.findings}
        if "CRITICAL" in sevs:
            return "BLOCKED"
        if "WARNING" in sevs:
            return "DEGRADED"
        return "HEALTHY"

    def blocked_tables(self) -> set[str]:
        return {f.table for f in self.findings if f.severity == "CRITICAL"}

    def impacted_downstream(self, dag: PipelineDAG) -> set[str]:
        """Blast radius of the blocking findings via lineage
        (pipeline_observability.py:282-321 impact analysis)."""
        out: set[str] = set()
        for t in self.blocked_tables():
            out |= dag.impact(t)
        return out

    def summary(self) -> dict:
        return {
            "status": self.status,
            "critical": [f.__dict__ for f in self.findings if f.severity == "CRITICAL"],
            "warning": [f.__dict__ for f in self.findings if f.severity == "WARNING"],
            "info_count": sum(1 for f in self.findings if f.severity == "INFO"),
        }
