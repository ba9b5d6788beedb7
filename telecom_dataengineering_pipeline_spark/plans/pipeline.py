"""Pipeline DAG + table-level lineage.

The reference orchestrates with Airflow (cdr_pipeline_dag.py:226-228:
freshness gate → ingest → silver → gold → tests → publish) and keeps a static
lineage graph with upstream/impact traversal
(pipeline_observability.py:282-321). Here both are one small engine-side
structure: stages declare their input/output tables, the DAG topologically
orders them, and lineage queries walk the declared edges.

This is deliberately driver-side Python (a handful of table names), not a
Spark job — lineage is metadata, not data.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter


@dataclass
class Stage:
    name: str
    inputs: Sequence[str]
    outputs: Sequence[str]
    run: Callable[[], None]
    kind: str = "transform"  # ingest | transform | quality_gate | publish


@dataclass
class PipelineDAG:
    stages: list[Stage] = field(default_factory=list)

    def add(self, stage: Stage) -> "PipelineDAG":
        self.stages.append(stage)
        return self

    # -- lineage ---------------------------------------------------------
    def _producers(self) -> Mapping[str, str]:
        return {t: s.name for s in self.stages for t in s.outputs}

    def edges(self) -> list[tuple[str, str]]:
        """(upstream_table, downstream_table) pairs via stage declarations."""
        out = []
        for s in self.stages:
            for i in s.inputs:
                for o in s.outputs:
                    out.append((i, o))
        return out

    def upstream(self, table: str) -> set[str]:
        """All transitive inputs feeding ``table``."""
        rev: dict[str, set[str]] = {}
        for u, d in self.edges():
            rev.setdefault(d, set()).add(u)
        seen: set[str] = set()
        frontier = [table]
        while frontier:
            t = frontier.pop()
            for u in rev.get(t, ()):
                if u not in seen:
                    seen.add(u)
                    frontier.append(u)
        return seen

    def impact(self, table: str) -> set[str]:
        """All transitive outputs downstream of ``table`` (blast radius)."""
        fwd: dict[str, set[str]] = {}
        for u, d in self.edges():
            fwd.setdefault(u, set()).add(d)
        seen: set[str] = set()
        frontier = [table]
        while frontier:
            t = frontier.pop()
            for d in fwd.get(t, ()):
                if d not in seen:
                    seen.add(d)
                    frontier.append(d)
        return seen

    # -- execution -------------------------------------------------------
    def topological_order(self) -> list[Stage]:
        producers = self._producers()
        ts: TopologicalSorter = TopologicalSorter()
        by_name = {s.name: s for s in self.stages}
        for s in self.stages:
            deps = {producers[i] for i in s.inputs if i in producers and producers[i] != s.name}
            ts.add(s.name, *deps)
        return [by_name[n] for n in ts.static_order()]

    def run(self) -> list[str]:
        """Execute stages in dependency order; returns the order run."""
        order = self.topological_order()
        for s in order:
            s.run()
        return [s.name for s in order]
