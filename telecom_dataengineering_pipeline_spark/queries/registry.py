"""Query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with the
equivalent ANSI/DuckDB oracle SQL run by the driver's correctness harness.

Cross-engine determinism conventions (every query follows these so the
order-insensitive value-hash comparison is exact, not approximate):

- **No raw doubles out of aggregations.** Sums aggregate over
  ``DECIMAL``-cast inputs (exact, order-independent) and are cast to DOUBLE at
  the end in *both* engines; averages/ratios are derived from those exact sums
  with the *same* double expression shape on both sides.
- **No raw timestamps in output.** The driver's ``events.ts`` is
  nanosecond-precision parquet which Spark truncates to microseconds; output
  time keys are strings (``date_format`` / ``strftime``) or DATEs, and any
  oracle arithmetic on ``ts`` goes through microsecond epochs
  (``epoch_us(ts)`` in DuckDB == ``unix_micros(ts)`` in Spark — both floor).
- **Deterministic order within window ties** — every ``ORDER BY`` inside a
  window includes a unique tie-break key.
- **Column names match** between Spark output and oracle SQL (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}

# Driver-window emission order for ``queries()`` / ``oracle_sql()`` —
# COMPUTED, not hand-maintained (VERDICT r8 item 10).
#
# The driver's correctness harness verifies the first 50 entries of
# ``queries()`` per round.  The order is derived mechanically from the
# committed ``CORRECTNESS_r*.json`` evidence files at call time:
#
#   1. Names with NO driver row yet ("never-checked"), in registration
#      order, capped at ``NEW_NAME_SLOT_CAP`` (30) — so a heavy-build
#      round can never displace the whole stale rotation.  Never-checked
#      names beyond the cap queue for the NEXT round's head (they sort
#      immediately after the rotation tier, before fresher names).
#   2. Already-checked names, stalest latest-driver-round first
#      (registration order as tie-break) — at least 20 window slots are
#      therefore refreshes (the pinned rotation minimum,
#      ``tests/test_probe_outliers_merges.py``), draining the stale tier
#      every round until the latest-round histogram is flat.
#
# Round-9 instance of this rule (r1-r8 evidence committed): the 30
# oldest r8 registrations head the window, then the 7 r3-stale names,
# then the 13 registration-first r4-stale names; the 3 last-registered
# r8 names (dwell_time_by_event_type, contingency_priority_status,
# char_class_doc_profile) hold at 51+ for the r10 head, exactly
# COVERAGE.md's corrected plan.  Evidence names no longer registered are
# ignored; new registrations always start never-checked.
#
# Round-12 instance: growth resumed — the three r11-verified candidates
# plus the composed split-leakage contract and the prepared-LSH pair
# (queries/round15.py) and the four curation-audit growth queries
# (queries/round16.py: source attribution, broadcast phrase tagger,
# dedup-quality bias bands, water-filling budget schedule) give 10
# never-checked names at the r12 window head, leaving 40 rotation slots:
# the whole r5-stale tier (29 names) retires plus the 11 oldest r6-stale
# names.
NEW_NAME_SLOT_CAP = 30
DRIVER_WINDOW = 50


def _latest_driver_round() -> dict[str, int]:
    """Latest round each registered query got a driver correctness row."""
    import json
    import re as _re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    seen: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name in rows:
            if name in REGISTRY:
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


def driver_order() -> list[str]:
    """The computed emission order (see the block comment above)."""
    seen = _latest_driver_round()
    reg_order = {n: i for i, n in enumerate(REGISTRY)}
    never = [n for n in REGISTRY if n not in seen]
    head, overflow = never[:NEW_NAME_SLOT_CAP], never[NEW_NAME_SLOT_CAP:]
    stale = sorted((n for n in REGISTRY if n in seen), key=lambda n: (seen[n], reg_order[n]))
    rotation = DRIVER_WINDOW - len(head)
    return head + stale[:rotation] + overflow + stale[rotation:]


def _ordered_specs() -> list[QuerySpec]:
    return [REGISTRY[name] for name in driver_order()]


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {s.name: s.fn for s in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in _ordered_specs() if s.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items() if s.bench}
