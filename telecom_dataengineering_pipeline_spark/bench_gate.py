"""Bench regression gate.

Runs the headline (``bench=True``) queries with the SAME measurement
protocol as ``bench.py`` (shared ``benchlib.measure_queries``) and fails
(exit 1) if any query regresses more than ``--factor`` (default 1.5×)
against the committed baseline ``BENCH_BASELINE.json`` — the per-query
numbers carried forward from the best known round. Queries without a
baseline entry are reported but never fail the gate (new queries earn a
baseline by updating the file with ``--update``); baseline entries whose
query no longer runs are reported as GONE so a renamed query cannot
silently lose its gate.

The baseline records the sf_dir it was measured at; a run against a
different $SPARK_GRAFT_SF_DIR refuses to compare (exit 2) instead of
producing bogus ok/FAIL rows across scale factors.

Usage::

    python -m telecom_dataengineering_pipeline_spark.bench_gate
    python -m telecom_dataengineering_pipeline_spark.bench_gate --update

Timing noise: local[32] run-to-run variance is ~±15%, so 1.5× headroom
flags real regressions, not jitter.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .benchlib import bench_session, measure_queries, noise_flags, noise_probe


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=1.5)
    ap.add_argument("--update", action="store_true", help="rewrite the baseline with this run")
    ap.add_argument("--baseline", default=None)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    baseline_path = args.baseline or os.path.join(repo_root, "BENCH_BASELINE.json")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if not args.update and os.path.exists(baseline_path):
        with open(baseline_path) as f:
            recorded = json.load(f)
        if recorded.get("sf_dir") != sf_dir:
            print(
                f"baseline was recorded at sf_dir={recorded.get('sf_dir')!r} but this "
                f"run targets {sf_dir!r} — cross-scale comparisons are meaningless. "
                f"Set SPARK_GRAFT_SF_DIR to match or pass --update/--baseline."
            )
            return 2

    probe_start = noise_probe()
    spark = bench_session("bench-gate")
    timings = measure_queries(spark, sf_dir)
    spark.stop()
    probe_end = noise_probe()
    flags = noise_flags(probe_start, probe_end)

    if args.update or not os.path.exists(baseline_path):
        doc = {"sf_dir": sf_dir, "queries": timings}
        # --update must not wipe the provenance note the workflow requires
        # maintainers to keep; carry it forward for hand-editing.
        if os.path.exists(baseline_path):
            try:
                with open(baseline_path) as f:
                    prev = json.load(f)
                if isinstance(prev, dict) and prev.get("note"):
                    doc["note"] = prev["note"]
            except (ValueError, OSError):
                pass  # corrupt baseline: --update rewrites it fresh
        with open(baseline_path, "w") as f:
            json.dump(doc, f, indent=2, sort_keys=True)
        print(f"baseline written: {baseline_path}")
        return 0

    baseline = recorded["queries"]

    failures = []
    for name, t in sorted(timings.items()):
        base = baseline.get(name)
        if base is None:
            print(f"NEW  {name}: {t:.3f}s (no baseline)")
        elif t > base * args.factor:
            failures.append((name, t, base))
            print(f"FAIL {name}: {t:.3f}s vs baseline {base:.3f}s (> {args.factor}x)")
        else:
            print(f"ok   {name}: {t:.3f}s vs baseline {base:.3f}s")
    for name in sorted(set(baseline) - set(timings)):
        print(f"GONE {name}: baseline {baseline[name]:.3f}s but not in bench set")
    if flags:
        # Annotate, never auto-pass: a flagged session's FAIL rows must be
        # re-judged solo on a quiet window (the r9-r11 protocol), but the
        # gate verdict itself stands until someone does.
        print("\nNOISY SESSION — timings above are suspect:")
        for fl in flags:
            print(f"  noise: {fl}")
        print(
            f"  probes: start inflation {probe_start['probe_inflation']}x, "
            f"end inflation {probe_end['probe_inflation']}x "
            f"(reference = quiet-host spin)"
        )
    if failures:
        print(f"\n{len(failures)} regression(s) beyond {args.factor}x")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
