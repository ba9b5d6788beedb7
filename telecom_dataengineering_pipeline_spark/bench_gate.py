"""Bench regression gate.

Runs the headline (``bench=True``) queries exactly like ``bench.py`` and
fails (exit 1) if any query regresses more than ``--factor`` (default
1.5×) against the committed baseline ``BENCH_BASELINE.json`` — the
per-query numbers carried forward from the best known round. Queries
without a baseline entry are reported but never fail the gate (new
queries earn a baseline by updating the file with ``--update``).

Usage::

    python -m telecom_dataengineering_pipeline_spark.bench_gate
    python -m telecom_dataengineering_pipeline_spark.bench_gate --update

Timing noise: each query is warmed once and the cache cleared between
queries (same protocol as bench.py); local[32] run-to-run variance is
~±15%, so 1.5× headroom flags real regressions, not jitter.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=1.5)
    ap.add_argument("--update", action="store_true", help="rewrite the baseline with this run")
    ap.add_argument("--baseline", default=None)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    baseline_path = args.baseline or os.path.join(repo_root, "BENCH_BASELINE.json")

    from .queries.registry import bench_queries
    from .session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-gate")
    spark.conf.set("spark.graft.engine_neutral_hash", "false")

    timings: dict[str, float] = {}
    for name, fn in bench_queries().items():
        fn(spark, sf_dir).count()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        # clearCache() misses RDDs pinned by localCheckpoint(eager=False);
        # drop them so queries aren't timed under earlier queries' residue
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    spark.stop()

    if args.update or not os.path.exists(baseline_path):
        with open(baseline_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": timings}, f, indent=2, sort_keys=True)
        print(f"baseline written: {baseline_path}")
        return 0

    with open(baseline_path) as f:
        baseline = json.load(f)["queries"]

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
    if failures:
        print(f"\n{len(failures)} regression(s) beyond {args.factor}x")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
