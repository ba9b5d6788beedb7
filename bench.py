"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Measurement protocol (warmup, steady-state timing, per-query cache/RDD
isolation) lives in ``telecom_dataengineering_pipeline_spark.benchlib`` and is
shared with the regression gate (``bench_gate``).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from telecom_dataengineering_pipeline_spark.benchlib import (
    bench_session,
    measure_queries,
    noise_flags,
    noise_probe,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    probe_start = noise_probe()
    spark = bench_session("bench")
    timings = measure_queries(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    spark.stop()
    probe_end = noise_probe()
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # r13: timed action is the noop sink (guide §1.4) — count()
                # let the optimizer prune declared output columns. Baseline
                # re-pinned under this protocol in the same commit; numbers
                # from r12-and-earlier BENCH_*.json are count-protocol.
                "protocol": "noop_sink",
                # Ambient-noise sentinel: probe_inflation ~1.0 = quiet host;
                # a flagged session's timings should be discounted/re-judged
                # solo instead of read as regressions (r10/r11 episodes).
                "noise_probe": {
                    "start": probe_start,
                    "end": probe_end,
                    "flags": noise_flags(probe_start, probe_end),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
