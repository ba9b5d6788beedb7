"""SparkSession factory.

One place for every config that affects semantics or scale behavior, so tests,
``bench.py`` and the driver's harness all run the same engine:

- **AQE on** (coalesce shuffle partitions, skew-join handling) — at 100 TB the
  static shuffle-partition count is always wrong for some stage; AQE re-plans
  from runtime stats.
- **Arrow on** for any pandas interchange (vectorized Pandas UDF path).
- **UTC session timezone** — reference events are ISO-8601 UTC
  (cdr_producer.py:86 in the reference); keeps timestamp rendering stable
  against the DuckDB oracle.
- **``nanosAsLong``** — the driver's ``events.parquet`` stores
  TIMESTAMP(NANOS) which Spark's vectorized reader refuses; we read the raw
  int64 nanos and convert with integer division (sources/catalog.py) so no
  precision surprises.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that are safe (and necessary) to apply to an externally-provided
# session at runtime — all are `spark.sql.*` session confs.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Driver testdata writes parquet timestamps with isAdjustedToUTC=false
    # (naive micros). Spark 4 would infer TIMESTAMP_NTZ, which unix_micros /
    # time-window functions reject; read them as plain TIMESTAMP instead.
    # Values are UTC instants either way (session tz is UTC), and keeping the
    # reader type native preserves filter pushdown on timestamp columns.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Without this, any plan under a persist() keeps its static
    # shuffle-partition count — every stage over a small cached relation
    # (the dedup/ANN spines cache their vector tables) pays full-width task
    # overhead. Letting AQE re-partition cached plans sizes those stages from
    # runtime stats at every scale; measured 2-3× on the sf0.1 cosine-dedup
    # bench, and at 100 TB it is what keeps cached intermediates from
    # inheriting a partition count tuned for a different stage.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    """CPU budget: $SPARK_GRAFT_CPUS, else all local cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply session-level confs to a session we did not build (driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; proceed with its value
    return spark


def get_spark(
    app_name: str = "telecom-pipeline-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned session.

    ``shuffle_partitions`` defaults to 2× the core count locally; on a real
    cluster you would size it to (executors × cores × 2-3) or simply let AQE
    coalesce from a high initial number — AQE is enabled either way.
    """
    n = cpus or default_parallelism()
    sp = shuffle_partitions or max(8, 2 * n)
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # files.maxPartitionBytes default 128m is right for the 256 MB-file
        # layout the compaction operator produces (2 splits per file).
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
