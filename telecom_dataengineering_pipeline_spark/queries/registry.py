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

# Explicit emission order for ``queries()`` / ``oracle_sql()``.
#
# The driver's correctness harness verifies the first 50 entries of
# ``queries()`` per round.  Round 1 proved the first 50 registration-order
# entries green (CORRECTNESS_r01.json) but left the llmprep/writeside layer
# (registered last) driver-unchecked.  This list rotates the window: the 22
# queries without a round-1 driver row come first, then round-2 additions,
# then the highest-coverage round-1-green queries; the tail (overlapping
# TPC-H variants, scalar-function twins, the DQ head — all value-exact in
# CORRECTNESS_r01.json) falls outside the window.  Names not present here
# sort after the list in registration order; names listed but not (yet)
# registered are simply skipped.
DRIVER_ORDER: list[str] = [
    # -- round-5 additions: no driver row yet — ALWAYS inside the window.
    #    Each later r5 registration appended HERE displaces one stale name
    #    from the 50-entry window (those stay locally oracle-checked).
    "psi_value_drift",
    "hll_set_ops_users",
    "lpa_copurchase_communities",
    "cdf_replica_apply",
    "holt_forecast_nation_revenue",
    "event_transition_matrix",
    "customer_rfm_segments",
    "txnlog_generated_columns",
    "txnlog_partition_evolution",
    "matview_cursor_refresh",
    # -- last driver-checked in ROUND 1 (stalest driver evidence; VERDICT
    #    r4 item 4: the remaining window slots go to these — 44 names, so
    #    with few r5 additions the tail spills to the stalest r2 names
    #    below; with more additions the last r1 names wait one round,
    #    still locally oracle-checked).
    "latest_event_per_user_type",
    "top_orders_per_segment",
    "asof_join_price_changes",
    "range_join_scd_versions",
    "fraud_impossible_travel",
    "fraud_velocity_alerts",
    "fraud_alert_stream",
    "user_sliding_window_counts",
    "user_sessionization",
    "daily_revenue_moving_avg",
    "event_type_pivot",
    "lineitem_cube_rollup",
    "user_funnel_stages",
    "cohort_retention_triangle",
    "incremental_lookback_slice",
    "csv_seed_dim_towers",
    "orphan_lineitems_check",
    "threshold_violations_union",
    "dim_date_spine",
    "value_distribution_check",
    "msisdn_format_validation",
    "row_count_anomaly_check",
    "top_orders_by_price",
    "event_flags_projection",
    "small_quantity_revenue",
    "top_supplier_by_revenue",
    "large_quantity_customers",
    "customers_with_open_orders",
    "users_active_both_periods",
    "hourly_usage_rollup_salted",
    "lapsed_users",
    "customer_pii_masked_keys",
    "order_date_math",
    "event_props_json_decode",
    "haversine_tower_distances",
    "user_event_deltas",
    "session_stats_rollup",
    "dq_unique_violations",
    "dq_accepted_values_violations",
    "dq_null_rate_profile",
    "dq_cardinality_profile",
    "dq_volume_zscore",
    "dq_freshness_check",
    "worst_status_rollup",
    # -- last driver-checked in round 2 (next-stalest tier: enters the
    #    window only if the r5 block + r1 tier leave room)
    "pii_redaction_stats",
    "duplicate_ngram_coverage",
    "quality_filter_verdicts",
    "corpus_shuffle_manifest",
    "embedding_norm_profile",
    "hourly_usage_rollup",
    "pricing_summary_rollup",
    "revenue_by_nation",
    "shipping_priority_topk",
    "star_join_enriched_orders",
    "customer_monthly_summary",
    # -- everything else (fresh round-3/round-4 driver rows) sorts after,
    #    in registration order.
]


def _ordered_specs() -> list[QuerySpec]:
    rank = {name: i for i, name in enumerate(DRIVER_ORDER)}
    default = len(DRIVER_ORDER)
    names = sorted(
        REGISTRY,
        key=lambda n, _ins={m: j for j, m in enumerate(REGISTRY)}: (
            rank.get(n, default),
            _ins[n],
        ),
    )
    return [REGISTRY[n] for n in names]


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
