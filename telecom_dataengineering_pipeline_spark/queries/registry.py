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
    # -- round-4 additions: no driver row yet — ALWAYS inside the window.
    #    Each later r4 registration appended HERE displaces one r1-stale
    #    name from the 50-entry window (those stay locally oracle-checked).
    "txnlog_table_changes",
    "cms_heavy_hitters",
    "weighted_sample_manifest",
    "bitext_mining_mutual_nn",
    "ann_recall_profile",
    "incremental_matview_sales",
    "value_quantile_sketch",
    "bloom_semi_join_stats",
    "pagerank_purchase_graph",
    "delete_where_orders_txnlog",
    "qty_price_correlation",
    "cardinality_hll_profile",
    "semantic_dedup_pairs",
    "orders_snapshot_diff",
    "text_bigram_logprob",
    "winsorized_value_stats",
    "hard_negative_mining",
    "order_price_deciles",
    "backfill_replace_where_txnlog",
    "windowed_counts_stream",
    "events_key_skew_profile",
    "fk_integrity_audit",
    "national_market_share",
    "ensemble_dedup_verdicts",
    "spatial_proximity_pairs",
    "bpe_training_rounds",
    "volume_shipping_pairs",
    "product_profit_by_nation",
    "returned_items_report",
    "customer_order_counts_dist",
    "promo_revenue_ratio",
    "brand_predicate_revenue",
    "min_cost_supplier_per_part",
    "prospect_balance_anti",
    "fuzzy_prefix_matches",
    "events_gap_fill_ffill",
    "dedup_containment_pairs",
    "order_price_positions",
    "ann_mmr_rerank",
    "daily_revenue_wma_anomaly",
    "txnlog_clone_divergence",
    "stream_dedup_availablenow",
    "order_priority_semi_counts",
    "discount_revenue_uplift",
    "important_part_values",
    "shipmode_priority_matrix",
    "supplier_part_variety",
    "promo_part_shippers",
    "waiting_supplier_ranking",
    "triangle_count_copurchase",
    # -- last driver-checked in ROUND 1 (stalest driver evidence; the
    #    relational/window/DQ tier VERDICT r3 asked to rotate back in)
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
    # -- last driver-checked in round 2 (outside the 50-window unless the
    #    r4 block stays small; still locally verified every round)
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
    # -- everything else (fresh round-3 driver rows) sorts after, in
    #    registration order.
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
