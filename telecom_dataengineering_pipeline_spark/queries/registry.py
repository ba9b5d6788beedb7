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
    # -- ROUND-8 WINDOW HEAD (VERDICT r7 item 1): the 30 round-7 session-4
    #    registrations landed AFTER the r7 window filled and have NO driver
    #    row yet (each carries three-SF local oracle evidence + the judge's
    #    10/10 sample). They head the window; NO new r8 registration may
    #    displace them (new r8 names register at positions 51+ and head the
    #    r9 window, same pattern).
    "anova_event_value_by_type",
    "spearman_acctbal_vs_spend",
    "spatial_cluster_event_cells",
    "kw_daily_value_by_type",
    "welch_purchase_vs_view_value",
    "logrank_churn_building_vs_auto",
    "pr_at_k_acctbal_vs_spend",
    "lift_deciles_order_returns",
    "calibration_discount_returns",
    "assortativity_copurchase",
    "closeness_copurchase_seeds",
    "pettitt_daily_event_value",
    "periodogram_daily_event_volume",
    "variants_user_journeys",
    "cycle_time_by_entry_event",
    "jsd_event_mix_halves",
    "theil_spend_by_nation",
    "kappa_discount_rule_vs_returns",
    "report_discount_rule_vs_returns",
    "nearest_tower_load",
    "bh_fdr_pettitt_alerts",
    "stratified_alloc_event_sample",
    "mase_naive7_event_values",
    "kendall_daily_volume_vs_value",
    "qnorm_acctbal_across_segments",
    "hhi_revenue_by_nation",
    "vocab_richness_profile",
    "conversion_latency_profile",
    "zprop_entry_view_vs_click",
    "jsd_stream_event_mix",
    # -- ROTATION SLOTS 31-50 (VERDICT r7 items 1-2): stalest driver
    #    evidence — last checked in ROUND 3. The first 20 of the 27
    #    remaining r3 names fill the rest of the r8 window; the last 7
    #    (below) plus the r4 tier queue for r9.
    "dedup_simhash_pairs",
    "dedup_source_overlap",
    "doc_chunking",
    "dq_totalprice_reconciliation",
    "embedding_centroid_outliers",
    "embedding_lsh_bucket_profile",
    "embedding_sq8_profile",
    "fraud_stream_availablenow",
    "jdbc_source_contract",
    "knn_cosine_bruteforce",
    "merge_upsert_orders",
    "merge_upsert_orders_txnlog",
    "multimodal_feature_extract",
    "scd2_customer_dim",
    "sequence_packing_stats",
    "session_stream_availablenow",
    "source_mixing_weights",
    "text_langid_heuristic",
    "text_quality_scores",
    "text_repetition_metrics",
    # ---- r8 window boundary: everything below is OUTSIDE the 50-slot
    #      window this round and queues for the r9 rotation head.
    # -- remaining 7 r3-stale names (r9 rotation, ahead of the r4 tier).
    "text_token_counts",
    "text_unigram_logprob",
    "tfidf_top_terms",
    "tokenizer_pair_merge_stats",
    "training_set_summary",
    "value_distribution_by_type",
    "vocab_topk",
    # -- last checked in ROUND 4 (r9 rotation after the r3 tail; the rest
    #    rotate in later rounds — all stay locally oracle-checked).
    "ann_mmr_rerank",
    "ann_recall_profile",
    "backfill_replace_where_txnlog",
    "bitext_mining_mutual_nn",
    "bloom_semi_join_stats",
    "bpe_training_rounds",
    "brand_predicate_revenue",
    "cardinality_hll_profile",
    "cms_heavy_hitters",
    "customer_order_counts_dist",
    "daily_revenue_wma_anomaly",
    # -- everything else (fresher round-5/round-6 driver rows) sorts after,
    #    in registration order.
    #
    # ROUND-9 WINDOW PLAN (do this first next round): the 33 round-8
    # registrations below sort at positions 69+ (unlisted, registration
    # order) and have NO driver row — they head the r9 window, then the
    # 7 r3-stale names above (positions 51-57), then ~10 r4-stale names,
    # keeping the >=20-rotation-slot pin satisfied (33 + 7 + 10 = 50).
    # r8 names (authoritative source: @register calls in
    # queries/round11.py; every one carries three-SF local oracle
    # evidence from its registration day):
    # pca_variance_explained, orphan_lineitems_injected, dq_accepted_values_injected,
    # attribution_stream_purchases, ann_hamming_topk, ols2_price_on_qty_discount,
    # kn_bigram_doc_scores, clustering_coeff_copurchase, cuped_event_value_experiment,
    # readability_doc_scores, iceberg_export_roundtrip, croston_error_demand,
    # rolling_median_event_values, abc_parts_by_revenue, impute_event_values_median,
    # sssp_copurchase_costs, seasonal_decompose_event_values, growth_accounting_daily_users,
    # winsorize_event_values, na_hazard_customer_churn, did_event_value_quasi_experiment,
    # growth_stream_daily_users, event_type_overlap_matrix, dq_expectations_orders_profile,
    # hwm_forecast_event_values, interpolate_error_demand_series, pivot_status_by_priority,
    # magnitude_profile_order_totals, mrl_truncation_recall, wilson_ci_fulfilled_by_nation,
    # dwell_time_by_event_type, contingency_priority_status, char_class_doc_profile
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
