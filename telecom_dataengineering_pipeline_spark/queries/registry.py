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
    # -- round-7 additions: no driver row yet — ALWAYS inside the window.
    #    (The round-6 tests-only operators promoted to oracle-checked
    #    queries, the media header round-trip, and the BPE train→encode
    #    composition.)
    "bm25_keyword_retrieval",
    "robust_outlier_daily_revenue",
    "grouped_quantile_event_values",
    "grid_density_event_cells",
    "last_touch_attribution_purchases",
    "copurchase_neighborhood_jaccard",
    "cusum_event_value_shifts",
    "txnlog_column_defaults",
    "media_header_dimensions",
    "bpe_encode_corpus",
    # -- round-7 session-2 additions: registered the same round they were
    #    built (no tests-only lag) — no driver row yet, always in-window.
    "dq_chi_squared_event_mix",
    "pii_k_anonymity_customers",
    "dq_event_type_entropy_daily",
    "ecdf_order_totals_by_priority",
    "te_loo_segment_order_totals",
    "auc_discount_predicts_returns",
    "join_preflight_orders_lineitem",
    "cohort_retention_weekly_users",
    "interarrival_burstiness_event_types",
    "association_rules_copurchase",
    "pmi_document_collocations",
    "rrf_hybrid_doc_ranking",
    "acf_daily_event_value",
    "hits_supply_graph",
    "mobility_radius_of_gyration",
    "interval_overlap_part_launch_window",
    "ks_drift_priority_totals",
    "sessionize_user_events",
    "ols_trend_nation_revenue",
    "gini_revenue_by_nation",
    "adamic_adar_copurchase",
    "ppr_copurchase_seeds",
    "ewma_event_value_chart",
    "cdc_chunk_boundaries",
    "jw_fuzzy_doc_prefixes",
    "wav_header_roundtrip",
    "ewma_stream_daily_means",
    "pca_embedding_projection",
    # -- round-7 session-3 additions: registered the same round they were
    #    built — no driver row yet, always in-window.
    "mk_trend_nation_revenue",
    "mi_priority_status",
    "woe_iv_priority_fulfilled",
    "ndcg_acctbal_vs_spend",
    "km_survival_customer_churn",
    "cf_item_neighbors_copurchase",
    "bfs_copurchase_radius",
    "hw_forecast_event_values",
    "ccf_event_volume_vs_value",
    "ef_event_process_matrix",
    # -- fix-up re-entries (VERDICT r6 items 2 & 3): both queries' prior
    #    driver greens were VACUOUS (0 rows at every SF); their literals/
    #    cohorts were fixed this round and they must re-enter the window to
    #    earn a non-empty row. The rotation test exempts them by name.
    "national_market_share",
    "lapsed_users",
    # -- round-7 session-4 additions: registered AFTER the 50-slot r7
    #    window filled (48 new + 2 fix-ups above) — they sit just outside
    #    it this round, carry local oracle evidence at three SFs, and MUST
    #    head the round-8 window together with the resumed r3/r4-stale
    #    rotation.
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
    # -- stalest driver evidence: last checked in ROUND 3 (all 27
    #    remaining r3 names — the alphabetical tail the r6 window could
    #    not fit).
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
    "text_token_counts",
    "text_unigram_logprob",
    "tfidf_top_terms",
    "tokenizer_pair_merge_stats",
    "training_set_summary",
    "value_distribution_by_type",
    "vocab_topk",
    # -- last checked in ROUND 4 (first 11 alphabetically; the rest rotate
    #    in next round — all stay locally oracle-checked).
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
