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
    # -- never driver-checked in round 1 (llmprep 18, writeside 2, quality tail 2)
    "text_quality_scores",
    "text_langid_heuristic",
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_fingerprints",
    "knn_cosine_bruteforce",
    "embedding_lsh_bucket_profile",
    "ann_bucketed_topk",
    "multimodal_feature_extract",
    "ann_ivf_topk",
    "text_token_counts",
    "dedup_embedding_cosine",
    "doc_chunking",
    "dataset_split_assignments",
    "training_set_summary",
    "ann_ivf_nprobe_topk",
    "dedup_connected_groups",
    "merge_upsert_orders",
    "scd2_customer_dim",
    "dq_totalprice_reconciliation",
    "value_distribution_by_type",
    # -- round-2 additions (registered as they are built)
    "fraud_stream_availablenow",
    "dedup_connected_groups_star",
    "jdbc_source_contract",
    "decontamination_check",
    "sequence_packing_stats",
    "text_repetition_metrics",
    "vocab_topk",
    "tfidf_top_terms",
    "source_mixing_weights",
    "curation_filter_funnel",
    "dedup_keep_best",
    "dedup_source_overlap",
    "text_unigram_logprob",
    "ann_ivf_kmeans_cells",
    "ann_ivf_kmeans_topk",
    "corpus_sampling_manifest",
    "dedup_effective_stats",
    # -- round-4 additions (must stay inside the 50-entry driver window)
    "txnlog_table_changes",
    "cms_heavy_hitters",
    "weighted_sample_manifest",
    "bitext_mining_mutual_nn",
    # -- round-3 additions
    "dedup_incremental_lsh_probe",
    "embedding_centroid_outliers",
    "tokenizer_pair_merge_stats",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "merge_upsert_orders_txnlog",
    "session_stream_availablenow",
    "dedup_chunk_groups",
    "embedding_sq8_profile",
    "dedup_simhash_pairs",
    "chunk_dup_coverage",
    "pii_redaction_stats",
    "duplicate_ngram_coverage",
    "quality_filter_verdicts",
    "corpus_shuffle_manifest",
    "embedding_norm_profile",
    # -- round-1-green, highest coverage value (distinct §2 IDs)
    "hourly_usage_rollup",
    "pricing_summary_rollup",
    "revenue_by_nation",
    "shipping_priority_topk",
    "star_join_enriched_orders",
    "customer_monthly_summary",
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
