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
    # -- round-6 additions: no driver row yet — ALWAYS inside the window.
    #    (The round-5 tail operators promoted from tests-only, the
    #    approx-cutoff RFM variant, and the composed record-linkage
    #    pipeline.)
    "k_core_copurchase",
    "seasonal_index_nation_revenue",
    "benford_order_prices",
    "melt_nation_order_metrics",
    "sequence_funnel_purchase",
    "sequence_funnel_stream",
    "customer_rfm_segments_approx",
    "entity_resolution_clusters",
    "survivorship_golden_records",
    "record_linkage_golden_records",
    "capped_sample_per_source",
    "boilerplate_line_filter",
    # -- stalest driver evidence: last checked in ROUND 1 (these four sat
    #    at positions 51-54 of the r5 ordering, just outside its window).
    "dq_cardinality_profile",
    "dq_freshness_check",
    "dq_volume_zscore",
    "worst_status_rollup",
    # -- last checked in ROUND 2.
    "corpus_shuffle_manifest",
    "customer_monthly_summary",
    "duplicate_ngram_coverage",
    "embedding_norm_profile",
    "hourly_usage_rollup",
    "pii_redaction_stats",
    "pricing_summary_rollup",
    "quality_filter_verdicts",
    "revenue_by_nation",
    "shipping_priority_topk",
    "star_join_enriched_orders",
    # -- last checked in ROUND 3 (all 50 r3 names are equally stale; the
    #    first 24 alphabetically fill the remaining window slots, the other
    #    26 rotate in next round — all stay locally oracle-checked).
    "ann_bucketed_topk",
    "ann_ivf_kmeans_cells",
    "ann_ivf_kmeans_topk",
    "ann_ivf_nprobe_topk",
    "ann_ivf_pq_topk",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "chunk_dup_coverage",
    "corpus_sampling_manifest",
    "curation_filter_funnel",
    "dataset_split_assignments",
    "decontamination_check",
    "dedup_chunk_groups",
    "dedup_connected_groups",
    "dedup_connected_groups_star",
    "dedup_effective_stats",
    "dedup_embedding_cosine",
    "dedup_exact_groups",
    "dedup_incremental_lsh_probe",
    "dedup_jaccard_pairs",
    "dedup_keep_best",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_fingerprints",
    "dedup_simhash_pairs",
    # -- everything else (fresh round-4/round-5 driver rows) sorts after,
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
