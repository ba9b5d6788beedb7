"""Round-3 registrations: incremental LSH probe, centroid outliers, and
BPE pair-merge counting — behavior invariants beyond the value-parity gate,
plus the band-geometry / zero-norm guards and the driver-window rotation."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.curation import pair_merge_stats
from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
    _check_band_geometry,
    incremental_lsh_probe,
    minhash_near_dup_pairs,
)
from telecom_dataengineering_pipeline_spark.llmprep.similarity import centroid_outliers


def test_incremental_probe_finds_cross_side_dups_only(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    index = spark.createDataFrame(
        [(0, base), (2, "completely different words about spark adaptive execution")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        # 1 ≈ index doc 0; 3 matches nothing; 5 ≈ index doc 2's twin IN THE
        # SAME BATCH (must NOT be emitted — probe is strictly batch×index).
        [(1, base), (3, "unrelated corpus text entirely"), (5, base)],
        "doc_id LONG, text STRING",
    )
    rows = incremental_lsh_probe(index, batch, threshold=0.5).collect()
    pairs = {(r["batch_doc"], r["index_doc"]) for r in rows}
    assert (1, 0) in pairs and (5, 0) in pairs
    # no batch-batch or index-index pairs
    assert all(b in (1, 3, 5) and i in (0, 2) for b, i in pairs)
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0


def test_band_geometry_validation():
    assert _check_band_geometry(64, 16) == 4
    with pytest.raises(ValueError, match="evenly divide"):
        _check_band_geometry(64, 24)
    with pytest.raises(ValueError, match="positive"):
        _check_band_geometry(64, 0)


def test_minhash_rejects_bad_band_geometry(spark):
    docs = spark.createDataFrame([(0, "a b c d e")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_near_dup_pairs(docs, num_perm=64, bands=24)


def test_centroid_outlier_zero_vector_surfaces_first(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.9, 0.1], 7),
            (2, [0.0, 0.0], 7),  # zero vector: cosine undefined
            (3, [0.8, 0.3], 7),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    rows = centroid_outliers(emb, bottom_k=2).collect()
    by_rank = {r["rank"]: r for r in rows}
    # the degenerate vector is the TOP outlier (NULL cosine, nulls first),
    # not silently dropped
    assert by_rank[1]["vec_id"] == 2
    assert by_rank[1]["cosine_to_centroid"] is None


def test_pair_merge_counts_multiplicity_and_df(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")],  # doc 2: no pairs
        "doc_id LONG, text STRING",
    )
    rows = {r["pair"]: r for r in pair_merge_stats(docs, k=10).collect()}
    assert rows["a b"]["tf"] == 3 and rows["a b"]["df"] == 2  # multiplicity kept
    assert rows["b a"]["tf"] == 1 and rows["b a"]["df"] == 1
    assert rows["b c"]["df"] == 1
    assert "x" not in rows


# The 30 round-7 session-4 registrations: landed AFTER the r7 window
# filled, so their FIRST driver row is the r8 window (VERDICT r7 item 1).
S4_NAMES = [
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
]


def test_round8_window_is_evidence_catchup():
    """Round-8 window contract (VERDICT r7 item 1, pinned): the driver
    verifies the first 50 entries of queries() per round. This round the
    head is NOT new registrations — it is the 30 round-7 session-4 names
    (zero driver rows, three-SF local evidence) followed by 20 r3-stale
    rotation slots. New round-8 registrations sit at positions 51+ (with
    three-SF local oracle evidence) and head the round-9 window, exactly
    the session-4 pattern."""
    from telecom_dataengineering_pipeline_spark.queries.registry import (
        oracle_sql,
        queries,
    )

    names = list(queries())
    window = names[:50]
    assert window[:30] == S4_NAMES, "session-4 names must head the r8 window in order"
    assert set(S4_NAMES) <= set(oracle_sql())
    # Rotation slots 31-50: the first 20 (alphabetically) of the 27 names
    # whose latest driver evidence is round 3 — the stalest tier.
    r3_rotation = window[30:]
    assert r3_rotation[0] == "dedup_simhash_pairs"
    assert r3_rotation[-1] == "text_repetition_metrics"
    assert len(r3_rotation) == 20
    # The remaining 7 r3 names queue immediately after the window so they
    # head the r9 rotation.
    assert names[50:57] == [
        "text_token_counts",
        "text_unigram_logprob",
        "tfidf_top_terms",
        "tokenizer_pair_merge_stats",
        "training_set_summary",
        "value_distribution_by_type",
        "vocab_topk",
    ]


def test_driver_window_refreshes_stalest_evidence():
    """Rotation contract (VERDICT r4 item 4, renewed every round): every
    slot of the 50-entry driver window goes to a query with NO driver row
    yet or to the stalest-evidence names — no name inside the window may
    have STRICTLY FRESHER driver evidence than a name waiting outside it.
    NEW (VERDICT r7 item 2): a minimum ROTATION BUDGET — at least 20
    window slots must be refreshes of already-driver-checked names, so the
    stale tier drains even in heavy-build rounds. Registering >30 new
    queries in one round can no longer displace the whole rotation."""
    import json

    from telecom_dataengineering_pipeline_spark.queries.registry import queries

    root = os.path.join(os.path.dirname(__file__), "..")
    seen: dict[str, int] = {}
    for rnd in (1, 2, 3, 4, 5, 6, 7):
        p = os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(p):
            continue
        for name in json.load(open(p)):
            seen[name] = rnd
    names = list(queries())
    window, outside = names[:50], names[50:]
    assert len(window) == 50
    # Stalest-first: nothing inside the window may be fresher than anything
    # waiting outside.
    in_ev = [seen[n] for n in window if n in seen]
    out_ev = [seen[n] for n in outside if n in seen]
    assert out_ev
    if in_ev:
        assert max(in_ev) <= min(out_ev), (
            f"window holds evidence from round {max(in_ev)} while a staler "
            f"round-{min(out_ev)} name waits outside"
        )
    # Minimum rotation budget: >= 20 slots are stale-refreshes.
    assert len(in_ev) >= 20, (
        f"only {len(in_ev)} rotation slots — the pinned minimum is 20 "
        "(VERDICT r7 item 2); new registrations go to positions 51+"
    )


def test_pq_encode_shape_and_self_distance(spark):
    """Every vector gets exactly m codes; a vector that IS a codeword seed
    reconstructs its own subspaces well enough that its ADC self-distance
    ranks it nearest to an identical twin."""
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_subvectors,
    )

    base = [float(i % 7) - 3.0 for i in range(16)]
    rows = [(0, base), (1, base), (2, [v + 5.0 for v in base]), (25, [v - 2.0 for v in base])]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    codes = pq_encode(emb, m=4, dims=16, codeword_mod=25, iters=1)
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == 4 for r in per_vec) and len(per_vec) == 4

    out = pq_adc_topk(emb, query_ids=[0], k=3, m=4, dims=16, codeword_mod=25, iters=1)
    top = {r["rank"]: r for r in out.collect()}
    # identical twin shares every code → ADC distance is the same for both,
    # and vec 1 (the twin) wins the tie-break at rank 1 or 2
    assert top[1]["neighbor_id"] == 1

    with pytest.raises(ValueError, match="evenly divide"):
        pq_subvectors(emb, m=5, dims=16)


def test_pq_query_path_reads_codes_not_vectors(spark):
    """The ADC join broadcasts the distance table onto the code relation —
    no shuffle of the corpus codes, no cartesian product."""
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import pq_adc_topk
    from telecom_dataengineering_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    out = pq_adc_topk(emb, query_ids=list(range(10)), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # ADC reduction + ranking: the dist-table join side is broadcast
    assert "BroadcastHashJoin" in plan


def test_probe_against_persisted_index_roundtrip(spark, tmp_path):
    """The production ingest flow: index tables built once, PERSISTED to
    parquet, read back, probed — identical pairs to the derive-both-sides
    path (the index never re-tokenizes)."""
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
        incremental_lsh_probe_prepared,
        lsh_index_tables,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    index = spark.createDataFrame(
        [(0, base), (2, "completely different words about spark adaptive execution")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame([(1, base)], "doc_id LONG, text STRING")

    banded, shingles = lsh_index_tables(index)
    bp, sp = str(tmp_path / "banded"), str(tmp_path / "shingles")
    banded.write.parquet(bp)
    shingles.write.parquet(sp)

    out = incremental_lsh_probe_prepared(
        spark.read.parquet(bp), spark.read.parquet(sp), batch, threshold=0.5
    ).collect()
    assert {(r["batch_doc"], r["index_doc"]) for r in out} == {(1, 0)}
    assert all(r["jaccard"] == 1.0 for r in out)
