"""Round-16 growth tier: property and plan invariants beyond value parity
(decon source attribution, broadcast phrase tagger, dedup-quality bias
bands, water-filling token budget schedule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.curation import (
    decontamination_overlap,
    decontamination_source_attribution,
    dedup_quality_bias,
    token_budget_schedule,
)
from telecom_dataengineering_pipeline_spark.llmprep.text import (
    PHRASE_TAGS,
    phrase_tag_profile,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_phrase_tagger_broadcasts_the_dictionary(spark, sf_smoke):
    """The dictionary must be the broadcast side: the corpus bigram
    stream never shuffles for the tag join."""
    out = phrase_tag_profile(load_table(spark, sf_smoke, "documents"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_phrase_tagger_counts_multiplicity(spark):
    docs = spark.createDataFrame(
        [(1, "slow query slow query batch scan", "s1"),
         (2, "slow query", "s1"),
         (3, "nothing matches here", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {(r.source, r.tag): (r.n_hits, r.n_docs)
            for r in phrase_tag_profile(docs).collect()}
    assert rows[("s1", "perf")] == (3, 2)   # two docs, three occurrences
    assert rows[("s1", "scan")] == (1, 1)
    assert ("s2", "perf") not in rows


def test_phrase_dictionary_is_well_formed():
    assert len({p for p, _ in PHRASE_TAGS}) == len(PHRASE_TAGS)
    assert all(len(p.split()) == 2 for p, _ in PHRASE_TAGS)


def test_source_attribution_bounded_by_overlap(spark, sf_smoke):
    """Per (doc-independent) split: attributed distinct shingles for any
    single source never exceed the decontamination audit's total
    contaminated shingle count for that split."""
    docs = load_table(spark, sf_smoke, "documents")
    attr = decontamination_source_attribution(docs)
    decon = decontamination_overlap(docs)
    per_split_attr = {
        r.split: r.mx
        for r in attr.groupBy("split").agg(F.max("n_shingles").alias("mx")).collect()
    }
    per_split_total = {
        r.split: r.tot
        for r in decon.groupBy("split").agg(F.sum("n_contaminated").alias("tot")).collect()
    }
    for split, mx in per_split_attr.items():
        assert mx <= per_split_total[split]


def test_dedup_quality_bias_partitions_the_corpus(spark, sf_smoke):
    """Bands partition the corpus: n_docs sums to the doc count; the
    'unique' band carries zero groups; group docs = corpus − unique."""
    docs = load_table(spark, sf_smoke, "documents")
    groups = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20), (4, 20)],
        "doc_id long, group_id long",
    )
    out = {r.band: r for r in dedup_quality_bias(docs, groups).collect()}
    n_docs = docs.count()
    assert sum(r.n_docs for r in out.values()) == n_docs
    assert out["unique"].n_groups == 0
    assert out["pair"].n_docs == 2 and out["pair"].n_groups == 1
    assert out["cluster"].n_docs == 3 and out["cluster"].n_groups == 1
    assert out["unique"].n_docs == n_docs - 5


def test_token_budget_schedule_waterfilling_invariants(spark):
    """The closed-form λ matches the defining properties of capped
    water-filling: caps respected, budget exactly filled (B < Σcap),
    uncapped allocations proportional to weight (equal epochs·r), and
    the capped set is a prefix of the r-sorted order."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), src)
         for i, (n, src) in enumerate(
             [(10, "tiny")] * 2 + [(50, "small")] * 4 + [(200, "mid")] * 5
             + [(1000, "big")] * 3
         )],
        "doc_id long, text string, source string",
    )
    rows = token_budget_schedule(docs, budget_factor=1.5, max_epochs=2.0).collect()
    total = sum(r.n_tokens for r in rows)
    budget = 1.5 * total
    # Caps respected and epochs ≤ max everywhere.
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens + 0.01
        assert r.epochs <= 2.0 + 1e-6
    # B < Σcap here, so the budget is filled exactly.
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 0.05
    assert all(abs(r.budget_fill - 1.0) < 1e-6 for r in rows)
    # Capped set is the small-source prefix; uncapped sources share one λ
    # (alloc/weight constant).
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    capped_flags = [r.capped for r in by_tokens]
    assert capped_flags == sorted(capped_flags, reverse=True)
    lams = [
        r.alloc_tokens / r.mix_weight for r in rows if not r.capped
    ]
    assert lams and max(lams) - min(lams) < max(lams) * 1e-4
    assert any(r.capped for r in rows)  # fixture genuinely exercises the cap


def test_token_budget_schedule_all_capped_when_budget_exceeds_caps(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d", "x"), (2, "a b c d e f g h", "y")],
        "doc_id long, text string, source string",
    )
    rows = token_budget_schedule(docs, budget_factor=5.0, max_epochs=2.0).collect()
    for r in rows:
        assert r.capped
        assert abs(r.epochs - 2.0) < 1e-6
    # Σalloc = Σcap = 2×tokens < B=5×tokens → fill = 2/5.
    assert all(abs(r.budget_fill - 0.4) < 1e-6 for r in rows)


def test_token_budget_schedule_single_scan_no_cartesian(spark, sf_smoke):
    """All the window math runs on the #sources-row aggregate: the corpus
    parquet is scanned once and nothing cross-joins."""
    out = token_budget_schedule(load_table(spark, sf_smoke, "documents"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_semdedup_prunes_duplicates_keeps_min_id(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        semdedup_cell_prune,
    )

    # vec 0 is the (only) centroid; 0/1 identical, 2 orthogonal-ish.
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.2])],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in semdedup_cell_prune(emb, threshold=0.9).collect()}
    assert not rows[0].pruned and rows[0].max_lower_cos is None  # min-id keeper
    assert rows[1].pruned and rows[1].max_lower_cos == 1.0
    assert not rows[2].pruned


def test_semdedup_pruned_iff_threshold(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        semdedup_cell_prune,
    )

    out = semdedup_cell_prune(load_table(spark, sf_smoke, "embeddings"), threshold=0.35)
    bad = out.filter(
        F.col("pruned") != F.coalesce(F.col("max_lower_cos") >= 0.35, F.lit(False))
    )
    assert bad.count() == 0
    n = out.count()
    assert out.select("vec_id").distinct().count() == n  # one verdict per vector


def test_novelty_first_doc_is_fully_novel(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.curation import (
        ngram_novelty_scores,
    )
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import shingle_stream

    docs = load_table(spark, sf_smoke, "documents")
    out = ngram_novelty_scores(docs)
    first = out.orderBy("doc_id").first()
    assert first.novelty_ratio == 1.0
    # Every distinct corpus shingle is novel in exactly one document.
    n_distinct = (
        shingle_stream(docs).select(F.xxhash64("shingle")).distinct().count()
    )
    assert out.agg(F.sum("n_novel")).first()[0] == n_distinct


def test_contamination_mixing_normalizes_and_penalizes(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.curation import (
        contamination_weighted_mixing,
    )

    rows = contamination_weighted_mixing(load_table(spark, sf_smoke, "documents")).collect()
    assert abs(sum(r.adj_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.contamination_share for r in rows) - 1.0) < 1e-4
    # The most-contaminated source must lose weight relative to its
    # temperature weight; a least-contaminated one gains or holds.
    worst = max(rows, key=lambda r: r.contamination_share)
    assert worst.adj_weight < worst.mix_weight


def test_contamination_mixing_zero_leak_corpus_keeps_weights(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.curation import (
        contamination_weighted_mixing,
    )

    # Two docs with disjoint vocabularies and <3 tokens shared: no shingle
    # overlap across splits → zero hits everywhere → adj == mix.
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(10)), f"s{i%2}") for i in range(20)],
        "doc_id long, text string, source string",
    )
    rows = contamination_weighted_mixing(docs).collect()
    assert all(r.n_hits == 0 for r in rows)
    assert all(r.contamination_share == 0.0 for r in rows)
    for r in rows:
        assert abs(r.adj_weight - r.mix_weight) < 2e-6


def test_dedup_quality_bias_malformed_groups_cannot_fan_out(spark, sf_smoke):
    """A doc listed in two groups reduces to its min group before the
    join: n_docs still partitions the corpus (ADVICE-r11 rule)."""
    docs = load_table(spark, sf_smoke, "documents")
    malformed = spark.createDataFrame(
        [(0, 10), (0, 30), (1, 10), (2, 20), (3, 20), (4, 20)],
        "doc_id long, group_id long",
    )
    out = {r.band: r for r in dedup_quality_bias(docs, malformed).collect()}
    assert sum(r.n_docs for r in out.values()) == docs.count()
    assert out["pair"].n_docs == 2      # docs 0,1 via min-group 10
    assert out["cluster"].n_docs == 3


def test_knn_label_agreement_properties(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        knn_label_agreement,
    )

    out = knn_label_agreement(load_table(spark, sf_smoke, "embeddings"), k=5)
    rows = out.collect()
    assert len(rows) == 500                      # one verdict per vector
    for r in rows:
        assert r.n_neighbors <= 5
        assert r.n_same_label <= r.n_neighbors
        if r.n_neighbors == 0:
            assert r.agreement is None and not r.suspect
        else:
            assert abs(r.agreement - r.n_same_label / r.n_neighbors) < 1e-6
            assert r.suspect == (r.agreement <= 0.2)
    assert any(r.suspect for r in rows)          # audit is non-vacuous


def test_knn_label_agreement_planted_noise(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        knn_label_agreement,
    )

    # One tight cluster around the centroid (vec 0), all label 1 except a
    # planted mislabel; k=3 neighbors all agree except for the plant.
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) * 1e-3], 1 if i != 2 else 9) for i in range(4)],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {r.vec_id: r for r in knn_label_agreement(emb, k=3).collect()}
    assert rows[2].suspect and rows[2].n_same_label == 0
    assert not rows[0].suspect and abs(rows[0].agreement - 2 / 3) < 1e-6


def test_quality_drift_by_source_bounds(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.curation import (
        quality_drift_by_source,
    )

    docs = load_table(spark, sf_smoke, "documents")
    rows = quality_drift_by_source(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0.0 <= r.jsd_bits <= 1.0 + 1e-9   # JSD is bounded by 1 bit
        assert r.status in ("stable", "moderate_shift", "major_shift")


def test_quality_drift_identical_sources_are_stable(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.curation import (
        quality_drift_by_source,
    )

    # Every source has the same single-doc text → identical distributions
    # → JSD exactly 0, status stable.
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog again and again", f"s{i%3}")
         for i in range(30)],
        "doc_id long, text string, source string",
    )
    rows = quality_drift_by_source(docs).collect()
    assert all(r.jsd_bits == 0.0 and r.status == "stable" for r in rows)
