"""Curation-tier operator invariants beyond value parity: mixing-weight
normalization, funnel first-fail attribution, keep-best tie-breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.curation import (
    FUNNEL_STAGES,
    cluster_representatives,
    filter_funnel,
    source_mixing_weights,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_mixing_weights_normalize_and_upweight_small(spark):
    docs = spark.createDataFrame(
        [(i, "w " * 10, "small") for i in range(5)]
        + [(i + 100, "w " * 10, "big") for i in range(80)],
        "doc_id LONG, text STRING, source STRING",
    )
    rows = {r["source"]: r for r in source_mixing_weights(docs).collect()}
    total_w = sum(r["mix_weight"] for r in rows.values())
    assert abs(total_w - 1.0) < 1e-5
    # α=0.5 temperature: small source's weight share exceeds its token share
    small_tok_share = rows["small"]["n_tokens"] / (
        rows["small"]["n_tokens"] + rows["big"]["n_tokens"]
    )
    assert rows["small"]["mix_weight"] > small_tok_share
    # epochs = budget * weight / tokens — small high-weight source repeats more
    assert rows["small"]["epochs_at_budget"] > rows["big"]["epochs_at_budget"]


def test_funnel_first_fail_attribution(spark):
    # doc 1 fails length AND lang — must be charged to length (stage 0) only;
    # doc 2 passes length, fails lang; doc 3 passes everything.
    docs = spark.createDataFrame(
        [
            (1, "short", "zh", 10),
            (2, "the of and is a plain english sentence with the usual words", "ja", 300),
            (3, "the quick brown fox jumps over a lazy dog of the morning", "en", 300),
        ],
        "doc_id LONG, text STRING, lang STRING, n_chars LONG",
    )
    out = {r["stage"]: r for r in filter_funnel(docs).collect()}
    assert [out[s]["stage_idx"] for s in FUNNEL_STAGES] == [0, 1, 2, 3]
    assert out["length"]["n_in"] == 3 and out["length"]["n_dropped"] == 1
    assert out["lang_allowed"]["n_in"] == 2 and out["lang_allowed"]["n_dropped"] == 1
    assert out["repetition"]["n_dropped"] == 0
    assert out["langid_agree"]["n_out"] == 1
    # funnel telescopes: each stage's n_out is the next stage's n_in
    for a, b in zip(FUNNEL_STAGES, FUNNEL_STAGES[1:]):
        assert out[a]["n_out"] == out[b]["n_in"]


def test_keep_best_ties_and_singletons(spark):
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (9, 40)],
        "doc_id LONG, n_chars LONG",
    )
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id LONG, group_id LONG"
    )
    out = {r["group_id"]: r for r in cluster_representatives(docs, groups).collect()}
    # cluster 1: max n_chars is tied 2/3 -> lowest doc_id wins
    assert out[1]["rep_doc_id"] == 2 and out[1]["rep_chars"] == 90
    assert out[1]["n_members"] == 3
    # doc 9 is in no pair: singleton cluster keyed by its own id
    assert out[9]["rep_doc_id"] == 9 and out[9]["n_members"] == 1


def test_funnel_is_single_scan(spark, sf_smoke):
    # the corpus-sized side of the funnel must be one scan into one partial
    # agg; the 4-row funnel arithmetic may exchange freely
    df = filter_funnel(load_table(spark, sf_smoke, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 2  # corpus scan + count(*) scan


@pytest.mark.slow
def test_kmeans_centroids_move_and_tighten(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        ivf_kmeans_assign,
    )
    from telecom_dataengineering_pipeline_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    seeded = ivf_kmeans_assign(emb, iters=0)  # = the hash-seeded ivf_assign cells
    learned = ivf_kmeans_assign(emb, iters=2)
    q0 = seeded.agg(F.sum("c_cos")).collect()[0][0]
    q2 = learned.agg(F.sum("c_cos")).collect()[0][0]
    # Lloyd rounds monotonically improve the quantization objective
    assert q2 > q0
    # every vector keeps exactly one cell
    assert learned.count() == emb.count()
    assert learned.select("vec_id").distinct().count() == emb.count()


def test_mixing_weights_single_corpus_pass(spark, sf_smoke):
    # one corpus scan; exchanges = the source groupBy + the #sources-row
    # whole-frame window, nothing corpus-sized beyond the first
    df = source_mixing_weights(load_table(spark, sf_smoke, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") <= 2
    assert "Python" not in plan  # pure JVM column expressions


def test_bpe_rounds_hand_computed_and_greedy_self_pairs(spark):
    """BPE training loop on a hand-checkable corpus: round-1 winner and
    merge effects verified by hand, and a self-pair run ('a a a') merges
    greedily left-to-right into (a a), a — the replace() semantics the
    whole construction rests on."""
    from telecom_dataengineering_pipeline_spark.llmprep.bpe import bpe_train_rounds

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b c a b")], "doc_id LONG, text STRING"
    )
    rows = {r["round"]: r for r in bpe_train_rounds(docs, rounds=2).collect()}
    # round 1: (a,b) wins with tf 3; doc0 -> [a, a, 'a b'], doc1 -> ['a b', c, 'a b']
    assert rows[1]["merged_pair"] == "a b" and rows[1]["tf"] == 3
    assert rows[1]["tokens_after"] == 6 and rows[1]["vocab_after"] == 3
    # round 2: all pairs tf 1 -> tie-break picks (a, a); greedy run merge
    assert rows[2]["merged_pair"] == "a a" and rows[2]["tf"] == 1
    assert rows[2]["tokens_after"] == 5 and rows[2]["vocab_after"] == 3

    # pure self-pair corpus: "a a a a a" -> (a a)(a a) a after one merge
    solo = spark.createDataFrame([(0, "a a a a a")], "doc_id LONG, text STRING")
    r1 = bpe_train_rounds(solo, rounds=1).collect()[0]
    assert r1["merged_pair"] == "a a" and r1["tf"] == 4  # occurrences counted
    assert r1["tokens_after"] == 3 and r1["vocab_after"] == 2


def test_bm25_ranks_relevant_docs_and_matches_bruteforce(spark):
    """BM25 against a brute-force reference with the identical
    round-then-decimal accumulation; rarity (IDF) must beat raw repetition
    of a common term, and doc-length normalization must favor the short
    focused doc over the long padded one."""
    import math

    from telecom_dataengineering_pipeline_spark.llmprep.text import bm25_scores

    docs = [
        (0, "spark shuffle join"),                      # short, focused
        (1, "spark " + "filler " * 40 + "shuffle"),     # long, padded
        (2, "spark spark spark spark"),                  # common term repeated
        (3, "unrelated words entirely"),
        (4, "shuffle tuning guide"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms = ["spark", "shuffle"]
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"])
        for r in bm25_scores(df, terms, top_k=10).collect()
    }

    # brute force with the same shapes
    import collections

    k1, b = 1.2, 0.75
    toks = {d: t.lower().strip().split() for d, t in docs}
    dls = {d: float(len(t)) for d, t in toks.items()}
    avgdl = sum(dls.values()) / len(dls)
    n = float(len(docs))
    tfs = {d: collections.Counter(t) for d, t in toks.items()}
    ref = {}
    for d in toks:
        parts = []
        for term in terms:
            tf = float(tfs[d][term])
            if tf == 0:
                continue
            dfreq = float(sum(1 for x in tfs.values() if x[term] > 0))
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[d] / avgdl))
            parts.append(round(idf * tfn, 9))
        if parts:
            ref[d] = (round(float(sum(parts)), 6), len(parts))
    assert got == ref
    assert 3 not in got  # no query term -> absent, not zero-scored
    # both-term docs outrank the single-term repeater; short beats padded
    assert got[0][0] > got[2][0]
    assert got[0][0] > got[1][0]


def test_bm25_rejects_empty_query(spark):
    import pytest

    from telecom_dataengineering_pipeline_spark.llmprep.text import bm25_scores

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one"):
        bm25_scores(df, [])


def test_bpe_encode_regimes_agree_and_match_training_semantics(spark):
    """encode() must apply merges with the exact left-to-right greedy
    convention training used (self-pair runs merge as '(a a) a'), chain
    ranks in order (later merges see earlier merged symbols), and the JVM
    replace-chain and Arrow mapInPandas regimes must agree exactly."""
    from telecom_dataengineering_pipeline_spark.llmprep.bpe import bpe_encode

    docs = spark.createDataFrame(
        [
            (0, "h e l l o"),
            (1, "a a a"),
            (2, "h e h e l"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    merges = [("h", "e"), ("h e", "l")]
    jvm = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    # rank 1 merges (h,e) -> "h e"; rank 2 merges ("h e", l) -> "h e l"
    assert jvm[0] == (["h e l", "l", "o"], 3)
    # no (a,a) merge in the table: untouched
    assert jvm[1] == (["a", "a", "a"], 3)
    # the scan-left convention: adjacent occurrences share the middle
    # sentinel, so "h e h e" merges only the FIRST pair — exactly the
    # convention the training statistics were computed under (encode must
    # match train, not an idealized BPE)
    assert jvm[2] == (["h e", "h", "e", "l"], 4)
    assert jvm[3] == (["x"], 1)
    # force the pandas regime with the same table: identical output
    pandas_out = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe_encode(docs, merges, jvm_max_merges=0).collect()
    }
    assert pandas_out == jvm

    import pytest as _pt

    with _pt.raises(ValueError, match="non-empty"):
        bpe_encode(docs, [])


def test_bpe_encode_consumes_trained_merges(spark, sf_smoke):
    """The loop closes: train -> encode with the learned table reduces the
    corpus token count by exactly the merged-pair frequencies."""
    from telecom_dataengineering_pipeline_spark.llmprep.bpe import (
        bpe_encode,
        bpe_train_rounds,
    )
    from telecom_dataengineering_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    trained = bpe_train_rounds(docs, rounds=2).orderBy("round").collect()
    merges = [tuple(r["merged_pair"].split(" ", 1)) for r in trained]
    enc = bpe_encode(docs, merges)
    total_after = enc.agg({"n_tokens": "sum"}).collect()[0][0]
    assert total_after == trained[-1]["tokens_after"]
