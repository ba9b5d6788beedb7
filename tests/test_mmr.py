"""MMR diversified re-ranking: the greedy trade-off actually diversifies."""

from __future__ import annotations

from telecom_dataengineering_pipeline_spark.llmprep.similarity import mmr_rerank


def test_mmr_penalizes_redundant_candidates(spark):
    # Query 0 at the origin-ish; candidates: two near-identical vectors A/A'
    # (both highly relevant) and one moderately relevant orthogonal-ish B.
    # Pure top-2 would take A then A'; MMR must take A then B.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # query
        (1, [0.9, 0.1, 0.0, 0.0]),       # A  (rel ≈ .994)
        (2, [0.9, 0.11, 0.0, 0.0]),      # A' (rel ≈ .993, sim(A,A') ≈ 1)
        (3, [0.5, 0.0, 0.5, 0.0]),       # B  (rel ≈ .707, dissimilar to A)
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {
        r["round"]: r["selected_id"]
        for r in mmr_rerank(emb, query_ids=[0], pool_k=3, select_k=2, lam=0.5).collect()
    }
    assert out[1] == 1  # most relevant first
    assert out[2] == 3  # diversity beats the near-duplicate


def test_mmr_rounds_are_distinct_and_scored(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    res = mmr_rerank(emb, query_ids=[0], pool_k=3, select_k=3, lam=0.7).collect()
    assert sorted(r["round"] for r in res) == [1, 2, 3]
    assert len({r["selected_id"] for r in res}) == 3  # never re-selects
    assert all(r["mmr_score"] is not None for r in res)
