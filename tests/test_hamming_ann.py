"""Binary sign quantization + Hamming top-k: packing correctness against
Python's own popcount, twin-vector self-distance, validation, and the
broadcast-nested-loop plan shape (10 query rows against the code
relation — never the raw embedding column)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
    binary_quantize,
    hamming_topk,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def _vec(bits: list[int], dims: int = 64) -> list[float]:
    # bit j set -> coordinate j positive
    return [1.0 if j in bits else -1.0 for j in range(dims)]


def test_binary_quantize_matches_python_packing(spark):
    bits = [0, 1, 5, 31, 32, 40, 63]
    emb = spark.createDataFrame(
        [(0, _vec(bits)), (1, _vec([]))], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    rows = {r["vec_id"]: (r["w0"], r["w1"]) for r in binary_quantize(emb).collect()}
    w0 = sum(1 << j for j in bits if j < 32)
    w1 = sum(1 << (j - 32) for j in bits if j >= 32)
    assert rows[0] == (w0, w1)
    assert rows[1] == (0, 0)
    # zeros quantize to 0 (strict > 0)
    z = spark.createDataFrame([(2, [0.0] * 64)], "vec_id LONG, embedding ARRAY<FLOAT>")
    assert binary_quantize(z).collect()[0]["w0"] == 0


def test_hamming_topk_twin_and_distances(spark):
    base = [0, 3, 17, 33, 50]
    rows = [
        (0, _vec(base)),
        (1, _vec(base)),  # identical twin: distance 0
        (2, _vec(base + [8])),  # one extra bit: distance 1
        (25, _vec([40, 41, 42])),
    ]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r["rank"]: r for r in hamming_topk(emb, query_ids=[0], k=3).collect()}
    assert out[1]["neighbor_id"] == 1 and out[1]["hamming"] == 0
    assert out[2]["neighbor_id"] == 2 and out[2]["hamming"] == 1
    # python reference for the far vector
    d = len(set(base) ^ {40, 41, 42})
    assert out[3]["neighbor_id"] == 25 and out[3]["hamming"] == d


def test_hamming_validations(spark):
    emb = spark.createDataFrame([(0, [1.0] * 64)], "vec_id LONG, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="evenly dividing"):
        binary_quantize(emb, dims=64, word_bits=33)
    with pytest.raises(ValueError, match="at least one query"):
        hamming_topk(emb, query_ids=[])


def test_hamming_plan_broadcasts_queries_over_codes(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = (
        hamming_topk(emb, query_ids=list(range(10)), k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 10-row query side broadcast
    assert "Python" not in plan and "Arrow" not in plan  # pure codegen
