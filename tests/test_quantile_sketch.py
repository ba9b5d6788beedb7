"""Histogram quantile sketch: shard-merge additivity, bucket-width error
bound vs exact percentiles, edge clamping."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.quality.quantile_sketch import (
    histogram_sketch,
    merge_histogram_sketches,
    quantile_estimates,
)

LO, HI, NB = 0.0, 100.0, 50
WIDTH = (HI - LO) / NB


def _vals(spark, rows):
    return spark.createDataFrame([(g, float(v)) for g, v in rows], "grp STRING, v DOUBLE")


def test_sharded_merge_equals_single_pass(spark):
    rows = [("a", (i * 37) % 100) for i in range(500)] + [("b", (i * 13) % 60) for i in range(300)]
    full = _vals(spark, rows)
    s_all = histogram_sketch(full, "v", LO, HI, NB, ["grp"])
    shard1 = histogram_sketch(_vals(spark, rows[:400]), "v", LO, HI, NB, ["grp"])
    shard2 = histogram_sketch(_vals(spark, rows[400:]), "v", LO, HI, NB, ["grp"])
    merged = merge_histogram_sketches([shard1, shard2], ["grp"])
    a = {(r["grp"], r["bucket"]): r["n"] for r in s_all.collect()}
    b = {(r["grp"], r["bucket"]): r["n"] for r in merged.collect()}
    assert a == b
    qa = {(r["grp"], r["prob"]): r["quantile_est"] for r in quantile_estimates(s_all, [0.5, 0.9], LO, HI, NB, ["grp"]).collect()}
    qb = {(r["grp"], r["prob"]): r["quantile_est"] for r in quantile_estimates(merged, [0.5, 0.9], LO, HI, NB, ["grp"]).collect()}
    assert qa == qb


def test_estimates_within_one_bucket_width_of_exact(spark):
    rows = [("a", (i * 37) % 100) for i in range(500)]
    df = _vals(spark, rows)
    sk = histogram_sketch(df, "v", LO, HI, NB, ["grp"])
    probs = [0.5, 0.9, 0.99]
    est = {r["prob"]: r["quantile_est"] for r in quantile_estimates(sk, probs, LO, HI, NB, ["grp"]).collect()}
    exact = df.agg(*[F.expr(f"percentile(v, {p})").alias(str(p)) for p in probs]).first()
    for p in probs:
        assert abs(est[p] - exact[str(p)]) <= WIDTH, (p, est[p], exact[str(p)])


def test_out_of_range_clamps_to_edge_buckets_and_nulls_drop(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 1e9), ("a", 50.0), ("a", None)], "grp STRING, v DOUBLE"
    )
    sk = {r["bucket"]: r["n"] for r in histogram_sketch(df, "v", LO, HI, NB, ["grp"]).collect()}
    assert sk == {0: 1, NB - 1: 1, int(50.0 // WIDTH): 1}
