"""Scale-path operators: salted aggregation/join equivalence, bucketed
shuffle-free joins, CBO statistics, streaming dedup-within-watermark."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.skew import salted_agg, salted_join
from telecom_dataengineering_pipeline_spark.sources.bucketing import analyze_table, write_bucketed
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_salted_agg_equals_direct(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    direct = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        F.max("value").alias("mx"),
    )
    salted = salted_agg(
        ev,
        ["user_id"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total": (F.sum(F.col("value").cast("decimal(18,2)")), F.sum("total")),
            "mx": (F.max("value"), F.max("mx")),
        },
        salt_buckets=8,
    )
    d = {r["user_id"]: (r["n"], r["total"], r["mx"]) for r in direct.collect()}
    s = {r["user_id"]: (r["n"], r["total"], r["mx"]) for r in salted.collect()}
    assert d == s


def test_salted_join_equals_plain(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events").select("event_id", "user_id", "value")
    cust = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = ev.join(cust, "user_id").select("event_id", "c_mktsegment")
    salted = salted_join(ev, cust, "user_id", salt_buckets=8).select("event_id", "c_mktsegment")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


@pytest.fixture()
def warehouse_spark(spark):
    yield spark
    for t in ("b_orders", "b_lineitem", "stats_demo"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(warehouse_spark, sf_smoke, tmp_path):
    spark = warehouse_spark
    o = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8, path=str(tmp_path / "b_orders"))
    write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8, path=str(tmp_path / "b_lineitem"))
    joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # bucketed co-located join: no Exchange (shuffle) in the final plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan.replace("ReusedExchange", "")
    assert joined.count() == li.count()


def test_analyze_table_statistics(warehouse_spark, sf_smoke, tmp_path):
    spark = warehouse_spark
    load_table(spark, sf_smoke, "orders").write.mode("overwrite").option(
        "path", str(tmp_path / "stats_demo")
    ).saveAsTable("stats_demo")
    analyze_table(spark, "stats_demo", columns=["o_custkey", "o_totalprice"])
    stats = spark.sql("DESCRIBE EXTENDED stats_demo").filter("col_name = 'Statistics'").collect()
    assert stats and "rows" in stats[0]["data_type"]
    col_stats = spark.sql("DESCRIBE EXTENDED stats_demo o_custkey").collect()
    kv = {r["info_name"]: r["info_value"] for r in col_stats}
    assert int(kv["distinct_count"]) > 0


def test_streaming_dedup_within_watermark(spark, sf_smoke):
    """W1's streaming form: dropDuplicatesWithinWatermark on at-least-once
    input (duplicates injected within the watermark window)."""
    ev = load_table(spark, sf_smoke, "events").select("event_id", "ts", "value").limit(200)
    dups = ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 5 SECONDS"))
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ev.unionByName(dups).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(ev.schema).parquet(src)
        deduped = stream.withWatermark("ts", "1 minute").dropDuplicatesWithinWatermark(["event_id"])
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.sql("SELECT * FROM dedup_stream")
        assert out.count() == 200
        assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_session_window_matches_manual_sessionization(spark, sf_smoke):
    """Spark's native session_window(gap) must produce the same per-session
    event counts as the lag+cumsum construction in queries/windows.py."""
    from telecom_dataengineering_pipeline_spark.queries.windows import SESSION_GAP_S, session_stats_rollup

    manual = session_stats_rollup(spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events")
    native = (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    m = sorted((r["user_id"], r["n_events"]) for r in manual.collect())
    n = sorted((r["user_id"], r["n_events"]) for r in native.collect())
    assert m == n


def test_jaccard_max_df_caps_ubiquitous_shingle(spark):
    """One boilerplate shingle shared by every doc must not create a
    quadratic all-pairs join: with max_df it leaves the universe (numerator
    AND denominator), pairs whose only overlap is boilerplate disappear, and
    genuine near-dups keep their (capped-universe) similarity."""
    import time

    from telecom_dataengineering_pipeline_spark.llmprep.dedup import jaccard_pairs

    boiler = "all rights reserved worldwide"
    docs = [(i, f"unique text number {i} alpha beta {boiler}") for i in range(2000)]
    # two genuine near-dups sharing informative shingles
    docs += [
        (9001, f"the quick brown fox jumps over the lazy dog {boiler}"),
        (9002, f"the quick brown fox jumps over the lazy cat {boiler}"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(8)

    t0 = time.monotonic()
    out = jaccard_pairs(df, threshold=0.3, max_df=100)
    pairs = {(r["doc1"], r["doc2"]): r["jaccard"] for r in out.collect()}
    elapsed = time.monotonic() - t0

    assert set(pairs) == {(9001, 9002)}
    # capped universe: 13 tokens -> 11 shingles, 2 boilerplate-capped -> 9
    # kept per doc, 6 shared informative
    assert pairs[(9001, 9002)] == round(6 / (9 + 9 - 6), 6)
    # uncapped this is a ~2002^2/2 pair join on the boilerplate shingles;
    # capped it must stay interactive
    assert elapsed < 60


@pytest.mark.slow
def test_minhash_fast_hash_mode_matches_neutral(spark, sf_smoke):
    """The xxhash64 fast spine must emit the same verified pairs as the
    engine-neutral md5 spine on the fixture corpus (the exact-verify step
    makes precision hash-independent; this pins recall too)."""
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import minhash_near_dup_pairs

    docs = load_table(spark, sf_smoke, "documents")
    neutral = minhash_near_dup_pairs(docs, threshold=0.5)
    fast = minhash_near_dup_pairs(docs, threshold=0.5, engine_neutral_hash=False)
    a = sorted((r["doc1"], r["doc2"], r["jaccard"]) for r in neutral.collect())
    b = sorted((r["doc1"], r["doc2"], r["jaccard"]) for r in fast.collect())
    assert a == b and a


def test_proximity_join_blocking_complete_and_no_cartesian(spark):
    """Spatial blocking: result equals brute-force all-pairs haversine
    (banding provably drops nothing), and the plan contains no cartesian
    product — candidates come from the band equi-join."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.functions.geo import haversine_km
    from telecom_dataengineering_pipeline_spark.operators.spatial import (
        proximity_join_km,
    )

    pts = spark.createDataFrame(
        [(i, -1.0 + (i * 13 % 40) / 40.0, 5.0 + (i * 7 % 60) / 30.0) for i in range(80)],
        "id LONG, lat DOUBLE, lon DOUBLE",
    )
    out = proximity_join_km(pts, radius_km=60.0)
    got = {(r["id1"], r["id2"]) for r in out.collect()}

    a, b = pts.alias("a"), pts.alias("b")
    brute = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(
                haversine_km(F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon")), 3
            ).alias("d"),
        )
        .filter(F.col("d") <= 60.0)
    )
    want = {(r["id1"], r["id2"]) for r in brute.collect()}
    assert got == want and want  # non-trivial fixture

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_minhash_calibration_audit_estimates_track_exact(spark):
    """r12 registration candidate (tests-only under the r11 freeze): the
    calibration table's per-bucket MinHash agreement estimate must track
    exact n-gram Jaccard within the estimator's statistical band
    (se ≈ √(j(1−j)/64) ≈ 0.06 per pair; bucket means much tighter), on a
    fixture whose pair overlaps span the candidate-surfaceable range.
    Plan stays candidate-join shaped: no cartesian, no Python."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
        minhash_calibration_audit,
    )

    rows = []
    for i in range(240):
        # pair i shares a prefix of L of 20 tokens, L spread over 8..20:
        # 3-gram jaccard = (L-2)/(2*18-(L-2)) spanning ~0.2..1.0
        L = 8 + (i % 13)
        a = [f"p{i}t{j}" for j in range(20)]
        b = a[:L] + [f"p{i}x{j}" for j in range(20 - L)]
        rows.append((2 * i, " ".join(a)))
        rows.append((2 * i + 1, " ".join(b)))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    out = minhash_calibration_audit(docs)
    got = {r["bucket"]: r for r in out.collect()}
    assert len(got) >= 4  # spread across the similarity range
    assert sum(r["n_pairs"] for r in got.values()) >= 60
    for b, r in got.items():
        assert 0.0 <= r["mean_est"] <= 1.0 and 0.0 <= r["mean_exact"] <= 1.0
        assert r["lo"] == b / 10
        if r["n_pairs"] >= 10:
            assert r["mean_abs_err"] <= 0.12, (b, r)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # ADVICE r11 pin: the exact-intersection join is LEFT outer, so a
    # zero-overlap candidate pair (bucket-merge collision) grades into
    # bucket 0 with exact = 0 instead of being silently dropped.
    assert "LeftOuter" in plan
