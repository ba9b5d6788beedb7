"""Runtime bloom-filter injection: when the dim side is too big to
broadcast, Spark builds a bloom filter from the filtered creation side and
applies might_contain on the fact side BEFORE the shuffle — the mechanism
that keeps selective non-broadcast joins affordable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_filter_injected_on_selective_join(spark, sf_smoke, no_broadcast):
    o = load_table(spark, sf_smoke, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_smoke, "lineitem")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy("o_orderpriority").count()
    physical = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in physical  # fact side pre-filtered pre-shuffle
    # and the result is unaffected by the runtime filter
    with_bloom = {(r.o_orderpriority, r["count"]) for r in j.collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    j2 = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy("o_orderpriority").count()
    without = {(r.o_orderpriority, r["count"]) for r in j2.collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert with_bloom == without


def test_explicit_bloom_no_false_negatives_and_exact_composition(spark):
    """operators/bloom.py: every real member passes; bloom-prefilter + exact
    join returns exactly the join's rows; the probe predicate is join-free."""
    from telecom_dataengineering_pipeline_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    dim = spark.createDataFrame([(i * 7,) for i in range(200)], "k LONG")
    fact = spark.createDataFrame([(i,) for i in range(2000)], "fk LONG")
    words = bloom_build(dim, "k", m_bits=1024, k=4)

    # no false negatives: all 200 members pass their own filter
    assert dim.filter(bloom_might_contain(F.col("k"), words, 1024, 4)).count() == 200

    # bloom -> exact equals plain exact
    pre = fact.filter(bloom_might_contain(F.col("fk"), words, 1024, 4))
    exact_pre = pre.join(dim, pre["fk"] == dim["k"], "left_semi")
    exact_plain = fact.join(dim, fact["fk"] == dim["k"], "left_semi")
    assert sorted(r["fk"] for r in exact_pre.collect()) == sorted(
        r["fk"] for r in exact_plain.collect()
    )

    # the prefilter reduces the fact (false positives are bounded, not ~100%)
    n_pass, n_true = pre.count(), exact_plain.count()
    assert n_true <= n_pass < fact.count() / 2

    # probe plan: a pure Filter over the scan -- no Join/Exchange anywhere
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
