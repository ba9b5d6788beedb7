"""Quality checks + monitors over fixtures with planted defects."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.quality.checks import (
    expect_accepted_values,
    expect_expression,
    expect_not_null,
    expect_relationships,
    expect_unique,
    run_checks,
)
from telecom_dataengineering_pipeline_spark.quality.monitors import (
    cardinality_drift,
    freshness,
    null_rate_drift,
    schema_drift,
    volume_zscore,
)
from telecom_dataengineering_pipeline_spark.sources.catalog import load_table


def test_checks_clean_and_dirty(spark):
    clean = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 0.0)], ["id", "cat", "amt"]
    )
    dirty = spark.createDataFrame(
        [(1, "a", 10.0), (1, "z", -5.0), (None, "b", 20.0)], ["id", "cat", "amt"]
    )
    assert expect_unique(clean, ["id"]).count() == 0
    assert expect_unique(dirty, ["id"]).count() == 1
    assert expect_not_null(dirty, ["id"]).count() == 1
    assert expect_accepted_values(dirty, "cat", ["a", "b"]).count() == 1
    assert expect_expression(dirty, "amt >= 0").count() == 1
    parent = spark.createDataFrame([(1,), (2,)], ["pid"])
    child = spark.createDataFrame([(1,), (3,)], ["fk"])
    assert expect_relationships(child, parent, {"fk": "pid"}).count() == 1

    results = run_checks(
        {
            "unique_id": expect_unique(dirty, ["id"]),
            "fk_ok": expect_relationships(child, parent, {"fk": "pid"}),
        },
        severities={"fk_ok": "warn"},
    )
    by_name = {r.name: r for r in results}
    assert not by_name["unique_id"].passed
    assert by_name["fk_ok"].passed and by_name["fk_ok"].violations == 1


def test_monitors_on_events(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    z = volume_zscore(ev, "ts")
    assert z.count() == 30
    assert z.filter(F.col("z_score").isNull()).count() == 0

    nr = null_rate_drift(ev, ["event_id", "props"], baseline={"event_id": 0.0, "props": 0.5})
    rows = {r["column_name"]: r for r in nr.collect()}
    assert rows["event_id"]["null_rate"] == 0.0 and not rows["event_id"]["drifted"]
    assert rows["props"]["drifted"]  # baseline 0.5 vs actual 0.0

    cd = cardinality_drift(ev, ["event_type"], baseline={"event_type": 5}, exact=True)
    r = cd.collect()[0]
    assert r["distinct_count"] == 5 and not r["drifted"]

    fr = freshness(ev, "ts", sla_seconds={"signup": 86400}, group_col="event_type")
    assert fr.count() == 5
    assert set(fr.columns) >= {"lag_seconds", "sla_breached"}


def test_schema_drift_policy(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    rep = schema_drift({"a": "bigint", "b": "string"}, df)
    assert rep.status == "OK"
    rep2 = schema_drift({"a": "bigint", "b": "string", "c": "double"}, df)
    assert rep2.status == "CRITICAL" and rep2.removed == ["c"]
    rep3 = schema_drift({"a": "int", "b": "string"}, df)
    assert rep3.status == "WARNING"
    rep4 = schema_drift({"a": "bigint"}, df)
    assert rep4.status == "INFO" and rep4.added == ["b"]


def test_psi_drift_detects_distribution_shift(spark):
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.quality.monitors import psi_drift

    ref = spark.range(0, 10_000).select((F.col("id") % 100).cast("double").alias("v"))
    # Identical distribution: PSI ~ 0, stable.
    same = spark.range(0, 5_000).select((F.col("id") % 100).cast("double").alias("v"))
    r = psi_drift(ref, same, "v").collect()[0]
    assert r["status"] == "stable" and abs(r["psi"]) < 0.01
    assert (r["n_ref"], r["n_cur"]) == (10_000, 5_000)
    # Shifted + widened distribution: major shift, out-of-range bucket used.
    shifted = spark.range(0, 5_000).select(
        ((F.col("id") % 100) + 80).cast("double").alias("v")
    )
    r2 = psi_drift(ref, shifted, "v").collect()[0]
    assert r2["status"] == "major_shift" and r2["psi"] > 0.25
    # Deterministic across runs (pure column arithmetic, no sampling).
    r3 = psi_drift(ref, shifted, "v").collect()[0]
    assert r2["psi"] == r3["psi"]


def test_holt_linear_hand_computed(spark):
    """Textbook Holt chain on a 3-step series, alpha=beta=0.5:
    x=[1,2,4] -> l0=1, b0=1; l1=.5*2+.5*2=2, b1=.5*1+.5*1=1;
    l2=.5*4+.5*3=3.5, b2=.5*1.5+.5*1=1.25; forecast h = l2+h*b2."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.operators.trend import holt_linear

    df = spark.createDataFrame(
        [("k", "s0", 1.0), ("k", "s1", 2.0), ("k", "s2", 4.0),
         ("gap", "s0", 1.0), ("gap", "s2", 3.0)],  # missing s1 counts as 0
        "key STRING, step STRING, x DOUBLE",
    )
    out = holt_linear(df, ["key"], "step", "x", ["s0", "s1", "s2"], horizon=2)
    rows = {(r["key"], r["h"]): r for r in out.collect()}
    assert rows[("k", 1)]["level"] == 3.5
    assert rows[("k", 1)]["trend"] == 1.25
    assert rows[("k", 1)]["forecast"] == 4.75
    assert rows[("k", 2)]["forecast"] == 6.0
    # gap series: x=[1,0,3] -> l0=1,b0=-1; l1=0.5*0+0.5*0=0, b1=.5*(-1)+.5*(-1)=-1
    # l2=.5*3+.5*(0-1)=1, b2=.5*(1-0)+.5*(-1)=0 -> forecast = 1
    assert rows[("gap", 1)]["forecast"] == 1.0
    with __import__("pytest").raises(ValueError):
        holt_linear(df, ["key"], "step", "x", ["s0"])
