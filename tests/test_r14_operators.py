"""Round-14 operator semantics: Bollinger bands (prior-window frame,
breakout flag), time-decay multi-touch attribution (exact binary-
reciprocal weights), and event-sequence n-gram mining — directed
hand-checkable cases plus plan-shape pins."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.trend import bollinger_bands
from telecom_dataengineering_pipeline_spark.operators.windows import (
    sequence_ngrams,
    time_decay_attribution,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# bollinger_bands
# ---------------------------------------------------------------------------


def _series(spark, values):
    rows = [("k", t + 1, float(v)) for t, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )


def test_bollinger_hand_case(spark):
    # history (1,2,3) -> mean 2, popvar 2/3; current 10 breaks the upper band
    df = _series(spark, [1, 2, 3, 10])
    got = {r["t"]: r for r in bollinger_bands(df, ["k"], "t", "x", window=7).collect()}
    # rows t=1..3 dropped (fewer than min_periods=3 history rows)
    assert set(got) == {4}
    r = got[4]
    mean, sd = 2.0, math.sqrt(2.0 / 3.0)
    assert r["n_window"] == 3
    assert r["ma"] == 2.0
    assert r["sd"] == round(sd, 6)
    assert r["upper_band"] == round(mean + 2 * sd, 6)
    assert r["lower_band"] == round(mean - 2 * sd, 6)
    assert r["breakout"] == 1


def test_bollinger_lower_breakout_and_quiet(spark):
    # constant history -> sd 0: equal value is quiet, any dip breaks down
    df = _series(spark, [5, 5, 5, 5, 4])
    rows = {r["t"]: r for r in bollinger_bands(df, ["k"], "t", "x", window=7).collect()}
    assert rows[4]["breakout"] == 0 and rows[4]["sd"] == 0.0
    assert rows[5]["breakout"] == -1


def test_bollinger_window_slides(spark):
    # window=2: at t=4 the frame is rows t=2,3 only
    df = _series(spark, [100, 1, 3, 2])
    rows = bollinger_bands(df, ["k"], "t", "x", window=2, min_periods=2).collect()
    got = {r["t"]: r for r in rows}
    assert set(got) == {3, 4}
    assert got[4]["ma"] == 2.0 and got[4]["n_window"] == 2
    # frame (1,3): mean 2, popvar 1 -> bands 0..4; v=2 quiet
    assert got[4]["breakout"] == 0


def test_bollinger_validation_and_plan(spark):
    df = _series(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        bollinger_bands(df, ["k"], "t", "x", window=0)
    with pytest.raises(ValueError):
        bollinger_bands(df, ["k"], "t", "x", min_periods=0)
    plan = _plan(bollinger_bands(df, ["k"], "t", "x"))
    assert "Join" not in plan and "Python" not in plan
    assert plan.count("Window") == 1


# ---------------------------------------------------------------------------
# time_decay_attribution
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )


def test_time_decay_hand_case(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "view", 1),  # 90 min before conv -> age 1 -> w 0.5
        (1, t0 + dt.timedelta(minutes=60), "click", 2),  # 30 min -> age 0 -> w 1
        (1, t0 + dt.timedelta(minutes=90), "purchase", 3),
    ]
    out = time_decay_attribution(
        _ev(spark, rows),
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=21_600,
        tiebreak_col="event_id",
        half_life_seconds=3_600,
    ).collect()
    got = {r["touch_event"]: (r["age_units"], r["credit"]) for r in out}
    assert got == {
        "view": (1, round(0.5 / 1.5, 9)),
        "click": (0, round(1.0 / 1.5, 9)),
    }


def test_time_decay_age_clamps_at_62(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "view", 1),
        (1, t0 + dt.timedelta(hours=200), "purchase", 2),
    ]
    out = time_decay_attribution(
        _ev(spark, rows),
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view"],
        within_seconds=None,
        tiebreak_col="event_id",
        half_life_seconds=1,  # 200 h of 1 s half-lives -> clamped
    ).collect()
    assert [r["age_units"] for r in out] == [62]
    assert out[0]["credit"] == 1.0  # lone touch still owns the conversion


def test_time_decay_validation(spark):
    df = _ev(spark, [(1, dt.datetime(2024, 1, 1), "view", 1)])
    with pytest.raises(ValueError):
        time_decay_attribution(
            df, "user_id", "ts", "event_type", "purchase", ["view"],
            half_life_seconds=0,
        )


# ---------------------------------------------------------------------------
# sequence_ngrams
# ---------------------------------------------------------------------------


def test_trigram_support_and_rank(spark):
    t0 = dt.datetime(2024, 1, 1)

    def seq(uid, base_id, *evs):
        return [
            (uid, t0 + dt.timedelta(minutes=i), e, base_id + i)
            for i, e in enumerate(evs)
        ]

    rows = (
        seq(1, 100, "a", "b", "c", "d")  # abc, bcd
        + seq(2, 200, "a", "b", "c")  # abc
        + seq(3, 300, "x", "y")  # too short
    )
    out = sequence_ngrams(
        _ev(spark, rows), "user_id", "ts", "event_type", n=3, tiebreak_col="event_id"
    ).collect()
    got = {
        (r["e1"], r["e2"], r["e3"]): (r["support"], r["n_users"], r["pattern_rank"])
        for r in out
    }
    assert got == {
        ("a", "b", "c"): (2, 2, 1),
        ("b", "c", "d"): (1, 1, 2),
    }


def test_ngram_tiebreak_orders_same_timestamp(spark):
    t0 = dt.datetime(2024, 1, 1)
    # identical timestamps: event_id must decide the order (b then a then c)
    rows = [(1, t0, "b", 1), (1, t0, "a", 2), (1, t0, "c", 3)]
    out = sequence_ngrams(
        _ev(spark, rows), "user_id", "ts", "event_type", n=3, tiebreak_col="event_id"
    ).collect()
    assert [(r["e1"], r["e2"], r["e3"]) for r in out] == [("b", "a", "c")]


def test_ngram_validation_and_plan(spark):
    df = _ev(spark, [(1, dt.datetime(2024, 1, 1), "a", 1)])
    with pytest.raises(ValueError):
        sequence_ngrams(df, "user_id", "ts", "event_type", n=1)
    plan = _plan(sequence_ngrams(df, "user_id", "ts", "event_type", n=2))
    assert "Join" not in plan and "Python" not in plan
