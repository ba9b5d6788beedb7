"""Property-based models for the round-14 operators: the winnowing
guarantee and density bound over random corpora, Bollinger band
invariants over random series, k-center monotone-radius + permutation
invariance, and the linear/U-shape/time-decay credit-conservation law
shared by the whole attribution family. Python references (where used)
replicate the exact operator arithmetic — the asof/txnlog model-test
precedent."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"])
_doc = st.lists(_token, min_size=0, max_size=30).map(" ".join)


@settings(**_SETTINGS)
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_winnowing_guarantee_and_density(spark, docs):
    """(1) Selected fingerprints are a subset of the doc's gram hashes and
    non-empty iff the doc has >= k tokens; (2) two docs sharing a
    contiguous run of >= w+k-1 tokens share >= 1 fingerprint."""
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
        winnowing_fingerprints,
    )

    k, w = 3, 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp_hash"])

    import hashlib

    def grams(text):
        toks = [t for t in text.strip().lower().split() if t]
        return [
            int(
                hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8], 16
            )
            for i in range(len(toks) - k + 1)
        ]

    for i, t in enumerate(docs):
        hs = grams(t)
        sel = got.get(i, set())
        if not hs:
            assert sel == set()
            continue
        assert sel, f"doc {i} has {len(hs)} grams but no fingerprints"
        assert sel <= set(hs)
        # density: one window selection per window position, deduped
        assert len(sel) <= max(len(hs) - w + 1, 1) + 1


@settings(**_SETTINGS)
@given(
    shared=st.lists(_token, min_size=6, max_size=10),
    pre=st.lists(_token, min_size=0, max_size=6),
    post=st.lists(_token, min_size=0, max_size=6),
)
@pytest.mark.slow
def test_winnowing_shared_run_always_pairs(spark, shared, pre, post):
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import winnowing_pairs

    d1 = " ".join(pre + shared)
    d2 = " ".join(shared + post)
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    pairs = winnowing_pairs(df, k=3, w=4, min_shared=1, max_df=None).collect()
    assert any((r["doc_a"], r["doc_b"]) == (1, 2) for r in pairs)


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=20
    )
)
def test_bollinger_invariants(spark, values):
    """Bands are symmetric around the moving average, sd >= 0, the flag
    agrees with the band comparison, and n_window counts the prior-frame
    rows only."""
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        bollinger_bands,
    )

    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, t long, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )
    out = bollinger_bands(df, ["k"], "t", "x", window=5, min_periods=2).collect()
    assert len(out) == max(len(values) - 2, 0)
    for r in out:
        assert r["sd"] >= 0
        assert r["n_window"] == min(r["t"], 5)
        mid = round((r["upper_band"] + r["lower_band"]) / 2, 5)
        assert abs(mid - r["ma"]) <= 1e-5
        if r["breakout"] == 1:
            assert r["v"] > r["lower_band"]
        if r["breakout"] == -1:
            assert r["v"] < r["upper_band"]


@settings(**_SETTINGS)
@given(
    coords=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=3,
        max_size=12,
        unique=True,
    )
)
@pytest.mark.slow
def test_kcenter_radius_monotone_and_permutation_free(spark, coords):
    """The greedy selection distance is non-increasing with rank, and the
    result is independent of input row order (a shuffle permutes
    partitions — the argmax must not depend on physical order)."""
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        kcenter_greedy,
    )

    pts = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(coords)]
    k = min(4, len(pts))
    df1 = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    df2 = spark.createDataFrame(list(reversed(pts)), "vec_id long, embedding array<float>")
    out1 = [
        (r["sel_rank"], r["vec_id"], r["dist2"])
        for r in kcenter_greedy(df1, k=k).orderBy("sel_rank").collect()
    ]
    out2 = [
        (r["sel_rank"], r["vec_id"], r["dist2"])
        for r in kcenter_greedy(df2, k=k).orderBy("sel_rank").collect()
    ]
    assert out1 == out2
    dists = [d for _, _, d in out1 if d is not None]
    assert all(a >= b for a, b in zip(dists, dists[1:]))


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=500),  # minute offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@pytest.mark.slow
def test_attribution_models_conserve_credit(spark, events):
    """Every attribution model distributes EXACTLY one unit of credit per
    attributed conversion (up to the 9-dp share rounding): the
    conservation law that makes the four models comparable."""
    from telecom_dataengineering_pipeline_spark.operators.windows import (
        linear_attribution,
        position_based_attribution,
        time_decay_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(minutes=m), ev, i)
        for i, (u, m, ev) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    kwargs = dict(
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=86_400,
        tiebreak_col="event_id",
    )
    for fn in (
        lambda: position_based_attribution(
            df, "user_id", "ts", "event_type", **kwargs
        ),
        lambda: linear_attribution(df, "user_id", "ts", "event_type", **kwargs),
        lambda: time_decay_attribution(
            df, "user_id", "ts", "event_type", **kwargs, half_life_seconds=600
        ),
    ):
        out = fn().collect()
        per_conv: dict[tuple, float] = {}
        for r in out:
            key = (r["user_id"], r["conv_us"], r["conv_tb"])
            per_conv[key] = per_conv.get(key, 0.0) + r["credit"]
        for key, total in per_conv.items():
            assert math.isclose(total, 1.0, abs_tol=1e-6), (key, total)
