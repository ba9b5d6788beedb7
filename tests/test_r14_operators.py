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


def test_time_decay_warns_past_exactness_bound(spark):
    """Beyond ~46 half-lives the per-conversion double weight sum can lose
    exactness (ADVICE r9): within_seconds=None and ratio>46 both warn;
    a bounded ratio stays silent."""
    import warnings

    df = _ev(spark, [(1, dt.datetime(2024, 1, 1), "view", 1)])
    args = (df, "user_id", "ts", "event_type", "purchase", ["view"])
    with pytest.warns(UserWarning, match="46 half-lives"):
        time_decay_attribution(*args, within_seconds=None)
    with pytest.warns(UserWarning, match="46 half-lives"):
        time_decay_attribution(*args, within_seconds=4700, half_life_seconds=100)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        time_decay_attribution(*args, within_seconds=4600, half_life_seconds=100)


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


# ---------------------------------------------------------------------------
# geohash_expr / synthetic_micro_coords
# ---------------------------------------------------------------------------


def test_geohash_matches_published_values(spark):
    from telecom_dataengineering_pipeline_spark.functions.geo import geohash_expr

    cases = [
        (37.7749, -122.4194, "9q8yy"),
        (51.5074, -0.1278, "gcpvj"),
        (-33.8688, 151.2093, "r3gx2"),
    ]
    exprs = [
        geohash_expr(str(int(lat * 1e6)), str(int(lon * 1e6)), 5, "spark")
        for lat, lon, _ in cases
    ]
    row = spark.range(1).select(
        *[F.expr(e).alias(f"g{i}") for i, e in enumerate(exprs)]
    ).collect()[0]
    assert [row[f"g{i}"] for i in range(3)] == [want for _, _, want in cases]


def test_geohash_dialects_agree_and_validate(spark):
    import duckdb

    from telecom_dataengineering_pipeline_spark.functions.geo import (
        geohash_expr,
        synthetic_micro_coords,
    )

    lat_s, lon_s = synthetic_micro_coords("id")
    lat_d, lon_d = synthetic_micro_coords("id", "duck")
    sp = spark.range(0, 50).select(
        F.expr(geohash_expr(lat_s, lon_s, 5, "spark")).alias("g")
    )
    got_spark = [r["g"] for r in sp.collect()]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {geohash_expr(lat_d, lon_d, 5, 'duck')} AS g "
            "FROM generate_series(0, 49) t(id) ORDER BY id"
        ).fetchall()
    ]
    assert got_spark == got_duck
    import pytest as _pytest

    with _pytest.raises(ValueError):
        geohash_expr("0", "0", chars=8)
    with _pytest.raises(ValueError):
        geohash_expr("0", "0", dialect="postgres")


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def _ref_winnow(text, k=3, w=4):
    import hashlib
    import re

    toks = re.split(r"\s+", text.strip().lower())
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    keys = [h * (1 << 26) + ((1 << 26) - 1 - i) for i, h in enumerate(hs)]
    n = len(keys)
    sel = set()
    for p in range(n):
        if p >= w - 1 or p == n - 1:
            sel.add(min(keys[max(0, p - w + 1) : p + 1]) >> 26)
    return sel


def test_winnowing_matches_python_reference(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
        winnowing_fingerprints,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "tiny doc",  # shorter than k: zero grams
        "one two three four",  # 2 grams < w: global-min fingerprint only
        "x x x x x x x x",  # all-equal hashes: rightmost-tie rule
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(docs, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    for i, t in enumerate(texts):
        toks = t.split()
        want = _ref_winnow(t) if len(toks) >= 3 else set()
        assert got.get(i, set()) == want, f"doc {i}"
    # all-equal-hash doc collapses to exactly one fingerprint
    assert len(got[3]) == 1


def test_winnowing_guarantee_shared_run_pairs(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import winnowing_pairs

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= w+k-1
    docs = spark.createDataFrame(
        [
            (1, f"unrelated prefix words here {shared}"),
            (2, f"{shared} and a totally different tail of tokens"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_pairs(docs, k=3, w=4, min_shared=1, max_df=None).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)


def test_winnowing_plan_no_python(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.dedup import (
        winnowing_fingerprints,
    )

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = _plan(winnowing_fingerprints(docs))
    assert "Python" not in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# community_modularity
# ---------------------------------------------------------------------------


def test_modularity_hand_graph(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        community_modularity,
    )

    # triangle {1,2,3} + edge {4,5} + one cross edge (3,4): m=5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (3, 4)], "u long, v long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)], "node long, label long"
    )
    got = {
        r["community"]: r for r in community_modularity(edges, labels).collect()
    }
    a, b = got[1], got[4]
    assert (a["n_members"], a["internal_edges"], a["degree_sum"]) == (3, 3, 7)
    assert (b["n_members"], b["internal_edges"], b["degree_sum"]) == (2, 1, 3)
    assert a["q_num_4m2"] == 4 * 5 * 3 - 49 == 11
    assert b["q_num_4m2"] == 4 * 5 * 1 - 9 == 11
    assert a["q_contrib"] == round(3 / 5 - (7 / 10) ** 2, 9)
    assert b["q_contrib"] == round(1 / 5 - (3 / 10) ** 2, 9)
    # sum of contributions == modularity of the partition
    assert abs((a["q_contrib"] + b["q_contrib"]) - 0.22) < 1e-9


def test_modularity_singleton_community_zero_internal(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        community_modularity,
    )

    edges = spark.createDataFrame([(1, 2)], "u long, v long")
    labels = spark.createDataFrame([(1, 1), (2, 2)], "node long, label long")
    got = {r["community"]: r for r in community_modularity(edges, labels).collect()}
    assert got[1]["internal_edges"] == 0 and got[2]["internal_edges"] == 0
    assert got[1]["q_contrib"] == round(0 - 0.25, 9)


# ---------------------------------------------------------------------------
# bootstrap_mean_ci
# ---------------------------------------------------------------------------


def _ref_bootstrap(values, key, n_boot=200, alpha=0.05):
    import hashlib

    n = len(values)
    sums = []
    for b in range(n_boot):
        s = 0.0
        for j in range(n):
            h = int(
                hashlib.md5(f"boot_{b}_{j}_{key}".encode()).hexdigest()[:8], 16
            )
            s += values[h % n]
        sums.append((s, b))
    sums.sort()
    lo_rank = int((alpha / 2) * n_boot)
    slo, shi = sums[lo_rank - 1][0], sums[n_boot - lo_rank][0]
    return round(slo / n, 6), round(shi / n, 6)


def test_bootstrap_matches_python_reference(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        bootstrap_mean_ci,
    )

    values = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0]
    rows = [("k", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", "t", F.col("v").cast("decimal(14,2)").alias("v")
    )
    got = bootstrap_mean_ci(df, ["k"], "t", "v", n_boot=200).collect()[0]
    want_lo, want_hi = _ref_bootstrap(values, "k")
    assert got["n_obs"] == 7 and got["n_boot"] == 200
    assert got["point_mean"] == 40.0
    assert got["ci_lo"] == want_lo and got["ci_hi"] == want_hi
    assert got["ci_lo"] <= got["point_mean"] <= got["ci_hi"]
    assert got["se_boot"] > 0


def test_bootstrap_constant_series_degenerate(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        bootstrap_mean_ci,
    )

    rows = [("k", i, 5.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, v double").select(
        "k", "t", F.col("v").cast("decimal(14,2)").alias("v")
    )
    got = bootstrap_mean_ci(df, ["k"], "t", "v", n_boot=40).collect()[0]
    assert got["ci_lo"] == got["ci_hi"] == got["point_mean"] == 5.0
    assert got["se_boot"] == 0.0


def test_bootstrap_validation(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame([("k", 1, 1.0)], "k string, t long, v double")
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, ["k"], "t", "v", n_boot=2)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, ["k"], "t", "v", alpha=1.5)
    with pytest.raises(ValueError):
        bootstrap_mean_ci(df, ["k"], "t", "v", n_boot=10, alpha=0.05)  # rank 0


# ---------------------------------------------------------------------------
# haar_detail_energy
# ---------------------------------------------------------------------------


def _ref_haar(values, levels=4):
    cur = list(values)
    out = {}
    for lvl in range(1, levels + 1):
        a = [cur[2 * j] + cur[2 * j + 1] for j in range(len(cur) // 2)]
        d = [cur[2 * j] - cur[2 * j + 1] for j in range(len(cur) // 2)]
        out[lvl] = (len(d), round(sum(x * x for x in d) / (1 << lvl), 6))
        cur = a
    return out


def test_haar_matches_python_reference(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        haar_detail_energy,
    )

    values = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0, 9.0, 7.0, 9.0, 3.0]
    rows = [("k", i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, t long, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )
    got = {
        r["level"]: (r["n_coeffs"], r["detail_energy"])
        for r in haar_detail_energy(df, ["k"], "t", "x", levels=4).collect()
    }
    assert got == _ref_haar(values)


def test_haar_short_keys_dropped_and_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        haar_detail_energy,
    )

    rows = [("short", i, 1.0) for i in range(15)] + [
        ("full", i, float(i)) for i in range(16)
    ]
    df = spark.createDataFrame(rows, "k string, t long, x double").select(
        "k", "t", F.col("x").cast("decimal(18,2)").alias("x")
    )
    out = haar_detail_energy(df, ["k"], "t", "x", levels=4).collect()
    assert {r["k"] for r in out} == {"full"}
    with pytest.raises(ValueError):
        haar_detail_energy(df, ["k"], "t", "x", levels=0)
    plan = _plan(haar_detail_energy(df, ["k"], "t", "x"))
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# cms_stream_heavy_hitters: stream == batch on the same corpus
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cms_stream_equals_batch(spark):
    from telecom_dataengineering_pipeline_spark.queries.llmprep import (
        cms_heavy_hitters_q,
    )
    from telecom_dataengineering_pipeline_spark.queries.round14 import (
        cms_stream_heavy_hitters,
    )

    sf = "/root/testdata/sf0.001"
    batch = [(r["tok"], r["cms_count"]) for r in cms_heavy_hitters_q(spark, sf).collect()]
    stream = [
        (r["tok"], r["cms_count"]) for r in cms_stream_heavy_hitters(spark, sf).collect()
    ]
    assert stream == batch


# ---------------------------------------------------------------------------
# split_conformal_interval
# ---------------------------------------------------------------------------


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "k string, t long, a double, f double")
    return df.select(
        "k",
        "t",
        F.col("a").cast("decimal(24,6)").alias("a"),
        F.col("f").cast("decimal(24,6)").alias("f"),
    )


def test_conformal_hand_case(spark):
    from telecom_dataengineering_pipeline_spark.operators.features import (
        split_conformal_interval,
    )

    # calibration residuals 1..10 -> qidx = ceil(9*11/10) = 10 -> q_hat 10
    rows = [("k", t, float(t), 0.0) for t in range(1, 11)] + [
        ("k", 23, 5.0, 0.0),   # |r|=5  <= 10: covered
        ("k", 24, 15.0, 0.0),  # |r|=15 > 10: not covered
        ("k", 25, -10.0, 0.0), # |r|=10 <= 10: covered (abs of negative)
    ]
    got = split_conformal_interval(
        _pairs(spark, rows), ["k"], "t", "a", "f", split_t=22
    ).collect()[0]
    assert (got["n_cal"], got["n_test"]) == (10, 3)
    assert got["q_hat"] == 10.0
    assert got["covered"] == 2
    assert got["coverage"] == round(2 / 3, 6)
    assert got["target_cov"] == 0.9


def test_conformal_insufficient_calibration_is_null(spark):
    from telecom_dataengineering_pipeline_spark.operators.features import (
        split_conformal_interval,
    )

    # n_cal = 1 -> qidx = ceil(9*2/10) = 2 > 1 -> q_hat NULL, coverage NULL
    rows = [("k", 1, 3.0, 0.0), ("k", 23, 1.0, 0.0)]
    got = split_conformal_interval(
        _pairs(spark, rows), ["k"], "t", "a", "f", split_t=22
    ).collect()[0]
    assert got["q_hat"] is None and got["coverage"] is None and got["covered"] is None
    assert (got["n_cal"], got["n_test"]) == (1, 1)
    with pytest.raises(ValueError):
        split_conformal_interval(
            _pairs(spark, rows), ["k"], "t", "a", "f", split_t=22, coverage_num=10
        )


# ---------------------------------------------------------------------------
# pacf_profile
# ---------------------------------------------------------------------------


def test_pacf_durbin_levinson_consistency(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        acf_profile,
        pacf_profile,
    )

    vals = [1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13]
    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = {
        row["lag"]: row["acf"]
        for row in acf_profile(df, ["k"], "t", "v", max_lag=3).collect()
    }
    got = pacf_profile(df, ["k"], "t", "v").collect()[0]
    assert got["pacf1"] == r[1]
    phi2 = (r[2] - r[1] * r[1]) / (1.0 - r[1] * r[1])
    assert got["pacf2"] == round(phi2, 6) + 0.0
    phi21 = r[1] - phi2 * r[1]
    den3 = 1.0 - phi21 * r[1] - phi2 * r[2]
    assert got["pacf3"] == round((r[3] - phi21 * r[2] - phi2 * r[1]) / den3, 6) + 0.0


def test_pacf_constant_series_nulls(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import pacf_profile

    rows = [("k", i, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = pacf_profile(df, ["k"], "t", "v").collect()[0]
    assert got["r1"] is None and got["pacf2"] is None and got["pacf3"] is None


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------


def test_hill_matches_python_reference(spark):
    import math

    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        hill_tail_index,
    )

    values = [100.0, 50.0, 25.0, 12.5, 6.25, 3.0, 1.0]
    rows = [("k", v, i) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, x double, tb long").select(
        "k", F.col("x").cast("decimal(12,2)").alias("x"), "tb"
    )
    k = 4
    got = hill_tail_index(df, ["k"], "x", "tb", k=k).collect()[0]
    top = sorted(values, reverse=True)[:k]
    xk = top[-1]
    slog = sum(round(math.log(x / xk), 9) for x in top[:-1])
    assert got["n_terms"] == k - 1
    assert got["x_k"] == round(xk, 6)
    assert got["sum_log"] == round(slog, 6)
    assert got["hill_alpha"] == round((k - 1) / slog, 6)


def test_hill_degenerate_and_short_keys(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        hill_tail_index,
    )

    rows = (
        [("flat", 7.0, i) for i in range(5)]  # all-equal top-k -> NULL alpha
        + [("short", 9.0, 0)]  # fewer than k positives -> dropped
        + [("neg", -1.0, 0), ("neg", -2.0, 1)]  # nothing positive -> dropped
    )
    df = spark.createDataFrame(rows, "k string, x double, tb long").select(
        "k", F.col("x").cast("decimal(12,2)").alias("x"), "tb"
    )
    got = {r["k"]: r for r in hill_tail_index(df, ["k"], "x", "tb", k=3).collect()}
    assert set(got) == {"flat"}
    assert got["flat"]["hill_alpha"] is None and got["flat"]["sum_log"] == 0.0
    with pytest.raises(ValueError):
        hill_tail_index(df, ["k"], "x", "tb", k=1)


# ---------------------------------------------------------------------------
# linear_attribution
# ---------------------------------------------------------------------------


def test_linear_attribution_equal_split(spark):
    from telecom_dataengineering_pipeline_spark.operators.windows import (
        linear_attribution,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, "view", 1),
        (1, t0 + dt.timedelta(minutes=10), "click", 2),
        (1, t0 + dt.timedelta(minutes=20), "view", 3),
        (1, t0 + dt.timedelta(minutes=30), "purchase", 4),
        (2, t0, "click", 5),
        (2, t0 + dt.timedelta(minutes=5), "purchase", 6),
    ]
    out = linear_attribution(
        _ev(spark, rows),
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=21_600,
        tiebreak_col="event_id",
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["credit"])
    assert sorted(by_user[1]) == [round(1 / 3, 9)] * 3
    assert by_user[2] == [1.0]


# ---------------------------------------------------------------------------
# markov_transition_entropy
# ---------------------------------------------------------------------------


def test_markov_entropy_hand_case(spark):
    import math

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        markov_transition_entropy,
    )

    t0 = dt.datetime(2024, 1, 1)
    # user 1: a -> b -> a -> c : transitions a->b, b->a, a->c
    rows = [
        (1, t0 + dt.timedelta(minutes=i), e, i)
        for i, e in enumerate(["a", "b", "a", "c"])
    ]
    got = {
        r["state"]: r
        for r in markov_transition_entropy(
            _ev(spark, rows), "user_id", "ts", "event_type", tiebreak_col="event_id"
        ).collect()
    }
    # state a: next in {b, c} uniformly -> H = ln 2; weight 2/3
    term = round(-(0.5 * math.log(0.5)), 9)
    h_a = round(2 * term, 6)
    assert got["a"]["n_transitions"] == 2 and got["a"]["n_next_states"] == 2
    assert got["a"]["h_nats"] == h_a
    assert got["a"]["weight"] == round(2 / 3, 6)
    # state b: deterministic next -> 0 entropy (and -0.0 normalized)
    assert got["b"]["h_nats"] == 0.0 and str(got["b"]["h_nats"])[0] != "-"
    assert got["b"]["rate_term"] == 0.0
    assert "c" not in got  # terminal state: no outgoing transitions


# ---------------------------------------------------------------------------
# trigram_stream_mining: stream == batch on the same corpus
# ---------------------------------------------------------------------------


def test_trigram_stream_equals_batch(spark):
    from telecom_dataengineering_pipeline_spark.queries.round14 import (
        event_trigram_mining,
        trigram_stream_mining,
    )

    sf = "/root/testdata/sf0.001"
    key = lambda r: (r["pattern_rank"], r["e1"], r["e2"], r["e3"])
    batch = sorted(
        (key(r), r["support"], r["n_users"])
        for r in event_trigram_mining(spark, sf).collect()
    )
    stream = sorted(
        (key(r), r["support"], r["n_users"])
        for r in trigram_stream_mining(spark, sf).collect()
    )
    assert stream == batch


# ---------------------------------------------------------------------------
# kcenter_greedy
# ---------------------------------------------------------------------------


def test_kcenter_greedy_hand_case(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.similarity import (
        kcenter_greedy,
    )

    # 1-D points on a line: greedy from the smallest id (pos 0)
    pts = [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [11.0]), (5, [100.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = [
        (r["sel_rank"], r["vec_id"], r["dist2"])
        for r in kcenter_greedy(df, k=4).orderBy("sel_rank").collect()
    ]
    # rank2: farthest from {0} is 100 (d2 10000); rank3: 11 (min(121,7921));
    # rank4: tie at d2=1 between ids 2 and 3 -> smaller id wins
    assert got == [(1, 1, None), (2, 5, 10000.0), (3, 4, 121.0), (4, 2, 1.0)]
    with pytest.raises(ValueError):
        kcenter_greedy(df, k=0)


# ---------------------------------------------------------------------------
# jl_distortion_pairs
# ---------------------------------------------------------------------------


def test_jl_matrix_deterministic_and_balanced():
    from telecom_dataengineering_pipeline_spark.llmprep.projections import (
        jl_sign_matrix,
    )

    m1 = jl_sign_matrix(64, 16)
    m2 = jl_sign_matrix(64, 16)
    assert m1 == m2  # pure function of the salt
    flat = [x for row in m1 for x in row]
    assert set(flat) == {1.0, -1.0}
    # md5 signs should be roughly balanced (this is a fixed matrix,
    # so the bound is a deterministic fact, not a flaky statistic)
    pos = sum(1 for x in flat if x > 0)
    assert 400 < pos < 624


def test_jl_distortion_near_one_for_identical_shift(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.projections import (
        jl_distortion_pairs,
    )

    # pair of identical vectors: orig_d2 = 0 -> NULL distortion;
    # pair differing in one coordinate: proj_d2 = sum_j (r_ji * delta)^2 / 16
    # = delta^2 * (sum of 16 sign^2)/16 = delta^2 exactly -> distortion 1.0
    v = [1.0] * 64
    v2 = list(v)
    v2[5] = 3.0
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, v2)], "vec_id long, embedding array<float>"
    )
    got = {r["id_a"]: r for r in jl_distortion_pairs(df).collect()}
    assert got[0]["orig_d2"] == 0.0 and got[0]["distortion"] is None
    assert got[1]["orig_d2"] == 4.0
    assert got[1]["distortion"] == 1.0  # single-coordinate delta is exact under signs
    with pytest.raises(ValueError):
        jl_distortion_pairs(df, out_dims=15)


# ---------------------------------------------------------------------------
# granger_lag1 / dispersion_index
# ---------------------------------------------------------------------------


def test_granger_matches_python_reference(spark):
    import math

    from telecom_dataengineering_pipeline_spark.operators.trend import granger_lag1

    ys = [10.0, 20.0, 15.0, 30.0, 25.0, 40.0, 35.0, 50.0]
    xs = [1, 4, 2, 5, 3, 7, 8, 9]
    rows = [("k", t + 1, ys[t], xs[t]) for t in range(8)]
    df = spark.createDataFrame(rows, "k string, t long, yv double, xv long").select(
        "k", "t", F.col("yv").cast("decimal(14,2)").alias("yv"), "xv"
    )
    got = granger_lag1(df, ["k"], "t", "yv", "xv").collect()[0]
    # pure-Python mirror of the exact expression tree
    pts = [(ys[t - 1], float(xs[t - 1]), ys[t]) for t in range(1, 8)]
    n = float(len(pts))
    s1 = sum(p[0] for p in pts); s2 = sum(p[1] for p in pts); sy = sum(p[2] for p in pts)
    s11 = math.floor(sum(p[0] * p[0] for p in pts)); s22 = math.floor(sum(p[1] * p[1] for p in pts))
    s12 = math.floor(sum(p[0] * p[1] for p in pts)); s1y = math.floor(sum(p[0] * p[2] for p in pts))
    s2y = math.floor(sum(p[1] * p[2] for p in pts)); syy = math.floor(sum(p[2] * p[2] for p in pts))
    det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    sse_u = syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y)
    detr = n * s11 - s1 * s1
    a1 = (n * s1y - s1 * sy) / detr
    a0 = (sy - a1 * s1) / n
    sse_r = syy - a0 * sy - a1 * s1y
    assert got["n_obs"] == 7
    assert got["b1_y"] == round(det1 / det, 6)
    assert got["b2_x"] == round(det2 / det, 6)
    assert got["sse_u"] == round(sse_u, 6) + 0.0
    assert got["sse_r"] == round(sse_r, 6) + 0.0
    assert got["f_stat"] == round((sse_r - sse_u) / (sse_u / (n - 3.0)), 6) + 0.0


def test_granger_degenerate_short_series(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import granger_lag1

    rows = [("k", t, 1.0 * t, t) for t in range(1, 4)]  # only 2 lagged rows
    df = spark.createDataFrame(rows, "k string, t long, yv double, xv long").select(
        "k", "t", F.col("yv").cast("decimal(14,2)").alias("yv"), "xv"
    )
    got = granger_lag1(df, ["k"], "t", "yv", "xv").collect()[0]
    assert got["f_stat"] is None and got["b1_y"] is None


def test_dispersion_index_hand_cases(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        dispersion_index,
    )

    rows = (
        [("under", 1, 4), ("under", 2, 6)]  # var 2, mean 5 -> D 0.4
        + [("over", 1, 1), ("over", 2, 9)]  # var 32, mean 5 -> D 6.4
        + [("single", 1, 7)]  # n < 2 -> NULLs
    )
    df = spark.createDataFrame(rows, "k string, t long, c long")
    got = {r["k"]: r for r in dispersion_index(df, ["k"], "c").collect()}
    assert got["under"]["dispersion_index"] == 0.4
    assert got["under"]["overdispersed"] is False
    assert got["over"]["dispersion_index"] == 6.4
    assert got["over"]["chi2"] == 6.4 and got["over"]["overdispersed"] is True
    assert got["single"]["dispersion_index"] is None


# ---------------------------------------------------------------------------
# pinball_loss_scorecard
# ---------------------------------------------------------------------------


def test_pinball_hand_case(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        pinball_loss_scorecard,
    )

    # residuals: +10 (under-forecast) and -10 (over-forecast)
    rows = [("k", 20.0, 10.0), ("k", 10.0, 20.0)]
    df = spark.createDataFrame(rows, "k string, a double, f double").select(
        "k",
        F.col("a").cast("decimal(24,6)").alias("a"),
        F.col("f").cast("decimal(24,6)").alias("f"),
    )
    got = {
        r["q"]: r["pinball_loss"]
        for r in pinball_loss_scorecard(df, ["k"], "a", "f").collect()
    }
    # q=0.5: (0.5*10 + 0.5*10)/2 = 5; q=0.1: (1+9)/2 = 5; q=0.9 symmetric
    assert got[0.5] == 5.0
    assert got[0.1] == round((round(0.1 * 10 + 0.9 * 10, 9)) / 2 * 1.0, 6) == 5.0
    # asymmetric case: only under-forecasts -> q=0.9 hurts 9x more than q=0.1
    rows2 = [("k", 20.0, 10.0)]
    df2 = spark.createDataFrame(rows2, "k string, a double, f double").select(
        "k",
        F.col("a").cast("decimal(24,6)").alias("a"),
        F.col("f").cast("decimal(24,6)").alias("f"),
    )
    got2 = {
        r["q"]: r["pinball_loss"]
        for r in pinball_loss_scorecard(df2, ["k"], "a", "f").collect()
    }
    assert got2[0.1] == 1.0 and got2[0.9] == 9.0
    with pytest.raises(ValueError):
        pinball_loss_scorecard(df2, ["k"], "a", "f", quantiles=(0.0,))
