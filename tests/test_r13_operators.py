"""Round-13 operator semantics: gaps-and-islands streaks, Theil–Sen,
Page–Hinkley (integer fixed-point), binary-segmentation split, and
position-based multi-touch attribution — directed hand-checkable cases
plus plan-shape pins (no Python, no cartesian, bounded scans)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.trend import (
    binseg_mean_shift,
    page_hinkley,
    theil_sen_slope,
)
from telecom_dataengineering_pipeline_spark.operators.windows import (
    activity_streaks,
    position_based_attribution,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# activity_streaks
# ---------------------------------------------------------------------------


def test_streaks_islands_and_gaps(spark):
    def ts(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = (
        # user 1: days 1,2,3 (one 3-streak; day 2 twice -> still one day)
        [(1, ts(1)), (1, ts(2)), (1, ts(2, 5)), (1, ts(3))]
        # user 1: day 5 alone
        + [(1, ts(5))]
        # user 2: single day
        + [(2, ts(9))]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], str(r["start_day"])): (str(r["end_day"]), r["streak_len"])
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert got == {
        (1, "2024-01-01"): ("2024-01-03", 3),
        (1, "2024-01-05"): ("2024-01-05", 1),
        (2, "2024-01-09"): ("2024-01-09", 1),
    }


def test_streaks_plan_no_join_no_python(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("user_id"),
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
    )
    plan = _plan(activity_streaks(df, "user_id", "ts"))
    assert "Join" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# theil_sen_slope
# ---------------------------------------------------------------------------


def test_theil_sen_outlier_immune(spark):
    # y = 3t exactly, except one wild outlier; median slope stays 3
    rows = [("k", t, 3.0 * t) for t in range(1, 10)] + [("k", 10, 1000.0)]
    df = spark.createDataFrame(rows, "k string, t long, y double")
    got = theil_sen_slope(df, "k", "t", "y").collect()[0]
    assert got["n_points"] == 10
    assert got["n_pairs"] == 45
    assert got["theil_sen_slope"] == 3.0


def test_theil_sen_even_pairs_average_two_middles(spark):
    rows = [("k", 0, 0.0), ("k", 1, 4.0), ("k", 2, 5.0), ("k", 3, 9.0)]
    # pairwise slopes sorted: 1, 2.5, 2.5, 3, 4, 4; middles 2.5 and 3 -> 2.75
    df = spark.createDataFrame(rows, "k string, t long, y double")
    got = theil_sen_slope(df, "k", "t", "y").collect()[0]
    assert got["n_pairs"] == 6
    assert got["theil_sen_slope"] == 2.75


def test_theil_sen_plan_no_cartesian_no_python(spark):
    df = spark.range(50).select(
        (F.col("id") % 2).cast("string").alias("k"),
        F.col("id").alias("t"),
        F.col("id").cast("double").alias("y"),
    )
    plan = _plan(theil_sen_slope(df, "k", "t", "y"))
    assert "Cartesian" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# page_hinkley
# ---------------------------------------------------------------------------


def test_page_hinkley_hand_values_and_alarm(spark):
    # level 100 for 5 steps then 0 for 5 steps; delta=0
    rows = [("k", f"t{i:02d}", 100 if i < 5 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t string, x long").select(
        "k", "t", F.col("x").cast("decimal(14,2)").alias("x")
    )
    out = {r["t"]: r for r in page_hinkley(df, "k", "t", "x", lam=100.0).collect()}
    # while flat at 100: mean == x -> dev 0 -> m 0, ph 0
    assert out["t04"]["m"] == 0.0 and out["t04"]["ph"] == 0.0
    assert out["t04"]["alarm"] == 0
    # after the drop m goes negative, historical max 0 stands -> ph = -m
    assert out["t09"]["m"] < -100.0
    assert out["t09"]["ph"] == -out["t09"]["m"]
    assert out["t09"]["alarm"] == 1
    # exact integer-arithmetic check for the first post-drop step:
    # means: t05 mean = 500/6 -> dev6 = 0 - round(500e6/6) = -83333333
    assert out["t05"]["m"] == -83.333333


def test_page_hinkley_negative_values_sign_path(spark):
    rows = [("k", "a", -10), ("k", "b", -20), ("k", "c", -30)]
    df = spark.createDataFrame(rows, "k string, t string, x long").select(
        "k", "t", F.col("x").cast("decimal(14,2)").alias("x")
    )
    out = {r["t"]: r for r in page_hinkley(df, "k", "t", "x", x_scale=2).collect()}
    # running means: -10, -15, -20 -> devs 0, -5, -10 -> m: 0, -5, -15
    assert out["a"]["m"] == 0.0
    assert out["b"]["m"] == -5.0
    assert out["c"]["m"] == -15.0
    assert out["c"]["ph"] == 15.0


def test_page_hinkley_plan_no_join_no_python(spark):
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.col("id").cast("string").alias("t"),
        F.col("id").cast("decimal(14,2)").alias("x"),
    )
    plan = _plan(page_hinkley(df, "k", "t", "x"))
    assert "Join" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# binseg_mean_shift
# ---------------------------------------------------------------------------


def test_binseg_clean_shift(spark):
    rows = [("k", f"t{i}", 0 if i < 3 else 10) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t string, x long").select(
        "k", "t", F.col("x").cast("decimal(14,2)").alias("x")
    )
    got = binseg_mean_shift(df, "k", "t", "x").collect()[0]
    assert got["split_t"] == "t2"
    assert (got["n_left"], got["n_right"]) == (3, 3)
    assert (got["mean_left"], got["mean_right"]) == (0.0, 10.0)
    # gain = 0 + 900/3 - 900/6 = 150
    assert got["gain"] == 150.0


def test_binseg_singleton_emits_null_row(spark):
    rows = [("solo", "t0", 5), ("pair", "t0", 1), ("pair", "t1", 9)]
    df = spark.createDataFrame(rows, "k string, t string, x long").select(
        "k", "t", F.col("x").cast("decimal(14,2)").alias("x")
    )
    got = {r["k"]: r for r in binseg_mean_shift(df, "k", "t", "x").collect()}
    assert set(got) == {"solo", "pair"}
    assert got["solo"]["split_t"] is None and got["solo"]["gain"] is None
    assert got["pair"]["split_t"] == "t0"


def test_binseg_tie_breaks_on_earliest_boundary(spark):
    # symmetric series: both splits give equal gain -> earliest t wins
    rows = [("k", "t0", 0), ("k", "t1", 5), ("k", "t2", 10)]
    df = spark.createDataFrame(rows, "k string, t string, x long").select(
        "k", "t", F.col("x").cast("decimal(14,2)").alias("x")
    )
    got = binseg_mean_shift(df, "k", "t", "x").collect()[0]
    assert got["split_t"] == "t0"


# ---------------------------------------------------------------------------
# position_based_attribution
# ---------------------------------------------------------------------------


def _attr(spark, rows, within=None):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    return position_based_attribution(
        df,
        "user_id",
        "ts",
        "event_type",
        conversion="purchase",
        touch_events=["view", "click"],
        within_seconds=within,
        tiebreak_col="event_id",
    ).collect()


def test_position_attr_u_shape_and_degenerations(spark):
    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = (
        # user 1: 4 touches -> 0.4, 0.1, 0.1, 0.4
        [(1, ts(0), "view", 1), (1, ts(1), "click", 2), (1, ts(2), "view", 3),
         (1, ts(3), "click", 4), (1, ts(4), "purchase", 5)]
        # user 2: 2 touches -> 0.5 / 0.5
        + [(2, ts(0), "view", 6), (2, ts(1), "click", 7), (2, ts(2), "purchase", 8)]
        # user 3: 1 touch -> 1.0
        + [(3, ts(0), "view", 9), (3, ts(1), "purchase", 10)]
        # user 4: touch AFTER the only purchase -> dropped
        + [(4, ts(0), "purchase", 11), (4, ts(1), "view", 12)]
    )
    got = _attr(spark, rows)
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_user[1], key=lambda r: r["position"])
    assert [round(r["credit"], 9) for r in u1] == [0.4, 0.1, 0.1, 0.4]
    assert all(r["k_touches"] == 4 for r in u1)
    u2 = sorted(by_user[2], key=lambda r: r["position"])
    assert [r["credit"] for r in u2] == [0.5, 0.5]
    assert [r["credit"] for r in by_user[3]] == [1.0]
    assert 4 not in by_user
    # total credit mass == one unit per credited conversion
    assert round(sum(r["credit"] for r in got), 9) == 3.0


def test_position_attr_window_cut_and_multi_conversion(spark):
    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # touch 6 min before purchase; within=300s (inclusive) excludes it
        (1, ts(0), "view", 1),
        (1, ts(4), "click", 2),  # 2 min before -> kept, becomes the ONLY touch
        (1, ts(6), "purchase", 3),
        # second conversion: the later view credits IT, not the first
        (1, ts(7), "view", 4),
        (1, ts(8), "purchase", 5),
    ]
    got = _attr(spark, rows, within=300)
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_tb"], []).append(r)
    assert [r["credit"] for r in by_conv["3"]] == [1.0]  # k=1 after the cut
    assert by_conv["3"][0]["touch_us"] == int(ts(4).timestamp() * 1_000_000)
    assert [r["credit"] for r in by_conv["5"]] == [1.0]
    assert by_conv["5"][0]["touch_us"] == int(ts(7).timestamp() * 1_000_000)


def test_position_attr_same_us_tiebreak_and_validation(spark):
    # conversion and touch share a timestamp: tb decides strict precedence
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "view", 1), (1, t0, "purchase", 2)]
    got = _attr(spark, rows)
    assert len(got) == 1 and got[0]["credit"] == 1.0  # tb 1 < 2 -> view precedes
    rows2 = [(1, t0, "purchase", 1), (1, t0, "view", 2)]
    assert _attr(spark, rows2) == []  # view sorts after -> no credit
    with pytest.raises(ValueError):
        position_based_attribution(
            spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long"),
            "user_id", "ts", "event_type",
            conversion="purchase", touch_events=["purchase"],
        )
    with pytest.raises(ValueError):
        position_based_attribution(
            spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long"),
            "user_id", "ts", "event_type",
            conversion="purchase", touch_events=["view"], first_weight=0.8,
            last_weight=0.3,
        )


def test_position_attr_plan_no_join_no_python(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        F.when(F.col("id") % 3 == 0, "purchase").otherwise("view").alias("event_type"),
        F.col("id").alias("event_id"),
    )
    plan = _plan(
        position_based_attribution(
            df, "user_id", "ts", "event_type",
            conversion="purchase", touch_events=["view", "click"],
        )
    )
    assert "Join" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# registered-query scan audits: one FileScan per source table
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,max_scans",
    [
        ("user_activity_streaks", 1),
        ("page_hinkley_daily_event_value", 1),
        ("binseg_split_daily_event_value", 1),
        ("attribution_position_based_purchases", 1),
        ("theil_sen_nation_revenue_trend", 3),  # orders + customer + nation
    ],
)
def test_r13_query_scan_counts(spark, sf_smoke, name, max_scans):
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    plan = _plan(REGISTRY[name].fn(spark, sf_smoke))
    assert plan.count("FileScan") <= max_scans, plan


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------


def test_rake_hand_scores_cap_and_order(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.text import rake_keywords

    docs = spark.createDataFrame(
        [
            (0, "red apple the red apple"),   # two "red apple" phrases
            (1, "apple"),                      # lone "apple" phrase
            (2, "b b b b b"),                  # one 5-word run: cap-dropped
        ],
        "doc_id long, text string",
    )
    got = {
        r["phrase"]: (r["n_occurrences"], r["rake_score"])
        for r in rake_keywords(
            docs, "doc_id", "text", stopwords=("the",), max_phrase_len=4, k=10
        ).collect()
    }
    # freq(red)=2 deg(red)=4 -> 2.0; freq(apple)=3 deg(apple)=5 -> 5/3
    apple = round(5 / 3, 9)
    assert got == {
        "red apple": (2, round(2.0 + apple, 6)),
        "apple": (1, round(apple, 6)),
    }


def test_rake_registered_query_plan(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    plan = (
        REGISTRY["rake_keywords_topk"].fn(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan
    assert plan.count("FileScan") <= 1, plan
    assert "TakeOrdered" in plan  # global top-k, never a full sort


# ---------------------------------------------------------------------------
# candidate_key_profile / time_to_convert / ohlc_bars
# ---------------------------------------------------------------------------


def test_candidate_key_profile_nulls_count_as_values(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        candidate_key_profile,
    )

    df = spark.createDataFrame(
        [(1, None), (1, None), (2, 3), (None, None)], "a long, b long"
    )
    got = {
        r["combo"]: (r["n_rows"], r["n_distinct"], r["dup_rows"], r["is_unique"])
        for r in candidate_key_profile(df, [["a"], ["a", "b"]]).collect()
    }
    # struct semantics: (1,None) duplicates itself; (None,) is a value
    assert got["a"] == (4, 3, 1, 0)
    assert got["a,b"] == (4, 3, 1, 0)
    with pytest.raises(ValueError, match="unknown columns"):
        candidate_key_profile(df, [["nope"]])
    with pytest.raises(ValueError, match="at least one combo"):
        candidate_key_profile(df, [])


def test_time_to_convert_prior_conversion_does_not_block(spark):
    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # user 1: purchase BEFORE first view, then view, then purchase
        (1, ts(0), "purchase", 1),
        (1, ts(2), "view", 2),
        (1, ts(5), "purchase", 3),
        # user 2: view, never purchases after (only before) -> excluded
        (2, ts(0), "purchase", 4),
        (2, ts(1), "view", 5),
        # user 3: converts instantly (same ts, tb orders view first)
        (3, ts(7), "view", 6),
        (3, ts(7), "purchase", 7),
    ]
    from telecom_dataengineering_pipeline_spark.operators.windows import (
        time_to_convert,
    )

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    got = {
        r["user_id"]: r["lag_s"]
        for r in time_to_convert(
            df, "user_id", "ts", "event_type",
            start_event="view", end_event="purchase", tiebreak_col="event_id",
        ).collect()
    }
    assert got == {1: 180.0, 3: 0.0}


def test_ohlc_bars_hand_values(spark):
    def ts(d, m):
        return dt.datetime(2024, 1, d, 0, m)

    rows = [
        ("x", ts(1, 0), 5.0, 1),   # day 1 open
        ("x", ts(1, 5), 9.0, 2),   # day 1 high
        ("x", ts(1, 9), 2.0, 3),   # day 1 low + close
        ("x", ts(2, 0), 7.0, 4),   # day 2 single event
        ("y", ts(1, 1), 4.0, 5),
    ]
    from telecom_dataengineering_pipeline_spark.operators.windows import ohlc_bars

    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    got = {
        (r["event_type"], r["bar"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"], r["total"]
        )
        for r in ohlc_bars(
            df, "event_type", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert got[("x", "2024-01-01")] == (5.0, 9.0, 2.0, 2.0, 3, 16.0)
    assert got[("x", "2024-01-02")] == (7.0, 7.0, 7.0, 7.0, 1, 7.0)
    assert got[("y", "2024-01-01")] == (4.0, 4.0, 4.0, 4.0, 1, 4.0)


def test_ohlc_plan_single_aggregate_no_window(spark):
    from telecom_dataengineering_pipeline_spark.operators.windows import ohlc_bars

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("event_type"),
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.col("id").alias("event_id"),
    )
    plan = _plan(ohlc_bars(df, "event_type", "ts", "value", tiebreak_col="event_id"))
    assert "Window" not in plan and "Join" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# betweenness_from_seeds
# ---------------------------------------------------------------------------


def _undirected(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionAll(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_betweenness_path_graph_both_ends(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        betweenness_from_seeds,
    )

    e = _undirected(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_from_seeds(e, [0, 3], max_hops=4).collect()
    }
    # Brandes by hand: from seed 0, delta = {1: 2, 2: 1, 3: 0};
    # from seed 3, delta = {2: 2, 1: 1, 0: 0}
    assert got == {0: 0.0, 1: 3.0, 2: 3.0, 3: 0.0}


def test_betweenness_diamond_split_paths(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        betweenness_from_seeds,
    )

    e = _undirected(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_from_seeds(e, [0], max_hops=4).collect()
    }
    # two shortest paths to 3 (sigma=2): each middle carries 1/2
    assert got == {1: 0.5, 2: 0.5, 3: 0.0}


def test_betweenness_hop_truncation_and_validation(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        betweenness_from_seeds,
    )

    e = _undirected(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_from_seeds(e, [0], max_hops=2).collect()
    }
    # radius 2: node 3 never discovered; delta(1) = 1*(1+0) from node 2
    assert got == {1: 1.0, 2: 0.0}
    with pytest.raises(ValueError):
        betweenness_from_seeds(e, [], max_hops=2)
    with pytest.raises(ValueError):
        betweenness_from_seeds(e, [0], max_hops=0)


@pytest.mark.slow
def test_betweenness_matches_unrolled_oracle_on_random_graph(spark):
    """Cross-engine: the Spark operator and the DuckDB unrolled oracle
    agree on a pseudo-random graph (the value gate in miniature)."""
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.graph import (
        betweenness_from_seeds,
        betweenness_oracle_sql,
    )

    pairs = sorted({((i * 7 + 3) % 23, (i * i + 5) % 23) for i in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _undirected(spark, pairs)
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness_from_seeds(e, [0, 1, 2], max_hops=4).collect()
    }
    values = ", ".join(f"({a}, {b}), ({b}, {a})" for a, b in pairs)
    sql = betweenness_oracle_sql(
        f"SELECT DISTINCT src, dst FROM (VALUES {values}) t(src, dst)",
        "SELECT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) "
        "ORDER BY node LIMIT 3",
        rounds=4,
    )
    want = {int(n): float(b) for n, b in duckdb.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# textrank_keywords
# ---------------------------------------------------------------------------


def test_textrank_structure_and_determinism(spark):
    from telecom_dataengineering_pipeline_spark.llmprep.text import textrank_keywords

    docs = spark.createDataFrame(
        [
            # hub degree 4 (alpha, beta, gamma, delta); all others <= 2
            (0, "alpha hub beta the hub gamma the delta hub"),
            (1, "alpha the hub"),  # stopword re-indexes: alpha-hub adjacency
            (2, "solo"),           # no pairs contributed
        ],
        "doc_id long, text string",
    )
    out = textrank_keywords(
        docs, stopwords=("the",), window=1, iters=3, k=10
    ).collect()
    ranks = {r["word"]: r["rank_fp"] for r in out}
    assert set(ranks) == {"hub", "alpha", "beta", "gamma", "delta"}
    # the strict-degree hub holds the strictly highest rank
    assert max(ranks, key=ranks.get) == "hub"
    assert "solo" not in ranks  # isolated word never enters the edge set
    # integer fixed-point: re-running yields the identical longs
    again = {
        r["word"]: r["rank_fp"]
        for r in textrank_keywords(
            docs, stopwords=("the",), window=1, iters=3, k=10
        ).collect()
    }
    assert again == ranks


def test_textrank_plan_no_cartesian_no_python(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    plan = (
        REGISTRY["textrank_word_graph"].fn(spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "Python" not in plan


# ---------------------------------------------------------------------------
# sprt_bernoulli / empirical_bayes_rates
# ---------------------------------------------------------------------------


def test_sprt_decisions_and_hand_llr(spark):
    import math

    from telecom_dataengineering_pipeline_spark.quality.monitors import sprt_bernoulli

    # strong H1 evidence: all successes; strong H0: all failures
    rows = [("h1", f"t{i}", 10, 10) for i in range(5)] + [
        ("h0", f"t{i}", 0, 10) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k string, t string, s long, n long")
    out = {
        (r["k"], r["t"]): (r["llr"], r["decision"])
        for r in sprt_bernoulli(df, "k", "t", "s", "n", p0=0.3, p1=0.7).collect()
    }
    k1, k0 = math.log(0.7 / 0.3), math.log(0.3 / 0.7)
    assert out[("h1", "t0")][0] == round(10 * k1, 6)
    assert out[("h1", "t4")][1] == "accept_h1"
    assert out[("h0", "t4")][1] == "accept_h0"
    with pytest.raises(ValueError):
        sprt_bernoulli(df, "k", "t", "s", "n", p0=0.3, p1=0.3)


def test_empirical_bayes_shrinks_small_n_toward_pool(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        empirical_bayes_rates,
    )

    rows = (
        [(f"big{i}", 500 + i, 1000) for i in range(8)]   # rates ~0.5, n huge
        + [("tiny_hi", 2, 2), ("tiny_lo", 0, 2)]          # extreme small-n
        + [("empty", 0, 0)]                               # n=0 dropped
    )
    df = spark.createDataFrame(rows, "k string, x long, n long")
    got = {r["k"]: r for r in empirical_bayes_rates(df, "k", "x", "n").collect()}
    assert "empty" not in got
    # extremes move strictly toward the pooled mean (~0.5); big keys barely
    assert 0.0 < got["tiny_lo"]["shrunk_rate"] < got["big0"]["shrunk_rate"]
    assert got["tiny_hi"]["shrunk_rate"] < 1.0
    assert abs(got["big0"]["shrunk_rate"] - got["big0"]["raw_rate"]) < 0.01
    assert abs(got["tiny_hi"]["shrunk_rate"] - got["tiny_hi"]["raw_rate"]) > 0.1
    assert got["big0"]["alpha"] is not None and got["big0"]["alpha"] > 0


def test_empirical_bayes_degenerate_variance_keeps_raw(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        empirical_bayes_rates,
    )

    rows = [("a", 1, 2), ("b", 2, 4), ("c", 3, 6)]  # all rates exactly 0.5
    df = spark.createDataFrame(rows, "k string, x long, n long")
    got = {r["k"]: r for r in empirical_bayes_rates(df, "k", "x", "n").collect()}
    for k in got:
        assert got[k]["alpha"] is None
        assert got[k]["shrunk_rate"] == got[k]["raw_rate"] == 0.5


# ---------------------------------------------------------------------------
# weighted_median
# ---------------------------------------------------------------------------


def test_weighted_median_hand_values_and_ties(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import weighted_median

    rows = [
        # key a: values 1(w1), 2(w1), 10(w1) -> W=3, crossing at 2
        ("a", 1.0, 1), ("a", 2.0, 1), ("a", 10.0, 1),
        # key b: heavy low value dominates: 1(w9), 100(w1) -> median 1
        ("b", 1.0, 9), ("b", 100.0, 1),
        # key c: even split 1(w1), 2(w1) -> lower median 1
        ("c", 1.0, 1), ("c", 2.0, 1),
        # key d: tied values share the RANGE cumulative -> median 5
        ("d", 5.0, 1), ("d", 5.0, 1), ("d", 6.0, 1),
        # zero/negative weights are dropped
        ("e", 7.0, 0), ("e", 3.0, 2),
    ]
    df = spark.createDataFrame(rows, "k string, v double, wt long")
    got = {
        r["k"]: (r["total_weight"], r["weighted_median"])
        for r in weighted_median(df, ["k"], "v", "wt").collect()
    }
    assert got == {
        "a": (3, 2.0),
        "b": (10, 1.0),
        "c": (2, 1.0),
        "d": (3, 5.0),
        "e": (2, 3.0),
    }


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------


def test_salted_join_identical_to_plain_join(spark):
    from telecom_dataengineering_pipeline_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "d")], "k long, lv string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (9, "Z")], "rk long, rv string")
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in salted_join(left, right, "k", "rk", salt_factor=4, how=how)
            .select("k", "lv", "rv")
            .collect()
        )
        want = sorted(
            (r["k"], r["lv"], r["rv"])
            for r in left.join(right, left["k"] == right["rk"], how)
            .select("k", "lv", "rv")
            .collect()
        )
        assert got == want, how
    with pytest.raises(ValueError):
        salted_join(left, right, "k", "rk", salt_factor=0)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", "rk", how="full")


def test_salted_join_plan_has_salt_in_join_keys(spark):
    from telecom_dataengineering_pipeline_spark.operators.joins import salted_join

    left = spark.range(1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(100).select(
        F.col("id").alias("rk"), (F.col("id") * 2).alias("rv")
    )
    plan = _plan(salted_join(left, right, "k", "rk", salt_factor=8))
    assert "__salt" in plan  # the salt participates in the join


# ---------------------------------------------------------------------------
# cohort_ltv
# ---------------------------------------------------------------------------


def test_cohort_ltv_hand_values(spark):
    from telecom_dataengineering_pipeline_spark.operators.windows import cohort_ltv

    def d(m, day=1):
        return dt.datetime(2024, m, day)

    rows = [
        # cohort 2024-01 (midx 24289): users 1, 2
        (1, d(1), 10.0), (2, d(1), 20.0),
        (1, d(2), 5.0),                      # age 1: only user 1 returns
        # cohort 2024-02: user 3
        (3, d(2), 100.0),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    got = {
        (r["cohort_month"], r["age_months"]): (
            r["cohort_users"], r["n_buyers"], r["period_revenue"],
            r["cum_revenue"], r["ltv_per_user"],
        )
        for r in cohort_ltv(df, "u", "ts", "v").collect()
    }
    jan = 2024 * 12 + 1
    feb = jan + 1
    assert got[(jan, 0)] == (2, 2, 30.0, 30.0, 15.0)
    assert got[(jan, 1)] == (2, 1, 5.0, 35.0, 17.5)
    assert got[(feb, 0)] == (1, 1, 100.0, 100.0, 100.0)


# ---------------------------------------------------------------------------
# pareto_concentration
# ---------------------------------------------------------------------------


def test_pareto_hand_values_and_exact_boundary(spark):
    from telecom_dataengineering_pipeline_spark.quality.monitors import (
        pareto_concentration,
    )

    rows = [
        # key a: values 80, 15, 5 -> 80% of 100 covered by the first alone?
        # cum_before of member1 = 0 < 80 -> needed; member2: 80 < 80 FALSE
        ("a", 1, "80.00"), ("a", 2, "15.00"), ("a", 3, "5.00"),
        # key b: uniform 4x25 -> need 4 members for 80? cum_before 75<80
        # at the 4th -> all 4 needed
        ("b", 1, "25.00"), ("b", 2, "25.00"), ("b", 3, "25.00"), ("b", 4, "25.00"),
    ]
    df = spark.createDataFrame(rows, "k string, m long, v string").select(
        "k", "m", F.col("v").cast("decimal(14,2)").alias("v")
    )
    got = {
        r["k"]: (r["n_members"], r["n_top"], r["top_share"])
        for r in pareto_concentration(df, ["k"], "m", "v").collect()
    }
    # exact boundary: member with cum_before == threshold is NOT needed
    assert got["a"] == (3, 1, round(1 / 3, 6))
    assert got["b"] == (4, 4, 1.0)
    with pytest.raises(ValueError):
        pareto_concentration(df, ["k"], "m", "v", threshold_pct=100)
