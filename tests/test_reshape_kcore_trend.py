"""Round-5 tests-only tier (queued for the round-6 driver window, same
pattern round 4 used): k-core peeling, seasonal index, Benford profile,
melt/unpivot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.mark.slow
def test_k_core_clique_with_pendant_chain(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import k_core

    # 4-clique (every node degree 3) + chain 3-10-11-12 hanging off it:
    # the chain peels away under k=3 in cascading rounds.
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "u long, v long")
    core3 = sorted(r["node"] for r in k_core(edges, k=3).collect())
    assert core3 == [0, 1, 2, 3]
    # k=2: the chain still peels (its ends have degree 1), clique stays
    core2 = sorted(r["node"] for r in k_core(edges, k=2).collect())
    assert core2 == [0, 1, 2, 3]
    # k=1 keeps everything; convergence: more rounds change nothing
    assert sorted(r["node"] for r in k_core(edges, k=1).collect()) == [
        0, 1, 2, 3, 10, 11, 12,
    ]
    a = sorted(r["node"] for r in k_core(edges, k=3, rounds=10).collect())
    b = sorted(r["node"] for r in k_core(edges, k=3, rounds=15).collect())
    assert a == b
    with pytest.raises(ValueError):
        k_core(edges, k=0)


def test_seasonal_index_hand_computed(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import seasonal_index

    df = spark.createDataFrame(
        [("a", "s1", 2.0), ("a", "s1", 4.0), ("a", "s2", 9.0),
         ("b", "s1", 5.0), ("b", "s2", 5.0)],
        "k STRING, season STRING, v DOUBLE",
    )
    rows = {(r["k"], r["season"]): r for r in seasonal_index(df, ["k"], "season", "v").collect()}
    assert rows[("a", "s1")]["seasonal_index"] == 0.6  # mean 3 / overall 5
    assert rows[("a", "s2")]["seasonal_index"] == 1.8  # mean 9 / overall 5
    assert rows[("a", "s1")]["n"] == 2
    assert rows[("b", "s1")]["seasonal_index"] == 1.0  # flat series


def test_benford_profile_digits_and_exclusions(spark):
    import math

    from telecom_dataengineering_pipeline_spark.quality.monitors import benford_profile

    df = spark.createDataFrame(
        [(1.0,), (1.5,), (19.0,), (0.0,), (-5.0,), (200.0,), (9000.0,), (None,)],
        "v DOUBLE",
    )
    rows = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert len(rows) == 9  # every digit present, absent ones n=0
    assert rows[1]["n"] == 3 and rows[2]["n"] == 1 and rows[9]["n"] == 1
    assert rows[5]["n"] == 0  # -5 excluded: no first significant digit
    assert rows[1]["share"] == 0.6
    assert rows[1]["expected_share"] == round(math.log10(2), 6)
    assert rows[3]["deviation"] == -rows[3]["expected_share"]


def test_melt_wide_to_long(spark):
    from telecom_dataengineering_pipeline_spark.operators.reshape import melt

    df = spark.createDataFrame(
        [(1, 10.0, 3, None), (2, 20.5, 4, 7.0)],
        "id LONG, a DOUBLE, b INT, c DOUBLE",
    )
    out = melt(df, ["id"], ["a", "b", "c"])
    assert out.columns == ["id", "metric", "value"]
    got = {(r["id"], r["metric"]): r["value"] for r in out.collect()}
    assert len(got) == 6
    assert got[(1, "a")] == 10.0 and got[(1, "b")] == 3.0  # int cast double
    assert got[(1, "c")] is None  # NULL melts as NULL, row kept
    with pytest.raises(ValueError):
        melt(df, ["id"], [])


def test_quantile_bucket_scores_no_global_window(spark):
    """The scalable ntile replacement: quartile buckets from broadcast
    sketch cutoffs — near-equal populations, no SinglePartition exchange
    in the plan, NULLs pass through as NULL."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        quantile_bucket_scores,
    )

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("m"))
    df = df.unionAll(spark.sql("SELECT CAST(NULL AS DOUBLE) AS m"))
    out = quantile_bucket_scores(df, ["m"], k=4)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["m_bucket"], []).append(r["m"])
    assert by_bucket[None] == [None]
    sizes = {b: len(v) for b, v in by_bucket.items() if b is not None}
    assert set(sizes) == {1, 2, 3, 4}
    assert all(20 <= n <= 30 for n in sizes.values())  # near-equal
    # ordering property: every bucket-1 value < every bucket-4 value
    assert max(by_bucket[1]) < min(by_bucket[4])
    # The whole point: no window operator and no global sort of the data
    # rows anywhere in the plan. (A SinglePartition exchange still exists
    # UNDER the scalar cutoff aggregate — it carries per-partition sketch
    # partials, not data rows, which is exactly the acceptable shape.)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Sort [" not in plan


def test_quantile_bucket_scores_exact_matches_rank_definition(spark):
    """exact=True yields RANK-EXACT buckets regardless of sketch error:
    every cutoff is the value at rank ceil(p·n) (row_number definition,
    ties with multiplicity), verified against a Python-sorted oracle on a
    tie-heavy fixture with a deliberately starved sketch (accuracy ~ n/6,
    so the proposal can miss ranks and the TakeOrdered refinement must
    land them). The returned plan stays window-free and exchange-free —
    literal comparisons only."""
    import math

    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        quantile_bucket_scores,
    )

    # 300 values with heavy ties: v = (7*i) % 50 — every value repeats ~6x.
    vals = [float((7 * i) % 50) for i in range(300)]
    df = (
        spark.createDataFrame([(v,) for v in vals], "m double")
        .repartition(8)
        .localCheckpoint(eager=False)  # mirror the call-site lineage cut
    )
    out = quantile_bucket_scores(df, ["m"], k=4, accuracy=50, exact=True)

    srt = sorted(vals)
    n = len(srt)
    cuts = [srt[math.ceil(p * n) - 1] for p in (0.25, 0.50, 0.75)]

    def expect_bucket(v):
        return 1 + sum(v > c for c in cuts)

    got = {(r["m"], r["m_bucket"]) for r in out.collect()}
    assert got == {(v, expect_bucket(v)) for v in vals}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan


def test_boilerplate_line_filter(spark):
    """Short lines, symbol-heavy lines, and unpunctuated ALL-CAPS
    headings drop; prose survives in original order; a fully-boilerplate
    doc keeps an empty clean_text with honest counts."""
    from telecom_dataengineering_pipeline_spark.llmprep.text import (
        boilerplate_line_filter,
    )

    doc = "\n".join(
        [
            "HOME | ABOUT | CONTACT",            # nav: symbols + caps
            "====================",               # separator: symbol ratio
            "This is the first real sentence.",   # keep
            "ok",                                 # too short
            "And here is another good line too.", # keep
            "COOKIE NOTICE",                      # all-caps heading, no punct
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "***\n##\nNAV")], "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r for r in boilerplate_line_filter(df).collect()}
    assert rows[1]["clean_text"] == (
        "This is the first real sentence.\nAnd here is another good line too."
    )
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (6, 2)
    assert rows[2]["clean_text"] == "" and rows[2]["n_kept"] == 0


def test_melt_quoted_identifiers_and_passthrough(spark):
    """Columns with spaces/hyphens melt correctly (quoted identifiers and
    escaped labels), and boilerplate_line_filter passes every input
    column through."""
    from telecom_dataengineering_pipeline_spark.llmprep.text import (
        boilerplate_line_filter,
    )
    from telecom_dataengineering_pipeline_spark.operators.reshape import melt

    df = spark.createDataFrame([(1, 2.0, 3.0)], ["id", "cpu usage", "mem-free"])
    out = melt(df, ["id"], ["cpu usage", "mem-free"])
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got == {"cpu usage": 2.0, "mem-free": 3.0}

    docs = spark.createDataFrame(
        [(1, "A good long sentence right here.", "en", "u://x")],
        "doc_id LONG, text STRING, lang STRING, source_url STRING",
    )
    row = boilerplate_line_filter(docs).collect()[0]
    assert row["lang"] == "en" and row["source_url"] == "u://x"
    assert row["clean_text"] == "A good long sentence right here."


def test_sequence_funnel_ordered_window_semantics(spark):
    """windowFunnel semantics: ordered subsequence with ignored noise,
    out-of-order steps don't count, the time budget is anchored at the
    first step-1 match, and a step-1-only user scores depth 1."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        sequence_funnel,
    )

    def t(s):
        return f"2024-01-01 00:00:{s:02d}"

    rows = [
        # u1: full ordered funnel with noise between steps
        (1, t(1), "click"), (1, t(2), "noise"), (1, t(3), "view"), (1, t(5), "buy"),
        # u2: buy BEFORE view: depth stops at 2 (click, view)
        (2, t(1), "click"), (2, t(2), "buy"), (2, t(3), "view"),
        # u3: full funnel but 'buy' lands outside the 5s window from click
        (3, t(1), "click"), (3, t(2), "view"), (3, t(30), "buy"),
        # u4: never starts
        (4, t(1), "view"), (4, t(2), "buy"),
        # u5: only step 1
        (5, t(9), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id LONG, ts_s STRING, event STRING").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event"
    )
    out = sequence_funnel(
        df, "user_id", "ts", "event", ["click", "view", "buy"], within_seconds=5
    )
    got = {r["user_id"]: r["funnel_depth"] for r in out.collect()}
    assert got[1] == 3
    assert got[2] == 2  # order matters: early 'buy' ignored
    assert got[3] == 2  # window expired before 'buy'
    assert got[4] == 0  # present in events but never matched step 1
    assert got[5] == 1
    # unbounded window: u3 completes
    out2 = sequence_funnel(df, "user_id", "ts", "event", ["click", "view", "buy"])
    got2 = {r["user_id"]: r["funnel_depth"] for r in out2.collect()}
    assert got2[3] == 3
    import pytest as _pt

    with _pt.raises(ValueError):
        sequence_funnel(df, "user_id", "ts", "event", [])


def test_cusum_detects_level_shift_and_matches_duckdb_mirror(spark):
    """A persistent mid-series level shift must accumulate past the
    threshold (no single point is a band outlier); a flat series (σ=0)
    degenerates to NULLs; and the generated DuckDB oracle reproduces the
    Spark output bit-for-bit on the same fixture."""
    import duckdb

    from telecom_dataengineering_pipeline_spark.operators.trend import (
        cusum_change_points,
        cusum_oracle_sql,
    )

    steps = [f"m{i}" for i in range(8)]
    rows = [("shift", f"m{i}", 10.0 if i < 4 else 20.0) for i in range(8)]
    rows += [("flat", f"m{i}", 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, step string, x double")
    out = cusum_change_points(df, ["g"], "step", "x", steps, k=0.5, h=1.5)
    got = {
        (r["g"], r["step"]): (
            r["x"],
            r["z"],
            r["cusum_pos"],
            r["cusum_neg"],
            r["is_change"],
        )
        for r in out.collect()
    }
    # the shift accumulates: early steps quiet, late steps alarm
    assert got[("shift", "m0")][4] is False
    assert got[("shift", "m7")][4] is True
    assert got[("shift", "m7")][2] > 1.5  # positive CUSUM crossed h
    # flat series: σ=0 -> NULL z/cusums/is_change, never a divide blow-up
    assert got[("flat", "m3")][1] is None
    assert got[("flat", "m3")][4] is None

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE fixture AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', '{s}', {x})" for g, s, x in rows)
        + ") AS t(g, step, x)"
    )
    sql = cusum_oracle_sql(
        "SELECT g, step, x FROM fixture", "g", "step", "x", steps, k=0.5, h=1.5
    )
    mirror = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(sql).fetchall()
    }
    assert mirror == got


def test_cusum_needs_three_steps(spark):
    import pytest

    from telecom_dataengineering_pipeline_spark.operators.trend import (
        cusum_change_points,
    )

    df = spark.createDataFrame([("a", "s0", 1.0)], "g string, step string, x double")
    with pytest.raises(ValueError, match="three steps"):
        cusum_change_points(df, ["g"], "step", "x", ["s0", "s1"])


def test_quantile_bucket_scores_exact_all_null_metric(spark):
    """ADVICE r11: an all-NULL (or empty) metric column must emit NULL
    buckets under exact=True — the same graceful behavior exact=False has
    (the NULL sketch propagates) — instead of crashing on
    enumerate(None); a mixed frame still rank-refines its non-null
    column."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.operators.windows import (
        quantile_bucket_scores,
    )

    df = spark.createDataFrame(
        [(float(i), None) for i in range(20)], "m double, z double"
    )
    out = quantile_bucket_scores(df, ["m", "z"], k=4, accuracy=50, exact=True)
    rows = out.collect()
    assert all(r["z_bucket"] is None for r in rows)
    assert {r["m_bucket"] for r in rows} == {1, 2, 3, 4}
    # fully empty input: no refinement jobs, no crash, zero rows out
    empty = quantile_bucket_scores(df.where(F.lit(False)), ["m"], k=4, exact=True)
    assert empty.count() == 0
