"""Gap-fill/forward-fill operator and blocked fuzzy matching."""

from __future__ import annotations

from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.llmprep.fuzzy import fuzzy_prefix_pairs
from telecom_dataengineering_pipeline_spark.operators.gapfill import gap_fill_ffill


def test_gapfill_synthesizes_and_carries_forward(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-01 12:00:00", 7.0),
            # Jan 2-3 silent
            (1, "2024-01-04 09:00:00", 1.0),
            (2, "2024-01-02 00:00:00", 3.0),
        ],
        "user_id LONG, ts_s STRING, value DOUBLE",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = gap_fill_ffill(
        ev,
        key="user_id",
        bucket=F.date_trunc("day", "ts"),
        values=[
            ("day_value", F.sum("value")),
            ("day_events", F.count(F.lit(1)).cast("long")),
        ],
    )
    rows = {
        (r["user_id"], str(r["bucket"])[:10]): r for r in out.collect()
    }
    # user 1 spans 4 days: observed, gap, gap, observed.
    assert len([k for k in rows if k[0] == 1]) == 4
    assert rows[(1, "2024-01-01")]["day_value"] == 12.0
    assert not rows[(1, "2024-01-01")]["is_gap"]
    for day in ("2024-01-02", "2024-01-03"):
        r = rows[(1, day)]
        assert r["is_gap"] and r["day_value"] == 12.0 and r["day_events"] == 2
    assert rows[(1, "2024-01-04")]["day_value"] == 1.0
    # user 2: single-day span, no synthesized rows; keys never bleed.
    assert len([k for k in rows if k[0] == 2]) == 1
    assert rows[(2, "2024-01-02")]["day_value"] == 3.0


def test_fuzzy_blocking_and_verify(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilom zeta eta theta"),  # 1 edit in pfx
            (2, "alpha completely different content here to see"),  # same tok0/band, far
            (3, "omega beta gamma delta epsilon zeta eta theta"),  # different tok0: blocked out
        ],
        "doc_id LONG, text STRING",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_prefix_pairs(docs, prefix_len=40, band_width=100, max_dist=5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1
    # Far same-block pair is a candidate but fails the verify threshold.
    assert (0, 2) not in pairs
    # Different first token never becomes a candidate (documented blocking
    # miss for prefix-unstable corruption — the trade every blocker makes).
    assert all(3 not in k for k in pairs)


def test_fuzzy_candidates_bounded_by_blocks(spark):
    # 20 docs across 2 blocks of 10: candidates = 2 * C(10,2) = 90,
    # not C(20,2) = 190 — the blocking actually prunes the join.
    rows = [(i, f"{'left' if i % 2 == 0 else 'right'} word{i} filler text") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    from telecom_dataengineering_pipeline_spark.llmprep.fuzzy import fuzzy_block_keys

    keys = fuzzy_block_keys(docs)
    a = keys.select(F.col("doc_id").alias("id_a"), "tok0", "band")
    b = keys.select(F.col("doc_id").alias("id_b"), "tok0", "band")
    n_cand = a.join(b, ["tok0", "band"]).filter(F.col("id_a") < F.col("id_b")).count()
    assert n_cand == 90


def test_wma_exact_and_out_of_sample(spark):
    from telecom_dataengineering_pipeline_spark.operators.trend import (
        band_anomaly_flags,
        weighted_moving_avg,
    )

    rows = [("d1", "10.00"), ("d2", "10.00"), ("d3", "10.00"), ("d4", "10.00"),
            ("d5", "100.00"), ("d6", "1.00")]
    df = spark.createDataFrame(rows, "day STRING, rev_s STRING").withColumn(
        "rev", F.col("rev_s").cast("decimal(12,2)")
    )
    out = {r["day"]: r for r in band_anomaly_flags(
        weighted_moving_avg(df, "day", "rev", weights=("0.4", "0.3", "0.2", "0.1")),
        value_col="rev",
    ).collect()}
    # Warm-up rows (fewer than 4 priors) have NULL baseline and no flags.
    for d in ("d1", "d2", "d3", "d4"):
        assert out[d]["wma"] is None and out[d]["is_drop"] is None
    # d5 baseline = exact 10.00; value 100 > 2×10 → spike, not drop.
    assert float(out["d5"]["wma"]) == 10.0
    assert out["d5"]["is_spike"] and not out["d5"]["is_drop"]
    # d6 baseline = .4·100 + .3·10 + .2·10 + .1·10 = 46.00 exactly.
    assert float(out["d6"]["wma"]) == 46.0
    assert out["d6"]["is_drop"] and not out["d6"]["is_spike"]


def test_entity_resolution_transitive_clusters(spark):
    """A≈B (1 edit) and B≈C (1 edit) cluster A,B,C together even though
    A and C are 2 edits apart and max_dist=1; unrelated entities stay
    apart; no-neighbor records form singleton clusters."""
    from pyspark.sql import functions as F

    from telecom_dataengineering_pipeline_spark.llmprep.fuzzy import (
        entity_resolution_clusters,
    )

    rows = [
        (1, "acme corporation ltd"),
        (2, "acme corporatian ltd"),   # 1 edit from 1
        (3, "acme corporatian ltd."),  # 1 edit from 2, 2 edits from 1
        (4, "globex industries"),
        (5, "globex industrias"),      # 1 edit from 4
        (6, "initech"),                # singleton
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in entity_resolution_clusters(df, max_dist=1).collect()
    }
    assert got[1] == got[2] == got[3] == 1  # transitive closure, min id
    assert got[4] == got[5] == 4
    assert got[6] == 6  # singleton keeps its own id
    assert got[1] != got[4] != got[6]


def test_survivorship_golden_records(spark):
    """Per cluster: most-complete wins, recency breaks completeness ties,
    id breaks full ties; singletons survive trivially."""
    from telecom_dataengineering_pipeline_spark.llmprep.fuzzy import (
        survivorship_golden_records,
    )

    rows = [
        # cluster 1: id 2 has more populated fields
        (1, 1, "acme", None, None, "2024-01-05"),
        (2, 1, "acme corp", "NY", "a@x.com", "2024-01-01"),
        # cluster 4: equal completeness -> newer wins
        (4, 4, "globex", "CA", None, "2024-01-01"),
        (5, 4, "globex inc", "TX", None, "2024-02-01"),
        # cluster 6: full tie -> min id
        (6, 6, "initech", None, None, "2024-01-01"),
        (7, 6, "initech!", None, None, "2024-01-01"),
        # singleton
        (9, 9, "hooli", "SF", "h@h.h", "2024-03-01"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, cluster_id LONG, name STRING, region STRING, email STRING, updated STRING"
    )
    out = survivorship_golden_records(
        df, completeness_cols=["region", "email"], recency_col="updated"
    )
    got = {r["cluster_id"]: r["doc_id"] for r in out.collect()}
    assert got == {1: 2, 4: 5, 6: 6, 9: 9}
    scores = {r["doc_id"]: r["_completeness"] for r in out.collect()}
    assert scores[2] == 2 and scores[6] == 0
