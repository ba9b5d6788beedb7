"""Round-6 tests-only additions (queued for the round-7 driver window):
neighborhood-Jaccard link prediction, last-touch attribution, the
median/MAD robust outlier screen, and per-group quantile bands. Each is
verified against a brute-force Python reference on fixtures the operator
can't special-case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telecom_dataengineering_pipeline_spark.operators.graph import neighborhood_jaccard
from telecom_dataengineering_pipeline_spark.operators.windows import last_touch_attribution
from telecom_dataengineering_pipeline_spark.quality.monitors import (
    grouped_quantile_profile,
    robust_outlier_profile,
)


def _jaccard_ref(edges, max_hub=None, min_common=1):
    import collections
    import itertools

    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        common = {
            w
            for w in adj[a] & adj[b]
            if max_hub is None or len(adj[w]) <= max_hub
        }
        if len(common) >= min_common:
            j = len(common) / (len(adj[a]) + len(adj[b]) - len(common))
            out[(a, b)] = (len(common), round(j, 6))
    return out


@pytest.mark.slow
def test_neighborhood_jaccard_matches_bruteforce(spark):
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in neighborhood_jaccard(df).collect()
    }
    assert got == _jaccard_ref(edges)


def test_neighborhood_jaccard_canonicalizes_bidirectional_input(spark):
    """Defensive canonicalization: a table carrying both (u,v) and (v,u)
    (plus literal duplicates) must yield EXACTLY the canonical answer —
    no doubled degrees, no doubled common counts."""
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 6)]
    noisy = edges + [(v, u) for u, v in edges] + edges[:3]
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in neighborhood_jaccard(
            spark.createDataFrame(noisy, "u long, v long")
        ).collect()
    }
    assert got == _jaccard_ref(edges)


def test_neighborhood_jaccard_hub_guard_drops_wedges_not_degrees(spark):
    """A hub above the cap stops GENERATING wedges but still counts in its
    neighbors' degrees — the denominator stays honest."""
    # star: hub 0 connects 1..5; plus the 1-2 edge
    edges = [(0, k) for k in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"])
        for r in neighborhood_jaccard(df, max_hub_degree=3).collect()
    }
    assert got == _jaccard_ref(edges, max_hub=3)
    # through-hub pairs like (3,4) are gone; (1,2) keeps its direct common
    # neighbors minus the hub wedge: N(1)={0,2}, N(2)={0,1} -> common {0}
    # suppressed -> (1,2) absent too
    assert (3, 4) not in got and (1, 2) not in got
    # unguarded: the hub generates all 10 leaf pairs (+ its own 2 pairs
    # with the 1-2 triangle's members)
    assert len(_jaccard_ref(edges)) == 12


def test_last_touch_attribution_window_and_ordering(spark):
    rows = [
        # user 1: click at 10, purchase at 20 -> attributed to the click
        (1, 10_000_000, 1, "click"),
        (1, 20_000_000, 2, "purchase"),
        # user 1: second purchase at 25 -> the same click is the last
        # touch but 15s old: outside the 10s window -> null
        (1, 25_000_000, 3, "purchase"),
        # user 2: view then later click; purchase takes the LATEST touch
        (2, 5_000_000, 4, "view"),
        (2, 9_000_000, 5, "click"),
        (2, 12_000_000, 6, "purchase"),
        # user 3: touch too old for the 10s window -> null attribution
        (3, 1_000_000, 7, "click"),
        (3, 50_000_000, 8, "purchase"),
        # user 4: purchase with no preceding touch at all
        (4, 8_000_000, 9, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, us long, event_id long, event_type string"
    ).select(
        "user_id",
        F.timestamp_micros("us").alias("ts"),
        "event_id",
        "event_type",
    )
    got = {
        (r["user_id"], r["conversion_us"]): (r["touch_event"], r["touch_us"])
        for r in last_touch_attribution(
            ev,
            user_col="user_id",
            ts_col="ts",
            event_col="event_type",
            conversion="purchase",
            touch_events=["view", "click"],
            within_seconds=10,
            tiebreak_col="event_id",
        ).collect()
    }
    assert got == {
        (1, 20_000_000): ("click", 10_000_000),
        (1, 25_000_000): (None, None),
        (2, 12_000_000): ("click", 9_000_000),
        (3, 50_000_000): (None, None),
        (4, 8_000_000): (None, None),
    }
    with pytest.raises(ValueError, match="cannot also be a touch"):
        last_touch_attribution(
            ev, "user_id", "ts", "event_type", "click", ["click"]
        )


def test_robust_outlier_profile_flags_only_true_outliers(spark):
    # 20 values near 100 plus two wild points; mean/std would drag toward
    # the outliers, median/MAD must not
    vals = [100.0 + (i % 5) for i in range(20)] + [10_000.0, -5_000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = robust_outlier_profile(df, "x").collect()[0]
    assert row["n"] == 22
    assert 100.0 <= row["median"] <= 104.0
    assert row["n_outliers"] == 2
    assert row["outlier_rate"] == round(2 / 22, 6)


def test_robust_outlier_profile_zero_mad_degenerates_to_null(spark):
    df = spark.createDataFrame([(5.0,)] * 10 + [(9.0,)], "x double")
    row = robust_outlier_profile(df, "x").collect()[0]
    assert row["mad"] == 0.0
    assert row["n_outliers"] is None  # degenerate scale: no silent zeros


def test_grouped_quantile_profile_rank_exact_per_group(spark):
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(10 * i)) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in grouped_quantile_profile(df, ["g"], "x").collect()}
    # rank-exact regime: value at rank ceil(p*n)
    assert got["a"]["n"] == 100 and got["b"]["n"] == 10
    assert got["a"]["q_25"] == 25.0 and got["a"]["q_50"] == 50.0
    assert got["a"]["q_75"] == 75.0 and got["a"]["q_90"] == 90.0
    assert got["b"]["q_50"] == 50.0 and got["b"]["q_90"] == 90.0


def test_grid_density_cells_centroids_and_negative_coords(spark):
    from telecom_dataengineering_pipeline_spark.functions.geo import grid_density

    pts = [
        (0.2, 0.2, 10.0),
        (0.8, 0.9, 20.0),   # same cell as above at 1-degree resolution
        (-0.5, 0.5, 5.0),   # floor(-0.5) = -1: negative coords need floor,
                            # not a truncating cast (which would give 0)
        (2.5, 3.5, 1.0),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double, v double")
    got = {
        (r["cell_lat"], r["cell_lon"]): (
            r["n"],
            r["centroid_lat"],
            r["centroid_lon"],
            r["total"],
        )
        for r in grid_density(df, "lat", "lon", 1.0, value_col="v").collect()
    }
    assert got == {
        (0, 0): (2, 0.5, 0.55, 30.0),
        (-1, 0): (1, -0.5, 0.5, 5.0),
        (2, 3): (1, 2.5, 3.5, 1.0),
    }
