"""Fixed-point PageRank: structural properties the value-parity gate can't
see — hub dominance, determinism across runs, and the Pregel plan shape."""

from __future__ import annotations

from telecom_dataengineering_pipeline_spark.operators.graph import pagerank_fixed_point
import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def test_hub_outranks_leaves_and_iteration_sharpens(spark):
    # star: every leaf points at the hub; hub points back at one leaf
    pairs = [(f"leaf{i}", "hub") for i in range(5)] + [("hub", "leaf0")]
    r1 = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(_edges(spark, pairs), iters=1).collect()}
    r3 = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(_edges(spark, pairs), iters=3).collect()}
    assert r1["hub"] > r1["leaf1"]
    assert r3["hub"] > r3["leaf1"]
    # leaf0 receives the hub's (large) mass — outranks the other leaves
    assert r3["leaf0"] > r3["leaf1"]
    # leaves 1..4 are symmetric: identical ranks, exactly
    assert len({r3[f"leaf{i}"] for i in range(1, 5)}) == 1


def test_deterministic_across_runs(spark):
    pairs = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(100)]
    a = sorted(pagerank_fixed_point(_edges(spark, pairs), iters=3).collect())
    b = sorted(pagerank_fixed_point(_edges(spark, pairs), iters=3).collect())
    assert a == b  # integer fixed-point: bit-identical, not approximately equal


def test_dangling_node_keeps_teleport_rank(spark):
    # b has no out-edges: its mass leaks, but it still holds teleport + inflow
    r = {r["node"]: r["rank_fp"] for r in pagerank_fixed_point(_edges(spark, [("a", "b")]), iters=2).collect()}
    teleport = 10**12 * 15 // 100
    assert r["a"] == teleport  # no inflow at all
    assert r["b"] > teleport  # a's contribution arrived


def test_topk_plan_is_take_ordered(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    df = REGISTRY["pagerank_purchase_graph"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def _und_edges(spark, pairs):
    return spark.createDataFrame(pairs, "u string, v string")


def test_triangles_k4_every_node_on_three(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import triangle_counts

    # K4: every node lies on C(3,2)=3 triangles; 4 triangles total.
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    r = {r["node"]: r["triangles"] for r in triangle_counts(_und_edges(spark, k4)).collect()}
    assert r == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_path_has_none_and_skewed_hub_is_exact(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import triangle_counts

    # A path graph has no triangles at all.
    path = [("a", "b"), ("b", "c"), ("c", "d")]
    assert triangle_counts(_und_edges(spark, path)).count() == 0

    # Star hub + one rim edge: exactly one triangle, and the hub's huge
    # degree must not inflate the count (degree orientation enumerates the
    # wedge at a rim node, never at the hub).
    star = [("hub", f"n{i}") for i in range(20)] + [("n3", "n7")]
    star = [(min(u, v), max(u, v)) for u, v in star]
    r = {r["node"]: r["triangles"] for r in triangle_counts(_und_edges(spark, star)).collect()}
    assert r == {"hub": 1, "n3": 1, "n7": 1}


def test_triangle_query_plan_semi_closure_no_cartesian(spark, sf_smoke):
    from telecom_dataengineering_pipeline_spark.queries.registry import REGISTRY

    df = REGISTRY["triangle_count_copurchase"].fn(spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan  # closure probe is a semi join, not a count join


@pytest.mark.slow
def test_label_propagation_two_communities(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # Two 4-cliques joined by one bridge edge: labels converge within each
    # clique; the bridge does not merge them (clique votes dominate).
    c1 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    c2 = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    bridge = [("a4", "b1")]
    edges = _und_edges(spark, c1 + c2 + bridge)
    r = {x["node"]: x["label"] for x in label_propagation(edges, iters=5).collect()}
    assert len({r[n] for n in ("a1", "a2", "a3", "a4")}) == 1
    assert len({r[n] for n in ("b1", "b2", "b3", "b4")}) == 1
    assert r["a1"] != r["b1"]
    # Deterministic across runs (no visit-order or tie-break randomness).
    r2 = {x["node"]: x["label"] for x in label_propagation(edges, iters=5).collect()}
    assert r == r2
    # An isolated self-community node keeps its own label.
    lone = _und_edges(spark, [("x", "y")])
    rl = {x["node"]: x["label"] for x in label_propagation(lone, iters=3).collect()}
    assert rl == {"x": "x", "y": "x"}  # pair collapses to min label


def test_triangle_closure_strategies_agree(spark):
    from telecom_dataengineering_pipeline_spark.operators.graph import triangle_counts

    # K4 plus a pendant: both closure strategies (broadcast map-side probe
    # vs shuffled semi join for edge lists too big to broadcast) must
    # produce identical exact counts.
    g = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    e = _und_edges(spark, g)
    bc = sorted(map(tuple, triangle_counts(e, closure_strategy="broadcast").collect()))
    sh = sorted(map(tuple, triangle_counts(e, closure_strategy="shuffle").collect()))
    assert bc == sh == [("a", 3), ("b", 3), ("c", 3), ("d", 3)]
