"""Iterative graph analytics: fixed-point PageRank.

Complements the connected-components tier (``llmprep/dedup.py``
large-star/small-star) with the other workhorse graph primitive. Pregel
shape per iteration: contributions flow along edges (join rank → edges),
aggregate at the destination (map-side-combined sum), recombine with the
teleport term — ranks and edges shuffle on node id, nothing ever
collects to the driver, and iterations unroll into one lazy plan.

Arithmetic is **fixed-point integer** (ranks scaled by ``scale``,
divisions are integer ``div``): float PageRank sums doubles in
partition-dependent order and never reproduces bit-identically across
engines or even across runs; integer arithmetic is exact, associative,
and engine-neutral, so the DuckDB oracle matches hash-exact. Floor
divisions leak ≤1 unit per edge per iteration — bounded, deterministic,
and irrelevant at rank scale 10^12.

Dangling nodes (no out-edges) leak their mass each iteration — the
simplified PageRank variant; both engines compute the same thing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """``edges``: directed ``(src, dst)`` pairs (dedup them upstream if
    multiplicity should not weight the walk). Returns ``(node, rank_fp)``
    with rank in units of ``scale`` after ``iters`` synchronous
    iterations from a uniform start."""
    edges = edges.select("src", "dst")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    teleport = scale * (100 - damping_pct) // 100
    rank = nodes.withColumn("rank_fp", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            edges.join(rank, edges["src"] == rank["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
        rank = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) div 100")
            )
            .cast("long")
            .alias("rank_fp"),
        )
    return rank
