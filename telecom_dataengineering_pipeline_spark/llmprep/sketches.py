"""Mergeable frequency sketches (count-min) for corpus-scale token/entity
frequency estimation.

A 100 TB corpus has a vocabulary too large to count exactly per pipeline
stage; a count-min sketch (Cormode & Muthukrishnan 2005) compresses the
whole frequency distribution into a fixed ``depth × width`` grid of
counters with one-sided error (estimates only over-count, by at most
``ε·N`` with ``ε = e/width`` at confidence ``1 − e^-depth``). On Spark the
sketch IS a tiny DataFrame of ``(rw, cl, cnt)`` cells:

- **build** = one explode (``depth`` cells per item) + one map-side-combined
  hash aggregate — a single pass, no driver state;
- **merge** across corpus shards/days = union + re-aggregate (counters are
  additive — the property that makes the sketch distributable);
- **estimate** = broadcast the d×w cell table onto the probe items and take
  the per-item minimum across rows.

Hashes are the engine-neutral md5-derived 32-bit family used across the
llmprep tier (``llmprep/text.py token_hash32``), so DuckDB reproduces the
exact sketch — construction and estimates are oracle-checkable, not just
plausible. The complement of the HLL cardinality sketch in
``quality/monitors.py`` (A9): HLL answers "how many distinct", CMS answers
"how often each".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import token_hash32


def _cms_col(item: Column, row: int, width: int) -> Column:
    """Column index of ``item`` in sketch row ``row``: md5-derived 32-bit
    hash of the row-salted item, mod width. Independent-enough hash family
    via the salt; reproducible verbatim in DuckDB."""
    return token_hash32(F.concat(F.lit(f"cms_{row}_"), item.cast("string"))) % F.lit(
        width
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch over one item per input row (pre-exploded stream):
    returns the ``(rw, cl, cnt)`` cell table, at most ``depth × width``
    rows regardless of corpus size. ``weight_col`` makes it a weighted
    sketch (e.g. byte counts instead of occurrences)."""
    it = F.col(item_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("rw"), _cms_col(it, j, width).alias("cl")
                )
                for j in range(depth)
            ]
        )
    ).alias("cell")
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        items.select(cells, w.cast("bigint").alias("_w"))
        .groupBy("cell.rw", "cell.cl")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical geometry: counters are additive,
    so shard/day/source sketches combine by cell-wise sum — the property
    that lets each executor (or each day's job) sketch independently."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("rw", "cl").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate item: min over the item's
    ``depth`` cells. The cell table (≤ d×w rows) broadcasts onto the probe
    side — estimating any number of candidates costs one broadcast join,
    never a shuffle of the sketch."""
    it = F.col(item_col)
    probes = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("rw"), _cms_col(it, j, width).alias("cl")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(item_col, "cell.rw", "cell.cl")
    return (
        probes.join(F.broadcast(sketch), ["rw", "cl"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    candidates: DataFrame,
    item_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k candidates by sketch-estimated frequency (estimate desc, item
    asc tiebreak): the bounded-memory answer to "which of these items are
    hot in the corpus" — the full stream is seen once, and only the d×w
    cells plus the candidate set are ever held."""
    sketch = cms_build(items, item_col, depth, width)
    est = cms_estimate(sketch, candidates, item_col, depth, width)
    return est.orderBy(F.col("cms_count").desc(), F.col(item_col).asc()).limit(k)
