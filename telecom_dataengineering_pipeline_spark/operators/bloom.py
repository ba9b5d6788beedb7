"""Bloom-filter semi-join reduction (runtime-filter pattern).

A fact⋈dim join at 100 TB moves every fact row to the join even when only
a sliver matches the dim-side predicate. The production fix is a runtime
filter: summarize the dim side's join keys into a few kilobytes of bloom
bits, push that summary into the fact scan as a plain column predicate,
and let the exact join run over the pre-filtered remnant. Spark injects
its own bloom runtime filters opportunistically
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator makes
the mechanism explicit, deterministic, and engine-neutral so the filter
itself is oracle-checkable.

- **build**: k md5-derived positions per dim key, OR-folded into
  ``m/64`` longs by one map-side-combined aggregate; the finished filter
  is a bounded driver fetch (64 longs at m=4096 — the same legitimacy
  class as broadcast k-means centroids).
- **probe**: membership is k bit-tests against a LITERAL long array —
  pure JVM shift/AND expressions inside whole-stage codegen; the fact side
  joins nothing and shuffles nothing to be filtered.
- **semantics**: no false negatives (every true match passes), bounded
  false positives (~(fill)^k) — so ``bloom → exact join`` returns exactly
  the join's rows, just cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..llmprep.text import token_hash32


def _position(key: Column, i: int, m_bits: int) -> Column:
    """Position of hash i: engine-neutral 32-bit hash of the salted key,
    mod m — reproduced verbatim by the DuckDB oracle."""
    return token_hash32(F.concat(F.lit(f"bloom_{i}_"), key.cast("string"))) % F.lit(
        m_bits
    )


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 4) -> list[int]:
    """Fold the key set into ``m_bits/64`` longs. One pass: explode k
    positions per key, OR partial words map-side, fetch the word table."""
    assert m_bits % 64 == 0
    pos = df.select(
        F.explode(
            F.array(*[_position(F.col(key_col), i, m_bits) for i in range(k)])
        ).alias("p")
    )
    rows = (
        pos.groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT)))"
            ).alias("bits")
        )
        .collect()  # bounded: m_bits/64 rows, not data
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = 4096, k: int = 4
) -> Column:
    """k bit-tests against the literal word array — constant-folded into
    codegen, no join, no shuffle. True for every real member; false
    positives bounded by the fill ratio^k."""
    w_arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for i in range(k):
        p = _position(key, i, m_bits)
        word = F.element_at(w_arr, (p / 64).cast("int") + 1)
        # F.shiftright only takes a literal count; the SQL function accepts
        # a column operand.
        bit = F.call_function("shiftright", word, (p % 64).cast("int")).bitwiseAND(
            F.lit(1)
        )
        cond = cond & (bit == 1)
    return cond
