"""Skew mitigation: salting for hot keys (SURVEY.md §4 "skewed keys →
salting or AQE skew-join").

AQE's skew-join handling only splits *join* partitions; a skewed
``groupBy`` (one customer with 10⁸ events) still funnels one key into one
task. Two-phase salted aggregation fixes that:

  phase 1: groupBy(key, salt = hash(row) % N) — partial aggregate spreads
           the hot key over N tasks;
  phase 2: groupBy(key) — combine N partials.

Works for any decomposable aggregate (sum/count/min/max; avg via sum+count).
``salted_join`` broadcasts-explodes the small side N× instead — the classic
replicated-skew-join — for when the big side's hot keys must equi-join a
medium dim that is too large to broadcast whole but fine to replicate for
the hot keys only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation.

    ``partials`` maps output name → (phase1 aggregate over input rows,
    phase2 aggregate over phase-1 partial columns). Example::

        salted_agg(df, ["k"], {
            "n":     (F.count(F.lit(1)),  F.sum("n")),
            "total": (F.sum("v"),         F.sum("total")),
            "mx":    (F.max("v"),         F.max("mx")),
        })
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[p1.alias(name) for name, (p1, _) in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[p2.alias(name) for name, (_, p2) in partials.items()]
    )


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicated skew join: salt the big side, explode the medium side
    ``salt_buckets``× so every salted key finds its match. The shuffle then
    distributes each hot key over N partitions instead of one."""
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    medium_exploded = medium.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(medium_exploded, on=[key, "_salt"], how=how).drop("_salt")
