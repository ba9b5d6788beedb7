"""Market-basket association mining — pairwise rules over (basket, item)
relations, the co-purchase analytics tier next to the graph operators
(``graph.py`` treats co-occurrence as edges; this treats it as RULES with
support/confidence/lift semantics).

Classic Apriori insight, Spark-first: frequent ITEMS are computed before
any pair is generated (the anti-monotone prune — a pair can't reach
``min_support`` unless both items do), so the quadratic per-basket
fan-out runs over the pruned item stream only. The remaining skew knob is
basket size: a mega-basket (a crawler account touching every item) emits
|B|²/2 pairs, so ``max_basket_size`` drops baskets whose PRUNED size (the
actual pair fan-out) exceeds the cap — the
``max_hub_degree`` discipline from ``graph.neighborhood_jaccard``, with
the same honesty property (surviving baskets' counts are exact; the cap
is a documented coverage bound, not silent truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Pairwise association rules A → B with support / confidence / lift.

    Pipeline: distinct (basket, item) → item supports (map-side combine)
    → anti-monotone prune at ``min_support`` → per-basket self-join on
    the pruned stream with ``item_a < item_b`` canonical election (each
    unordered pair counted once, the interval-join trick) → pair counts
    → both rule directions emitted from the canonical pair with the item
    supports joined back via two broadcast-sized lookups.

    Scale shape: the only basket-keyed shuffle carries the PRUNED item
    stream; pair counting is one map-side-combined aggregate on the pair
    key; item supports and the basket total are metadata-sized
    broadcasts. Confidence = pair/antecedent and lift = confidence /
    (consequent/n_baskets) are single deterministic double divisions
    from exact integer counts (rounded to 6) — no float accumulation.

    Returns (antecedent, consequent, pair_count, antecedent_count,
    consequent_count, n_baskets, support, confidence, lift), one row per
    DIRECTION, support = pair_count/n_baskets."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    bi = (
        df.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    totals = bi.agg(
        F.count_distinct(F.col("basket")).cast("long").alias("n_baskets")
    )
    supports = bi.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("item_count")
    )
    frequent = supports.filter(F.col("item_count") >= int(min_support))
    pruned = bi.join(F.broadcast(frequent.select("item")), "item")
    if max_basket_size is not None:
        sizes = pruned.groupBy("basket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        pruned = pruned.join(
            F.broadcast(sizes.filter(F.col("_bsz") <= int(max_basket_size))).select(
                "basket"
            ),
            "basket",
        )
    a = pruned.select("basket", F.col("item").alias("item_a"))
    b = pruned.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_count"))
        .filter(F.col("pair_count") >= int(min_support))
    )
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count",
        )
    )
    ac = frequent.select(
        F.col("item").alias("antecedent"), F.col("item_count").alias("antecedent_count")
    )
    cc = frequent.select(
        F.col("item").alias("consequent"), F.col("item_count").alias("consequent_count")
    )
    out = (
        both.join(F.broadcast(ac), "antecedent")
        .join(F.broadcast(cc), "consequent")
        .crossJoin(F.broadcast(totals))
    )
    nb = F.col("n_baskets").cast("double")
    conf = F.col("pair_count").cast("double") / F.col("antecedent_count").cast("double")
    return out.select(
        "antecedent",
        "consequent",
        "pair_count",
        "antecedent_count",
        "consequent_count",
        "n_baskets",
        F.round(F.col("pair_count").cast("double") / nb, 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(
            conf / (F.col("consequent_count").cast("double") / nb), 6
        ).alias("lift"),
    )
