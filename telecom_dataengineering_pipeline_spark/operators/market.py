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
from ..lineage import lineage_cut


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
        .transform(lineage_cut)
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
    # Both rule directions via a map-side explode instead of a union of a
    # swapped projection — the union's second branch re-executes the pair
    # aggregate (shared subtrees are not deduped); the explode doubles
    # rows inside the same stage. See item_item_cosine_topk.
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                    F.col("pair_count").alias("pair_count"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                    F.col("pair_count").alias("pair_count"),
                ),
            )
        ).alias("p")
    ).select("p.antecedent", "p.consequent", "p.pair_count")
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


def item_item_cosine_topk(
    df: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 10,
    min_count: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Item–item collaborative filtering: the top-``k`` most similar
    items per item under binary cosine sim(i,j) = |U_i ∩ U_j| /
    √(|U_i|·|U_j|) over the user–item interaction relation — the
    neighborhood model behind "customers who bought X also bought Y".
    Completes the co-occurrence triangle: :func:`association_rules`
    grades pairs as RULES (directional confidence/lift),
    ``graph.neighborhood_jaccard`` as LINK PREDICTION (shared-neighbor
    sets); this ranks NEIGHBORS per item with the cosine that discounts
    blockbuster items (√ of both popularities in the denominator).

    Scale shape: identical pair discipline to :func:`association_rules`
    — distinct interactions, anti-monotone ``min_count`` item prune
    BEFORE the per-user fan-out, ``max_basket_size`` cap on the pruned
    basket (the hub guard), canonical ``i < j`` election so each pair
    aggregates once, both directions emitted from the canonical pair
    relation (pair-grain, metadata-sized), item counts joined back as a
    broadcast. The final top-k is a WindowGroupLimit-prunable
    row_number over (item, cosine desc).

    Determinism: all counts exact LONGs; cosine is one fixed-shape
    double expression co/√(nᵢ·nⱼ) ROUNDED to 6 and the neighbor rank
    orders by (rounded cosine DESC, neighbor ASC) — rounded-first so
    ulp skew can't flip a rank cross-engine. Returns one row per
    (item, neighbor) with rk ≤ k: (item, neighbor, n_item, n_neighbor,
    n_co, cosine, rk)."""
    if k < 1:
        raise ValueError("item_item_cosine_topk needs k >= 1")
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    ui = (
        df.select(F.col(user_col).alias("user"), F.col(item_col).alias("item"))
        .distinct()
        .transform(lineage_cut)
    )
    counts = ui.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    frequent = counts.filter(F.col("n_item") >= int(min_count))
    pruned = ui.join(F.broadcast(frequent.select("item")), "item")
    if max_basket_size is not None:
        sizes = pruned.groupBy("user").agg(F.count(F.lit(1)).alias("_bsz"))
        pruned = pruned.join(
            F.broadcast(sizes.filter(F.col("_bsz") <= int(max_basket_size))).select(
                "user"
            ),
            "user",
        )
    a = pruned.select("user", F.col("item").alias("i"))
    b = pruned.select("user", F.col("item").alias("j"))
    pairs = (
        a.join(b, "user")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("n_co"))
    )
    # Emit both neighbor directions with a map-side explode instead of a
    # union of a swapped projection: the union's second branch re-executes
    # the whole pair aggregate (Spark does not dedupe shared subtrees —
    # runtime exchange reuse saves the shuffle write but the final
    # aggregate + downstream still run per branch); the explode doubles
    # rows inside the same stage for free.
    both = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("i"), F.col("j").alias("j"), F.col("n_co").alias("n_co")
                ),
                F.struct(
                    F.col("j").alias("i"), F.col("i").alias("j"), F.col("n_co").alias("n_co")
                ),
            )
        ).alias("p")
    ).select("p.i", "p.j", "p.n_co")
    ni = frequent.select(F.col("item").alias("i"), F.col("n_item").alias("n_item"))
    nj = frequent.select(F.col("item").alias("j"), F.col("n_item").alias("n_neighbor"))
    scored = (
        both.join(F.broadcast(ni), "i")
        .join(F.broadcast(nj), "j")
        .withColumn(
            "cosine",
            F.round(
                F.col("n_co").cast("double")
                / F.sqrt(
                    F.col("n_item").cast("double") * F.col("n_neighbor").cast("double")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("i").orderBy(F.col("cosine").desc(), F.col("j").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= int(k))
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            "n_item",
            "n_neighbor",
            "n_co",
            "cosine",
            "rk",
        )
    )


def cohort_overlap_matrix(
    df: DataFrame,
    unit_col: str,
    label_col: str,
) -> DataFrame:
    """Pairwise audience-overlap matrix over a (unit, label) membership
    relation — "how many users who did X also did Y": |A∩B|, Jaccard,
    and lift vs independence, the audience-planning companion of the
    association-rules tier (rules rank directed item pairs by support
    inside baskets; this profiles label AUDIENCES over units).

    Scale shape: memberships dedup to the (unit, label) grain, then the
    per-unit label-set fan-out is alphabet-bounded (labels per unit ≤
    |labels| — event types, segments, plans; NOT items) before one
    map-side-combined pair count. Label totals ride a broadcast join;
    nothing quadratic in units.

    Determinism: counts exact; jaccard/lift fixed-shape doubles rounded
    to 6 (lift = n_both·n_units / (n_a·n_b)). Returns one row per
    unordered label pair (label_a < label_b): (label_a, label_b,
    n_both, n_a, n_b, n_units, jaccard, lift)."""
    m = df.select(
        F.col(unit_col).alias("u"), F.col(label_col).alias("l")
    ).distinct().transform(lineage_cut)
    totals = m.groupBy("l").agg(F.count(F.lit(1)).cast("long").alias("n"))
    n_units = m.select("u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_units")
    )
    sets = m.groupBy("u").agg(F.sort_array(F.collect_set("l")).alias("ls"))
    pairs = (
        sets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ls, (x, i) -> "
                        "transform(slice(ls, i + 2, size(ls)), "
                        "y -> struct(x AS a, y AS b)))"
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("label_a"), F.col("p.b").alias("label_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ta = totals.select(F.col("l").alias("label_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("l").alias("label_b"), F.col("n").alias("n_b"))
    j = (
        pairs.join(F.broadcast(ta), "label_a")
        .join(F.broadcast(tb), "label_b")
        .crossJoin(F.broadcast(n_units))
    )
    both = F.col("n_both").cast("double")
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    return j.select(
        "label_a",
        "label_b",
        "n_both",
        "n_a",
        "n_b",
        "n_units",
        F.round(both / (na + nb - both), 6).alias("jaccard"),
        F.round(both * F.col("n_units").cast("double") / (na * nb), 6).alias("lift"),
    )
