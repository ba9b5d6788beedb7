"""Feature-engineering and evaluation operators — the supervised-ML rim
of the engine: encode categoricals against a target without leakage,
normalize scores per key, and grade a scorer's ranking quality. These sit
downstream of the dedup/linkage tiers (whose scored candidate pairs are
exactly what :func:`binary_auc` evaluates) and upstream of the sampling
tier's split assignment.

Determinism discipline matches the registry conventions: every statistic
derives from exact integer/decimal sums; doubles appear only in final,
fixed-shape divisions rounded to 6 — so each operator mirrors verbatim in
a second engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 0.0,
    out_col: str = "te_loo",
) -> DataFrame:
    """Leave-one-out target encoding — the categorical encoder that
    doesn't leak: each row's category is replaced by the mean target of
    the OTHER rows in that category, (Σy − y)/(n − 1), optionally
    smoothed toward the global mean with ``smoothing`` pseudo-counts
    ((Σy − y + m·ȳ)/(n − 1 + m), the empirical-Bayes shrink that tames
    rare categories). Plain mean encoding memorizes its own row's label
    — the classic target-leak; the LOO form is what a fit-on-train /
    apply-on-test pipeline produces, computed in one pass.

    Scale shape: one category-keyed exchange — Σy and n ride a
    partition window, the per-row subtraction is a projection; the
    global mean is a 1-row broadcast. No category dictionary collected,
    no join back onto the row relation.

    Determinism: Σy is a DECIMAL sum (exact); the encode is one
    fixed-shape double division per row, rounded to 6. Singleton
    categories (n = 1) encode NULL when unsmoothed — no other row to
    borrow from — and shrink fully to the global mean when smoothed.
    NULL targets are excluded from Σy/n but their rows still receive an
    encoding. Returns the input plus ``out_col``."""
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    w = Window.partitionBy(F.col(category_col))
    y = F.col(target_col).cast("decimal(24,6)")
    cur = df.withColumn("_sum_y", F.sum(y).over(w)).withColumn(
        "_n_y", F.count(y).over(w).cast("long")
    )
    gstats = df.agg(
        (
            F.sum(y).cast("double")
            / F.count(y).cast("double")
        ).alias("_gmean")
    )
    cur = cur.crossJoin(F.broadcast(gstats))
    self_y = F.coalesce(y.cast("double"), F.lit(0.0))
    self_n = F.col(target_col).isNotNull().cast("long")
    num = (
        F.coalesce(F.col("_sum_y").cast("double"), F.lit(0.0))
        - self_y
        + F.lit(float(smoothing)) * F.col("_gmean")
    )
    den = (F.col("_n_y") - self_n).cast("double") + F.lit(float(smoothing))
    enc = F.when(den > 0, F.round(num / den, 6))
    return cur.withColumn(out_col, enc).drop("_sum_y", "_n_y", "_gmean")


def ecdf_normalize(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    out_prefix: str = "",
) -> DataFrame:
    """Per-key empirical-CDF normalization — the rank transform that
    makes heavy-tailed features comparable across keys (a 300-ms latency
    is P50 for one cell tower and P99 for another): adds
    ``ecdf`` = P(X ≤ x) (cume_dist) and ``pct_rank`` = (rank−1)/(n−1)
    (percent_rank), both tie-SAFE — every row of a tie group gets the
    identical value, so the output is deterministic without a tie-break
    column, unlike row_number scalers.

    One keyed sort-window exchange, two window expressions, zero joins.
    NULL values sort per Spark/SQL default (first ascending) in both
    engines' NULLS FIRST convention — callers who want NULLs excluded
    filter upstream. Rounded to 6."""
    wo = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        F.col(value_col).asc()
    )
    return df.withColumn(
        out_prefix + "ecdf", F.round(F.cume_dist().over(wo), 6)
    ).withColumn(out_prefix + "pct_rank", F.round(F.percent_rank().over(wo), 6))


def binary_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """ROC-AUC of a binary scorer via the Mann–Whitney U statistic —
    the threshold-free grade for the linkage/dedup tiers' candidate
    scores (is_match vs similarity) and any fraud/quality scorer:
    AUC = P(score_pos > score_neg) + ½·P(tie), computed exactly as
    U/(n₊·n₋) with tie-averaged ranks.

    The textbook form sorts ALL scores globally; here ranks come from
    ONE (optionally keyed) sort window, and ties use the closed form
    avg_rank = rank + (tie_count − 1)/2 where tie_count is a
    RANGE-frame count over the same ordered window (rows with equal
    order value — no second partitioning, no self-join). To stay in
    integers, the aggregate sums 2·avg_rank = 2·rank + tie_count − 1
    (always integral) over the positives, so
    AUC = (Σ2r₊ − n₊·(n₊+1)) / (2·n₊·n₋) divides two exact LONGs —
    bit-identical in any engine.

    ``key_cols`` empty grades one global scorer (the window is a single
    partition — fine for eval-sized scored sets, the usual case; pass
    keys to grade per-segment at scale). Labels must be 0/1 (cast from
    boolean upstream); rows with NULL label or score are excluded.
    Returns (*key_cols, n_pos, n_neg, auc) with auc rounded to 6, NULL
    when either class is empty."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    ).select(
        *kcols,
        F.col(label_col).cast("long").alias("_y"),
        F.col(score_col).cast("double").alias("_s"),
    )
    wo = Window.partitionBy(*kcols).orderBy(F.col("_s").asc())
    wt = wo.rangeBetween(Window.currentRow, Window.currentRow)
    # 2·avg_rank = 2·min_rank + ties − 1 (integral): rank() is the min
    # rank of the tie group, the RANGE frame counts the group's size.
    ranked = base.withColumn(
        "_2r",
        (2 * F.rank().over(wo) + F.count(F.lit(1)).over(wt) - 1).cast("long"),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.sum("_y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("_y") == 1, F.col("_2r")).otherwise(0))
        .cast("long")
        .alias("_s2r"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (
                F.col("_s2r").cast("double")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double")
            )
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
            6,
        ),
    )
    return agg.select(*key_cols, "n_pos", "n_neg", auc.alias("auc"))
