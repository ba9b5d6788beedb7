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
from ..lineage import lineage_cut


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


def woe_iv_profile(
    df: DataFrame,
    category_col: str,
    label_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence / information-value profile of a categorical
    feature against a binary label — the credit-scoring screen that
    grades each level's pull toward the positive class and the feature's
    total predictive power: WOE_i = ln(d⁺_i / d⁻_i) with
    d±_i = (n±_i + s)/(T± + s·C) (Laplace ``smoothing`` s over C levels
    keeps one-sided cells finite), IV = Σ (d⁺_i − d⁻_i)·WOE_i. The
    supervised sibling of :func:`~..quality.monitors.mutual_information`
    (symmetric dependence) and of :func:`target_encode_loo` (which
    encodes; this one *audits*). Standard IV bands: <0.02 useless,
    0.02–0.1 weak, 0.1–0.3 medium, >0.3 strong.

    Scale shape: ONE map-side-combined count on the category — the only
    row-grain shuffle; totals and the level count ride a window over the
    cell relation (|C| rows, metadata-sized), never the base table.
    NULL categories are a real level (``__null__``); NULL labels are
    excluded.

    Determinism: counts exact; each WOE is one fixed-shape double
    expression from integer counts rounded to 6; IV contributions are
    rounded to 9 then DECIMAL-summed (round-then-decimal), the total
    cast to double and rounded to 6 — bit-identical cross-engine.
    Returns one row per level: (category, n, n_pos, n_neg, woe,
    iv_contrib, iv_total)."""
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    s = float(smoothing)
    cat = F.coalesce(F.col(category_col).cast("string"), F.lit("__null__"))
    y = F.col(label_col).cast("long")
    cells = (
        df.filter(y.isNotNull())
        .select(cat.alias("category"), y.alias("_y"))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_y").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("n_neg"),
        )
    )
    w = Window.partitionBy()
    cells = (
        cells.withColumn("_tp", F.sum("n_pos").over(w).cast("long"))
        .withColumn("_tn", F.sum("n_neg").over(w).cast("long"))
        .withColumn("_c", F.count(F.lit(1)).over(w).cast("long"))
    )
    dp = (F.col("n_pos").cast("double") + F.lit(s)) / (
        F.col("_tp").cast("double") + F.lit(s) * F.col("_c").cast("double")
    )
    dn = (F.col("n_neg").cast("double") + F.lit(s)) / (
        F.col("_tn").cast("double") + F.lit(s) * F.col("_c").cast("double")
    )
    woe = F.log(dp / dn)
    cells = cells.withColumn(
        "_ivc", F.round((dp - dn) * woe, 9).cast("decimal(28,9)")
    )
    return (
        cells.withColumn(
            "iv_total", F.round(F.sum("_ivc").over(w).cast("double"), 6)
        )
        .select(
            "category",
            "n",
            "n_pos",
            "n_neg",
            F.round(woe, 6).alias("woe"),
            F.col("_ivc").cast("double").alias("iv_contrib"),
            "iv_total",
        )
    )


def ndcg_at_k(
    df: DataFrame,
    query_cols: Sequence[str],
    score_col: str,
    rel_col: str,
    k: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """NDCG@k per query — the graded-relevance ranking grade that
    completes the evaluation rim (:func:`binary_auc` grades a binary
    scorer globally; recall@k grades set overlap; NDCG grades ORDER with
    graded gains): DCG@k = Σ_{i≤k} (2^rel_i − 1)/log₂(i+1) over docs
    ranked by the scorer, normalized by the ideal ordering's IDCG@k.

    Scale shape: one query-keyed exchange — the scorer ranking and the
    ideal ranking are two sort windows over the SAME partitioning (one
    hash exchange, two in-partition sorts), and the final rollup
    aggregates the ranked relation; nothing re-joins the base table.

    Determinism: gains 2^rel − 1 are exact LONGs (``rel`` must be a
    small non-negative integer grade, e.g. 0–10); each position's
    discount divides by the identical ln-based double shape in both
    engines, rounded to 9 then DECIMAL-summed; the final ratio is one
    double division rounded to 6. Ranking ties break on
    ``tiebreak_col`` — REQUIRED and must be unique within query
    (ADVICE r7: defaulting to ``score_col`` was a no-op tiebreak that
    made ranks partition-order-dependent whenever scores tie — the
    same mandatory-tiebreak contract as ``quantile_normalize``). Rows
    with NULL score/rel are excluded.

    Returns one row per query: (*query_cols, n_docs, dcg, idcg, ndcg);
    ndcg NULL when IDCG = 0 (no relevant docs)."""
    if k < 1:
        raise ValueError("ndcg_at_k needs k >= 1")
    if tiebreak_col is None:
        raise ValueError(
            "ndcg_at_k requires tiebreak_col (unique within query): "
            "tied scores would rank partition-order-dependently without one"
        )
    qcols = [F.col(c) for c in query_cols]
    tb = F.col(tiebreak_col)
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        *qcols,
        F.col(score_col).cast("double").alias("_s"),
        F.col(rel_col).cast("long").alias("_r"),
        tb.alias("_tb"),
    )
    gain = F.expr("shiftleft(cast(1 as bigint), cast(_r as int)) - 1").cast("long")
    w_score = Window.partitionBy(*qcols).orderBy(F.col("_s").desc(), F.col("_tb").asc())
    w_ideal = Window.partitionBy(*qcols).orderBy(F.col("_r").desc(), F.col("_tb").asc())
    ranked = base.withColumn("_g", gain).select(
        *query_cols,
        "_g",
        F.row_number().over(w_score).alias("_rk"),
        F.row_number().over(w_ideal).alias("_irk"),
    )
    # Identical discount shape in both engines: g / (ln(i+1)/ln(2)),
    # rounded to 9 before the decimal sum (absorbs any ulp skew).
    def _term(rank_col: str) -> "F.Column":
        return F.when(
            F.col(rank_col) <= k,
            F.round(
                F.col("_g").cast("double")
                / (F.log(F.col(rank_col).cast("double") + 1.0) / F.log(F.lit(2.0))),
                9,
            ).cast("decimal(28,9)"),
        ).otherwise(F.lit(0).cast("decimal(28,9)"))

    agg = ranked.groupBy(*query_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(_term("_rk")).alias("_dcg"),
        F.sum(_term("_irk")).alias("_idcg"),
    )
    dcg = F.col("_dcg").cast("double")
    idcg = F.col("_idcg").cast("double")
    return agg.select(
        *query_cols,
        "n_docs",
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(idcg > 0, F.round(dcg / idcg, 6)).alias("ndcg"),
    )


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


def pr_map_at_k(
    df: DataFrame,
    query_cols: Sequence[str],
    score_col: str,
    rel_col: str,
    k: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Precision@k / Recall@k / AP@k per query — the binary-relevance
    ranking grades that complete :func:`ndcg_at_k`'s graded view: P@k
    (how much of the page is relevant, TREC convention: divide by k),
    R@k (how much of the relevant set the page found), and average
    precision AP@k = Σ_{i≤k, rel_i} P@i / min(n_rel, k) — the
    order-sensitive one (macro-averaging AP over queries gives MAP@k).

    Scale shape: ONE query-keyed exchange — ranking, running hit count,
    and the per-query rollup all ride the same sort window partitioning;
    nothing re-joins the base relation.

    Determinism: hits and ranks are exact LONGs; each AP term
    cum_hits_i / i is a fixed-shape double ROUNDED to 9 then
    DECIMAL-summed; final ratios are single double expressions rounded
    to 6. ``rel_col`` > 0 marks relevant. Ties break on
    ``tiebreak_col`` — REQUIRED and must be unique within query
    (ADVICE r7: no more score-as-tiebreak no-op default). NULL
    score/rel rows are excluded. Returns one row per query:
    (*query_cols, n_docs, n_rel, hits_at_k, p_at_k, r_at_k, ap_at_k);
    recall/AP NULL when the query has no relevant docs."""
    if k < 1:
        raise ValueError("pr_map_at_k needs k >= 1")
    if tiebreak_col is None:
        raise ValueError(
            "pr_map_at_k requires tiebreak_col (unique within query): "
            "tied scores would rank partition-order-dependently without one"
        )
    qcols = [F.col(c) for c in query_cols]
    tb = F.col(tiebreak_col)
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(rel_col).isNotNull()
    ).select(
        *qcols,
        F.col(score_col).cast("double").alias("_s"),
        (F.col(rel_col) > 0).cast("long").alias("_r"),
        tb.alias("_tb"),
    )
    w = Window.partitionBy(*qcols).orderBy(F.col("_s").desc(), F.col("_tb").asc())
    ranked = base.select(
        *query_cols,
        "_r",
        F.row_number().over(w).alias("_rk"),
        F.sum("_r").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("_cum"),
    )
    ap_term = F.when(
        (F.col("_r") == 1) & (F.col("_rk") <= k),
        F.round(F.col("_cum").cast("double") / F.col("_rk").cast("double"), 9).cast(
            "decimal(28,9)"
        ),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    agg = ranked.groupBy(*query_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_r").cast("long").alias("n_rel"),
        F.sum(F.when(F.col("_rk") <= k, F.col("_r")).otherwise(0))
        .cast("long")
        .alias("hits_at_k"),
        F.sum(ap_term).alias("_ap"),
    )
    hits = F.col("hits_at_k").cast("double")
    nrel = F.col("n_rel")
    denom = F.least(nrel, F.lit(k)).cast("double")
    return agg.select(
        *query_cols,
        "n_docs",
        "n_rel",
        "hits_at_k",
        F.round(hits / F.lit(float(k)), 6).alias("p_at_k"),
        F.when(nrel > 0, F.round(hits / nrel.cast("double"), 6)).alias("r_at_k"),
        F.when(nrel > 0, F.round(F.col("_ap").cast("double") / denom, 6)).alias(
            "ap_at_k"
        ),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Decile lift / cumulative-gains table — the campaign-targeting
    grade: rank the population by a scorer, cut into ``n_buckets``
    equal slices, and ask how concentrated the positives are in the top
    slices (lift = slice response rate / base rate; cumulative gain =
    share of all positives captured so far). The marketing twin of
    :func:`binary_auc` — AUC grades the whole ordering, lift grades the
    operating points a campaign actually mails.

    Scale shape: a GLOBAL ntile sort (single partition — the same
    eval-grain contract as binary_auc's global variant: feed it scored
    entities, not raw events), then every derived column folds over the
    bucket grain (``n_buckets`` rows) in one window.

    Determinism: ntile's floor/ceil bucket allocation is the SQL
    standard one in both engines given a total order — ties break on
    ``tiebreak_col``, REQUIRED and must be unique (ADVICE r7: no more
    score-as-tiebreak no-op default); counts are exact LONGs; rates,
    lift, and gains are fixed-shape doubles rounded to 6.
    ``label_col`` > 0 marks positives; NULL score/label rows are
    excluded. Returns one row per bucket: (bucket, n, n_pos, resp_rate,
    lift, cum_pos, cum_gain); lift/cum_gain NULL when the population
    has no positives."""
    if n_buckets < 2:
        raise ValueError("lift_table needs n_buckets >= 2")
    if tiebreak_col is None:
        raise ValueError(
            "lift_table requires tiebreak_col (unique): tied scores would "
            "bucket partition-order-dependently without one"
        )
    tb = F.col(tiebreak_col)
    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(score_col).cast("double").alias("_s"),
        (F.col(label_col) > 0).cast("long").alias("_y"),
        tb.alias("_tb"),
    )
    w = Window.orderBy(F.col("_s").desc(), F.col("_tb").asc())
    bucketed = base.select(
        F.ntile(n_buckets).over(w).cast("long").alias("bucket"), "_y"
    )
    g = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
    )
    wall = Window.partitionBy()
    wcum = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = (
        g.withColumn("_tn", F.sum("n").over(wall).cast("long"))
        .withColumn("_tp", F.sum("n_pos").over(wall).cast("long"))
        .withColumn("cum_pos", F.sum("n_pos").over(wcum).cast("long"))
    )
    nd = F.col("n").cast("double")
    rate = F.col("n_pos").cast("double") / nd
    base_rate = F.col("_tp").cast("double") / F.col("_tn").cast("double")
    return g.select(
        "bucket",
        "n",
        "n_pos",
        F.round(rate, 6).alias("resp_rate"),
        F.when(F.col("_tp") > 0, F.round(rate / base_rate, 6)).alias("lift"),
        "cum_pos",
        F.when(
            F.col("_tp") > 0,
            F.round(F.col("cum_pos").cast("double") / F.col("_tp").cast("double"), 6),
        ).alias("cum_gain"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins — is a probability-scoring model
    CALIBRATED (when it says 0.7, does the event happen 70% of the
    time)? Complements rank-order grades (:func:`binary_auc`,
    :func:`lift_table`, :func:`pr_map_at_k`): a model can rank
    perfectly yet be wildly miscalibrated, and this is the monitor that
    sees it. Probabilities bucket into ``n_bins`` equal-width bins;
    each bin reports predicted mean vs observed frequency and the gap.

    Scale shape: ONE map-side-combined aggregate on the bin key — the
    bin id is a pure projection, counts/sums reduce before the
    exchange, and the derived columns fold over the ``n_bins``-row
    relation. Safe at any grain.

    Determinism: probabilities are DECIMAL(18,6)-cast before summing
    (feed pre-rounded values per the registry convention); counts are
    exact; mean/frequency/gap are fixed-shape doubles rounded to 6.
    ``prob_col`` must lie in [0,1] (values at exactly 1.0 fold into the
    last bin); ``label_col`` > 0 marks positives; NULL prob/label rows
    are excluded. Returns one row per non-empty bin: (bin, bin_lo, n,
    n_pos, mean_prob, frac_pos, gap)."""
    if n_bins < 2:
        raise ValueError("calibration_bins needs n_bins >= 2")
    p = F.col(prob_col).cast("double")
    base = df.filter(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.least(
            F.floor(p * F.lit(float(n_bins))).cast("long"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.col(prob_col).cast("decimal(18,6)").alias("_p"),
        (F.col(label_col) > 0).cast("long").alias("_y"),
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_p").alias("_sp"),
    )
    nd = F.col("n").cast("double")
    mean_p = F.col("_sp").cast("double") / nd
    frac = F.col("n_pos").cast("double") / nd
    return g.select(
        "bin",
        F.round(F.col("bin").cast("double") / F.lit(float(n_bins)), 6).alias("bin_lo"),
        "n",
        "n_pos",
        F.round(mean_p, 6).alias("mean_prob"),
        F.round(frac, 6).alias("frac_pos"),
        F.round(mean_p - frac, 6).alias("gap"),
    )


def classification_report(
    df: DataFrame,
    pred_col: str,
    label_col: str,
) -> DataFrame:
    """Per-class precision/recall/F1 with support — the thresholded
    endpoint of the evaluation rim (:func:`binary_auc` grades the raw
    scorer, :func:`calibration_bins` its probabilities; once a DECISION
    rule exists, this grades the decisions, one-vs-rest per class,
    multiclass for free).

    Scale shape: ONE (pred, label) cell shuffle (category² cells); the
    per-class tp/fp/fn fold over the cell relation via label-level
    aggregates of the two marginals — the raw grain is touched exactly
    once.

    Determinism: every count is an exact LONG; precision/recall are
    fixed-shape doubles rounded to 6, and F1 folds from the UNROUNDED
    ratios (2pr/(p+r)) before its own 6-dp round. NULL predictions or
    labels are a real ``__null__`` class. Returns one row per class
    seen on EITHER side: (class, support, tp, fp, fn, precision,
    recall, f1); precision NULL when the class is never predicted,
    recall NULL when it never occurs."""
    p = F.coalesce(F.col(pred_col).cast("string"), F.lit("__null__"))
    y = F.coalesce(F.col(label_col).cast("string"), F.lit("__null__"))
    cells = df.select(p.alias("_p"), y.alias("_y")).groupBy("_p", "_y").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    ).transform(lineage_cut)
    pred_m = cells.groupBy("_p").agg(F.sum("_n").cast("long").alias("_np")).select(
        F.col("_p").alias("class"), "_np"
    )
    lbl_m = cells.groupBy("_y").agg(F.sum("_n").cast("long").alias("_ny")).select(
        F.col("_y").alias("class"), "_ny"
    )
    diag = cells.filter(F.col("_p") == F.col("_y")).select(
        F.col("_p").alias("class"), F.col("_n").alias("_tp")
    )
    rep = (
        pred_m.join(lbl_m, "class", "full_outer")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce(F.col("_ny"), F.lit(0)).cast("long").alias("support"),
            F.coalesce(F.col("_tp"), F.lit(0)).cast("long").alias("tp"),
            (F.coalesce(F.col("_np"), F.lit(0)) - F.coalesce(F.col("_tp"), F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce(F.col("_ny"), F.lit(0)) - F.coalesce(F.col("_tp"), F.lit(0)))
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        F.round(F.lit(2.0) * prec * rec / (prec + rec), 6),
    )
    return rep.select(
        "class",
        "support",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        f1.alias("f1"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Cross-source quantile normalization — force every group's value
    distribution onto the POOLED distribution, so a score of "0.8 from
    source A" and "0.8 from source B" mean the same thing downstream
    (the batch-effect fix for heterogeneous quality/score columns
    before mixing corpora; :func:`ecdf_normalize` maps values to
    within-group ranks, this maps them to pooled VALUES).

    Each row's within-group quantile position r_g/n_g picks the pooled
    order statistic at index ⌈(r_g/n_g)·N⌉ — an exact INTEGER index
    election, no interpolation, so the mapping is engine-exact.

    Scale shape: one per-group sort window ranks each row; one global
    sort window indexes the pooled distribution (eval-grain contract —
    feed scored entities, not raw events); the mapping is a single
    equi-join on the integer index. Ties break on ``tiebreak_col``
    (must be unique) in BOTH sorts, so every rank is reproducible.

    NULL values are excluded. Returns one row per input row: (group,
    tiebreak, value, quantile_frac, normalized) with quantile_frac
    rounded to 6."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).cast("string").alias("group"),
        F.col(tiebreak_col).alias("tiebreak"),
        F.col(value_col).cast("double").alias("value"),
    ).transform(lineage_cut)
    wg = Window.partitionBy("group").orderBy(
        F.col("value").asc(), F.col("tiebreak").asc()
    )
    wgk = Window.partitionBy("group")
    ranked = base.withColumn("_r", F.row_number().over(wg).cast("long")).withColumn(
        "_ng", F.count(F.lit(1)).over(wgk).cast("long")
    )
    wp = Window.orderBy(F.col("value").asc(), F.col("tiebreak").asc())
    wall = Window.partitionBy()
    pooled = base.select(
        F.row_number().over(wp).cast("long").alias("_idx"),
        F.col("value").alias("_pv"),
    ).withColumn("_n", F.count(F.lit(1)).over(wall).cast("long"))
    # target index: ceil(r/n_g · N) = (r·N + n_g − 1) DIV n_g — pure
    # integer ceiling division, exact at any scale (no decimal rounding)
    tgt = F.expr("CAST((_r * _nn + _ng - 1) DIV _ng AS BIGINT)")
    n_total = pooled.groupBy().agg(F.max("_n").alias("_nn"))
    j = ranked.crossJoin(F.broadcast(n_total)).withColumn("_tgt", tgt)
    out = j.join(pooled.select("_idx", "_pv"), j["_tgt"] == F.col("_idx"))
    return out.select(
        "group",
        "tiebreak",
        "value",
        F.round(F.col("_r").cast("double") / F.col("_ng").cast("double"), 6).alias(
            "quantile_frac"
        ),
        F.col("_pv").alias("normalized"),
    )


def cuped_adjusted_means(
    df: DataFrame,
    arm_col: str,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance reduction for A/B experiments (Deng et al., WSDM
    2013): adjust each unit's post-period metric by its PRE-period
    covariate, ŷᵢ = yᵢ − θ(xᵢ − x̄), with θ = cov(x, y)/var(x) fitted
    POOLED across arms — the industry-standard way to shrink experiment
    confidence intervals without touching the treatment effect (the
    adjustment is mean-zero and treatment-independent under
    randomization).

    Input is a UNIT-GRAIN relation (one row per experiment unit with
    exact decimal/integral pre/post aggregates — callers build it with
    one keyed rollup). This operator is then two metadata-sized
    aggregates off a lineage-cut base: the pooled θ sums and the per-arm
    moment sums; every sum is exact (operands sized so products stay
    inside decimal(38)), and θ/means/variances are fixed-shape doubles
    an oracle recomputes exactly.

    Returns one row per arm: (arm, n_units, theta, mean_post,
    adj_mean_post, var_post, var_adj, var_reduction) — var_adj via
    var(y − θx) = var(y) − 2θ·cov + θ²·var(x); NULL variance columns for
    arms with n < 2, NULL theta/adjustments when pooled var(x) is 0
    (constant covariate: CUPED is a no-op, means pass through
    unadjusted)."""
    base = df.select(
        F.col(arm_col).alias("arm"),
        F.col(pre_col).cast("decimal(19,4)").alias("x"),
        F.col(post_col).cast("decimal(19,4)").alias("y"),
    ).transform(lineage_cut)
    big = "decimal(38,8)"
    pooled = base.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        F.sum((F.col("x") * F.col("x")).cast(big)).alias("_sxx"),
        F.sum((F.col("x") * F.col("y")).cast(big)).alias("_sxy"),
    )
    per_arm = base.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("x").alias("_ax"),
        F.sum("y").alias("_ay"),
        F.sum((F.col("x") * F.col("x")).cast(big)).alias("_axx"),
        F.sum((F.col("y") * F.col("y")).cast(big)).alias("_ayy"),
        F.sum((F.col("x") * F.col("y")).cast(big)).alias("_axy"),
    )
    j = per_arm.crossJoin(F.broadcast(pooled))
    nd = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, sxy = F.col("_sxx").cast("double"), F.col("_sxy").cast("double")
    pooled_var_x = sxx - sx * sx / nd
    pooled_cov = sxy - sx * sy / nd
    theta = pooled_cov / pooled_var_x  # raw sums form: scale cancels
    an = F.col("n_units").cast("double")
    ax, ay = F.col("_ax").cast("double"), F.col("_ay").cast("double")
    axx, ayy = F.col("_axx").cast("double"), F.col("_ayy").cast("double")
    axy = F.col("_axy").cast("double")
    mean_post = ay / an
    ok_t = pooled_var_x != 0
    adj_mean = F.when(ok_t, mean_post - theta * (ax / an - sx / nd)).otherwise(
        mean_post
    )
    den = an - F.lit(1.0)
    var_y = (ayy - ay * ay / an) / den
    var_x = (axx - ax * ax / an) / den
    cov_a = (axy - ax * ay / an) / den
    var_adj = var_y - F.lit(2.0) * theta * cov_a + theta * theta * var_x
    has_var = F.col("n_units") >= 2
    return j.select(
        "arm",
        "n_units",
        F.round(F.when(ok_t, theta), 6).alias("theta"),
        F.round(mean_post, 6).alias("mean_post"),
        F.round(adj_mean, 6).alias("adj_mean_post"),
        F.round(F.when(has_var, var_y), 6).alias("var_post"),
        F.round(F.when(has_var & ok_t, var_adj), 6).alias("var_adj"),
        F.round(
            F.when(has_var & ok_t & (var_y != 0), F.lit(1.0) - var_adj / var_y), 6
        ).alias("var_reduction"),
    )


def impute_group_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    strategy: str = "median",
    out_col: str = "value_imputed",
) -> DataFrame:
    """Group-wise missing-value imputation — the feature-engineering
    staple before any model sees the table: NULLs in ``value_col`` fill
    with the group's mean or EXACT median (never a sketch), and
    ``was_imputed`` marks the filled rows for downstream audits.

    Scale shape (median): no per-group array collect — group sizes are
    unbounded. The non-null rows rank inside one keyed sort window
    (value, then a stable in-group tiebreak), the two middle ranks elect
    by integer order statistics ((n+1)//2 and n//2+1 — exact, the
    qnorm/rolling-median discipline), and the per-key middle average
    joins back as a metadata-sized relation. Mean is one exact
    decimal-sum aggregate. Either way: one extra key-grain join, the
    fact table scans once per branch off a lineage cut.

    Determinism: elections are integer-exact on exact-typed inputs (cast
    ``value_col`` to a decimal upstream); the fill value is one
    fixed-shape double rounded to 6. Groups that are entirely NULL stay
    NULL (``was_imputed`` false — nothing to borrow). Returns the input
    plus (out_col, was_imputed)."""
    if strategy not in ("mean", "median"):
        raise ValueError("strategy must be 'mean' or 'median'")
    kcols = [F.col(c) for c in key_cols]
    base = df.transform(lineage_cut)
    nn = base.filter(F.col(value_col).isNotNull())
    if strategy == "mean":
        fill = nn.groupBy(*kcols).agg(
            F.round(
                F.sum(F.col(value_col)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("_fill")
        )
    else:
        wrank = Window.partitionBy(*kcols).orderBy(
            F.col(value_col).asc(), *[F.col(c).asc() for c in key_cols]
        )
        wn = Window.partitionBy(*kcols)
        ranked = nn.withColumn("_rk", F.row_number().over(wrank).cast("long")).withColumn(
            "_n", F.count(F.lit(1)).over(wn).cast("long")
        )
        lo = ((F.col("_n") + 1) / 2).cast("long")
        hi = (F.col("_n") / 2 + 1).cast("long")
        fill = (
            ranked.filter((F.col("_rk") == lo) | (F.col("_rk") == hi))
            .groupBy(*kcols)
            .agg(
                F.round(
                    F.sum(F.col(value_col)).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                ).alias("_fill")
            )
        )
    out = base.join(fill, list(key_cols), "left")
    missing = F.col(value_col).isNull()
    return out.withColumn(
        out_col,
        F.when(missing, F.col("_fill")).otherwise(
            F.round(F.col(value_col).cast("double"), 6)
        ),
    ).withColumn(
        "was_imputed", missing & F.col("_fill").isNotNull()
    ).drop("_fill")


def winsorize(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    lower_pct: int = 5,
    upper_pct: int = 95,
    out_col: str = "value_winsorized",
) -> DataFrame:
    """Group-wise winsorization — clip each value into its group's
    [P_lower, P_upper] band, the robust-preprocessing staple next to
    :func:`impute_group_stats` (imputation fixes holes; winsorization
    tames tails before means/OLS see them).

    The bounds are EXACT order statistics: rank ⌈p·n⌉ elected by the
    INTEGER ceiling division (p·n + 99) // 100 — no float percentile, no
    sketch ([[spark-cross-engine-gotchas]]: integer ceiling division is
    the portable order-statistic election). One keyed sort window ranks
    the non-null values, the two elected rows per key join back
    metadata-sized, and the clip is a projection.

    Pass an exact-typed ``value_col``; the output value is one
    fixed-shape double rounded to 6. NULL values pass through NULL with
    both flags false. Returns the input plus (out_col, clipped_low,
    clipped_high)."""
    if not 0 <= lower_pct < upper_pct <= 100:
        raise ValueError("need 0 <= lower_pct < upper_pct <= 100")
    kcols = [F.col(c) for c in key_cols]
    base = df.transform(lineage_cut)
    nn = base.filter(F.col(value_col).isNotNull())
    wrank = Window.partitionBy(*kcols).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*kcols)
    ranked = nn.withColumn("_rk", F.row_number().over(wrank).cast("long")).withColumn(
        "_n", F.count(F.lit(1)).over(wn).cast("long")
    )
    lo_rk = F.greatest(
        F.lit(1).cast("long"),
        ((F.col("_n") * lower_pct + 99) / 100).cast("long"),
    )
    hi_rk = ((F.col("_n") * upper_pct + 99) / 100).cast("long")
    bounds = (
        ranked.filter((F.col("_rk") == lo_rk) | (F.col("_rk") == hi_rk))
        .groupBy(*kcols)
        .agg(
            F.min(F.col(value_col)).cast("double").alias("_lo"),
            F.max(F.col(value_col)).cast("double").alias("_hi"),
        )
    )
    out = base.join(bounds, list(key_cols), "left")
    v = F.col(value_col).cast("double")
    clipped = F.round(F.least(F.greatest(v, F.col("_lo")), F.col("_hi")), 6)
    return (
        out.withColumn(out_col, F.when(v.isNotNull(), clipped))
        .withColumn("clipped_low", v.isNotNull() & (v < F.col("_lo")))
        .withColumn("clipped_high", v.isNotNull() & (v > F.col("_hi")))
        .drop("_lo", "_hi")
    )


def diff_in_differences(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    y_col: str,
) -> DataFrame:
    """Two-period difference-in-differences — the quasi-experimental
    workhorse next to :func:`cuped_adjusted_means` (CUPED shrinks a
    randomized experiment's variance; DiD estimates an effect WITHOUT
    randomization by differencing out group and period effects):
    DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), with the
    classic unpooled standard error √(Σ s²_cell/n_cell) over the four
    cells and t = DiD/se.

    Input is a UNIT-PERIOD-GRAIN relation (one row per unit per period
    with an exact decimal/integral outcome; ``treat_col``/``post_col``
    integral 0/1). One map-side-combined aggregate over the four cells
    — metadata-sized output, everything downstream fixed-shape doubles
    from exact sums (products sized for decimal(38), the width-19
    DuckDB discipline).

    Returns ONE row: (n_treat_pre, n_treat_post, n_control_pre,
    n_control_post, mean_treat_pre, mean_treat_post, mean_control_pre,
    mean_control_post, did, se, t_stat); se/t NULL when any cell has
    n < 2."""
    t = F.col(treat_col).cast("int")
    p = F.col(post_col).cast("int")
    y = F.col(y_col).cast("decimal(19,4)")
    big = "decimal(38,8)"

    def cell(tv: int, pv: int, tag: str):
        m = (t == tv) & (p == pv)
        return [
            F.sum(F.when(m, 1).otherwise(0)).cast("long").alias(f"n_{tag}"),
            F.sum(F.when(m, y)).alias(f"_s_{tag}"),
            F.sum(F.when(m, (y * y).cast(big))).alias(f"_ss_{tag}"),
        ]

    agg = df.agg(
        *cell(1, 0, "treat_pre"),
        *cell(1, 1, "treat_post"),
        *cell(0, 0, "control_pre"),
        *cell(0, 1, "control_post"),
    )
    tags = ("treat_pre", "treat_post", "control_pre", "control_post")
    means = {}
    variances = {}
    for tag in tags:
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"_s_{tag}").cast("double")
        ss = F.col(f"_ss_{tag}").cast("double")
        means[tag] = s / n
        variances[tag] = (ss - s * s / n) / (n - F.lit(1.0))
    did = (means["treat_post"] - means["treat_pre"]) - (
        means["control_post"] - means["control_pre"]
    )
    var_sum = None
    for tag in tags:
        term = variances[tag] / F.col(f"n_{tag}").cast("double")
        var_sum = term if var_sum is None else var_sum + term
    ok = None
    for tag in tags:
        c = F.col(f"n_{tag}") >= 2
        ok = c if ok is None else (ok & c)
    se = F.when(ok, F.sqrt(var_sum))
    return agg.select(
        *[F.col(f"n_{tag}") for tag in tags],
        *[F.round(means[tag], 6).alias(f"mean_{tag}") for tag in tags],
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(F.when(ok & (F.sqrt(var_sum) != 0), did / F.sqrt(var_sum)), 6).alias(
            "t_stat"
        ),
    )


def split_conformal_interval(
    pairs: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    actual_col: str,
    forecast_col: str,
    split_t,
    coverage_num: int = 9,
    coverage_den: int = 10,
) -> DataFrame:
    """Split-conformal prediction intervals around a point forecaster:
    calibration rows (``t_col <= split_t``) rank their ABSOLUTE residuals
    exactly, the conformal quantile q̂ is the ``ceil((n+1)·cov)``-th
    order statistic, and the held-out rows (``t_col > split_t``) report
    the interval's EMPIRICAL coverage — the distribution-free guarantee
    (coverage ≥ cov on exchangeable data) made auditable per key.

    Exactness: residuals are DECIMAL differences (no float |a−f|), the
    rank index uses INTEGER ceiling arithmetic
    ``(num·(n+1) + den−1) DIV den`` — never ``ceil(0.9·(n+1))``, whose
    binary-0.9 ulp both engines would have to agree on — and the
    covered/|test| comparison happens on exact decimals. The only floats
    are the final reporting columns (one shape per engine). One key
    exchange: a rank window over the calibration slice, a broadcast of
    the |keys|-row q̂ relation back onto the test slice.

    Returns (keys…, n_cal, n_test, q_hat, covered, coverage, target_cov);
    q_hat is NULL (and coverage with it) when the quantile index exceeds
    n_cal — the honest "not enough calibration data" answer.
    """
    if not (0 < coverage_num < coverage_den):
        raise ValueError("coverage must be a proper fraction")
    keys = list(key_cols)
    r = (F.col(actual_col) - F.col(forecast_col)).alias("_r")
    absr = F.when(F.col("_r") < 0, -F.col("_r")).otherwise(F.col("_r"))
    base = pairs.select(
        *keys, F.col(t_col).alias("_t"), r
    ).withColumn("_ar", absr)
    cal = base.filter(F.col("_t") <= F.lit(split_t))
    test = base.filter(F.col("_t") > F.lit(split_t))
    w = Window.partitionBy(*keys).orderBy(F.col("_ar").asc(), F.col("_t").asc())
    ranked = cal.select(
        *keys,
        "_ar",
        F.row_number().over(w).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).cast("long").alias("_n"),
    )
    qidx = F.expr(
        f"({coverage_num} * (_n + 1) + {coverage_den - 1}) DIV {coverage_den}"
    )
    qhat = ranked.groupBy(*keys).agg(
        F.max("_n").alias("n_cal"),
        F.min(F.when(F.col("_rk") == qidx, F.col("_ar"))).alias("_q"),
    )
    scored = test.join(F.broadcast(qhat), keys, "left")
    out = scored.groupBy(*keys).agg(
        F.max("n_cal").alias("n_cal"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("_q").alias("_q"),
        F.sum(F.when(F.col("_ar") <= F.col("_q"), 1)).cast("long").alias("_cov"),
    )
    covered = F.when(F.col("_q").isNotNull(), F.coalesce(F.col("_cov"), F.lit(0)))
    cov = F.when(
        F.col("_q").isNotNull(),
        F.round(
            F.coalesce(F.col("_cov"), F.lit(0)).cast("double")
            / F.col("n_test").cast("double"),
            6,
        ),
    )
    return out.select(
        *keys,
        "n_cal",
        "n_test",
        F.round(F.col("_q").cast("double"), 6).alias("q_hat"),
        covered.cast("long").alias("covered"),
        cov.alias("coverage"),
        F.lit(float(coverage_num) / float(coverage_den)).alias("target_cov"),
    )
