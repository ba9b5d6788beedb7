"""Survival analysis — time-to-event statistics over right-censored
observations. The churn/retention lens the cohort-retention triangle
(``operators/windows.py::cohort_retention``) can't express: retention
counts *activity by offset*; the Kaplan–Meier estimator grades *time
until a terminal event* while correctly using customers who haven't
churned YET (censored observations stay in the risk set until their
observation window ends, instead of being dropped or miscounted as
churned).

Reference parity: the reference's marts layer stops at cohort/retention
rollups (``dbt_project/models/marts``); this extends that tier with the
standard survival estimator a telecom churn analysis sits on.

Determinism follows the registry conventions: risk sets and event counts
are exact integers off windowed cumulatives; the survival product is a
round-then-decimal cumulative sum of per-step ln factors (identical
expression shape cross-engine), exponentiated once at the end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Kaplan–Meier product-limit survival curve per key:
    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) where dᵢ counts events at duration tᵢ
    and nᵢ is the at-risk count (everyone whose duration ≥ tᵢ —
    censored rows leave the risk set at their duration WITHOUT counting
    as events; that's the whole point of the estimator).

    Scale shape: one (key, duration) map-side-combined count collapses
    the observation grain to the duration grain, then ONE keyed
    sort-window exchange carries the total, the at-risk cumulative, the
    survival ln-sum, and the zero-factor flag together — no self-join,
    no re-scan of the base relation.

    Determinism: dᵢ, cᵢ, nᵢ are exact LONGs from windowed integer
    cumulatives. The product telescopes as a cumulative DECIMAL sum of
    per-step ln(1 − d/n) terms rounded to 9 (the round-then-decimal
    recipe — identical expression shape in a SQL mirror), exponentiated
    and rounded to 6 at the end. A step where d = n (everyone remaining
    dies) zeroes the curve exactly from that duration on instead of
    feeding ln(0).

    ``duration_col`` must be integral (days/weeks since entry);
    ``event_col`` is 1 = event observed, 0 = right-censored. NULL
    duration/event rows are excluded. Returns one row per (key,
    duration): (*key_cols, duration, n_risk, n_event, n_censored,
    survival)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        *kcols,
        F.col(duration_col).cast("long").alias("duration"),
        F.col(event_col).cast("int").alias("_ev"),
    )
    g = base.groupBy(*key_cols, "duration").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_ev").cast("long").alias("n_event"),
    )
    wk = Window.partitionBy(*kcols)
    wo = Window.partitionBy(*kcols).orderBy(F.col("duration").asc())
    w_prev = wo.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = F.col("n_event")
    cur = g.withColumn(
        "n_risk",
        (
            F.sum("_n").over(wk)
            - F.coalesce(F.sum("_n").over(w_prev), F.lit(0))
        ).cast("long"),
    )
    ln_term = F.when(
        d < F.col("n_risk"),
        F.round(
            F.log(
                F.lit(1.0) - d.cast("double") / F.col("n_risk").cast("double")
            ),
            9,
        ).cast("decimal(28,9)"),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    zero_step = F.when(d == F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    cur = cur.withColumn("_lnsum", F.sum(ln_term).over(w_cum)).withColumn(
        "_zs", F.sum(zero_step).over(w_cum)
    )
    survival = F.when(F.col("_zs") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp(F.col("_lnsum").cast("double")), 6)
    )
    return cur.select(
        *key_cols,
        "duration",
        "n_risk",
        "n_event",
        (F.col("_n") - d).cast("long").alias("n_censored"),
        survival.alias("survival"),
    )


def log_rank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Log-rank (Mantel–Cox) test: are two groups' survival curves the
    same? The inference companion to :func:`kaplan_meier` — KM draws the
    curves, this says whether the gap is noise. At each event time t the
    observed group-A deaths d_At are compared to the hypergeometric
    expectation d_t·n_At/n_t given the pooled risk sets;
    χ² = (ΣO_A − ΣE_A)² / ΣV_t with the standard variance
    V_t = d_t·(n_At/n_t)·(1 − n_At/n_t)·(n_t − d_t)/(n_t − 1).

    Scale shape: one (group, duration) map-side-combined count collapses
    the observation grain, a second tiny aggregate pivots the two groups
    wide per duration, and ONE sort window over the collapsed duration
    grain (metadata-sized — distinct durations, never observations)
    builds both risk sets; the χ² folds in a final scalar aggregate.

    Determinism: every n and d is an exact LONG; the E and V terms are
    fixed-shape doubles of integer ratios ROUNDED to 9 then
    DECIMAL-summed (the round-then-decimal recipe), so the statistic is
    bit-identical cross-engine. Durations must be integral; rows outside
    the two groups or with NULL duration/event are excluded. Returns one
    row: (n_a, n_b, o_a, e_a, o_b, e_b, var_s, chi_sq); chi_sq NULL when
    the variance sum is 0 (no comparable event times)."""
    ga = F.col(group_col) == F.lit(group_a)
    base = df.filter(
        (F.col(group_col).isin(group_a, group_b))
        & F.col(duration_col).isNotNull()
        & F.col(event_col).isNotNull()
    ).select(
        ga.cast("int").alias("_ga"),
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("int").alias("_ev"),
    )
    g = base.groupBy("_ga", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_ev").cast("long").alias("_d"),
    )
    wide = g.groupBy("_t").agg(
        F.sum(F.when(F.col("_ga") == 1, F.col("_d")).otherwise(0)).cast("long").alias("_d1"),
        F.sum(F.when(F.col("_ga") == 1, F.col("_n")).otherwise(0)).cast("long").alias("_t1"),
        F.sum(F.when(F.col("_ga") == 0, F.col("_d")).otherwise(0)).cast("long").alias("_d2"),
        F.sum(F.when(F.col("_ga") == 0, F.col("_n")).otherwise(0)).cast("long").alias("_t2"),
    )
    # Risk sets via right-cumulative over the duration grain: n_g(t) =
    # total_g − Σ_{u<t} ending_g(u). Single partition over DISTINCT
    # durations only (calendar-sized), same contract as the series ops.
    wall = Window.partitionBy()
    wprev = Window.partitionBy().orderBy(F.col("_t").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = wide.withColumn(
        "_n1",
        (F.sum("_t1").over(wall) - F.coalesce(F.sum("_t1").over(wprev), F.lit(0))).cast("long"),
    ).withColumn(
        "_n2",
        (F.sum("_t2").over(wall) - F.coalesce(F.sum("_t2").over(wprev), F.lit(0))).cast("long"),
    )
    dt = (F.col("_d1") + F.col("_d2")).cast("long")
    nt = (F.col("_n1") + F.col("_n2")).cast("long")
    dtd, ntd = dt.cast("double"), nt.cast("double")
    n1d, n2d = F.col("_n1").cast("double"), F.col("_n2").cast("double")
    p1 = n1d / ntd
    e1_t = F.when(dt > 0, F.round(dtd * p1, 9).cast("decimal(28,9)")).otherwise(
        F.lit(0).cast("decimal(28,9)")
    )
    e2_t = F.when(dt > 0, F.round(dtd * (n2d / ntd), 9).cast("decimal(28,9)")).otherwise(
        F.lit(0).cast("decimal(28,9)")
    )
    v_t = F.when(
        (dt > 0) & (nt > 1),
        F.round(
            dtd * p1 * (F.lit(1.0) - p1) * (ntd - dtd) / (ntd - F.lit(1.0)), 9
        ).cast("decimal(28,9)"),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    agg = r.groupBy().agg(
        F.sum(F.when(F.col("_t1") > 0, F.col("_t1")).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("_t2") > 0, F.col("_t2")).otherwise(0)).cast("long").alias("n_b"),
        F.sum("_d1").cast("long").alias("o_a"),
        F.sum("_d2").cast("long").alias("o_b"),
        F.sum(e1_t).alias("_e1"),
        F.sum(e2_t).alias("_e2"),
        F.sum(v_t).alias("_v"),
    )
    e1, e2, v = (
        F.col("_e1").cast("double"),
        F.col("_e2").cast("double"),
        F.col("_v").cast("double"),
    )
    oa = F.col("o_a").cast("double")
    chi = F.when(
        v > 0, F.round((oa - e1) * (oa - e1) / v, 6)
    )
    return agg.select(
        "n_a",
        "n_b",
        "o_a",
        F.round(e1, 6).alias("e_a"),
        "o_b",
        F.round(e2, 6).alias("e_b"),
        F.round(v, 6).alias("var_s"),
        chi.alias("chi_sq"),
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator per key:
    H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over the same duration/risk-set grain as
    :func:`kaplan_meier` — the hazard-side view of the same data (KM
    answers "what fraction survives"; NA answers "how much hazard has
    accumulated", the additive quantity log-rank-style comparisons and
    hazard-ratio eyeballing want). Also emits the Fleming–Harrington
    survival estimate exp(−H), KM's asymptotic twin.

    Same shape and determinism recipe as KM: duration-grain counts,
    ONE keyed sort window for the at-risk cumulative, per-step d/n
    rounded to 9 dp then DECIMAL-cumulated (order-free), doubles only
    at the end (rounded 6). Returns one row per (key, duration):
    (*key_cols, duration, n_risk, n_event, n_censored, cum_hazard,
    fh_survival)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(duration_col).isNotNull() & F.col(event_col).isNotNull()
    ).select(
        *kcols,
        F.col(duration_col).cast("long").alias("duration"),
        F.col(event_col).cast("int").alias("_ev"),
    )
    g = base.groupBy(*key_cols, "duration").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_ev").cast("long").alias("n_event"),
    )
    wk = Window.partitionBy(*kcols)
    wo = Window.partitionBy(*kcols).orderBy(F.col("duration").asc())
    w_prev = wo.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur = g.withColumn(
        "n_risk",
        (
            F.sum("_n").over(wk)
            - F.coalesce(F.sum("_n").over(w_prev), F.lit(0))
        ).cast("long"),
    )
    term = F.round(
        F.col("n_event").cast("double") / F.col("n_risk").cast("double"), 9
    ).cast("decimal(28,9)")
    cur = cur.withColumn("_h", F.sum(term).over(w_cum))
    h = F.col("_h").cast("double")
    return cur.select(
        *key_cols,
        "duration",
        "n_risk",
        "n_event",
        (F.col("_n") - F.col("n_event")).cast("long").alias("n_censored"),
        F.round(h, 6).alias("cum_hazard"),
        F.round(F.exp(-h), 6).alias("fh_survival"),
    )
