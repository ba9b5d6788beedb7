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
