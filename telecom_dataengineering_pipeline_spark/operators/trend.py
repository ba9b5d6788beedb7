"""Trend baselines over ordered series: weighted moving average + banded
anomaly flags.

The reference's volume anomaly test compares today against a flat 7-day
mean (``assert_row_count_anomaly.sql:4-33``, A6) and its observability
monitor against a z-score (A8). The natural next baseline for drifting
series is a RECENCY-WEIGHTED average — but a true EWMA is an infinite
recurrence whose float accumulation is neither order-independent nor
engine-reproducible. The production-honest compromise: a finite weighted
window (Σ wₖ·lag(x,k)), which is an EWMA truncated at k lags, expressed as
pure window expressions.

Determinism discipline (registry conventions): weights are DECIMAL
literals and the series values DECIMAL, so the weighted sum is exact
arithmetic — no float accumulation anywhere; the anomaly bands multiply
decimals and compare exactly. One window pass, no self-join; at scale this
rides whatever partitioning the series already has (partitionBy key, or a
single ordered partition for a global daily series whose cardinality is
days, not events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..lineage import lineage_cut


def weighted_moving_avg(
    df: DataFrame,
    order_col: str,
    value_col: str,
    weights: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Adds ``wma`` = Σ weights[k] · lag(value, k+1): a baseline built from
    the k rows BEFORE each row (never including the row itself, so the
    comparison is out-of-sample). ``weights`` are decimal strings (e.g.
    ``("0.4", "0.3", "0.2", "0.1")``) — exact arithmetic by construction.
    Rows with insufficient history get NULL (no partial-window guesses)."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    terms: list[Column] = []
    for k, wt in enumerate(weights, start=1):
        terms.append(
            F.lit(wt).cast("decimal(4,3)") * F.lag(F.col(value_col), k).over(w)
        )
    wma = terms[0]
    for t in terms[1:]:
        wma = wma + t
    return df.withColumn("wma", wma)


def band_anomaly_flags(
    df: DataFrame,
    value_col: str,
    baseline_col: str = "wma",
    low: str = "0.5",
    high: str = "2.0",
) -> DataFrame:
    """Adds ``is_drop`` / ``is_spike``: value outside [low·baseline,
    high·baseline]. Decimal multiplication keeps the band edges exact;
    NULL baseline (warm-up rows) flags nothing."""
    lo = F.lit(low).cast("decimal(4,2)") * F.col(baseline_col)
    hi = F.lit(high).cast("decimal(4,2)") * F.col(baseline_col)
    return df.withColumn(
        "is_drop", F.when(F.col(baseline_col).isNotNull(), F.col(value_col) < lo)
    ).withColumn(
        "is_spike", F.when(F.col(baseline_col).isNotNull(), F.col(value_col) > hi)
    )


def holt_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 3,
) -> DataFrame:
    """Holt's linear method (double exponential smoothing: level + trend),
    the classic short-horizon forecaster for trending series — unrolled
    over a FIXED, ordered ``steps`` list so the recurrence becomes a
    deterministic column chain instead of a sequential scan.

    Scale/determinism shape: one conditional aggregate pivots each key's
    series into T columns (single map-side-combined pass — the grain is
    |keys| rows, not |events|); the T-step recurrence then runs as
    per-row scalar arithmetic — no window over time, no driver loop, no
    UDF — and per-row double arithmetic is bit-deterministic (nothing
    accumulates across rows, the trap the registry conventions exist
    for). Missing steps contribute 0 (a gap IS zero volume for additive
    series like revenue). A true infinite-history EWMA/Holt is a
    sequential recurrence; fixing T is what makes it a parallel one —
    same trade the finite-window WMA above makes.

    Returns one row per key and forecast step ``h`` in 1..horizon:
    ``(*key_cols, h, level, trend, forecast)`` where forecast =
    level + h·trend off the last fitted state. Initialization is the
    textbook l₀=x₀, b₀=x₁−x₀ (needs ≥2 steps).
    """
    T = len(steps)
    if T < 2:
        raise ValueError("holt_linear needs at least two steps")
    a, b = float(alpha), float(beta)
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    cur = cur.withColumn("_l0", F.col("_x0")).withColumn(
        "_b0", F.col("_x1") - F.col("_x0")
    )
    for t in range(1, T):
        cur = cur.withColumn(
            f"_l{t}",
            F.lit(a) * F.col(f"_x{t}")
            + F.lit(1.0 - a) * (F.col(f"_l{t-1}") + F.col(f"_b{t-1}")),
        ).withColumn(
            f"_b{t}",
            F.lit(b) * (F.col(f"_l{t}") - F.col(f"_l{t-1}"))
            + F.lit(1.0 - b) * F.col(f"_b{t-1}"),
        )
    last_l, last_b = F.col(f"_l{T-1}"), F.col(f"_b{T-1}")
    fc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).cast("int").alias("h"),
                    (last_l + F.lit(float(h)) * last_b).alias("forecast"),
                )
                for h in range(1, horizon + 1)
            ]
        )
    ).alias("_fc")
    return cur.select(*key_cols, last_l.alias("_level"), last_b.alias("_trend"), fc).select(
        *key_cols,
        F.col("_fc.h").alias("h"),
        F.col("_level").alias("level"),
        F.col("_trend").alias("trend"),
        F.col("_fc.forecast").alias("forecast"),
    )


def holt_linear_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    alpha: float = 0.5,
    beta: float = 0.5,
    horizon: int = 3,
    round_dp: int = 4,
) -> str:
    """The DuckDB mirror of :func:`holt_linear`, generated by the SAME
    unrolling loop so both engines evaluate identically-shaped double
    expressions (IEEE determinism needs identical shapes, not just equal
    math). ``base_cte`` must expose (key, step, value) via the given
    expressions."""
    T = len(steps)
    a, b = float(alpha), float(beta)
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS x{i}"
        for i, s in enumerate(steps)
    )
    ctes = [
        f"base AS ({base_cte})",
        f"wide AS (SELECT {key_expr} AS k, {xs} FROM base GROUP BY 1)",
        "s0 AS (SELECT *, x0 AS l0, x1 - x0 AS b0 FROM wide)",
    ]
    for t in range(1, T):
        ctes.append(
            f"sl{t} AS (SELECT *, {a} * x{t} + {1.0 - a} * (l{t-1} + b{t-1}) AS l{t} FROM {'s0' if t == 1 else f'sb{t-1}'})"
        )
        ctes.append(
            f"sb{t} AS (SELECT *, {b} * (l{t} - l{t-1}) + {1.0 - b} * b{t-1} AS b{t} FROM sl{t})"
        )
    hs = ", ".join(str(h) for h in range(1, horizon + 1))
    final = (
        f"SELECT k, CAST(h AS INTEGER) AS h, round(l{T-1}, {round_dp}) AS level, "
        f"round(b{T-1}, {round_dp}) AS trend, "
        f"round(l{T-1} + CAST(h AS DOUBLE) * b{T-1}, {round_dp}) AS forecast "
        f"FROM sb{T-1} CROSS JOIN (SELECT unnest([{hs}]) AS h)"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def seasonal_index(
    df: DataFrame,
    key_cols: Sequence[str],
    season_col: str,
    value_col: str,
    decimal_type: str = "decimal(38,6)",
) -> DataFrame:
    """Multiplicative seasonality profile: per (key, season) the ratio of
    the season's mean value to the key's overall mean — the classical
    seasonal index every demand-planning rollup starts from (index > 1:
    the season runs hot). Two map-side-combined aggregates; means derive
    from exact DECIMAL sums and the ratio applies one double division at
    the end, so the index is engine-exact. Returns
    ``(*key_cols, season, n, seasonal_index)``."""
    from pyspark.sql import Window

    v = F.col(value_col).cast(decimal_type)
    per = df.groupBy(*key_cols, F.col(season_col).alias("season")).agg(
        F.sum(v).alias("_s_sum"), F.count(value_col).alias("_s_n")
    )
    # Key totals as a window over the POST-AGGREGATE season grain — not a
    # second groupBy + self-join, which would re-evaluate the whole base
    # subtree (Spark does not dedupe shared subtrees: two full input
    # scans at any size). Seasons partition the rows, so the window sums
    # of the exact decimal partials ARE the key totals.
    wk = Window.partitionBy(*key_cols)
    joined = per.withColumn("_t_sum", F.sum("_s_sum").over(wk)).withColumn(
        "_t_n", F.sum("_s_n").over(wk)
    )
    idx = (F.col("_s_sum").cast("double") / F.col("_s_n")) / (
        F.col("_t_sum").cast("double") / F.col("_t_n")
    )
    return joined.select(
        *key_cols,
        "season",
        F.col("_s_n").cast("long").alias("n"),
        F.round(idx, 6).alias("seasonal_index"),
    )


def cusum_change_points(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Two-sided standardized CUSUM (Page 1954) over a fixed step spine —
    the classic level-shift detector the WMA band (A6) and z-score (A8)
    monitors miss: a small persistent drift accumulates in the CUSUM long
    before any single point crosses a band. ``k`` is the slack (drift
    allowance, in σ), ``h`` the decision threshold.

    Same scale/determinism shape as :func:`holt_linear`: one conditional
    aggregate pivots each key's series into T columns (grain = |keys|,
    single map-side-combined pass), the key's own mean/σ standardize the
    series, and the max(0, ·) recurrence — NOT expressible as a window
    cumsum, it's nonlinear — unrolls into a per-row scalar column chain.
    The mean/variance sums are written as LEFT-FOLD chains and the oracle
    generator emits the identical shapes, because IEEE determinism needs
    identical expression trees, not just equal math. NOTE: when a
    (key, step) cell can hold MORE THAN ONE input row, ``value_col`` must
    be an exact type (decimal/integral) — the conditional ``sum`` that
    pivots the series is partition-order-dependent on DOUBLE inputs, and
    the left-fold chains only protect the math DOWNSTREAM of those sums.
    Cast to a decimal before calling (as the registered queries do) and
    to double only after aggregation. A flat series
    (σ = 0) yields NULL z/CUSUM columns rather than dividing — that
    degenerate shape is its own signal.

    Returns one row per (key, step): ``(*key_cols, step, x, z,
    cusum_pos, cusum_neg, is_change)`` with doubles rounded to 6."""
    T = len(steps)
    if T < 3:
        raise ValueError("cusum_change_points needs at least three steps")
    kf, hf = float(k), float(h)
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    total = F.col("_x0")
    for t in range(1, T):
        total = total + F.col(f"_x{t}")
    cur = cur.withColumn("_mean", total / F.lit(float(T)))
    ss = (F.col("_x0") - F.col("_mean")) * (F.col("_x0") - F.col("_mean"))
    for t in range(1, T):
        d = F.col(f"_x{t}") - F.col("_mean")
        ss = ss + d * d
    cur = cur.withColumn("_sd", F.sqrt(ss / F.lit(float(T - 1))))
    z = lambda t: F.when(  # noqa: E731
        F.col("_sd") > 0, (F.col(f"_x{t}") - F.col("_mean")) / F.col("_sd")
    )
    # Guard every recurrence step on σ > 0 explicitly: Spark's greatest()
    # IGNORES nulls, so an unguarded max(0, NULL − k) would silently turn
    # the degenerate flat-series case into 0.0 instead of the documented
    # NULL (and DuckDB's greatest agrees on the ignore-null behavior, so
    # the bug would even cross-validate).
    live = F.col("_sd") > 0
    cur = cur.withColumn("_z0", z(0))
    cur = cur.withColumn(
        "_sp0", F.when(live, F.greatest(F.lit(0.0), F.col("_z0") - F.lit(kf)))
    ).withColumn(
        "_sn0", F.when(live, F.greatest(F.lit(0.0), -F.col("_z0") - F.lit(kf)))
    )
    for t in range(1, T):
        cur = cur.withColumn(f"_z{t}", z(t))
        cur = cur.withColumn(
            f"_sp{t}",
            F.when(
                live,
                F.greatest(
                    F.lit(0.0), F.col(f"_sp{t-1}") + F.col(f"_z{t}") - F.lit(kf)
                ),
            ),
        ).withColumn(
            f"_sn{t}",
            F.when(
                live,
                F.greatest(
                    F.lit(0.0), F.col(f"_sn{t-1}") - F.col(f"_z{t}") - F.lit(kf)
                ),
            ),
        )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("step"),
                    F.round(F.col(f"_x{i}"), 6).alias("x"),
                    F.round(F.col(f"_z{i}"), 6).alias("z"),
                    F.round(F.col(f"_sp{i}"), 6).alias("cusum_pos"),
                    F.round(F.col(f"_sn{i}"), 6).alias("cusum_neg"),
                    (
                        (F.col(f"_sp{i}") > F.lit(hf))
                        | (F.col(f"_sn{i}") > F.lit(hf))
                    ).alias("is_change"),
                )
                for i, s in enumerate(steps)
            ]
        )
    ).alias("_r")
    return cur.select(*key_cols, rows).select(
        *key_cols,
        "_r.step",
        "_r.x",
        "_r.z",
        "_r.cusum_pos",
        "_r.cusum_neg",
        "_r.is_change",
    )


def cusum_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    k: float = 0.5,
    h: float = 4.0,
) -> str:
    """The DuckDB mirror of :func:`cusum_change_points`, generated by the
    same unrolling loop (identical left-fold sum chains, identical
    max(0,·) recurrence shapes). ``base_cte`` must expose (key, step,
    value) via the given expressions; emits (k, step, x, z, cusum_pos,
    cusum_neg, is_change)."""
    T = len(steps)
    kf, hf = float(k), float(h)
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS x{i}"
        for i, s in enumerate(steps)
    )
    total = "x0"
    for t in range(1, T):
        total = f"({total} + x{t})"
    ss = "((x0 - m) * (x0 - m))"
    for t in range(1, T):
        ss = f"({ss} + ((x{t} - m) * (x{t} - m)))"
    ctes = [
        f"base AS ({base_cte})",
        f"s0 AS (SELECT {key_expr} AS k, {xs} FROM base GROUP BY 1)",
        f"sm AS (SELECT *, {total} / {float(T)!r} AS m FROM s0)",
        f"sd AS (SELECT *, sqrt({ss} / {float(T - 1)!r}) AS sdv FROM sm)",
        "z0 AS (SELECT *, CASE WHEN sdv > 0 THEN (x0 - m) / sdv END AS z0 FROM sd)",
        f"c0 AS (SELECT *, CASE WHEN sdv > 0 THEN greatest(0.0, z0 - {kf!r}) END AS sp0, "
        f"CASE WHEN sdv > 0 THEN greatest(0.0, -z0 - {kf!r}) END AS sn0 FROM z0)",
    ]
    for t in range(1, T):
        ctes.append(
            f"z{t} AS (SELECT *, CASE WHEN sdv > 0 THEN (x{t} - m) / sdv END AS z{t} FROM c{t-1})"
        )
        ctes.append(
            f"c{t} AS (SELECT *, CASE WHEN sdv > 0 THEN greatest(0.0, sp{t-1} + z{t} - {kf!r}) END AS sp{t}, "
            f"CASE WHEN sdv > 0 THEN greatest(0.0, sn{t-1} - z{t} - {kf!r}) END AS sn{t} FROM z{t})"
        )
    selects = [
        f"SELECT k, '{s}' AS step, round(x{i}, 6) AS x, round(z{i}, 6) AS z, "
        f"round(sp{i}, 6) AS cusum_pos, round(sn{i}, 6) AS cusum_neg, "
        f"(sp{i} > {hf!r} OR sn{i} > {hf!r}) AS is_change FROM c{T-1}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def _ewma_limit_factors(T: int, lam: float, L: float) -> "list[float]":
    """Per-step EWMA control-limit width factors
    ``L·sqrt(λ/(2−λ)·(1−(1−λ)^(2(t+1))))`` — computed ONCE in Python and
    embedded as identical literals in the Spark plan and the generated
    oracle SQL: sqrt/pow may differ by an ulp across engines, a Python
    float literal cannot."""
    import math

    lam, L = float(lam), float(L)
    return [
        L * math.sqrt(lam / (2.0 - lam) * (1.0 - (1.0 - lam) ** (2 * (t + 1))))
        for t in range(T)
    ]


def ewma_control_chart(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    lam: float = 0.3,
    L: float = 3.0,
) -> DataFrame:
    """EWMA control chart (Roberts 1959; Lucas & Saccucci 1990) over a
    fixed step spine — the small-persistent-shift detector between the
    z-score band (reacts to single points) and CUSUM (reacts to drifts):
    ``z_t = λ·x_t + (1−λ)·z_{t−1}`` against time-varying control limits
    ``m ± L·σ·sqrt(λ/(2−λ)·(1−(1−λ)^{2(t+1)}))``.

    Same scale/determinism shape as :func:`cusum_change_points`: one
    conditional aggregate pivots each key's series into T columns (grain
    = |keys|, single map-side-combined pass), the recurrence unrolls as a
    per-row scalar column chain, the mean/variance sums are LEFT-FOLD
    chains mirrored by the paired generator, and the per-step limit
    factors are Python-computed literals shared by both engines. The
    exact-input requirement on ``value_col`` is identical too (decimal in,
    double out). Unlike CUSUM there is NO division by σ anywhere, so a
    flat series degenerates gracefully: σ = 0 collapses the limits onto
    the center and ``is_out`` is False, never NULL.

    Returns one row per (key, step): ``(*key_cols, step, x, ewma, ucl,
    lcl, is_out)`` with doubles rounded to 6."""
    T = len(steps)
    if T < 2:
        raise ValueError("ewma_control_chart needs at least two steps")
    if not 0.0 < lam <= 1.0:
        raise ValueError("lam must be in (0, 1]")
    lamf = float(lam)
    factors = _ewma_limit_factors(T, lamf, float(L))
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    total = F.col("_x0")
    for t in range(1, T):
        total = total + F.col(f"_x{t}")
    cur = cur.withColumn("_mean", total / F.lit(float(T)))
    ss = (F.col("_x0") - F.col("_mean")) * (F.col("_x0") - F.col("_mean"))
    for t in range(1, T):
        d = F.col(f"_x{t}") - F.col("_mean")
        ss = ss + d * d
    cur = cur.withColumn("_sd", F.sqrt(ss / F.lit(float(T - 1))))
    cur = cur.withColumn("_e0", F.col("_x0"))
    for t in range(1, T):
        cur = cur.withColumn(
            f"_e{t}",
            F.lit(lamf) * F.col(f"_x{t}")
            + F.lit(1.0 - lamf) * F.col(f"_e{t-1}"),
        )
    for t in range(T):
        cur = cur.withColumn(
            f"_u{t}", F.col("_mean") + F.lit(factors[t]) * F.col("_sd")
        ).withColumn(
            f"_l{t}", F.col("_mean") - F.lit(factors[t]) * F.col("_sd")
        )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("step"),
                    F.round(F.col(f"_x{i}"), 6).alias("x"),
                    F.round(F.col(f"_e{i}"), 6).alias("ewma"),
                    F.round(F.col(f"_u{i}"), 6).alias("ucl"),
                    F.round(F.col(f"_l{i}"), 6).alias("lcl"),
                    (
                        (F.col(f"_e{i}") > F.col(f"_u{i}"))
                        | (F.col(f"_e{i}") < F.col(f"_l{i}"))
                    ).alias("is_out"),
                )
                for i, s in enumerate(steps)
            ]
        )
    ).alias("_r")
    return cur.select(*key_cols, rows).select(
        *key_cols, "_r.step", "_r.x", "_r.ewma", "_r.ucl", "_r.lcl", "_r.is_out"
    )


def ewma_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    lam: float = 0.3,
    L: float = 3.0,
) -> str:
    """The DuckDB mirror of :func:`ewma_control_chart`, generated by the
    same unrolling loop: identical left-fold mean/variance chains,
    identical recurrence shapes, the SAME Python-computed limit-factor
    literals. ``base_cte`` must expose (key, step, value) via the given
    expressions; emits (k, step, x, ewma, ucl, lcl, is_out)."""
    T = len(steps)
    lamf = float(lam)
    factors = _ewma_limit_factors(T, lamf, float(L))
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS x{i}"
        for i, s in enumerate(steps)
    )
    total = "x0"
    for t in range(1, T):
        total = f"({total} + x{t})"
    ss = "((x0 - m) * (x0 - m))"
    for t in range(1, T):
        ss = f"({ss} + ((x{t} - m) * (x{t} - m)))"
    ctes = [
        f"base AS ({base_cte})",
        f"s0 AS (SELECT {key_expr} AS k, {xs} FROM base GROUP BY 1)",
        f"sm AS (SELECT *, {total} / {float(T)!r} AS m FROM s0)",
        f"sd AS (SELECT *, sqrt({ss} / {float(T - 1)!r}) AS sdv FROM sm)",
        "e0 AS (SELECT *, x0 AS e0 FROM sd)",
    ]
    for t in range(1, T):
        ctes.append(
            f"e{t} AS (SELECT *, {lamf!r} * x{t} + {1.0 - lamf!r} * e{t-1} AS e{t} FROM e{t-1})"
        )
    selects = [
        f"SELECT k, '{s}' AS step, round(x{i}, 6) AS x, round(e{i}, 6) AS ewma, "
        f"round(m + {factors[i]!r} * sdv, 6) AS ucl, "
        f"round(m - {factors[i]!r} * sdv, 6) AS lcl, "
        f"(e{i} > m + {factors[i]!r} * sdv OR e{i} < m - {factors[i]!r} * sdv) AS is_out "
        f"FROM e{T-1}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def ols_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares line fit — the "is this KPI
    trending" primitive under every mart sparkline: slope/intercept from
    the closed-form sums, plus r² as fit quality. ``x_col`` must be
    integral (a step/day index), ``y_col`` exact (decimal/integral) —
    then every accumulated sum (Σx, Σy, Σxy, Σx², Σy²) is EXACT and
    order-independent, and the only doubles are the final closed-form
    divisions, written with one expression shape for both engines.

    One map-side-combined aggregate per key — the same single-pass grain
    as the other trend operators; nothing sorts, nothing iterates.
    Degenerate keys (n < 2 or zero x-variance) yield NULL fit columns,
    never a division blow-up. Returns (*key_cols, n, slope, intercept,
    r2) with doubles rounded to 6."""
    x = F.col(x_col).cast("decimal(20,0)")
    y = F.col(y_col).cast("decimal(24,6)")
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum((x * y).cast("decimal(38,6)")).alias("_sxy"),
        F.sum((y * y).cast("decimal(38,6)")).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = F.when((F.col("n") >= 2) & (dx > 0), cov / dx)
    intercept = F.when((F.col("n") >= 2) & (dx > 0), (sy - (cov / dx) * sx) / n)
    r2 = F.when((F.col("n") >= 2) & (dx > 0) & (dy > 0), (cov * cov) / (dx * dy))
    return agg.select(
        *key_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def ols_two_feature(
    df: DataFrame,
    key_cols: Sequence[str],
    x1_col: str,
    x2_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key TWO-feature least squares ŷ = b0 + b1·x1 + b2·x2 — the
    multiple-regression step up from :func:`ols_trend`, solved in closed
    form: the 3×3 normal equations by Cramer's rule, so no iteration, no
    linear-algebra library, and a SQL oracle can recompute every number.

    Inputs must be EXACT (decimal/integral) — then all nine accumulated
    sums (Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²) are exact
    and order-independent; the determinants and coefficients are the
    only doubles, written with one expression shape for both engines.

    One map-side-combined aggregate per key — single pass, no sort, no
    join. Degenerate keys (n < 3, singular normal matrix from collinear
    or constant features, zero y-variance for r²) yield NULL fit
    columns, never a division blow-up. Returns (*key_cols, n, b0, b1,
    b2, r2, adj_r2) with doubles rounded to 6. SSE uses the OLS-optimum
    identity SSE = Σy² − (b0·Σy + b1·Σx1y + b2·Σx2y)."""
    # widths chosen so every PRODUCT stays inside decimal(38,_) exactly:
    # (16,4)x(16,4)->(33,8), (16,4)x(18,4)->(35,8), (18,4)^2->(37,8)
    x1 = F.col(x1_col).cast("decimal(16,4)")
    x2 = F.col(x2_col).cast("decimal(16,4)")
    y = F.col(y_col).cast("decimal(18,4)")
    big = "decimal(38,8)"
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).alias("_s1"),
        F.sum(x2).alias("_s2"),
        F.sum(y).alias("_sy"),
        F.sum((x1 * x1).cast(big)).alias("_s11"),
        F.sum((x2 * x2).cast(big)).alias("_s22"),
        F.sum((x1 * x2).cast(big)).alias("_s12"),
        F.sum((x1 * y).cast(big)).alias("_s1y"),
        F.sum((x2 * y).cast(big)).alias("_s2y"),
        F.sum((y * y).cast(big)).alias("_syy"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = (F.col(c).cast("double") for c in ("_s1", "_s2", "_sy"))
    s11, s22, s12 = (F.col(c).cast("double") for c in ("_s11", "_s22", "_s12"))
    s1y, s2y, syy = (F.col(c).cast("double") for c in ("_s1y", "_s2y", "_syy"))
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    ok = (F.col("n") >= 3) & (det != 0)
    b0 = F.round(F.when(ok, det0 / det), 6)
    b1 = F.round(F.when(ok, det1 / det), 6)
    b2 = F.round(F.when(ok, det2 / det), 6)
    sse = syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y)
    sst = syy - sy * sy / n
    r2x = F.when(ok & (sst > 0), F.lit(1.0) - sse / sst)
    r2 = F.round(r2x, 6)
    adj = F.round(
        F.when(
            ok & (sst > 0) & (F.col("n") > 3),
            F.lit(1.0) - (F.lit(1.0) - r2x) * (n - 1) / (n - 3),
        ),
        6,
    )
    return agg.select(
        *key_cols, "n",
        b0.alias("b0"), b1.alias("b1"), b2.alias("b2"),
        r2.alias("r2"), adj.alias("adj_r2"),
    )


def acf_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key sample autocorrelation function at lags 1..``max_lag`` —
    the seasonality/persistence fingerprint that picks the period for
    :func:`seasonal_index` and validates :func:`holt_linear`'s trend
    assumption (a daily KPI with r₇ ≫ 0 wants a weekly model, one with
    r₁ ≈ 0 doesn't need smoothing at all). Standard biased estimator:
    r_k = Σ_{t>k} (x_t − x̄)(x_{t−k} − x̄) / Σ_t (x_t − x̄)² with the
    FULL-series mean and denominator (so r_k is a proper correlation
    matrix taper, |r_k| ≤ 1).

    One user-keyed exchange carries everything: the per-key mean and
    denominator ride a partition window, the k lag columns ride the same
    window ordered, and the final aggregate reuses the hash partitioning
    the window installed — no second shuffle, no self-join per lag.

    Determinism: the mean is ``CAST(decimal-sum AS DOUBLE)/n`` (one
    deterministic division, identical expression cross-engine); each
    centered product is a deterministic double ROUNDED to 9 dp then
    decimal-summed (the PSI/BM25 recipe), so numerator and denominator
    are partition-order-free. Ties in ``order_col`` would make lag()
    nondeterministic — callers pass a unique order (the registered
    queries use a date grain).

    Returns one row per (key, lag): (*key_cols, lag, n, n_pairs, acf),
    acf rounded to 6; NULL for a constant series (denominator 0) and for
    lags with no pairs (n ≤ k)."""
    if max_lag < 1:
        raise ValueError("acf_profile needs max_lag >= 1")
    kcols = [F.col(c) for c in key_cols]
    wo = Window.partitionBy(*kcols).orderBy(F.col(order_col).asc())
    wp = Window.partitionBy(*kcols)
    v = F.col(value_col).cast("decimal(24,6)")
    cur = df.select(*kcols, F.col(order_col), v.alias("_v"))
    cur = cur.withColumn("_n", F.count(F.lit(1)).over(wp).cast("long")).withColumn(
        "_mean", F.sum("_v").over(wp).cast("double") / F.col("_n").cast("double")
    )
    d = F.col("_v").cast("double") - F.col("_mean")
    cur = cur.withColumn("_den_t", F.round(d * d, 9).cast("decimal(28,9)"))
    for k in range(1, max_lag + 1):
        lagged = F.lag(F.col("_v"), k).over(wo)
        cur = cur.withColumn(
            f"_num{k}",
            F.when(
                lagged.isNotNull(),
                F.round(d * (lagged.cast("double") - F.col("_mean")), 9),
            ).cast("decimal(28,9)"),
        )
    agg = cur.groupBy(*kcols).agg(
        F.max("_n").alias("n"),
        F.sum("_den_t").alias("_den"),
        *[F.sum(f"_num{k}").alias(f"_num{k}") for k in range(1, max_lag + 1)],
        *[
            F.count(f"_num{k}").cast("long").alias(f"_np{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stacked = agg.select(
        *key_cols,
        "n",
        "_den",
        F.expr(
            "stack({}, {})".format(
                max_lag,
                ", ".join(
                    f"CAST({k} AS BIGINT), _np{k}, _num{k}"
                    for k in range(1, max_lag + 1)
                ),
            )
        ).alias("lag", "n_pairs", "_num"),
    )
    acf = F.when(
        (F.col("_den") > 0) & (F.col("n_pairs") > 0),
        F.round(F.col("_num").cast("double") / F.col("_den").cast("double"), 6),
    )
    return stacked.select(*key_cols, "lag", "n", "n_pairs", acf.alias("acf"))


def mann_kendall_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    z_alpha: float = 1.96,
) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per key — the
    NONPARAMETRIC twin of :func:`ols_trend`: S = Σ_{i<j} sign(x_j − x_i)
    detects monotone trend without assuming linearity or normal errors,
    and the Sen slope (median of all pairwise slopes) is robust to the
    outliers that drag an OLS fit. The standard pairing for "is this KPI
    really drifting" on noisy telemetry.

    Shape: the pair set is built by ONE key-equi self-join of the series
    relation against itself (i < j on the order column). That is
    O(T²/2) pairs per key — sane ONLY because the input is a post-agg
    series at calendar grain (the same contract as holt/CUSUM/EWMA:
    T = days or months, never events), so the join is tiny however big
    the underlying table was; the series relation is lazily checkpointed
    so both join sides read one materialization.

    Determinism: S and the tie-corrected variance
    var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18 are exact
    integers (values compare as decimals; ties counted exactly); z uses
    the standard continuity correction ((S∓1)/√var, 0 at S=0). The Sen
    slope is rank-selected from the ordered pairwise slopes (average of
    the two middle ranks — a deterministic double from exact ranks, no
    sketch). ``order_col`` must be integral (a step/day index).

    Returns (*key_cols, n, s_stat, var_s, z, trend, sen_slope) — trend ∈
    increasing/decreasing/no_trend at ``z_alpha``; NULL z/trend/slope
    for n < 2 or var 0 (all-tied series)."""
    kcols = list(key_cols)
    v = F.col(value_col).cast("decimal(24,6)")
    t = F.col(order_col).cast("long")
    base = df.select(
        *[F.col(c) for c in kcols], t.alias("_t"), v.alias("_v")
    ).transform(lineage_cut)
    a = base.select(
        *[F.col(c) for c in kcols],
        F.col("_t").alias("_ti"),
        F.col("_v").alias("_vi"),
    )
    b = base.select(
        *[F.col(c).alias(f"_{c}_b") for c in kcols],
        F.col("_t").alias("_tj"),
        F.col("_v").alias("_vj"),
    )
    cond = [a[c] == b[f"_{c}_b"] for c in kcols]
    pairs = a.join(b, cond).filter(F.col("_ti") < F.col("_tj"))
    sgn = F.when(F.col("_vj") > F.col("_vi"), 1).when(
        F.col("_vj") < F.col("_vi"), -1
    ).otherwise(0)
    slope = (F.col("_vj") - F.col("_vi")).cast("double") / (
        F.col("_tj") - F.col("_ti")
    ).cast("double")
    w = Window.partitionBy(*[F.col(c) for c in kcols]).orderBy(
        F.col("_slope").asc(), F.col("_ti").asc(), F.col("_tj").asc()
    )
    scored = pairs.select(
        *[a[c] for c in kcols],
        "_ti",
        "_tj",
        sgn.alias("_sgn"),
        slope.alias("_slope"),
    ).withColumn("_rk", F.row_number().over(w).cast("long"))
    wm = Window.partitionBy(*[F.col(c) for c in kcols])
    scored = scored.withColumn("_m", F.max("_rk").over(wm))
    lo = (F.col("_m") + 1) / 2
    hi = F.col("_m") / 2 + 1
    mid = scored.filter(
        (F.col("_rk") == F.floor(lo)) | (F.col("_rk") == F.floor(hi))
    ).groupBy(*kcols).agg(
        (F.sum("_slope") / F.count(F.lit(1))).alias("_sen")
    )
    s_agg = scored.groupBy(*kcols).agg(
        F.sum("_sgn").cast("long").alias("s_stat")
    )
    ties = (
        base.groupBy(*[F.col(c) for c in kcols], F.col("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_tg"))
        .groupBy(*kcols)
        .agg(
            F.sum("_tg").cast("long").alias("n"),
            F.sum(
                F.col("_tg") * (F.col("_tg") - 1) * (2 * F.col("_tg") + 5)
            ).cast("long").alias("_tie_term"),
        )
    )
    n = F.col("n")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("_tie_term")).cast("double") / 18.0
    joined = ties.join(s_agg, kcols, "left").join(mid, kcols, "left")
    s = F.coalesce(F.col("s_stat"), F.lit(0)).cast("double")
    z = F.when(var18 > 0,
        F.when(s > 0, (s - 1) / F.sqrt(var18))
        .when(s < 0, (s + 1) / F.sqrt(var18))
        .otherwise(F.lit(0.0)),
    )
    trend = F.when(
        z.isNull(), F.lit(None).cast("string")
    ).when(z > float(z_alpha), "increasing").when(
        z < -float(z_alpha), "decreasing"
    ).otherwise("no_trend")
    return joined.select(
        *kcols,
        "n",
        F.coalesce(F.col("s_stat"), F.lit(0)).alias("s_stat"),
        F.round(var18, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        trend.alias("trend"),
        F.round(F.col("_sen"), 6).alias("sen_slope"),
    )


def _hw_fold_sum(terms: "list[str]") -> str:
    """Left-fold addition text ``((a + b) + c)…`` — both engines must
    evaluate the same association order for IEEE-identical results."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def holt_winters_additive(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int | None = None,
) -> DataFrame:
    """Holt–Winters additive triple exponential smoothing — the seasonal
    completion of the trend tier: :func:`holt_linear` fits level+trend,
    :func:`seasonal_index` measures a static seasonal profile; HW fits
    level + trend + an EVOLVING seasonal state and forecasts with all
    three (the standard short-horizon forecaster for weekly-patterned
    telemetry).

    Recurrence (t ≥ m, m = ``period``):
    lₜ = α(xₜ − sₜ₋ₘ) + (1−α)(lₜ₋₁ + bₜ₋₁);
    bₜ = β(lₜ − lₜ₋₁) + (1−β)bₜ₋₁;
    sₜ = γ(xₜ − lₜ) + (1−γ)sₜ₋ₘ.
    Textbook init off the first two seasons (needs T ≥ 2m):
    l = mean(season 1), b = (Σseason 2 − Σseason 1)/m², sᵢ = xᵢ − l.
    Forecast h steps ahead: l_T + h·b_T + s_{T−m+((h−1) mod m)}.

    Scale/determinism shape is :func:`holt_linear`'s: ONE conditional
    aggregate pivots each key's series to T columns (|keys| result
    rows), the recurrence unrolls into a per-row scalar column chain
    (no window over time, no driver loop, no UDF), and every sum in the
    init is a LEFT-FOLD with the same association order the paired
    :func:`holt_winters_oracle_sql` emits — IEEE determinism needs
    identical expression trees. Missing steps contribute 0.

    Returns one row per key and h in 1..``horizon`` (default m):
    (*key_cols, h, level, trend, seasonal, forecast)."""
    T = len(steps)
    m = int(period)
    if m < 2:
        raise ValueError("holt_winters_additive needs period >= 2")
    if T < 2 * m:
        raise ValueError("holt_winters_additive needs at least two full seasons")
    hz = m if horizon is None else int(horizon)
    if hz < 1:
        raise ValueError("horizon must be >= 1")
    a, b, g = float(alpha), float(beta), float(gamma)
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    s1 = _hw_fold_sum([f"_x{i}" for i in range(m)])
    s2 = _hw_fold_sum([f"_x{i}" for i in range(m, 2 * m)])
    cur = cur.withColumn(f"_l{m-1}", F.expr(f"{s1} / {float(m)!r}")).withColumn(
        f"_b{m-1}", F.expr(f"({s2} - {s1}) / {float(m * m)!r}")
    )
    for i in range(m):
        cur = cur.withColumn(f"_s{i}", F.col(f"_x{i}") - F.col(f"_l{m-1}"))
    for t in range(m, T):
        cur = (
            cur.withColumn(
                f"_l{t}",
                F.lit(a) * (F.col(f"_x{t}") - F.col(f"_s{t-m}"))
                + F.lit(1.0 - a) * (F.col(f"_l{t-1}") + F.col(f"_b{t-1}")),
            )
            .withColumn(
                f"_b{t}",
                F.lit(b) * (F.col(f"_l{t}") - F.col(f"_l{t-1}"))
                + F.lit(1.0 - b) * F.col(f"_b{t-1}"),
            )
            .withColumn(
                f"_s{t}",
                F.lit(g) * (F.col(f"_x{t}") - F.col(f"_l{t}"))
                + F.lit(1.0 - g) * F.col(f"_s{t-m}"),
            )
        )
    last_l, last_b = F.col(f"_l{T-1}"), F.col(f"_b{T-1}")
    fc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).cast("int").alias("h"),
                    F.col(f"_s{T - m + ((h - 1) % m)}").alias("seasonal"),
                    (
                        last_l
                        + F.lit(float(h)) * last_b
                        + F.col(f"_s{T - m + ((h - 1) % m)}")
                    ).alias("forecast"),
                )
                for h in range(1, hz + 1)
            ]
        )
    ).alias("_fc")
    return cur.select(
        *key_cols, last_l.alias("_level"), last_b.alias("_trend"), fc
    ).select(
        *key_cols,
        F.col("_fc.h").alias("h"),
        F.col("_level").alias("level"),
        F.col("_trend").alias("trend"),
        F.col("_fc.seasonal").alias("seasonal"),
        F.col("_fc.forecast").alias("forecast"),
    )


def holt_winters_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int | None = None,
    round_dp: int = 4,
) -> str:
    """DuckDB mirror of :func:`holt_winters_additive`, generated by the
    SAME unrolling loop (the holt/cusum/ewma pattern): identical
    left-fold init sums, identical recurrence shapes, repr-printed
    coefficient literals. ``base_cte`` must expose (key, step, value)
    via the given expressions."""
    T = len(steps)
    m = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    hz = m if horizon is None else int(horizon)
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS _x{i}"
        for i, s in enumerate(steps)
    )
    s1 = _hw_fold_sum([f"_x{i}" for i in range(m)])
    s2 = _hw_fold_sum([f"_x{i}" for i in range(m, 2 * m)])
    init_s = ", ".join(f"_x{i} - _l{m-1} AS _s{i}" for i in range(m))
    ctes = [
        f"base AS ({base_cte})",
        f"wide AS (SELECT {key_expr} AS k, {xs} FROM base GROUP BY 1)",
        f"init AS (SELECT *, {s1} / {float(m)!r} AS _l{m-1}, "
        f"({s2} - {s1}) / {float(m * m)!r} AS _b{m-1} FROM wide)",
        f"init_s AS (SELECT *, {init_s} FROM init)",
    ]
    prev = "init_s"
    for t in range(m, T):
        ctes.append(
            f"sl{t} AS (SELECT *, {a!r} * (_x{t} - _s{t-m}) + {1.0 - a!r} * (_l{t-1} + _b{t-1}) AS _l{t} FROM {prev})"
        )
        ctes.append(
            f"sb{t} AS (SELECT *, {b!r} * (_l{t} - _l{t-1}) + {1.0 - b!r} * _b{t-1} AS _b{t} FROM sl{t})"
        )
        ctes.append(
            f"ss{t} AS (SELECT *, {g!r} * (_x{t} - _l{t}) + {1.0 - g!r} * _s{t-m} AS _s{t} FROM sb{t})"
        )
        prev = f"ss{t}"
    arms = " ".join(
        f"WHEN h = {h} THEN _s{T - m + ((h - 1) % m)}" for h in range(1, hz + 1)
    )
    hs = ", ".join(str(h) for h in range(1, hz + 1))
    final = (
        f"SELECT k, CAST(h AS INTEGER) AS h, round(_l{T-1}, {round_dp}) AS level, "
        f"round(_b{T-1}, {round_dp}) AS trend, "
        f"round(CASE {arms} END, {round_dp}) AS seasonal, "
        f"round(_l{T-1} + CAST(h AS DOUBLE) * _b{T-1} + CASE {arms} END, {round_dp}) AS forecast "
        f"FROM {prev} CROSS JOIN (SELECT unnest([{hs}]) AS h)"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def ccf_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key sample CROSS-correlation function at lags −K..K — the
    two-series sibling of :func:`acf_profile` that answers "does x LEAD
    y" (does error volume spike before purchase value drops, does
    signup volume lead purchase volume by a day): r_k = Σ_t (x_t − x̄)
    (y_{t+k} − ȳ) / √(Σ(x − x̄)²·Σ(y − ȳ)²), full-series means and
    denominators (the same taper normalization as the ACF, so
    |r_k| ≤ 1 and lags are comparable). Positive lag = x leads y.

    Scale shape matches :func:`acf_profile` verbatim: ONE keyed
    exchange carries the means, both denominators, and all 2K+1 lead
    columns (the window and the final aggregate share the hash
    partitioning); the lag axis unstacks from the per-key aggregate
    row — no self-join per lag, no re-scan.

    Determinism: means are decimal-sum/count divisions; every centered
    product and square is ROUNDED to 9 dp then decimal-summed; the
    final ratio is one double expression rounded to 6. ``order_col``
    must be unique per key (a calendar grain). Returns one row per
    (key, lag): (*key_cols, lag, n, n_pairs, ccf); ccf NULL when either
    series is constant or the lag has no pairs."""
    if max_lag < 1:
        raise ValueError("ccf_profile needs max_lag >= 1")
    kcols = [F.col(c) for c in key_cols]
    wo = Window.partitionBy(*kcols).orderBy(F.col(order_col).asc())
    wp = Window.partitionBy(*kcols)
    x = F.col(x_col).cast("decimal(24,6)")
    y = F.col(y_col).cast("decimal(24,6)")
    cur = df.select(*kcols, F.col(order_col), x.alias("_x"), y.alias("_y"))
    cur = (
        cur.withColumn("_n", F.count(F.lit(1)).over(wp).cast("long"))
        .withColumn(
            "_mx", F.sum("_x").over(wp).cast("double") / F.col("_n").cast("double")
        )
        .withColumn(
            "_my", F.sum("_y").over(wp).cast("double") / F.col("_n").cast("double")
        )
    )
    dx = F.col("_x").cast("double") - F.col("_mx")
    dy = F.col("_y").cast("double") - F.col("_my")
    cur = cur.withColumn("_dx2", F.round(dx * dx, 9).cast("decimal(28,9)")).withColumn(
        "_dy2", F.round(dy * dy, 9).cast("decimal(28,9)")
    )
    lags = list(range(-max_lag, max_lag + 1))
    for k in lags:
        led = F.lead(F.col("_y"), k).over(wo) if k >= 0 else F.lag(
            F.col("_y"), -k
        ).over(wo)
        tag = f"m{-k}" if k < 0 else str(k)
        cur = cur.withColumn(
            f"_num{tag}",
            F.when(
                led.isNotNull(),
                F.round(dx * (led.cast("double") - F.col("_my")), 9),
            ).cast("decimal(28,9)"),
        )
    tags = [f"m{-k}" if k < 0 else str(k) for k in lags]
    agg = cur.groupBy(*kcols).agg(
        F.max("_n").alias("n"),
        F.sum("_dx2").alias("_denx"),
        F.sum("_dy2").alias("_deny"),
        *[F.sum(f"_num{t}").alias(f"_num{t}") for t in tags],
        *[F.count(f"_num{t}").cast("long").alias(f"_np{t}") for t in tags],
    )
    stacked = agg.select(
        *key_cols,
        "n",
        "_denx",
        "_deny",
        F.expr(
            "stack({}, {})".format(
                len(lags),
                ", ".join(
                    f"CAST({k} AS BIGINT), _np{t}, _num{t}"
                    for k, t in zip(lags, tags)
                ),
            )
        ).alias("lag", "n_pairs", "_num"),
    )
    den = F.sqrt(F.col("_denx").cast("double") * F.col("_deny").cast("double"))
    ccf = F.when(
        (F.col("_denx") > 0) & (F.col("_deny") > 0) & (F.col("n_pairs") > 0),
        F.round(F.col("_num").cast("double") / den, 6),
    )
    return stacked.select(*key_cols, "lag", "n", "n_pairs", ccf.alias("ccf"))


def pettitt_test(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
) -> DataFrame:
    """Pettitt change-point test — the nonparametric single-breakpoint
    locator: where does the series' distribution shift, and is the
    shift significant? Rank-based like :func:`mann_kendall_trend` (its
    monotone-trend sibling): U_t = Σ_{i≤t} Σ_{j>t} sgn(xᵢ − xⱼ), the
    break sits at K = max|U_t|, with the classic approximation
    p ≈ 2·exp(−6K²/(T³+T²)).

    Scale shape: the O(T²) comparison runs as ONE self-join on the
    series key at the CALENDAR-GRAIN series contract (the Mann–Kendall
    discipline: feed monthly/daily aggregates, never raw events), via
    Pettitt's recurrence U_t = U_{t−1} + Σ_{j≠t} sgn(x_t − x_j) — the
    join collapses to T rows (one V_t per step) before a single keyed
    sort window accumulates U and elects the argmax.

    Determinism: sgn comparisons run on the EXACT input values (pass
    DECIMAL aggregates), so every U_t is an exact LONG; the argmax
    breaks |U| ties on the earliest step; only the p-value is a
    fixed-shape double, rounded to 6. ``t_col`` must be an integral
    step index unique per key. Returns one row per key: (*key_cols, n,
    t_star, u_at_t, k_stat, p_value); NULL t_star/u_at_t/k_stat/p for
    series with fewer than 2 points (a key-grain left join guarantees
    every input key emits exactly one row — ADVICE r7: 1-point keys
    used to vanish from the output instead)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(t_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        *kcols,
        F.col(t_col).cast("long").alias("_t"),
        F.col(value_col).alias("_v"),
    )
    a = base.select(*[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
                    F.col("_t").alias("_ta"), F.col("_v").alias("_va"))
    cond = [a[f"_k{i}"] == base[c] for i, c in enumerate(key_cols)]
    sgn = F.when(F.col("_v") > F.col("_va"), 1).when(
        F.col("_v") < F.col("_va"), -1
    ).otherwise(0)
    v_t = (
        base.join(a, cond if cond else [F.lit(True)])
        .filter(F.col("_ta") != F.col("_t"))
        .groupBy(*key_cols, "_t")
        .agg(F.sum(sgn).cast("long").alias("_vt"))
    )
    # Steps with no comparison rows (T = 1) never reach here; re-join is
    # unnecessary because every t pairs with every other t.
    wcum = Window.partitionBy(*kcols).orderBy(F.col("_t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wk = Window.partitionBy(*kcols)
    wlast = Window.partitionBy(*kcols).orderBy(F.col("_t").desc())
    u = v_t.withColumn("_u", F.sum("_vt").over(wcum).cast("long")).withColumn(
        "_n", F.count(F.lit(1)).over(wk).cast("long")
    ).withColumn("_is_last", F.row_number().over(wlast) == 1)
    # exclude the final step (U_T = 0 by construction, not a candidate)
    cand = u.filter(~F.col("_is_last"))
    wbest = Window.partitionBy(*kcols).orderBy(
        F.abs(F.col("_u")).desc(), F.col("_t").asc()
    )
    best = cand.withColumn("_rk", F.row_number().over(wbest)).filter(
        F.col("_rk") == 1
    )
    nd = F.col("_n").cast("double")
    k = F.abs(F.col("_u")).cast("double")
    p = F.round(
        F.least(
            F.lit(1.0),
            F.lit(2.0) * F.exp(F.lit(-6.0) * k * k / (nd * nd * nd + nd * nd)),
        ),
        6,
    )
    best_sel = best.select(
        *key_cols,
        F.col("_t").alias("t_star"),
        F.col("_u").alias("u_at_t"),
        F.abs(F.col("_u")).cast("long").alias("k_stat"),
        p.alias("p_value"),
    )
    # Key-grain left join: a T=1 series produces no comparison pairs, so
    # it has no `best` row — it still emits (*key, n=1, NULLs) here. The
    # count relation is key-grain (metadata-sized next to the series).
    per_key = base.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return per_key.join(best_sel, list(key_cols), "left").select(
        *key_cols, "n", "t_star", "u_at_t", "k_stat", "p_value"
    )


def _trig_case_sql(col: str, period: int, fn: str) -> str:
    """CASE expression mapping ``col % period`` to Python-computed
    cos/sin literals — the embed-constants recipe that keeps both
    engines bit-identical without trusting their libm."""
    import math

    f = {"cos": math.cos, "sin": math.sin}[fn]
    arms = " ".join(
        f"WHEN {k} THEN {f(2.0 * math.pi * k / period)!r}" for k in range(period)
    )
    return f"CASE CAST({col} % {period} AS INT) {arms} END"


def periodogram(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
    periods: Sequence[int],
) -> DataFrame:
    """Fixed-period DFT periodogram — which cycle length dominates a
    series? Scans candidate periods (e.g. 2..14 days) and reports the
    spectral power at each: power_p = C_p² + S_p² over the mean-centered
    series, where C_p = Σ v'_t·cos(2πt/p), S_p = Σ v'_t·sin(2πt/p).
    The frequency-domain sibling of :func:`acf_profile` (ACF answers
    "how correlated at lag k", this answers "how much energy at period
    p" — sharper when several cycles overlap).

    Scale shape: runs at the calendar-grain series contract; the series
    relation fans out |periods|× via a literal array explode (still
    calendar-sized), and ONE keyed aggregate per (key, period) folds
    the trig sums; the mean rides a window over the same key
    partitioning — no re-scan, no join.

    Determinism: cos/sin are PYTHON-computed constants embedded as
    literals in both engines (the fixed-point-constants recipe — trig
    only ever evaluates at the p distinct phases t mod p, so each
    period is a p-armed CASE); per-term products round to 9 then
    DECIMAL-sum; power is one fixed-shape double rounded to 6. Pass
    DECIMAL values (the mean subtraction is exact-sum-derived).
    ``t_col`` must be an integral step index unique per key. Returns
    one row per (key, period): (*key_cols, period, c_sum, s_sum,
    power)."""
    import math

    ps = [int(p) for p in periods]
    if not ps or any(p < 2 for p in ps):
        raise ValueError("periodogram needs periods all >= 2")
    kcols = [F.col(c) for c in key_cols]
    wk = Window.partitionBy(*kcols)
    base = (
        df.filter(F.col(t_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            *kcols,
            F.col(t_col).cast("long").alias("_t"),
            F.col(value_col).cast("decimal(24,6)").alias("_v"),
        )
        .withColumn("_s", F.sum("_v").over(wk))
        .withColumn("_n", F.count(F.lit(1)).over(wk).cast("long"))
    )
    centered = base.select(
        *key_cols,
        "_t",
        (
            F.col("_v").cast("double")
            - F.col("_s").cast("double") / F.col("_n").cast("double")
        ).alias("_c"),
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("period"),
    )

    def _trig(fn) -> "F.Column":
        expr = F.lit(None).cast("double")
        for p in ps:
            vals = [fn(2.0 * math.pi * k / p) for k in range(p)]
            arm = F.element_at(
                F.array(*[F.lit(v) for v in vals]), (F.col("_t") % p).cast("int") + 1
            )
            expr = F.when(F.col("period") == p, arm).otherwise(expr)
        return expr

    terms = centered.select(
        *key_cols,
        "period",
        F.round(F.col("_c") * _trig(math.cos), 9).cast("decimal(28,9)").alias("_ct"),
        F.round(F.col("_c") * _trig(math.sin), 9).cast("decimal(28,9)").alias("_st"),
    )
    agg = terms.groupBy(*key_cols, "period").agg(
        F.sum("_ct").alias("_cs"), F.sum("_st").alias("_ss")
    )
    c, s = F.col("_cs").cast("double"), F.col("_ss").cast("double")
    return agg.select(
        *key_cols,
        "period",
        F.round(c, 6).alias("c_sum"),
        F.round(s, 6).alias("s_sum"),
        F.round(c * c + s * s, 6).alias("power"),
    )


def periodogram_oracle_sql(
    inner_sql: str,
    key_expr: str,
    t_expr: str,
    value_expr: str,
    periods: Sequence[int],
) -> str:
    """DuckDB oracle generator paired with :func:`periodogram` — emits
    the IDENTICAL Python trig literals and expression shapes (the
    holt/cusum/ewma paired-generator pattern)."""
    ps = [int(p) for p in periods]
    arms = []
    for p in ps:
        cos_case = _trig_case_sql("t", p, "cos")
        sin_case = _trig_case_sql("t", p, "sin")
        arms.append(
            f"SELECT k, {p} AS period,\n"
            f"  CAST(round(c * ({cos_case}), 9) AS DECIMAL(28,9)) AS ct,\n"
            f"  CAST(round(c * ({sin_case}), 9) AS DECIMAL(28,9)) AS st\n"
            "FROM centered"
        )
    union = "\nUNION ALL\n".join(arms)
    return f"""
WITH series AS ({inner_sql}),
typed AS (
  SELECT {key_expr} AS k, CAST({t_expr} AS BIGINT) AS t,
         CAST({value_expr} AS DECIMAL(24,6)) AS v
  FROM series
  WHERE {t_expr} IS NOT NULL AND {value_expr} IS NOT NULL
),
stats AS (
  SELECT *, sum(v) OVER (PARTITION BY k) AS s,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
  FROM typed
),
centered AS (
  SELECT k, t, CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS c
  FROM stats
),
terms AS (
{union}
),
agg AS (
  SELECT k, period, sum(ct) AS cs, sum(st) AS ss FROM terms GROUP BY 1, 2
)
SELECT k, period,
  round(CAST(cs AS DOUBLE), 6) AS c_sum,
  round(CAST(ss AS DOUBLE), 6) AS s_sum,
  round(CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
        + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE), 6) AS power
FROM agg
"""


def forecast_errors(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    actual_col: str,
    forecast_col: str,
) -> DataFrame:
    """Forecast-accuracy scorecard per series — MAE, RMSE, MAPE, sMAPE,
    and MASE over (actual, forecast) pairs: the evaluation closer for
    the forecasting tier (:func:`holt_linear` /
    :func:`holt_winters_additive` produce forecasts; this grades any of
    them, or a naive baseline, on held-out steps). MASE scales MAE by
    the in-sample naive lag-1 error — the scale-free score that lets a
    5-event-type dashboard share one threshold (MASE < 1 beats naive).

    Scale shape: ONE keyed sort window derives the lag-1 naive error;
    the same partitioning feeds the map-side-combined rollup. Runs at
    the calendar-grain series contract.

    Determinism: pass DECIMAL actuals/forecasts — errors, |errors|, and
    squared errors stay exact DECIMALs; the per-row MAPE/sMAPE ratios
    round to 9 then DECIMAL-sum; final scores are fixed-shape doubles
    rounded to 6. Rows with NULL actual or forecast are excluded; MAPE
    skips zero actuals (count reported), sMAPE skips rows where
    |a|+|f| = 0; MASE NULL for single-point series or a flat naive
    scale. Returns one row per key: (*key_cols, n, n_zero_actual, mae,
    rmse, mape, smape, mase)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(actual_col).isNotNull()
        & F.col(forecast_col).isNotNull()
        & F.col(t_col).isNotNull()
    ).select(
        *kcols,
        F.col(t_col).cast("long").alias("_t"),
        F.col(actual_col).cast("decimal(24,6)").alias("_a"),
        F.col(forecast_col).cast("decimal(24,6)").alias("_f"),
    )
    wlag = Window.partitionBy(*kcols).orderBy(F.col("_t").asc())
    cur = base.withColumn("_prev", F.lag("_a").over(wlag))
    e = F.col("_a") - F.col("_f")
    abs_e = F.abs(e)
    ad, fd = F.col("_a").cast("double"), F.col("_f").cast("double")
    mape_t = F.when(
        F.col("_a") != 0,
        F.round(F.abs(ad - fd) / F.abs(ad), 9).cast("decimal(28,9)"),
    )
    smape_t = F.when(
        F.abs(ad) + F.abs(fd) > 0,
        F.round(
            F.lit(2.0) * F.abs(ad - fd) / (F.abs(ad) + F.abs(fd)), 9
        ).cast("decimal(28,9)"),
    )
    naive_t = F.when(
        F.col("_prev").isNotNull(), F.abs(F.col("_a") - F.col("_prev"))
    )
    agg = cur.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("_a") == 0).cast("long")).cast("long").alias("n_zero_actual"),
        F.sum(abs_e).alias("_sae"),
        F.sum(e * e).alias("_sse"),
        F.sum(mape_t).alias("_mape"),
        F.count(mape_t).cast("long").alias("_nmape"),
        F.sum(smape_t).alias("_smape"),
        F.count(smape_t).cast("long").alias("_nsmape"),
        F.sum(naive_t).alias("_snaive"),
        F.count(naive_t).cast("long").alias("_nnaive"),
    )
    nd = F.col("n").cast("double")
    mae = F.col("_sae").cast("double") / nd
    rmse = F.sqrt(F.col("_sse").cast("double") / nd)
    mape = F.when(
        F.col("_nmape") > 0,
        F.col("_mape").cast("double") / F.col("_nmape").cast("double"),
    )
    smape = F.when(
        F.col("_nsmape") > 0,
        F.col("_smape").cast("double") / F.col("_nsmape").cast("double"),
    )
    naive_scale = F.when(
        F.col("_nnaive") > 0,
        F.col("_snaive").cast("double") / F.col("_nnaive").cast("double"),
    )
    mase = F.when(naive_scale > 0, F.round(mae / naive_scale, 6))
    return agg.select(
        *key_cols,
        "n",
        "n_zero_actual",
        F.round(mae, 6).alias("mae"),
        F.round(rmse, 6).alias("rmse"),
        F.round(mape, 6).alias("mape"),
        F.round(smape, 6).alias("smape"),
        mase.alias("mase"),
    )


def croston_method(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    alpha: float = 0.1,
) -> DataFrame:
    """Croston's method (1972) — the intermittent-demand forecaster the
    Holt/Holt-Winters family mishandles (zero-heavy series drag their
    levels toward zero between demands): smooth the NONZERO demand sizes
    zₜ and the inter-demand intervals pₜ separately, forecast = z/p
    (expected demand per period).

    Same scale/determinism shape as :func:`holt_linear`/:func:`cusum_
    change_points`: one conditional aggregate pivots each key's series
    onto the FIXED ``steps`` spine (|keys| rows; cast ``value_col`` to a
    decimal upstream when a (key, step) cell can hold >1 row — the cusum
    exactness note), and the branchy recurrence unrolls into per-row
    CASE column chains — no window, no driver loop. The paired
    :func:`croston_oracle_sql` emits IDENTICAL expression shapes.

    State per step: seen (any demand yet), c (periods since the last
    demand), z (smoothed size), p (smoothed interval). The first demand
    initializes z to the demand and p to its 1-based position (the
    textbook init); later demands update z ← α·x + (1−α)·z and
    p ← α·(c+1) + (1−α)·p. Keys with NO demand in the spine emit NULL
    state/forecast. Returns one row per key: (*key_cols, n_steps,
    n_demand_steps, z_final, p_final, croston_forecast) rounded to 6."""
    T = len(steps)
    if T < 2:
        raise ValueError("croston_method needs at least two steps")
    if not 0 < alpha < 1:
        raise ValueError("croston_method needs 0 < alpha < 1")
    a = float(alpha)
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    nd = F.when(F.col("_x0") > 0, 1).otherwise(0)
    for t in range(1, T):
        nd = nd + F.when(F.col(f"_x{t}") > 0, 1).otherwise(0)
    cur = cur.withColumn("_nd", nd.cast("long"))
    # step 0
    cur = (
        cur.withColumn("_seen0", F.col("_x0") > 0)
        .withColumn("_z0", F.when(F.col("_x0") > 0, F.col("_x0")))
        .withColumn("_p0", F.when(F.col("_x0") > 0, F.lit(1.0)))
        .withColumn("_c0", F.when(F.col("_x0") > 0, F.lit(0)).otherwise(F.lit(1)))
    )
    for t in range(1, T):
        x = F.col(f"_x{t}")
        seen_p, z_p, p_p, c_p = (
            F.col(f"_seen{t-1}"), F.col(f"_z{t-1}"),
            F.col(f"_p{t-1}"), F.col(f"_c{t-1}"),
        )
        cur = (
            cur.withColumn(f"_seen{t}", seen_p | (x > 0))
            .withColumn(
                f"_z{t}",
                F.when(
                    x > 0,
                    F.when(seen_p, F.lit(a) * x + F.lit(1.0 - a) * z_p).otherwise(x),
                ).otherwise(z_p),
            )
            .withColumn(
                f"_p{t}",
                F.when(
                    x > 0,
                    F.when(
                        seen_p,
                        F.lit(a) * (c_p + F.lit(1)).cast("double")
                        + F.lit(1.0 - a) * p_p,
                    ).otherwise(F.lit(float(t + 1))),
                ).otherwise(p_p),
            )
            .withColumn(
                f"_c{t}", F.when(x > 0, F.lit(0)).otherwise(c_p + F.lit(1))
            )
        )
    zf, pf = F.col(f"_z{T-1}"), F.col(f"_p{T-1}")
    return cur.select(
        *key_cols,
        F.lit(T).cast("long").alias("n_steps"),
        F.col("_nd").alias("n_demand_steps"),
        F.round(zf, 6).alias("z_final"),
        F.round(pf, 6).alias("p_final"),
        F.round(F.when(pf > 0, zf / pf), 6).alias("croston_forecast"),
    )


def croston_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    alpha: float = 0.1,
    key_name: str = "k",
) -> str:
    """DuckDB mirror of :func:`croston_method`, generated by the SAME
    unrolling loop (identical double expression shapes)."""
    T = len(steps)
    a = float(alpha)
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS x{i}"
        for i, s in enumerate(steps)
    )
    nd = " + ".join(f"CASE WHEN x{t} > 0 THEN 1 ELSE 0 END" for t in range(T))
    ctes = [
        f"base AS ({base_cte})",
        f"wide AS (SELECT {key_expr} AS {key_name}, {xs} FROM base GROUP BY 1)",
        (
            "s0 AS (SELECT *, "
            f"CAST({nd} AS BIGINT) AS nd, "
            "x0 > 0 AS seen0, "
            "CASE WHEN x0 > 0 THEN x0 END AS z0, "
            "CASE WHEN x0 > 0 THEN 1.0 END AS p0, "
            "CASE WHEN x0 > 0 THEN 0 ELSE 1 END AS c0 FROM wide)"
        ),
    ]
    for t in range(1, T):
        ctes.append(
            f"s{t} AS (SELECT *, "
            f"(seen{t-1} OR x{t} > 0) AS seen{t}, "
            f"CASE WHEN x{t} > 0 THEN (CASE WHEN seen{t-1} THEN {a} * x{t} + {1.0 - a} * z{t-1} ELSE x{t} END) ELSE z{t-1} END AS z{t}, "
            f"CASE WHEN x{t} > 0 THEN (CASE WHEN seen{t-1} THEN {a} * CAST(c{t-1} + 1 AS DOUBLE) + {1.0 - a} * p{t-1} ELSE {float(t + 1)} END) ELSE p{t-1} END AS p{t}, "
            f"CASE WHEN x{t} > 0 THEN 0 ELSE c{t-1} + 1 END AS c{t} "
            f"FROM s{t-1})"
        )
    final = (
        f"SELECT {key_name}, CAST({T} AS BIGINT) AS n_steps, nd AS n_demand_steps, "
        f"round(z{T-1}, 6) AS z_final, round(p{T-1}, 6) AS p_final, "
        f"round(CASE WHEN p{T-1} > 0 THEN z{T-1} / p{T-1} END, 6) AS croston_forecast "
        f"FROM s{T-1}"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def seasonal_decompose_additive(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classic additive seasonal decomposition (the statsmodels
    ``seasonal_decompose`` shape): trend = centered ``period``-point
    moving average (defined only where the full window exists),
    seasonal = the phase-mean of the detrended series re-centered to
    sum 0 over one period, residual = x − trend − seasonal. The
    decompose view behind :func:`seasonal_index` (which reports the
    seasonal profile alone) and the input convention for
    seasonal-anomaly monitors (alert on |residual|).

    Scale/determinism shape: calendar-grain series contract (``t_col``
    an integral step index unique per key; ``value_col`` EXACT). Trend
    is an exact decimal window sum divided once; the detrended values
    are doubles, so the phase means use ROUND-THEN-DECIMAL folding
    (9 dp) — the order-independent recipe — as does the re-centering
    mean over the ``period`` phase values. One keyed sort window + one
    phase-grain aggregate + one metadata-sized join back; the series
    base is lineage-cut so the branches scan one materialization.

    Returns one row per input row: (*key_cols, t, x, phase, trend,
    seasonal, residual); trend/residual NULL at the edges (incomplete
    window), seasonal NULL only if the key has NO complete window.
    ``period`` must be odd (centered window) and >= 3."""
    if period < 3 or period % 2 == 0:
        raise ValueError("seasonal_decompose_additive needs an odd period >= 3")
    half = period // 2
    kcols = [F.col(c) for c in key_cols]
    base = df.select(
        *kcols,
        F.col(t_col).cast("long").alias("t"),
        F.col(value_col).alias("_v"),
    ).transform(lineage_cut)
    w = (
        Window.partitionBy(*kcols)
        .orderBy(F.col("t").asc())
        .rowsBetween(-half, half)
    )
    cur = base.withColumn("_wn", F.count(F.lit(1)).over(w)).withColumn(
        "_ws", F.sum("_v").over(w)
    )
    trend = F.when(
        F.col("_wn") == period,
        F.col("_ws").cast("double") / F.lit(float(period)),
    )
    cur = cur.withColumn("trend", trend).withColumn(
        "phase", (F.col("t") % period).cast("int")
    )
    det = F.when(
        F.col("trend").isNotNull(),
        F.round(F.col("_v").cast("double") - F.col("trend"), 9).cast("decimal(28,9)"),
    )
    cur = cur.withColumn("_det", det).transform(lineage_cut)
    phase_means = (
        cur.filter(F.col("_det").isNotNull())
        .groupBy(*kcols, "phase")
        .agg(
            (F.sum("_det").cast("double") / F.count(F.lit(1)).cast("double")).alias("_pm")
        )
    )
    wkey = Window.partitionBy(*kcols)
    centered = phase_means.withColumn(
        "_gm",
        F.sum(F.round(F.col("_pm"), 9).cast("decimal(28,9)")).over(wkey).cast("double")
        / F.count(F.lit(1)).over(wkey).cast("double"),
    ).select(
        *kcols, "phase", F.round(F.col("_pm") - F.col("_gm"), 9).alias("seasonal")
    )
    out = cur.join(centered, [*key_cols, "phase"], "left")
    resid = F.when(
        F.col("trend").isNotNull() & F.col("seasonal").isNotNull(),
        F.round(F.col("_v").cast("double") - F.col("trend") - F.col("seasonal"), 6),
    )
    return out.select(
        *key_cols,
        "t",
        F.col("_v").cast("double").alias("x"),
        "phase",
        F.round(F.col("trend"), 6).alias("trend"),
        F.round(F.col("seasonal"), 6).alias("seasonal"),
        resid.alias("residual"),
    )


def holt_winters_multiplicative(
    df: DataFrame,
    key_cols: Sequence[str],
    step_col: str,
    value_col: str,
    steps: Sequence[str],
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int | None = None,
) -> DataFrame:
    """Holt–Winters MULTIPLICATIVE triple exponential smoothing — the
    variant for series whose seasonal swing scales WITH the level
    (revenue whose weekend dip is a percentage, not a fixed amount);
    the additive form (:func:`holt_winters_additive`) models a constant-
    amplitude season. Recurrence (t ≥ m):
    lₜ = α(xₜ/sₜ₋ₘ) + (1−α)(lₜ₋₁+bₜ₋₁); bₜ as Holt;
    sₜ = γ(xₜ/lₜ) + (1−γ)sₜ₋ₘ; forecast = (l_T + h·b_T)·s.
    Textbook init: l = mean(season 1), b = (Σs₂−Σs₁)/m², sᵢ = xᵢ/l.

    Multiplicative decomposition is defined on STRICTLY POSITIVE data:
    keys with any pivoted step ≤ 0 emit NULL state/forecast rather than
    dividing through zero (the degenerate shape is its own signal — use
    the additive form there). Same unrolled-column-chain scale shape
    and left-fold determinism as the additive twin; the paired
    :func:`holt_winters_mult_oracle_sql` emits identical expression
    trees. Returns (*key_cols, h, level, trend, seasonal, forecast)."""
    T = len(steps)
    m = int(period)
    if m < 2:
        raise ValueError("holt_winters_multiplicative needs period >= 2")
    if T < 2 * m:
        raise ValueError("holt_winters_multiplicative needs at least two full seasons")
    hz = m if horizon is None else int(horizon)
    if hz < 1:
        raise ValueError("horizon must be >= 1")
    a, b, g = float(alpha), float(beta), float(gamma)
    aggs = [
        F.sum(
            F.when(F.col(step_col) == F.lit(s), F.col(value_col)).otherwise(F.lit(0))
        ).alias(f"_x{i}")
        for i, s in enumerate(steps)
    ]
    cur = df.groupBy(*key_cols).agg(*aggs)
    cur = cur.select(
        *key_cols, *[F.col(f"_x{i}").cast("double").alias(f"_x{i}") for i in range(T)]
    )
    pos = F.col("_x0") > 0
    for i in range(1, T):
        pos = pos & (F.col(f"_x{i}") > 0)
    cur = cur.withColumn("_pos", pos)
    s1 = _hw_fold_sum([f"_x{i}" for i in range(m)])
    s2 = _hw_fold_sum([f"_x{i}" for i in range(m, 2 * m)])
    cur = cur.withColumn(
        f"_l{m-1}", F.when(F.col("_pos"), F.expr(f"{s1} / {float(m)!r}"))
    ).withColumn(
        f"_b{m-1}", F.when(F.col("_pos"), F.expr(f"({s2} - {s1}) / {float(m * m)!r}"))
    )
    for i in range(m):
        cur = cur.withColumn(f"_s{i}", F.col(f"_x{i}") / F.col(f"_l{m-1}"))
    for t in range(m, T):
        cur = (
            cur.withColumn(
                f"_l{t}",
                F.lit(a) * (F.col(f"_x{t}") / F.col(f"_s{t-m}"))
                + F.lit(1.0 - a) * (F.col(f"_l{t-1}") + F.col(f"_b{t-1}")),
            )
            .withColumn(
                f"_b{t}",
                F.lit(b) * (F.col(f"_l{t}") - F.col(f"_l{t-1}"))
                + F.lit(1.0 - b) * F.col(f"_b{t-1}"),
            )
            .withColumn(
                f"_s{t}",
                F.lit(g) * (F.col(f"_x{t}") / F.col(f"_l{t}"))
                + F.lit(1.0 - g) * F.col(f"_s{t-m}"),
            )
        )
    last_l, last_b = F.col(f"_l{T-1}"), F.col(f"_b{T-1}")
    fc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(h).cast("int").alias("h"),
                    F.col(f"_s{T - m + ((h - 1) % m)}").alias("seasonal"),
                    (
                        (last_l + F.lit(float(h)) * last_b)
                        * F.col(f"_s{T - m + ((h - 1) % m)}")
                    ).alias("forecast"),
                )
                for h in range(1, hz + 1)
            ]
        )
    ).alias("_fc")
    return cur.select(
        *key_cols, last_l.alias("_level"), last_b.alias("_trend"), fc
    ).select(
        *key_cols,
        F.col("_fc.h").alias("h"),
        F.col("_level").alias("level"),
        F.col("_trend").alias("trend"),
        F.col("_fc.seasonal").alias("seasonal"),
        F.col("_fc.forecast").alias("forecast"),
    )


def holt_winters_mult_oracle_sql(
    base_cte: str,
    key_expr: str,
    step_expr: str,
    value_expr: str,
    steps: Sequence[str],
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int | None = None,
    round_dp: int = 4,
) -> str:
    """DuckDB mirror of :func:`holt_winters_multiplicative` — same
    unrolling loop, identical expression trees."""
    T = len(steps)
    m = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    hz = m if horizon is None else int(horizon)
    xs = ", ".join(
        f"CAST(coalesce(sum(CASE WHEN {step_expr} = '{s}' THEN {value_expr} ELSE 0 END), 0) AS DOUBLE) AS _x{i}"
        for i, s in enumerate(steps)
    )
    pos = " AND ".join(f"_x{i} > 0" for i in range(T))
    s1 = _hw_fold_sum([f"_x{i}" for i in range(m)])
    s2 = _hw_fold_sum([f"_x{i}" for i in range(m, 2 * m)])
    init_s = ", ".join(f"_x{i} / _l{m-1} AS _s{i}" for i in range(m))
    ctes = [
        f"base AS ({base_cte})",
        f"wide AS (SELECT {key_expr} AS k, {xs} FROM base GROUP BY 1)",
        f"posw AS (SELECT *, ({pos}) AS _pos FROM wide)",
        f"init AS (SELECT *, CASE WHEN _pos THEN {s1} / {float(m)!r} END AS _l{m-1}, "
        f"CASE WHEN _pos THEN ({s2} - {s1}) / {float(m * m)!r} END AS _b{m-1} FROM posw)",
        f"init_s AS (SELECT *, {init_s} FROM init)",
    ]
    prev = "init_s"
    for t in range(m, T):
        ctes.append(
            f"sl{t} AS (SELECT *, {a!r} * (_x{t} / _s{t-m}) + {1.0 - a!r} * (_l{t-1} + _b{t-1}) AS _l{t} FROM {prev})"
        )
        ctes.append(
            f"sb{t} AS (SELECT *, {b!r} * (_l{t} - _l{t-1}) + {1.0 - b!r} * _b{t-1} AS _b{t} FROM sl{t})"
        )
        ctes.append(
            f"ss{t} AS (SELECT *, {g!r} * (_x{t} / _l{t}) + {1.0 - g!r} * _s{t-m} AS _s{t} FROM sb{t})"
        )
        prev = f"ss{t}"
    arms = " ".join(
        f"WHEN h = {h} THEN _s{T - m + ((h - 1) % m)}" for h in range(1, hz + 1)
    )
    hs = ", ".join(str(h) for h in range(1, hz + 1))
    final = (
        f"SELECT k, CAST(h AS INTEGER) AS h, round(_l{T-1}, {round_dp}) AS level, "
        f"round(_b{T-1}, {round_dp}) AS trend, "
        f"round(CASE {arms} END, {round_dp}) AS seasonal, "
        f"round((_l{T-1} + CAST(h AS DOUBLE) * _b{T-1}) * (CASE {arms} END), {round_dp}) AS forecast "
        f"FROM {prev} CROSS JOIN (SELECT unnest([{hs}]) AS h)"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def theil_sen_slope(
    df: DataFrame,
    key_col: str,
    t_col: str,
    y_col: str,
) -> DataFrame:
    """Theil–Sen robust trend per key: the MEDIAN of all pairwise slopes
    (y_j − y_i)/(t_j − t_i) over i<j — up to ~29% contamination leaves the
    estimate standing where OLS (``ols_trend``) is dragged by one outlier.

    ``t_col`` must be INTEGRAL and unique per key (a day/month index);
    ``y_col`` should derive from exact decimal sums cast to double with
    the same expression shape on both engines. The pair fan-out is an
    equi-self-join on the key, quadratic ONLY in the per-key series
    length — callers aggregate to a bounded time grain first (months,
    days), so a key's pair count is thousands, never row-scale; the
    shuffle moves the aggregated grain, not raw events. Median = the
    row_number mirror (avg of the two middle order stats for even n,
    integer-DIV rank selection — DuckDB ``//`` ≡ Spark ``DIV``), never a
    sketch. Returns (key, n_points, n_pairs, theil_sen_slope) with the
    slope rounded to 6."""
    # lineage cut: the (usually aggregated) input subtree is consumed
    # THREE times (both pair sides + the n_points rollup); Spark does not
    # dedupe shared subtrees, so checkpoint the series grain once
    src = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).cast("long").alias("t"),
        F.col(y_col).cast("double").alias("y"),
    ).transform(lineage_cut)
    a = src.select("k", F.col("t").alias("t1"), F.col("y").alias("y1"))
    b = src.select("k", F.col("t").alias("t2"), F.col("y").alias("y2"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("t1") < F.col("t2"))
        .select(
            "k",
            "t1",
            "t2",
            (
                (F.col("y2") - F.col("y1"))
                / (F.col("t2") - F.col("t1")).cast("double")
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("k").orderBy(
        F.col("slope").asc(), F.col("t1").asc(), F.col("t2").asc()
    )
    ranked = pairs.select(
        "k",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("np"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.expr("(np + 1) DIV 2")) | (F.col("rn") == F.expr("np DIV 2 + 1"))
    )
    pts = src.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    return (
        mid.groupBy("k")
        .agg(
            F.max("np").cast("long").alias("n_pairs"),
            F.round(F.sum("slope") / F.count(F.lit(1)).cast("double"), 6).alias(
                "theil_sen_slope"
            ),
        )
        .join(pts, "k")
        .select(
            F.col("k").alias(key_col), "n_points", "n_pairs", "theil_sen_slope"
        )
    )


def theil_sen_oracle_sql(
    base_cte: str,
    key_name: str = "k",
) -> str:
    """DuckDB mirror of :func:`theil_sen_slope`. ``base_cte`` must expose
    (k, t, y) at the aggregated series grain — the SAME relation the Spark
    side feeds the operator (same exact-sum → double derivation)."""
    return f"""
WITH base AS MATERIALIZED ({base_cte}),
pairs AS (
  SELECT a.k, a.t AS t1, b.t AS t2,
         (b.y - a.y) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM base a JOIN base b ON a.k = b.k AND a.t < b.t
), ranked AS (
  SELECT k, slope,
         CAST(row_number() OVER (PARTITION BY k ORDER BY slope ASC, t1 ASC, t2 ASC) AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS np
  FROM pairs
), mid AS (
  SELECT k, slope, np FROM ranked
  WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
), pts AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_points FROM base GROUP BY 1
)
SELECT mid.k AS {key_name}, pts.n_points, max(np) AS n_pairs,
       round(sum(slope) / CAST(count(*) AS DOUBLE), 6) AS theil_sen_slope
FROM mid JOIN pts ON mid.k = pts.k
GROUP BY 1, 2
"""


def page_hinkley(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
    delta: float = 0.0,
    lam: float = 50.0,
    x_scale: int = 2,
) -> DataFrame:
    """Page–Hinkley drift detector per key: the sequential companion of
    ``cusum_change_points`` for mean drift against a RUNNING (not fixed)
    reference. At step t, with running mean x̄_t of the series so far, the
    cumulative deviation m_t = Σ_{i≤t}(x_i − x̄_i − δ); the PH statistic is
    max_{i≤t} m_i − m_t, alarming when it exceeds λ — a drop in level stops
    m growing while its historical max stands.

    INTEGER FIXED-POINT throughout (the PageRank/HLL discipline): ``x_col``
    must be an exact DECIMAL with scale ≤ ``x_scale``; values move to
    micro-units (×10⁶) as LONGs, the running mean is rounded HALF-UP to
    micro-units with pure integer arithmetic (sign·((2·|S|·10^{6−s} + i)
    DIV (2·i)) — an exact rational rounding no float can wobble), and the
    running sums/maxima stay LONG. The first float-rounded-at-a-grid
    version of this operator mismatched DuckDB at 1 ulp: decimal→double
    casts differ at 1 ulp between engines for some sums, and per-step
    rounding at 1e-9 AMPLIFIES that into grid-boundary flips; integers
    cannot. Doubles appear only in the final display division by 10⁶.
    Bounds: |Σx|·10^{6−s+1} must fit in int64 (~4.6e18; document per
    caller). Two stacked window passes over the key's series —
    cardinality is the time grain, not events. Returns one row per
    (key, t): (key, t, x, m, ph, alarm)."""
    if x_scale < 0 or x_scale > 6:
        raise ValueError("x_scale must be in [0, 6]")
    up = 10 ** (6 - x_scale)
    delta6 = int(round(float(delta) * 1_000_000))
    lam6 = int(round(float(lam) * 1_000_000))
    w = Window.partitionBy("k").orderBy("t")
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).alias("t"),
        (F.col(x_col) * F.lit(10 ** x_scale)).cast("long").alias("xs"),
    )
    cum = base.select(
        "k",
        "t",
        "xs",
        F.row_number().over(w).cast("long").alias("_i"),
        F.sum("xs").over(w).alias("_s"),
    )
    # running mean in micro-units, exact HALF-UP integer rounding
    sgn = F.when(F.col("_s") < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    mean6 = sgn * F.expr(f"(2 * abs(_s) * {up} + _i) DIV (2 * _i)")
    dev = cum.select(
        "k",
        "t",
        "xs",
        (F.col("xs") * F.lit(up) - mean6 - F.lit(delta6)).alias("_dev6"),
    )
    m = dev.select("k", "t", "xs", F.sum("_dev6").over(w).alias("_m6"))
    ph6 = F.max("_m6").over(w) - F.col("_m6")
    return m.select(
        F.col("k").alias(key_col),
        "t",
        (F.col("xs").cast("double") / F.lit(float(10 ** x_scale))).alias("x"),
        (F.col("_m6").cast("double") / F.lit(1_000_000.0)).alias("m"),
        (ph6.cast("double") / F.lit(1_000_000.0)).alias("ph"),
        (ph6 > F.lit(lam6)).cast("int").alias("alarm"),
    )


def page_hinkley_oracle_sql(
    base_cte: str,
    delta: float = 0.0,
    lam: float = 50.0,
    x_scale: int = 2,
    key_name: str = "k",
) -> str:
    """DuckDB mirror of :func:`page_hinkley` — the same integer
    fixed-point pipeline (``//`` ≡ Spark ``DIV`` on non-negatives; the
    sign is factored out first). ``base_cte`` exposes (k, t, x) with x
    the SAME exact decimal the Spark side scales."""
    up = 10 ** (6 - x_scale)
    delta6 = int(round(float(delta) * 1_000_000))
    lam6 = int(round(float(lam) * 1_000_000))
    return f"""
WITH base AS ({base_cte}),
scaled AS (
  SELECT k, t, CAST(x * {10 ** x_scale} AS BIGINT) AS xs FROM base
), cum AS (
  SELECT k, t, xs,
         CAST(row_number() OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS i,
         CAST(sum(xs) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS s
  FROM scaled
), dev AS (
  SELECT k, t, xs,
         xs * {up}
           - (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((2 * abs(s) * {up} + i) // (2 * i))
           - {delta6} AS dev6
  FROM cum
), m AS (
  SELECT k, t, xs, CAST(sum(dev6) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS m6
  FROM dev
)
SELECT k AS {key_name}, t,
       CAST(xs AS DOUBLE) / {float(10 ** x_scale)!r} AS x,
       CAST(m6 AS DOUBLE) / 1000000.0 AS m,
       CAST(max(m6) OVER (PARTITION BY k ORDER BY t) - m6 AS DOUBLE) / 1000000.0 AS ph,
       CAST(max(m6) OVER (PARTITION BY k ORDER BY t) - m6 > {lam6} AS INTEGER) AS alarm
FROM m
"""


def binseg_mean_shift(
    df: DataFrame,
    key_col: str,
    t_col: str,
    x_col: str,
) -> DataFrame:
    """Single binary-segmentation changepoint per key: the split that
    maximizes the between-segment sum-of-squares gain — the first
    iteration of classic binary segmentation (Scott–Knott / CROPS
    family), the MEAN-SHIFT companion of the rank-based ``pettitt_test``.
    For ordered x_1..x_n and split after position p, the SSE reduction is
    S_L²/n_L + S_R²/n_R − S²/n (S = segment sums) — variance terms cancel,
    so only running sums are needed.

    ``x_col`` must be an exact DECIMAL: prefix sums come off ONE
    cumulative window pass (exact), the gain is derived in double with
    one expression shape, rounded to 6, and the argmax breaks ties on the
    earliest boundary — fully deterministic. Cardinality is the series
    grain. Keys with n < 2 emit a NULL-boundary row (the pettitt NULL-row
    convention: the key is visible, the split is undefined). Returns
    (key, split_t, n_left, n_right, mean_left, mean_right, gain)."""
    w = Window.partitionBy("k").orderBy("t")
    wk = Window.partitionBy("k")
    # lineage cut: base feeds both the split window chain and the
    # singleton rollup (shared-subtree double-scan otherwise)
    base = df.select(
        F.col(key_col).alias("k"), F.col(t_col).alias("t"), F.col(x_col).alias("x")
    ).transform(lineage_cut)
    cum = base.select(
        "k",
        "t",
        F.row_number().over(w).alias("_p"),
        F.sum("x").over(w).alias("_sl"),
        F.count(F.lit(1)).over(wk).alias("_n"),
        F.sum("x").over(wk).alias("_s"),
    )
    nl = F.col("_p").cast("double")
    nr = (F.col("_n") - F.col("_p")).cast("double")
    sl = F.col("_sl").cast("double")
    sr = (F.col("_s") - F.col("_sl")).cast("double")
    st = F.col("_s").cast("double")
    gain = F.round(
        sl * sl / nl + sr * sr / nr - st * st / F.col("_n").cast("double"), 6
    )
    splits = cum.filter(F.col("_p") < F.col("_n")).select(
        "k",
        "t",
        "_p",
        "_n",
        gain.alias("_gain"),
        F.round(sl / nl, 6).alias("_ml"),
        F.round(sr / nr, 6).alias("_mr"),
    )
    pick = Window.partitionBy("k").orderBy(F.col("_gain").desc(), F.col("t").asc())
    best = splits.withColumn("_rn", F.row_number().over(pick)).filter(
        F.col("_rn") == 1
    )
    singletons = (
        base.groupBy("k")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") < 2)
        .select(
            "k",
            F.lit(None).cast("string").alias("split_t"),
            F.lit(None).cast("long").alias("n_left"),
            F.lit(None).cast("long").alias("n_right"),
            F.lit(None).cast("double").alias("mean_left"),
            F.lit(None).cast("double").alias("mean_right"),
            F.lit(None).cast("double").alias("gain"),
        )
    )
    return best.select(
        "k",
        F.col("t").cast("string").alias("split_t"),
        F.col("_p").cast("long").alias("n_left"),
        (F.col("_n") - F.col("_p")).cast("long").alias("n_right"),
        F.col("_ml").alias("mean_left"),
        F.col("_mr").alias("mean_right"),
        F.col("_gain").alias("gain"),
    ).unionByName(singletons).withColumnRenamed("k", key_col)


def binseg_oracle_sql(base_cte: str, key_name: str = "k") -> str:
    """DuckDB mirror of :func:`binseg_mean_shift`. ``base_cte`` exposes
    (k, t, x) with x the SAME exact decimal as the Spark side."""
    return f"""
WITH base AS ({base_cte}),
cum AS (
  SELECT k, t,
         CAST(row_number() OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS p,
         sum(x) OVER (PARTITION BY k ORDER BY t) AS sl,
         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
         sum(x) OVER (PARTITION BY k) AS s
  FROM base
), splits AS (
  SELECT k, t, p, n,
    round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(p AS DOUBLE)
        + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE) / CAST(n - p AS DOUBLE)
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gain,
    round(CAST(sl AS DOUBLE) / CAST(p AS DOUBLE), 6) AS ml,
    round(CAST(s - sl AS DOUBLE) / CAST(n - p AS DOUBLE), 6) AS mr
  FROM cum WHERE p < n
), best AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY gain DESC, t ASC) AS rn
  FROM splits
)
SELECT k AS {key_name}, CAST(t AS VARCHAR) AS split_t, p AS n_left,
       n - p AS n_right, ml AS mean_left, mr AS mean_right, gain
FROM best WHERE rn = 1
UNION ALL
SELECT k, NULL, NULL, NULL, NULL, NULL, NULL
FROM base GROUP BY 1 HAVING count(*) < 2
"""


def bollinger_bands(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    v_col: str,
    window: int = 7,
    k: float = 2.0,
    min_periods: int = 3,
) -> DataFrame:
    """Bollinger bands over an ordered series: mean ± ``k``·σ (population)
    of the ``window`` rows STRICTLY BEFORE each point, plus a breakout
    flag for the point itself.

    The volatility-band companion of :func:`weighted_moving_avg` /
    :func:`ewma_control_chart` — bands ADAPT to local variance instead of
    a fixed z or EWMA limit. Reference parity: the same
    threshold-over-rolling-stats shape as the volume-anomaly dbt test
    (``assert_row_count_anomaly.sql``), with a variance-scaled band. The
    frame EXCLUDES the current row deliberately: a spike inside its own
    band inflates σ, and with the row included the maximum attainable
    |z| is (n−1)/√n — a k=2 band over a ≤5-row window could never fire.
    Rows with fewer than ``min_periods`` history rows are dropped (the
    band is meaningless on an empty/1-row history).

    Determinism discipline: ``v_col`` must be an exact DECIMAL; Σx and
    Σx² fold as DECIMAL over the trailing frame (exact, order-free), and
    every float appears only in the final mean/var/sqrt expressions,
    whose SHAPE is mirrored verbatim in :func:`bollinger_oracle_sql` —
    both engines run the identical IEEE ops on identical exact inputs,
    so even the unrounded band COMPARISON (the breakout flag) is
    cross-engine stable. One window pass over the series partitioning;
    no join, no Python. At 100 TB this rides the (key, day) grain —
    cardinality |keys|·|days|, never the event grain.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_periods < 1:
        raise ValueError("min_periods must be >= 1")
    kf = float(k)
    v = F.col(v_col)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(t_col).asc())
        .rowsBetween(-window, -1)
    )
    n = F.count(F.lit(1)).over(w).cast("long")
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s.cast("double") / n.cast("double")
    var = ss.cast("double") / n.cast("double") - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    upper = mean + F.lit(kf) * sd
    lower = mean - F.lit(kf) * sd
    breakout = (
        F.when(v.cast("double") > upper, F.lit(1))
        .when(v.cast("double") < lower, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return df.select(
        *key_cols,
        F.col(t_col),
        v.cast("double").alias("v"),
        n.alias("n_window"),
        F.round(mean, 6).alias("ma"),
        F.round(sd, 6).alias("sd"),
        F.round(upper, 6).alias("upper_band"),
        F.round(lower, 6).alias("lower_band"),
        breakout.cast("int").alias("breakout"),
    ).filter(F.col("n_window") >= min_periods)


def bollinger_oracle_sql(
    base_cte: str,
    window: int = 7,
    k: float = 2.0,
    key_name: str = "k",
    min_periods: int = 3,
) -> str:
    """DuckDB mirror of :func:`bollinger_bands` (same IEEE shapes).

    ``base_cte`` must yield columns ``k`` (key), ``t`` (order key,
    unique per key) and ``x`` (exact DECIMAL value).
    """
    kf = float(k)
    return f"""
WITH base AS ({base_cte}),
win AS (
  SELECT k, t, x,
    CAST(count(*) OVER w AS BIGINT) AS n,
    sum(x) OVER w AS s,
    sum(x * x) OVER w AS ss
  FROM base
  WINDOW w AS (PARTITION BY k ORDER BY t ASC
               ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING)
),
bands AS (
  SELECT k, t, x, n,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
    CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
  FROM win
  WHERE n >= {min_periods}
)
SELECT k AS {key_name}, t, CAST(x AS DOUBLE) AS v, n AS n_window,
  round(mean, 6) AS ma,
  round(sqrt(greatest(var, 0.0)), 6) AS sd,
  round(mean + {kf!r} * sqrt(greatest(var, 0.0)), 6) AS upper_band,
  round(mean - {kf!r} * sqrt(greatest(var, 0.0)), 6) AS lower_band,
  CAST(CASE WHEN CAST(x AS DOUBLE) > mean + {kf!r} * sqrt(greatest(var, 0.0)) THEN 1
            WHEN CAST(x AS DOUBLE) < mean - {kf!r} * sqrt(greatest(var, 0.0)) THEN -1
            ELSE 0 END AS INTEGER) AS breakout
FROM bands
"""


def haar_detail_energy(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    v_col: str,
    levels: int = 4,
    dec_type: str = "decimal(18,2)",
) -> DataFrame:
    """Multi-resolution Haar wavelet energy decomposition of an ordered
    series: per key, the first ``2^levels`` observations transform
    through ``levels`` rounds of pairwise sums (approximation) and
    signed differences (detail); the output is each level's detail
    ENERGY — which time scales carry the series' variation, the
    time-domain companion of :func:`periodogram` (frequency) and
    :func:`acf_profile` (lag).

    Exactness: the transform is UN-normalized (integer ±1 coefficients,
    pure DECIMAL addition — no √2 anywhere), so every coefficient is
    exact; the conventional 1/2^level normalization is applied to the
    final energy as one float division per level.

    Quantization/overflow contract: inputs are cast to ``dec_type``
    (default ``decimal(18,2)``) — values with a finer scale are
    QUANTIZED at the cast, and a level sum that overflows the type
    yields NULL in Spark while a mirrored DuckDB oracle ERRORS. Pass a
    ``dec_type`` wide enough for ``2^levels`` summed inputs at the
    source scale (and the matching precision/scale to
    :func:`haar_oracle_sql`); level-``levels`` approximation sums reach
    ``2^levels · max|v|``. Each level is one
    aggregate on the halved index (``DIV 2`` — integer), and the whole
    transform touches only the first 2^levels rows per key —
    calendar-sized however big the event table is. Keys shorter than
    2^levels rows are dropped (both engines agree on the cutoff).

    Returns (keys…, level 1..levels, n_coeffs, detail_energy) where
    level 1 is the finest scale.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    need = 1 << levels
    keys = list(key_cols)
    w_key = Window.partitionBy(*keys)
    base = df.select(
        *keys,
        (F.row_number().over(w_key.orderBy(F.col(t_col).asc())) - 1).alias("_i"),
        F.count(F.lit(1)).over(w_key).cast("long").alias("_n"),
        F.col(v_col).cast(dec_type).alias("_x"),
    ).filter((F.col("_n") >= need) & (F.col("_i") < need))
    cur = base.select(*keys, "_i", "_x")
    outs = []
    for lvl in range(1, levels + 1):
        nxt = (
            cur.groupBy(*keys, F.expr("_i DIV 2").alias("_h"))
            .agg(
                F.sum("_x").cast(dec_type).alias("_a"),
                F.sum(
                    F.when(F.col("_i") % 2 == 0, F.col("_x")).otherwise(-F.col("_x"))
                )
                .cast(dec_type)
                .alias("_d"),
            )
            .transform(lineage_cut)
        )
        outs.append(
            nxt.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_coeffs"),
                F.round(
                    F.sum(F.col("_d") * F.col("_d")).cast("double")
                    / F.lit(float(1 << lvl)),
                    6,
                ).alias("detail_energy"),
            )
            .select(
                *keys,
                F.lit(lvl).cast("int").alias("level"),
                "n_coeffs",
                "detail_energy",
            )
        )
        cur = nxt.select(*keys, F.col("_h").alias("_i"), F.col("_a").alias("_x"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def haar_oracle_sql(
    base_cte: str,
    levels: int = 4,
    key_name: str = "k",
    precision: int = 18,
    scale: int = 2,
) -> str:
    """DuckDB mirror of :func:`haar_detail_energy` — pass the SAME
    decimal ``precision``/``scale`` as the operator's ``dec_type``.
    ``base_cte`` yields (k, t, x DECIMAL). Level CTEs materialize
    (DuckDB otherwise inlines the whole chain into every union branch);
    the detail square casts one operand to DECIMAL(precision+1, scale)
    to force INT128 (the round-8 overflow note)."""
    need = 1 << levels
    wide = precision + 1
    parts = [
        f"""WITH daily AS ({base_cte}),
idx AS (
  SELECT k, row_number() OVER (PARTITION BY k ORDER BY t ASC) - 1 AS i,
         count(*) OVER (PARTITION BY k) AS n, x
  FROM daily
),
b0 AS MATERIALIZED (
  SELECT k, i, CAST(x AS DECIMAL({precision},{scale})) AS x
  FROM idx WHERE n >= {need} AND i < {need}
)"""
    ]
    prev = "b0"
    for lvl in range(1, levels + 1):
        parts.append(
            f""",
l{lvl} AS MATERIALIZED (
  SELECT k, i // 2 AS i,
    CAST(sum(x) AS DECIMAL({precision},{scale})) AS x,
    CAST(sum(CASE WHEN i % 2 = 0 THEN x ELSE -x END) AS DECIMAL({precision},{scale})) AS d
  FROM {prev} GROUP BY 1, 2
)"""
        )
        prev = f"l{lvl}"
    branches = [
        f"""SELECT k AS {key_name}, CAST({lvl} AS INTEGER) AS level,
  CAST(count(*) AS BIGINT) AS n_coeffs,
  round(CAST(sum(CAST(d AS DECIMAL({wide},{scale})) * d) AS DOUBLE) / {float(1 << lvl)!r}, 6)
    AS detail_energy
FROM l{lvl} GROUP BY 1"""
        for lvl in range(1, levels + 1)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(branches))
    return "".join(parts)


def pacf_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Partial autocorrelation at lags 1..3 via the Durbin–Levinson
    recursion — the AR-order fingerprint next to :func:`acf_profile`
    (ACF says "correlated at lag k"; PACF says "correlated at lag k
    AFTER removing shorter lags", which is what picks an AR(p)).

    Builds on the ACF's own cross-engine contract: the recursion runs on
    the ROUNDED (6 dp) r₁..r₃ that :func:`acf_profile` already emits
    identically in both engines, so every downstream float is a
    fixed-shape expression over identical inputs. Degenerate
    denominators (|r₁| = 1, etc.) yield NULL, not a crash; rounded
    outputs normalize IEEE −0.0 with ``+ 0.0``.

    Returns one row per key: (keys…, n, r1, r2, r3, pacf1, pacf2,
    pacf3).
    """
    acf = acf_profile(df, key_cols, order_col, value_col, max_lag=3)
    keys = list(key_cols)
    piv = acf.groupBy(*keys).agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("lag") == k, F.col("acf"))).alias(f"r{k}")
            for k in (1, 2, 3)
        ],
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    den2 = F.lit(1.0) - r1 * r1
    phi2 = F.when(den2 != 0.0, (r2 - r1 * r1) / den2)
    phi21 = r1 - phi2 * r1
    den3 = F.lit(1.0) - phi21 * r1 - phi2 * r2
    phi3 = F.when(den3 != 0.0, (r3 - phi21 * r2 - phi2 * r1) / den3)
    return piv.select(
        *keys,
        "n",
        "r1",
        "r2",
        "r3",
        r1.alias("pacf1"),
        (F.round(phi2, 6) + F.lit(0.0)).alias("pacf2"),
        (F.round(phi3, 6) + F.lit(0.0)).alias("pacf3"),
    )


def pacf_oracle_sql(acf_sql: str, key_name: str = "k") -> str:
    """DuckDB mirror of :func:`pacf_profile` over an ACF relation
    (``acf_sql`` must yield (<key_name>, lag, n, n_pairs, acf) — pass
    the registered ACF query's own oracle)."""
    return f"""
WITH acf AS ({acf_sql}),
piv AS (
  SELECT {key_name} AS k, max(n) AS n,
    max(CASE WHEN lag = 1 THEN acf END) AS r1,
    max(CASE WHEN lag = 2 THEN acf END) AS r2,
    max(CASE WHEN lag = 3 THEN acf END) AS r3
  FROM acf GROUP BY 1
),
dl AS (
  SELECT k, n, r1, r2, r3,
    CASE WHEN 1.0 - r1 * r1 <> 0.0
         THEN (r2 - r1 * r1) / (1.0 - r1 * r1) END AS phi2
  FROM piv
),
dl2 AS (
  SELECT *, r1 - phi2 * r1 AS phi21 FROM dl
)
SELECT k AS {key_name}, CAST(n AS BIGINT) AS n, r1, r2, r3,
  r1 AS pacf1,
  round(phi2, 6) + 0.0 AS pacf2,
  CASE WHEN 1.0 - phi21 * r1 - phi2 * r2 <> 0.0
       THEN round((r3 - phi21 * r2 - phi2 * r1)
            / (1.0 - phi21 * r1 - phi2 * r2), 6) + 0.0 END AS pacf3
FROM dl2
"""


def granger_lag1(
    df: DataFrame,
    key_cols: Sequence[str],
    t_col: str,
    y_col: str,
    x_col: str,
) -> DataFrame:
    """Lag-1 Granger-causality F-test per key: does x's past improve the
    prediction of y beyond y's own past? Unrestricted
    ``y_t = b0 + b1·y_{t−1} + b2·x_{t−1}`` vs restricted
    ``y_t = a0 + a1·y_{t−1}``; F = (SSE_r − SSE_u) / (SSE_u/(n−3)) with
    (1, n−3) degrees of freedom. The causal-direction companion of
    :func:`ccf_profile` (which only measures lagged correlation).

    Both models solve in closed form from ONE set of exact decimal sums
    (the :func:`ols_two_feature` width discipline — every product stays
    inside decimal(38,_)); the lag is one window over the unique time
    key; every float is a fixed-shape expression mirrored in the oracle.
    SSEs use the OLS-optimum identity. Degenerate keys (n < 4, singular
    normal matrix, zero residual variance) yield NULL F, never a
    blow-up. Returns (keys…, n_obs, b1_y, b2_x, sse_u, sse_r, f_stat).
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(t_col).asc())
    lagged = df.select(
        *keys,
        F.col(y_col).alias("_yraw"),
        F.lag(F.col(y_col)).over(w).alias("_ylag"),
        F.lag(F.col(x_col)).over(w).alias("_xlag"),
    ).filter(F.col("_ylag").isNotNull() & F.col("_xlag").isNotNull())
    x1 = F.col("_ylag").cast("decimal(16,4)")
    x2 = F.col("_xlag").cast("decimal(16,4)")
    y = F.col("_yraw").cast("decimal(18,4)")
    big = "decimal(38,8)"
    agg = lagged.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).alias("_s1"),
        F.sum(x2).alias("_s2"),
        F.sum(y).alias("_sy"),
        F.sum((x1 * x1).cast(big)).alias("_s11"),
        F.sum((x2 * x2).cast(big)).alias("_s22"),
        F.sum((x1 * x2).cast(big)).alias("_s12"),
        F.sum((x1 * y).cast(big)).alias("_s1y"),
        F.sum((x2 * y).cast(big)).alias("_s2y"),
        F.sum((y * y).cast(big)).alias("_syy"),
    )
    n = F.col("n").cast("double")
    s1, s2, sy = (F.col(c).cast("double") for c in ("_s1", "_s2", "_sy"))
    # FLOOR the PRODUCT sums before the double cast: their scale-8
    # unscaled values exceed 2^53 at gate scales, where the two engines'
    # decimal→double rounding can differ by 1 ulp — harmless alone, but
    # detr = n·s11 − s1² CANCELS, amplifying that ulp ~300× into the
    # restricted SSE (caught at sf0.1). floor() has identical toward-−∞
    # semantics in both engines (a decimal(22,0) narrowing does NOT:
    # Spark rounds HALF_UP, DuckDB truncates — also caught here), and
    # the floored integer is < 2^53 so the double cast is exact. The
    # dropped sub-unit fraction is ~1e-15 relative at this magnitude.
    s11, s22, s12 = (
        F.floor(F.col(c)).cast("double") for c in ("_s11", "_s22", "_s12")
    )
    s1y, s2y, syy = (
        F.floor(F.col(c)).cast("double") for c in ("_s1y", "_s2y", "_syy")
    )
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    sse_u = syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y)
    detr = n * s11 - s1 * s1
    a1 = (n * s1y - s1 * sy) / detr
    a0 = (sy - a1 * s1) / n
    sse_r = syy - a0 * sy - a1 * s1y
    ok = (F.col("n") >= 4) & (det != 0) & (detr != 0)
    f_ok = ok & (sse_u > 0)
    f_stat = (sse_r - sse_u) / (sse_u / (n - F.lit(3.0)))
    return agg.select(
        *keys,
        F.col("n").alias("n_obs"),
        F.round(F.when(ok, det1 / det), 6).alias("b1_y"),
        F.round(F.when(ok, det2 / det), 6).alias("b2_x"),
        (F.round(F.when(ok, sse_u), 6) + F.lit(0.0)).alias("sse_u"),
        (F.round(F.when(ok, sse_r), 6) + F.lit(0.0)).alias("sse_r"),
        (F.round(F.when(f_ok, f_stat), 6) + F.lit(0.0)).alias("f_stat"),
    )


def pinball_loss_scorecard(
    pairs: DataFrame,
    key_cols: Sequence[str],
    actual_col: str,
    forecast_col: str,
    quantiles: Sequence[float] = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Pinball (quantile) loss of a point forecast read as each requested
    quantile: L_q = q·(a−f)⁺ + (1−q)·(f−a)⁺, averaged per key — the
    quantile-forecast member of the evaluation family
    (:func:`forecast_errors` grades the mean, the conformal audit grades
    the interval, this grades asymmetric over/under-forecasting: a
    forecaster that systematically under-predicts scores badly at q=0.9).

    Exactness: residuals are DECIMAL differences; each q is a Python
    literal interpolated into BOTH engines, and q·r folds as
    round-then-decimal (9 dp) so the per-key mean is order-independent.
    One map-side aggregate; output grain |keys|·|quantiles|.
    Returns (keys…, q, n_pairs, pinball_loss).
    """
    qs = [float(q) for q in quantiles]
    if not qs or any(not (0.0 < q < 1.0) for q in qs):
        raise ValueError("quantiles must be in (0, 1)")
    keys = list(key_cols)
    r = F.col(actual_col) - F.col(forecast_col)
    base = pairs.select(*keys, r.alias("_r"))
    over = F.when(F.col("_r") > 0, F.col("_r")).otherwise(F.lit(0)).cast("double")
    under = F.when(F.col("_r") < 0, -F.col("_r")).otherwise(F.lit(0)).cast("double")
    aggs = []
    for i, q in enumerate(qs):
        term = F.round(F.lit(q) * over + F.lit(1.0 - q) * under, 9).cast(
            "decimal(28,9)"
        )
        aggs.append(F.sum(term).alias(f"_l{i}"))
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"), *aggs
    )
    stacked = agg.select(
        *keys,
        "n_pairs",
        F.expr(
            "stack({}, {})".format(
                len(qs),
                ", ".join(f"CAST({q!r} AS DOUBLE), _l{i}" for i, q in enumerate(qs)),
            )
        ).alias("q", "_l"),
    )
    return stacked.select(
        *keys,
        "q",
        "n_pairs",
        F.round(
            F.col("_l").cast("double") / F.col("n_pairs").cast("double"), 6
        ).alias("pinball_loss"),
    )
