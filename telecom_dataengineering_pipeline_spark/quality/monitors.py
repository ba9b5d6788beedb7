"""Observability monitors (reference ``monitoring/pipeline_observability.py``).

Statistical drift/freshness monitors as Spark aggregations. Each returns a
small summary DataFrame (or plain dataclass) — the HEALTHY/DEGRADED/BLOCKED
rollup the reference builds (pipeline_observability.py:326-364) is a fold
over these.

Scale notes: cardinality uses ``approx_count_distinct`` by default (HLL —
one pass, mergeable, no giant exact-distinct shuffle at 100 TB); callers can
request exact for small dims. Null-rate and volume monitors are single
aggregates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..lineage import lineage_cut


def volume_zscore(df: DataFrame, date_col: str, z_threshold: float = 3.0) -> DataFrame:
    """Daily row counts with z-scores vs the table's own history
    (pipeline_observability.py:92-139)."""
    daily = df.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    n = F.col("n")
    cnt = F.count(F.lit(1))
    stats = daily.agg(
        (F.sum(n).cast("double") / cnt).alias("mean_n"),
        F.sqrt(
            (F.sum(n * n).cast("double") - F.sum(n).cast("double") * F.sum(n) / cnt) / (cnt - 1)
        ).alias("sd_n"),
    )
    z = (F.col("n") - F.col("mean_n")) / F.col("sd_n")
    return daily.crossJoin(F.broadcast(stats)).select(
        "d",
        "n",
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def null_rate_drift(
    df: DataFrame, cols: Sequence[str], baseline: Mapping[str, float], tolerance: float = 0.05
) -> DataFrame:
    """Per-column null rate vs a stored baseline, ±tolerance
    (pipeline_observability.py:150-173). One aggregate for all columns."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(c))
    rates = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = rates.selectExpr(f"stack({len(cols)}, {stack_expr}) as (column_name, null_rate)")
    base = F.create_map(*[x for c in cols for x in (F.lit(c), F.lit(float(baseline.get(c, 0.0))))])
    return long.select(
        "column_name",
        F.round("null_rate", 6).alias("null_rate"),
        F.round(base[F.col("column_name")], 6).alias("baseline_rate"),
        (F.abs(F.col("null_rate") - base[F.col("column_name")]) > tolerance).alias("drifted"),
    )


def cardinality_drift(
    df: DataFrame,
    cols: Sequence[str],
    baseline: Mapping[str, int],
    tolerance_pct: float = 20.0,
    exact: bool = False,
) -> DataFrame:
    """Distinct-count drift vs baseline ±pct (pipeline_observability.py:175-205).
    HLL (approx_count_distinct) by default — the only sane choice at 100 TB;
    ``exact=True`` for small dimensions."""
    agg_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [agg_fn(c).alias(c) for c in cols]
    counts = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = counts.selectExpr(f"stack({len(cols)}, {stack_expr}) as (column_name, distinct_count)")
    base = F.create_map(*[x for c in cols for x in (F.lit(c), F.lit(int(baseline.get(c, 0))))])
    pct = F.when(
        base[F.col("column_name")] > 0,
        F.abs(F.col("distinct_count") - base[F.col("column_name")])
        * 100.0
        / base[F.col("column_name")],
    )
    return long.select(
        "column_name",
        "distinct_count",
        base[F.col("column_name")].alias("baseline_count"),
        F.round(pct, 2).alias("drift_pct"),
        (pct > tolerance_pct).alias("drifted"),
    )


def freshness(
    df: DataFrame, ts_col: str, sla_seconds: Mapping[str, int] | int, group_col: str | None = None
) -> DataFrame:
    """Staleness vs the table's high-water mark, optionally per group
    (pipeline_observability.py:52-87). SLA breach is relative to max(ts) so
    the monitor is reproducible on static fixtures; production callers pass
    a clock column instead."""
    if group_col is None:
        agg = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("max_us"))
        sla = sla_seconds if isinstance(sla_seconds, int) else max(sla_seconds.values())
        return agg.select(
            F.timestamp_micros(F.col("max_us")).alias("latest_ts"),
            F.lit(sla).alias("sla_seconds"),
        )
    per = df.groupBy(group_col).agg(F.max(F.unix_micros(F.col(ts_col))).alias("max_us"))
    hwm = per.agg(F.max("max_us").alias("global_us"))
    lag_s = F.floor((F.col("global_us") - F.col("max_us")) / 1_000_000).cast("long")
    default_sla = sla_seconds if isinstance(sla_seconds, int) else 0
    sla_map = (
        F.create_map(
            *[x for k, v in sla_seconds.items() for x in (F.lit(k), F.lit(int(v)))]
        )
        if isinstance(sla_seconds, Mapping)
        else None
    )
    sla_col = (
        F.coalesce(sla_map[F.col(group_col)], F.lit(default_sla))
        if sla_map is not None
        else F.lit(default_sla)
    )
    return per.crossJoin(F.broadcast(hwm)).select(
        group_col,
        F.timestamp_micros(F.col("max_us")).alias("latest_ts"),
        lag_s.alias("lag_seconds"),
        sla_col.alias("sla_seconds"),
        (lag_s > sla_col).alias("sla_breached"),
    )


@dataclass
class SchemaDriftReport:
    removed: list[str]
    added: list[str]
    type_changed: list[tuple[str, str, str]]

    @property
    def status(self) -> str:
        """Reference policy (pipeline_observability.py:210-277): removed =
        CRITICAL, type change = WARNING, added = INFO."""
        if self.removed:
            return "CRITICAL"
        if self.type_changed:
            return "WARNING"
        if self.added:
            return "INFO"
        return "OK"


def schema_drift(baseline: Mapping[str, str], current: DataFrame) -> SchemaDriftReport:
    """U2: set comparison of {column: type} vs the live DataFrame schema."""
    cur = {f.name: f.dataType.simpleString() for f in current.schema.fields}
    removed = sorted(set(baseline) - set(cur))
    added = sorted(set(cur) - set(baseline))
    changed = sorted(
        (c, baseline[c], cur[c]) for c in set(baseline) & set(cur) if baseline[c] != cur[c]
    )
    return SchemaDriftReport(removed=removed, added=added, type_changed=changed)


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Partition-skew diagnostics for a prospective shuffle key: the top-k
    heaviest keys with their share and cumulative share of all rows — the
    report that decides between a plain, salted, or AQE-skew-split plan
    BEFORE the expensive job runs. One map-side-combined count per key,
    top-k via TakeOrderedAndProject, a 1-row total broadcast onto k rows;
    the base table is scanned once and only the key column."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("long").alias("_total"))
    top = counts.orderBy(F.col("n").desc(), F.col(key_col).asc()).limit(top_k)
    w = (
        Window.orderBy(F.col("n").desc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(Window.orderBy(F.col("n").desc(), F.col(key_col).asc())).cast("int"))
        .select(
            "rank",
            F.col(key_col).cast("string").alias("key"),
            "n",
            F.round(F.col("n").cast("double") / F.col("_total"), 6).alias("share"),
            F.round(F.sum("n").over(w).cast("double") / F.col("_total"), 6).alias("cum_share"),
        )
    )


def psi_drift(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    warn: float = 0.1,
    alert: float = 0.25,
) -> DataFrame:
    """Population Stability Index between a reference window and the
    current window of a numeric column — the standard model/feature drift
    score (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major shift).

    Buckets are EQUAL-WIDTH over the reference's [min, max] (plus open
    edge buckets), so bucketing is a pure column expression from one
    broadcast 2-value aggregate — no quantile pass, no sort. Both sides
    aggregate map-side to n_buckets+2 cells; the PSI sum runs over that
    tiny cell table. Zero-count cells get the usual 1e-6 floor so the log
    term stays finite. Scale: two scans (one per side), everything else is
    metadata-sized.

    Returns one row: (psi, n_ref, n_cur, status) with per-bucket detail
    available by the same construction — kept scalar here because the
    monitor rollup consumes scalars.
    """
    bounds = reference.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    )

    def bucketize(df: DataFrame) -> DataFrame:
        v = F.col(value_col).cast("double")
        width = (F.col("hi") - F.col("lo")) / n_buckets
        # v == hi (the reference max itself) belongs in the TOP interior
        # bucket, not the overflow bucket; the least() clamp both enforces
        # that and guards float rounding at interior boundaries.
        b = F.when(v < F.col("lo"), F.lit(-1)).when(
            v > F.col("hi"), F.lit(n_buckets)
        ).otherwise(
            F.least(
                F.floor((v - F.col("lo")) / width).cast("int"),
                F.lit(n_buckets - 1),
            )
        )
        return (
            df.filter(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(bounds))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    ref = bucketize(reference).withColumnRenamed("n", "n_ref")
    cur = bucketize(current).withColumnRenamed("n", "n_cur")
    cells = ref.join(cur, "bucket", "full_outer").na.fill(
        {"n_ref": 0, "n_cur": 0}
    )
    totals = cells.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(1e-6))
    q = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(1e-6))
    # Round-then-decimal-sum (9 dp): each log term is a deterministic
    # double, but a double SUM depends on partition order — the decimal
    # accumulation is exact and order-independent, so the PSI itself is
    # reproducible bit-for-bit (and cross-engine comparable).
    term = F.round((q - p) * F.log(q / p), 9).cast("decimal(28,9)")
    out = (
        cells.crossJoin(F.broadcast(totals))
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("psi"),
            F.first("t_ref").alias("n_ref"),
            F.first("t_cur").alias("n_cur"),
        )
    )
    # A window with no (non-null) data is "no baseline / no signal", never
    # a shift verdict — without this, an empty reference floors p to 1e-6
    # everywhere and mints a huge, meaningless PSI.
    status = (
        F.when(
            F.col("psi").isNull()
            | (F.coalesce(F.col("n_ref"), F.lit(0)) == 0)
            | (F.coalesce(F.col("n_cur"), F.lit(0)) == 0),
            "no_reference",
        )
        .when(F.col("psi") < warn, "stable")
        .when(F.col("psi") < alert, "moderate_shift")
        .otherwise("major_shift")
    )
    return out.select("psi", "n_ref", "n_cur", status.alias("status"))


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-data / unit-mixing screen for financial columns.
    One map-side-combined count over 9 cells; the expected shares
    log10(1 + 1/d) are embedded as Python-computed literals so both
    engines compare against the IDENTICAL doubles. Only strictly
    positive values have a first significant digit; the rest are
    excluded (their count is visible as n_total − Σn).

    Returns 9 rows: (digit, n, share, expected, deviation) with share
    and deviation rounded to 6 — plus the caller can sum |deviation| for
    a single MAD score (kept per-digit here because the monitor rollup
    wants to SEE which digit is off)."""
    import math

    v = F.col(value_col).cast("double")
    # first significant digit of v > 0: shift the decimal point so the
    # value lands in [1, 10) and truncate — pure column arithmetic
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    counts = (
        df.filter(v > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    # All 9 digits present even when a digit never occurs (its absence IS
    # the signal): a tiny literal spine outer-joins the observed counts.
    spine = counts.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    expected = F.lit(None).cast("double")
    for d in range(9, 0, -1):
        expected = F.when(F.col("digit") == d, F.lit(math.log10(1 + 1 / d))).otherwise(
            expected
        )
    # The grand total as an unpartitioned window over the NINE joined rows
    # — not counts.agg(...) joined back, which would re-evaluate the
    # counts subtree (two full input scans; Spark does not dedupe shared
    # subtrees). The single-partition window holds ≤ 9 rows at any input
    # size; missing digits contribute their filled 0.
    from pyspark.sql import Window

    return (
        spine.join(counts, "digit", "left")
        .na.fill({"n": 0})
        .withColumn("_t", F.sum("n").over(Window.partitionBy()).cast("long"))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("_t"), 6).alias("share"),
            F.round(expected, 6).alias("expected_share"),
            F.round(
                F.col("n").cast("double") / F.col("_t") - expected, 6
            ).alias("deviation"),
        )
    )


def robust_outlier_profile(
    df: DataFrame,
    value_col: str,
    z_thresh: float = 3.5,
    accuracy: int = 10000,
) -> DataFrame:
    """Median/MAD robust outlier screen (Iglewicz–Hoaglin modified
    z-score): |0.6745·(x − median)| / MAD > ``z_thresh`` flags outliers
    without the mean/stddev's own sensitivity to them — the screen the
    z-score monitor (A8) can't provide on heavy-tailed columns.

    Scale shape: two scalar percentile-sketch aggregates (median, then
    median of |x − median|) and one counting pass, each a map-side-
    combined aggregate whose SinglePartition merge carries one bounded
    sketch per input partition — never a global sort. Three passes over
    the input are inherent to nested medians; callers at the 100 TB tier
    materialize the (usually post-aggregate) input once. The sketch is
    rank-exact while accuracy ≫ n, where the result equals the value at
    rank ⌈n/2⌉ (what a SQL oracle computes with row_number).

    Returns ONE row: (n, median, mad, n_outliers, outlier_rate). A zero
    MAD (> half the values identical) yields NULL outlier stats rather
    than a division blow-up — that degenerate shape is its own signal."""
    v = F.col(value_col).cast("double")
    med = df.agg(
        F.percentile_approx(v, F.lit(0.5), F.lit(accuracy)).alias("_med")
    )
    dev = df.crossJoin(F.broadcast(med))
    mad = dev.agg(
        F.percentile_approx(F.abs(v - F.col("_med")), F.lit(0.5), F.lit(accuracy)).alias("_mad"),
        F.first("_med").alias("_med"),
    )
    scored = df.crossJoin(F.broadcast(mad))
    z = F.lit(0.6745) * F.abs(v - F.col("_med")) / F.col("_mad")
    is_out = F.when(F.col("_mad") > 0, (z > z_thresh).cast("int"))
    return scored.agg(
        F.count(v).cast("long").alias("n"),
        F.round(F.first("_med"), 6).alias("median"),
        F.round(F.first("_mad"), 6).alias("mad"),
        F.sum(is_out).cast("long").alias("n_outliers"),
        F.round(F.sum(is_out).cast("double") / F.count(v), 6).alias("outlier_rate"),
    )


def grouped_quantile_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantile bands (P25/P50/P75/P90 by default) — the
    distribution monitor at the group grain the global quantile sketch
    (A11) can't see: a tail regression inside one event type hides in
    the global profile but moves its own band immediately.

    One map-side-combined sketch aggregate per group — group sketches
    merge associatively, so the single shuffle carries one bounded
    sketch per (partition, group), never raw values. Rank-exact while
    accuracy ≫ group size (the oracle regime). Returns one row per
    group: (*group_cols, n, q_25, q_50, ... as column-per-prob)."""
    v = F.col(value_col).cast("double")
    aggs = [F.count(v).cast("long").alias("n")]
    # Column names derive from an integer percent basis: q_25/q_50/q_90,
    # q_100 for p=1.0 — never a dot in the name (backtick-free selects),
    # never ambiguous. Probs are validated to two decimals so distinct
    # probs can't collide on a name.
    for p in probs:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"quantile prob out of (0, 1]: {p}")
        pct = round(p * 100)
        if abs(p * 100 - pct) > 1e-9:
            raise ValueError(f"quantile probs must have <= 2 decimals: {p}")
        name = f"q_{int(pct):02d}"
        aggs.append(
            F.percentile_approx(v, F.lit(p), F.lit(accuracy)).alias(name)
        )
    return df.groupBy(*group_cols).agg(*aggs)


def ks_two_sample(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bucket_width: float,
    alpha_c: float = 1.358,  # c(α) for α=0.05
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic, bucketized: D =
    max |ECDF_ref − ECDF_cur| evaluated at bucket boundaries (buckets of
    ``bucket_width`` over the value). PSI (:func:`psi_drift`) needs a
    binning CHOICE and reacts to mass reallocation; KS is binning-robust
    in the limit and reacts to any CDF separation — the pair covers each
    other's blind spots.

    Scale shape: the textbook KS needs a global sort of the pooled
    samples — a SinglePartition non-starter. Bucketizing first reduces
    each side to one map-side-combined count per bucket; the cumulative
    ECDFs then run as a window over the BUCKET relation (cardinality =
    value range / width, thousands not billions), so the only ordered
    pass is metadata-sized. The quantized D is exact at bucket
    boundaries and under-estimates the true D by at most the largest
    single-bucket mass — pick ``bucket_width`` like a histogram bin.

    Determinism: cumulative counts are INTEGERS (exact, any engine);
    the ECDF divisions and the threshold ``c(α)·sqrt((n+m)/(n·m))``
    follow the same expression shape in both engines with c(α) a
    Python literal. Returns ONE row: (d_stat, at_bucket, n_ref, n_cur,
    threshold, drifted)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def bucketize(df: DataFrame, side: str) -> DataFrame:
        # NULLs carry no position on the value axis (and engines disagree
        # on NULL ordering): excluded, visible via n_ref/n_cur vs count(*)
        return (
            df.filter(F.col(value_col).isNotNull())
            .select(
                F.floor(F.col(value_col).cast("double") / F.lit(float(bucket_width)))
                .cast("long")
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_{side}"))
        )

    from pyspark.sql import Window

    both = bucketize(ref, "ref").join(bucketize(cur, "cur"), "bucket", "full").na.fill(
        {"n_ref": 0, "n_cur": 0}
    )
    w = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = both.select(
        "bucket",
        F.sum("n_ref").over(w).cast("long").alias("c_ref"),
        F.sum("n_cur").over(w).cast("long").alias("c_cur"),
    )
    totals = Window.partitionBy()
    scored = stepped.select(
        "bucket",
        "c_ref",
        "c_cur",
        F.max("c_ref").over(totals).cast("long").alias("t_ref"),
        F.max("c_cur").over(totals).cast("long").alias("t_cur"),
    ).select(
        "bucket",
        "t_ref",
        "t_cur",
        F.abs(
            F.col("c_ref").cast("double") / F.col("t_ref")
            - F.col("c_cur").cast("double") / F.col("t_cur")
        ).alias("diff"),
    )
    best = scored.select(
        F.round(F.max(F.struct(F.col("diff"), (-F.col("bucket")).alias("nb")))["diff"], 6).alias(
            "d_stat"
        ),
        (-F.max(F.struct(F.col("diff"), (-F.col("bucket")).alias("nb")))["nb"]).alias(
            "at_bucket"
        ),
        F.first("t_ref").alias("n_ref"),
        F.first("t_cur").alias("n_cur"),
    )
    thresh = F.round(
        F.lit(float(alpha_c))
        * F.sqrt(
            (F.col("n_ref") + F.col("n_cur")).cast("double")
            / (F.col("n_ref") * F.col("n_cur")).cast("double")
        ),
        6,
    )
    return best.select(
        "d_stat",
        "at_bucket",
        "n_ref",
        "n_cur",
        thresh.alias("threshold"),
        (F.col("d_stat") > thresh).alias("drifted"),
    )


def gini_concentration(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-key Gini coefficient over non-negative values — the revenue /
    traffic concentration KPI ("do 5% of customers carry 80% of load"),
    the scalar twin of :func:`key_skew_profile`'s top-k view. Rank form:
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ ascending, which is
    TIE-SAFE (permuting equal values leaves Σ i·xᵢ unchanged — no
    tie-break column needed, unlike most rank statistics).

    One exchange on the key carries both the ranking window and the
    rollup; ranks are integers and values DECIMAL-cast, so Σ i·xᵢ and Σx
    are exact and the single double division is engine-stable. Zero-sum
    keys yield NULL (concentration of nothing is not 0). Returns
    (*key_cols, n, total, gini) rounded to 6."""
    v = F.col(value_col).cast("decimal(24,6)")
    ranked = df.select(*key_cols, v.alias("_v")).withColumn(
        "_i", F.row_number().over(Window.partitionBy(*key_cols).orderBy(F.col("_v").asc())).cast("long")
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_v").alias("_s"),
        F.sum((F.col("_i") * F.col("_v")).cast("decimal(38,6)")).alias("_is"),
    )
    n = F.col("n").cast("double")
    s = F.col("_s").cast("double")
    iws = F.col("_is").cast("double")
    gini = F.when(s > 0, (2.0 * iws - (n + 1.0) * s) / (n * s))
    return agg.select(
        *key_cols,
        "n",
        F.round(s, 6).alias("total"),
        F.round(gini, 6).alias("gini"),
    )


def chi_squared_drift(
    reference: DataFrame,
    current: DataFrame,
    category_col: str,
    min_count: int = 0,
) -> DataFrame:
    """Two-sample chi-squared homogeneity test over a CATEGORICAL column —
    the categorical sibling of :func:`psi_drift` (equal-width numeric
    buckets) and :func:`ks_two_sample` (CDF separation): "did the mix of
    plan types / device models / event types shift between windows?".

    For category i with counts a_i (reference) and b_i (current) and side
    totals N_a, N_b, the homogeneity expectation is
    E_side,i = N_side · (a_i + b_i) / (N_a + N_b) and
    χ² = Σ_i (a_i − E_a,i)²/E_a,i + (b_i − E_b,i)²/E_b,i with k−1 degrees
    of freedom. The verdict uses Cramér's V = sqrt(χ² / N) (for a 2×k
    table min(r,c)−1 = 1), the sample-size-free effect size — no χ²
    distribution table needed in either engine, and the usual 0.1/0.3
    small/medium/large cuts are standard.

    Scale shape: each side reduces map-side to one count per category, so
    the only shuffled relation is (categories × 2) cells. ``min_count``
    pools categories whose COMBINED count falls below it into
    ``__other__`` BEFORE the test — the textbook low-expected-cell fix,
    and at 100 TB also the guard that keeps a high-cardinality column
    (msisdn-like) from minting a billion-row cell table: the pooled pass
    adds one more map-side-combined aggregate, never a wide shuffle.

    Determinism: counts are integers; each cell's χ² term is a
    deterministic double ROUNDED then summed as decimal (the
    :func:`psi_drift` recipe), so the statistic is partition-order-free
    and cross-engine comparable. NULL categories are a real level
    (coalesced to ``__null__``) — a drift INTO missingness is drift.

    Returns one row: (chi2, dof, n_ref, n_cur, n_categories, cramers_v,
    status); status is ``no_reference`` when either side is empty,
    ``stable`` / ``moderate_shift`` / ``major_shift`` on V < 0.1 / < 0.3 /
    else, matching the PSI verdict vocabulary."""

    def counts(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.coalesce(F.col(category_col).cast("string"), F.lit("__null__")).alias(
                    "cat"
                )
            )
            .groupBy("cat")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_{side}"))
        )

    cells = counts(reference, "ref").join(counts(current, "cur"), "cat", "full").na.fill(
        {"n_ref": 0, "n_cur": 0}
    )
    if min_count > 0:
        pooled = F.when(
            (F.col("n_ref") + F.col("n_cur")) < F.lit(int(min_count)),
            F.lit("__other__"),
        ).otherwise(F.col("cat"))
        cells = (
            cells.select(pooled.alias("cat"), "n_ref", "n_cur")
            .groupBy("cat")
            .agg(
                F.sum("n_ref").cast("long").alias("n_ref"),
                F.sum("n_cur").cast("long").alias("n_cur"),
            )
        )
    t = cells.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    both = F.col("n_ref") + F.col("n_cur")
    grand = (F.col("t_ref") + F.col("t_cur")).cast("double")
    e_ref = F.col("t_ref").cast("double") * both.cast("double") / grand
    e_cur = F.col("t_cur").cast("double") * both.cast("double") / grand
    d_ref = F.col("n_ref").cast("double") - e_ref
    d_cur = F.col("n_cur").cast("double") - e_cur
    # A category absent from one side gives E_side = 0 only when that
    # side's TOTAL is 0 (the no_reference case — verdict handled below,
    # but under ANSI mode the division itself must not evaluate: gate
    # each term on E > 0 rather than relying on the status short-circuit).
    term = F.round(
        F.when(e_ref > 0, d_ref * d_ref / e_ref).otherwise(F.lit(0.0))
        + F.when(e_cur > 0, d_cur * d_cur / e_cur).otherwise(F.lit(0.0)),
        9,
    ).cast("decimal(28,9)")
    out = (
        cells.crossJoin(F.broadcast(t))
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("chi2"),
            (F.count(F.lit(1)) - 1).cast("long").alias("dof"),
            F.first("t_ref").alias("n_ref"),
            F.first("t_cur").alias("t_cur_dup"),
            F.count(F.lit(1)).cast("long").alias("n_categories"),
        )
        .withColumnRenamed("t_cur_dup", "n_cur")
    )
    v = F.round(
        F.sqrt(
            F.col("chi2") / (F.col("n_ref") + F.col("n_cur")).cast("double")
        ),
        6,
    )
    out = out.withColumn("cramers_v", v)
    status = (
        F.when(
            (F.coalesce(F.col("n_ref"), F.lit(0)) == 0)
            | (F.coalesce(F.col("n_cur"), F.lit(0)) == 0)
            | (F.col("dof") < 1),
            "no_reference",
        )
        .when(F.col("cramers_v") < 0.1, "stable")
        .when(F.col("cramers_v") < 0.3, "moderate_shift")
        .otherwise("major_shift")
    )
    return out.select(
        "chi2", "dof", "n_ref", "n_cur", "n_categories", "cramers_v",
        status.alias("status"),
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_identifiers: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the release-safety
    check behind the masking tier (``functions/masking.py``): after
    dropping direct identifiers, can any row still be singled out by the
    remaining columns (prefix+region+plan, say)? A dataset is k-anonymous
    when every equivalence class (distinct QI combination) contains ≥ k
    rows.

    One map-side-combined ``groupBy`` over the QI columns produces the
    class-size relation; a second metadata-sized aggregate folds it to
    the scalar verdict. Nothing row-grain ever shuffles twice, and the
    class relation is the natural skew shape (many small classes) that
    AQE coalesces. NULL QI values group as themselves (Spark and SQL
    GROUP BY agree NULL = NULL in grouping) — a NULL plan code is a
    distinguishing value to an attacker, so that is the honest reading.

    Returns one row: (n_rows, n_classes, min_class_size, k_threshold,
    violating_classes, violating_rows, at_risk_pct, is_k_anonymous).
    ``at_risk_pct`` = violating_rows / n_rows rounded to 6;
    ``min_class_size`` is the k actually achieved — the caller's
    re-bucketing loop (coarsen QI, re-audit) keys off it. Empty input is
    vacuously anonymous with NULL percentages, not a violation."""
    if not quasi_identifiers:
        raise ValueError("k_anonymity_profile needs at least one quasi-identifier")
    kk = int(k)
    classes = df.groupBy(*[F.col(c) for c in quasi_identifiers]).agg(
        F.count(F.lit(1)).cast("long").alias("_sz")
    )
    viol = F.col("_sz") < F.lit(kk)
    out = classes.agg(
        F.coalesce(F.sum("_sz"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_sz").cast("long").alias("min_class_size"),
        F.lit(kk).cast("long").alias("k_threshold"),
        F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violating_classes"),
        F.coalesce(F.sum(F.when(viol, F.col("_sz")).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("violating_rows"),
    )
    pct = F.when(
        F.col("n_rows") > 0,
        F.round(F.col("violating_rows").cast("double") / F.col("n_rows").cast("double"), 6),
    )
    return out.select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "k_threshold",
        "violating_classes",
        "violating_rows",
        pct.alias("at_risk_pct"),
        (F.col("violating_classes") == 0).alias("is_k_anonymous"),
    )


def entropy_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    category_col: str,
) -> DataFrame:
    """Per-key Shannon entropy of a categorical column — the dispersion
    monitor between :func:`cardinality_drift` (HOW MANY distinct values)
    and :func:`key_skew_profile` (the top-k view): H tells whether the
    mass is spread or concentrated. H = −Σ p·ln p over the key's
    category distribution, plus the normalized H/ln(k) ∈ [0, 1]
    (evenness) so keys with different cardinalities compare. Reading:
    a user whose event-type entropy collapses to 0 became a single-action
    bot; a column whose evenness jumps toward 1 lost its skew (or its
    meaning).

    Scale shape: one map-side-combined count on (key, category) — the
    only row-grain shuffle — then a key-grain aggregate that rides the
    same hash partitioning prefix. NULL categories count as a real level
    (missingness carries information), matching
    :func:`chi_squared_drift`.

    Determinism: counts are exact integers; the per-category −p·ln p
    term is a deterministic double from (count, total) ROUNDED to 9 dp
    and decimal-summed (the PSI recipe). The total rides a window over
    the (key, category) grain — post-agg, metadata-sized, no second
    scan. Returns (*key_cols, n_rows, n_categories, entropy, evenness)
    rounded to 6; evenness NULL for single-category keys (ln 1 = 0)."""
    kcols = [F.col(c) for c in key_cols]
    cat = F.coalesce(F.col(category_col).cast("string"), F.lit("__null__"))
    cells = (
        df.select(*kcols, cat.alias("_cat"))
        .groupBy(*kcols, "_cat")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    wk = Window.partitionBy(*[F.col(c) for c in key_cols])
    cells = cells.withColumn("_tot", F.sum("_n").over(wk).cast("long"))
    p = F.col("_n").cast("double") / F.col("_tot").cast("double")
    term = F.round(-p * F.log(p), 9).cast("decimal(28,9)")
    agg = cells.withColumn("_term", term).groupBy(*key_cols).agg(
        F.first("_tot").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.round(F.sum("_term").cast("double"), 6).alias("entropy"),
    )
    evenness = F.when(
        F.col("n_categories") > 1,
        F.round(
            F.col("entropy") / F.log(F.col("n_categories").cast("double")), 6
        ),
    )
    return agg.select(
        *key_cols, "n_rows", "n_categories", "entropy",
        evenness.alias("evenness"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information between two categorical columns — the
    dependence monitor that closes the categorical-statistics triangle:
    :func:`chi_squared_drift` tests whether ONE column's mix moved
    between windows, :func:`entropy_profile` scores one column's
    dispersion, MI quantifies how much one column PREDICTS another
    (plan type vs churn flag, device model vs event type) — the standard
    feature-selection / redundant-column screen.

    I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), plus both marginal
    entropies and the normalized score NMI = I/√(H(X)·H(Y)) ∈ [0, 1].

    Scale shape: one map-side-combined count on (x, y) — the only
    row-grain shuffle; the marginals aggregate that cell relation
    further (never the base table), and all three totals ride windows /
    tiny joins over cells. NULLs are real levels (``__null__``),
    consistent with the other categorical monitors.

    Determinism: counts exact; each cell term is a deterministic double
    from integer counts ROUNDED to 9 dp then decimal-summed. Returns
    one row: (n, n_cells, mi, h_x, h_y, nmi) rounded to 6; NMI NULL
    when either marginal entropy is 0 (a constant column predicts
    nothing and nothing predicts it — MI is 0 there too)."""
    x = F.coalesce(F.col(x_col).cast("string"), F.lit("__null__"))
    y = F.coalesce(F.col(y_col).cast("string"), F.lit("__null__"))
    cells = (
        df.select(x.alias("_x"), y.alias("_y"))
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .transform(lineage_cut)
    )
    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    wall = Window.partitionBy()
    scored = (
        cells.withColumn("_nx", F.sum("_n").over(wx).cast("long"))
        .withColumn("_ny", F.sum("_n").over(wy).cast("long"))
        .withColumn("_tot", F.sum("_n").over(wall).cast("long"))
    )
    Nd = F.col("_tot").cast("double")
    p_xy = F.col("_n").cast("double") / Nd
    term_mi = F.round(
        p_xy
        * F.log(
            (F.col("_n").cast("double") * Nd)
            / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    scored = scored.withColumn("_term", term_mi)
    mi_agg = scored.agg(
        F.first("_tot").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(F.sum("_term").cast("double"), 6).alias("mi"),
    )

    # marginal entropies from the cell relation (one scan of cells each,
    # never of the base table)
    def _h(col: str):
        m = (
            cells.groupBy(col)
            .agg(F.sum("_n").cast("long").alias("_m"))
        )
        tot = Window.partitionBy()
        p = F.col("_m").cast("double") / F.sum("_m").over(tot).cast("double")
        return (
            m.withColumn("_t", F.round(-p * F.log(p), 9).cast("decimal(28,9)"))
            .agg(F.round(F.sum("_t").cast("double"), 6).alias("h"))
        )

    hx = _h("_x").withColumnRenamed("h", "h_x")
    hy = _h("_y").withColumnRenamed("h", "h_y")
    out = mi_agg.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    nmi = F.when(
        (F.col("h_x") > 0) & (F.col("h_y") > 0),
        F.round(F.col("mi") / F.sqrt(F.col("h_x") * F.col("h_y")), 6),
    )
    return out.select("n", "n_cells", "mi", "h_x", "h_y", nmi.alias("nmi"))


def anova_oneway(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-way ANOVA F statistic — does a categorical factor move a
    numeric measure? The variance-decomposition screen between
    :func:`chi_squared_drift` (categorical × categorical) and
    :func:`mutual_information` (dependence strength): F = MS_between /
    MS_within over the per-level means, with η² = SS_between/SS_total as
    the effect size (how much of the variance the factor explains).

    Scale shape: one map-side-combined aggregate on the group key is
    the only row-grain shuffle (n, Σv, Σv² per level as exact DECIMAL
    sums); SS terms and the F ratio fold over the level relation
    (|levels| rows, metadata-sized).

    Determinism: per-level SS contributions are fixed-shape doubles
    from exact sums ROUNDED to 9 then DECIMAL-summed; the final ratios
    are single double expressions rounded to 6. NULL groups are a real
    level (``__null__``); NULL values are excluded. Returns one row:
    (n, k, ss_between, ss_within, df_between, df_within, f_stat,
    eta_sq); f_stat NULL when df_within = 0 or SS_within = 0 (a
    perfectly-explained or degenerate layout is its own signal)."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    v = F.col(value_col).cast("decimal(24,6)")
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .select(g.alias("_g"), v.alias("_v"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_v").alias("_s"),
            F.sum(F.col("_v") * F.col("_v")).alias("_ss"),
        )
    )
    w = Window.partitionBy()
    cells = (
        cells.withColumn("_tn", F.sum("_n").over(w).cast("long"))
        .withColumn("_tsum", F.sum("_s").over(w))
        .withColumn("_k", F.count(F.lit(1)).over(w).cast("long"))
    )
    gm = F.col("_tsum").cast("double") / F.col("_tn").cast("double")
    mean_g = F.col("_s").cast("double") / F.col("_n").cast("double")
    ssb_t = F.round(F.col("_n").cast("double") * (mean_g - gm) * (mean_g - gm), 9)
    ssw_t = F.round(
        F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double")
        / F.col("_n").cast("double"),
        9,
    )
    agg = cells.groupBy().agg(
        F.max("_tn").alias("n"),
        F.max("_k").alias("k"),
        F.sum(ssb_t.cast("decimal(28,9)")).alias("_ssb"),
        F.sum(ssw_t.cast("decimal(28,9)")).alias("_ssw"),
    )
    ssb = F.col("_ssb").cast("double")
    ssw = F.col("_ssw").cast("double")
    dfb = (F.col("k") - 1).cast("long")
    dfw = (F.col("n") - F.col("k")).cast("long")
    f_stat = F.when(
        (dfb > 0) & (dfw > 0) & (ssw > 0),
        F.round((ssb / dfb.cast("double")) / (ssw / dfw.cast("double")), 6),
    )
    eta = F.when(
        ssb + ssw > 0, F.round(ssb / (ssb + ssw), 6)
    )
    return agg.select(
        "n",
        "k",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        dfb.alias("df_between"),
        dfw.alias("df_within"),
        f_stat.alias("f_stat"),
        eta.alias("eta_sq"),
    )


def spearman_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Spearman rank correlation ρ per key — the monotone-association
    monitor that survives the outliers and nonlinearity Pearson
    doesn't: Pearson over tie-AVERAGED ranks. The rank trick is
    :func:`~..operators.features.binary_auc`'s: 2·avg_rank = 2·rank +
    tie_count − 1 stays INTEGRAL (rank() is the tie group's min rank, a
    RANGE frame counts its size), and because correlation is invariant
    to affine rescaling, ρ computed over u = 2r_x, v = 2r_y equals ρ
    over the averaged ranks — so every accumulated sum (Σu, Σu², Σuv)
    is an exact DECIMAL of integers and the whole statistic is one
    fixed-shape double expression cross-engine.

    Scale shape: two sort windows (one per axis) over the SAME key
    partitioning — one hash exchange, two in-partition sorts — then one
    map-side-combined aggregate reusing that partitioning. ``key_cols``
    empty grades one global pair (single partition — eval-sized inputs,
    same contract as binary_auc).

    Rows with NULL x or y are excluded (complete-case, keeps both rank
    spaces aligned). Returns (*key_cols, n, rho) with ρ rounded to 6,
    NULL when either axis is constant (zero rank variance)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *kcols,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    wx = Window.partitionBy(*kcols).orderBy(F.col("_x").asc())
    wxt = wx.rangeBetween(Window.currentRow, Window.currentRow)
    wy = Window.partitionBy(*kcols).orderBy(F.col("_y").asc())
    wyt = wy.rangeBetween(Window.currentRow, Window.currentRow)
    ranked = base.withColumn(
        "_u",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(wxt) - 1)
        .cast("long")
        .cast("decimal(24,0)"),
    ).withColumn(
        "_v",
        (2 * F.rank().over(wy) + F.count(F.lit(1)).over(wyt) - 1)
        .cast("long")
        .cast("decimal(24,0)"),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_u").alias("_su"),
        F.sum("_v").alias("_sv"),
        F.sum(F.col("_u") * F.col("_u")).alias("_suu"),
        F.sum(F.col("_v") * F.col("_v")).alias("_svv"),
        F.sum(
            (F.col("_u") * F.col("_v")).cast("decimal(38,0)")
        ).alias("_suv"),
    )
    nd = F.col("n").cast("double")
    su, sv = F.col("_su").cast("double"), F.col("_sv").cast("double")
    suu, svv = F.col("_suu").cast("double"), F.col("_svv").cast("double")
    suv = F.col("_suv").cast("double")
    varu = nd * suu - su * su
    varv = nd * svv - sv * sv
    rho = F.when(
        (varu > 0) & (varv > 0),
        F.round((nd * suv - su * sv) / F.sqrt(varu * varv), 6),
    )
    return agg.select(*key_cols, "n", rho.alias("rho"))


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Kruskal–Wallis H test — the rank-based (nonparametric) sibling of
    :func:`anova_oneway`: does the factor shift the DISTRIBUTION of the
    measure, judged on ranks so outliers and non-normality can't fake or
    hide the effect? H = 12/(n(n+1)) Σ R_g²/n_g − 3(n+1) over per-group
    rank sums, divided by the tie correction
    C = 1 − Σ(t³−t)/(n³−n).

    Rank trick shared with :func:`spearman_correlation` /
    ``operators.features.binary_auc``: u = 2·avg_rank = 2·rank +
    tie_count − 1 stays INTEGRAL, and with R_g = Σu/2 the statistic
    keeps Σu²/(4n_g) = R_g²/n_g so H = 12/(n(n+1)) · Σ (Σu)²_g/(4n_g) − 3(n+1) — every
    accumulated sum is an exact DECIMAL of integers (exact while a
    group's Σu < 2^53, i.e. tens of millions of rows), the per-group
    terms are fixed-shape doubles rounded to 9 then DECIMAL-summed, and
    the final H is a single double expression cross-engine.

    Scale shape: ONE global sort window assigns ranks (single
    partition — the same eval/post-agg-grain contract as binary_auc's
    global variant: feed it series or evaluation relations, not raw
    event grain), a lazy lineage cut stops Catalyst re-running the sort
    into both branches, then the group rank-sums and the tie-size
    aggregate each reduce map-side and cross-join as 1×1 scalars.

    NULL values are excluded; NULL group is a real ``__null__`` level.
    Returns one row: (n, k, h_stat, tie_correction, h_adj); h_adj NULL
    when every value ties (C = 0), h_stat NULL when k < 2."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    base = df.filter(F.col(value_col).isNotNull()).select(
        g.alias("_g"), F.col(value_col).cast("double").alias("_x")
    )
    wx = Window.orderBy(F.col("_x").asc())
    wxt = wx.rangeBetween(Window.currentRow, Window.currentRow)
    ranked = base.withColumn(
        "_u",
        (2 * F.rank().over(wx) + F.count(F.lit(1)).over(wxt) - 1)
        .cast("long")
        .cast("decimal(24,0)"),
    ).transform(lineage_cut)
    per_g = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_u").cast("decimal(38,0)").alias("_su"),
    )
    term = F.round(
        F.col("_su").cast("double") * F.col("_su").cast("double")
        / (F.lit(4.0) * F.col("_n").cast("double")),
        9,
    ).cast("decimal(28,9)")
    groups = per_g.groupBy().agg(
        F.sum("_n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(term).alias("_t"),
    )
    # Tie groups share a single u value (same rank, same tie count), so
    # tie sizes come straight off the ranked relation.
    ties = (
        ranked.groupBy("_u")
        .agg(F.count(F.lit(1)).cast("long").alias("_tsz"))
        .groupBy()
        .agg(
            F.sum(
                (F.col("_tsz") * F.col("_tsz") * F.col("_tsz") - F.col("_tsz")).cast(
                    "decimal(38,0)"
                )
            ).alias("_tie")
        )
    )
    j = groups.crossJoin(ties)
    nd = F.col("n").cast("double")
    h = F.when(
        F.col("k") >= 2,
        F.lit(12.0) * F.col("_t").cast("double") / (nd * (nd + F.lit(1.0)))
        - F.lit(3.0) * (nd + F.lit(1.0)),
    )
    c = F.when(
        F.col("n") > 1,
        F.lit(1.0) - F.col("_tie").cast("double") / (nd * nd * nd - nd),
    )
    return j.select(
        "n",
        "k",
        F.round(h, 6).alias("h_stat"),
        F.round(c, 6).alias("tie_correction"),
        F.when((c > 0) & h.isNotNull(), F.round(h / c, 6)).alias("h_adj"),
    )


def welch_t_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's two-sample t-test (unequal variances) — the focused
    two-level drilldown under :func:`anova_oneway`: is group A's mean
    different from group B's, without assuming the two spreads match?
    t = (m_A − m_B)/√(s²_A/n_A + s²_B/n_B) with the Welch–Satterthwaite
    degrees of freedom.

    Scale shape: ONE map-side-combined scalar aggregate — six
    conditional sums (n, Σv, Σv² per side) over DECIMAL-cast values —
    is the whole plan; no window, no join, no second scan. This is the
    cheapest monitor in the file and safe at any grain.

    Determinism: the sums are exact DECIMALs; means, variances, t and
    df are fixed-shape double expressions off those sums, rounded to 6.
    Rows outside the two groups or with NULL values are excluded.
    Returns one row: (n_a, n_b, mean_a, mean_b, var_a, var_b, t_stat,
    df_welch); t/df NULL when either side has n < 2 or both variances
    are 0."""
    va = F.col(value_col).cast("decimal(24,6)")
    ina = (F.col(group_col) == F.lit(group_a)).cast("int")
    inb = (F.col(group_col) == F.lit(group_b)).cast("int")
    base = df.filter(
        F.col(group_col).isin(group_a, group_b) & F.col(value_col).isNotNull()
    ).select(ina.alias("_a"), inb.alias("_b"), va.alias("_v"))
    agg = base.groupBy().agg(
        F.sum("_a").cast("long").alias("n_a"),
        F.sum("_b").cast("long").alias("n_b"),
        F.sum(F.when(F.col("_a") == 1, F.col("_v"))).alias("_sa"),
        F.sum(F.when(F.col("_b") == 1, F.col("_v"))).alias("_sb"),
        F.sum(F.when(F.col("_a") == 1, F.col("_v") * F.col("_v"))).alias("_ssa"),
        F.sum(F.when(F.col("_b") == 1, F.col("_v") * F.col("_v"))).alias("_ssb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    ssa, ssb = F.col("_ssa").cast("double"), F.col("_ssb").cast("double")
    ma, mb = sa / na, sb / nb
    vara = F.when(F.col("n_a") > 1, (ssa - sa * sa / na) / (na - F.lit(1.0)))
    varb = F.when(F.col("n_b") > 1, (ssb - sb * sb / nb) / (nb - F.lit(1.0)))
    se2 = vara / na + varb / nb
    t = F.when(se2 > 0, F.round((ma - mb) / F.sqrt(se2), 6))
    dfw = F.when(
        (se2 > 0) & (F.col("n_a") > 1) & (F.col("n_b") > 1),
        F.round(
            se2 * se2
            / (
                (vara / na) * (vara / na) / (na - F.lit(1.0))
                + (varb / nb) * (varb / nb) / (nb - F.lit(1.0))
            ),
            6,
        ),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(vara, 6).alias("var_a"),
        F.round(varb, 6).alias("var_b"),
        t.alias("t_stat"),
        dfw.alias("df_welch"),
    )


def js_divergence(
    reference: DataFrame,
    current: DataFrame,
    category_col: str,
) -> DataFrame:
    """Jensen–Shannon divergence between two categorical mixes — the
    bounded, symmetric drift score that completes the categorical-drift
    rim: :func:`chi_squared_drift` answers "is the shift statistically
    real", JSD answers "how BIG is it on an absolute [0,1] scale"
    (bits; base-2), comparable across columns and windows and immune to
    sample size — KL without the infinities (disjoint support maxes at
    1 bit instead of diverging).

    Scale shape: each side reduces map-side to one count per category;
    the only shuffled relation is the category-sized cell table
    (full-outer merged via a side-flagged union, the drift-monitor
    discipline) and totals ride a window over it.

    Determinism: counts are exact; each term p·ln(p/m) is a fixed-shape
    double ROUNDED to 9 then DECIMAL-summed; the final /ln(2)
    normalization and verdict cuts (0.05 / 0.2 bits) are single double
    expressions. NULL categories are a real ``__null__`` level.
    Returns one row: (n_ref, n_cur, n_categories, jsd_nats, jsd_bits,
    status); ``no_reference`` when either side is empty."""
    g = F.coalesce(F.col(category_col).cast("string"), F.lit("__null__"))
    ref = reference.select(g.alias("_c"), F.lit(1).alias("_ra"), F.lit(0).alias("_rb"))
    cur = current.select(g.alias("_c"), F.lit(0).alias("_ra"), F.lit(1).alias("_rb"))
    cells = (
        ref.unionAll(cur)
        .groupBy("_c")
        .agg(
            F.sum("_ra").cast("long").alias("_a"),
            F.sum("_rb").cast("long").alias("_b"),
        )
    )
    w = Window.partitionBy()
    cells = (
        cells.withColumn("_na", F.sum("_a").over(w).cast("long"))
        .withColumn("_nb", F.sum("_b").over(w).cast("long"))
    )
    p = F.col("_a").cast("double") / F.col("_na").cast("double")
    q = F.col("_b").cast("double") / F.col("_nb").cast("double")
    m = (p + q) / F.lit(2.0)
    t_p = F.when(
        F.col("_a") > 0, F.round(p * F.log(p / m), 9).cast("decimal(28,9)")
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    t_q = F.when(
        F.col("_b") > 0, F.round(q * F.log(q / m), 9).cast("decimal(28,9)")
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    agg = cells.groupBy().agg(
        F.max("_na").alias("n_ref"),
        F.max("_nb").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(t_p).alias("_tp"),
        F.sum(t_q).alias("_tq"),
    )
    jsd = (F.col("_tp").cast("double") + F.col("_tq").cast("double")) / F.lit(2.0)
    import math as _math

    bits = jsd / F.lit(_math.log(2.0))
    status = F.when(
        (F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit("no_reference")
    ).otherwise(
        F.when(bits < 0.05, "stable").when(bits < 0.2, "moderate_shift").otherwise("major_shift")
    )
    return agg.select(
        "n_ref",
        "n_cur",
        "n_categories",
        F.round(jsd, 6).alias("jsd_nats"),
        F.round(bits, 6).alias("jsd_bits"),
        status.alias("status"),
    )


def theil_index(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Theil T inequality index with between/within decomposition — the
    concentration monitor :func:`gini_concentration` can't decompose:
    how unequal is the measure across units, and how much of that
    inequality lives BETWEEN groups vs INSIDE them?
    T = (1/N) Σ (xᵢ/μ)·ln(xᵢ/μ); T_between replaces each unit by its
    group mean; T_within = T − T_between (exact additive
    decomposition).

    Scale shape: the global totals reduce to ONE row that broadcasts
    back over the unit relation (scalar cross join — no window over raw
    grain, no re-sort); per-unit terms reduce map-side; the group tier
    folds over the |groups| relation. Two passes over the unit
    relation, both shuffle-light.

    Determinism: sums are exact DECIMALs (pass DECIMAL-friendly
    values); every ln term is a fixed-shape double ROUNDED to 9 then
    DECIMAL-summed; outputs round to 6. Theil is defined on POSITIVE
    values: rows with NULL or ≤ 0 values are excluded (count reported
    as n_excluded). Returns one row: (n, n_excluded, k_groups, mean,
    theil_total, theil_between, theil_within)."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    v = F.col(value_col).cast("decimal(24,6)")
    raw = df.select(g.alias("_g"), v.alias("_v"))
    base = raw.filter(F.col("_v") > 0).transform(lineage_cut)
    excluded = raw.filter(F.col("_v").isNull() | (F.col("_v") <= 0)).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_excluded")
    )
    totals = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_v").alias("_s"),
    )
    mu = F.col("_s").cast("double") / F.col("_n").cast("double")
    # per-unit terms against the broadcast scalar mean
    unit = base.crossJoin(F.broadcast(totals))
    x_over_mu = F.col("_v").cast("double") / mu
    t_term = F.round(x_over_mu * F.log(x_over_mu), 9).cast("decimal(28,9)")
    t_total = unit.groupBy().agg(F.sum(t_term).alias("_tt"))
    # group tier: share-weighted log of (income share / population share)
    groups = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("_ng"),
        F.sum("_v").alias("_sg"),
    )
    gu = groups.crossJoin(F.broadcast(totals))
    inc_share = F.col("_sg").cast("double") / F.col("_s").cast("double")
    pop_share = F.col("_ng").cast("double") / F.col("_n").cast("double")
    b_term = F.when(
        F.col("_sg") > 0,
        F.round(inc_share * F.log(inc_share / pop_share), 9).cast("decimal(28,9)"),
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    t_between = gu.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum(b_term).alias("_tb"),
    )
    j = totals.crossJoin(excluded).crossJoin(t_total).crossJoin(t_between)
    tt = F.col("_tt").cast("double") / F.col("_n").cast("double")
    tb = F.col("_tb").cast("double")
    return j.select(
        F.col("_n").alias("n"),
        "n_excluded",
        "k_groups",
        F.round(mu, 6).alias("mean"),
        F.round(tt, 6).alias("theil_total"),
        F.round(tb, 6).alias("theil_between"),
        F.round(tt - tb, 6).alias("theil_within"),
    )


def cohens_kappa(df: DataFrame, rater_a_col: str, rater_b_col: str) -> DataFrame:
    """Cohen's κ — chance-corrected agreement between two categorical
    labelings (model vs model, annotator vs annotator, rule vs rule):
    κ = (p_o − p_e)/(1 − p_e) where p_o is observed agreement and p_e
    the agreement two independent raters with these marginals would hit
    by luck. The agreement lens :func:`mutual_information` doesn't
    give — MI rewards ANY dependence, κ only rewards agreement on the
    SAME label.

    Scale shape: one (a, b) cell shuffle (category² cells, the
    :func:`mutual_information` discipline); marginals ride windows over
    the cell relation; the fold is scalar.

    Determinism: counts are exact LONGs; p_e terms are fixed-shape
    doubles of integer ratios ROUNDED to 9 then DECIMAL-summed; κ is a
    single double rounded to 6. NULL labels are a real ``__null__``
    level (two raters agreeing on "missing" IS agreement). Returns one
    row: (n, k_a, k_b, po, pe, kappa); κ NULL when p_e = 1 (both raters
    constant)."""
    a = F.coalesce(F.col(rater_a_col).cast("string"), F.lit("__null__"))
    b = F.coalesce(F.col(rater_b_col).cast("string"), F.lit("__null__"))
    # lineage cut: the cell relation feeds three branches (two marginal
    # folds + the totals) — without it Catalyst re-runs the base scan and
    # groupBy into every branch (the shared-subtree rule).
    cells = (
        df.select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .transform(lineage_cut)
    )
    # p_e needs Σ_label rowshare · colshare over labels BOTH raters use;
    # a diagonal cell may be absent even when both marginals exist, so the
    # contribution folds over a label-level join of the two marginal
    # relations (never the raw grain).
    ma = cells.groupBy("_a").agg(F.sum("_n").cast("long").alias("_ca")).select(
        F.col("_a").alias("_lbl"), "_ca"
    )
    mb = cells.groupBy("_b").agg(F.sum("_n").cast("long").alias("_cb")).select(
        F.col("_b").alias("_lbl"), "_cb"
    )
    tot1 = cells.groupBy().agg(
        F.sum("_n").cast("long").alias("n"),
        F.countDistinct("_a").cast("long").alias("k_a"),
        F.countDistinct("_b").cast("long").alias("k_b"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0))
        .cast("long")
        .alias("_agree"),
    )
    pe_all = (
        ma.join(mb, "_lbl")
        .crossJoin(F.broadcast(tot1.select("n")))
        .select(
            F.round(
                (F.col("_ca").cast("double") / F.col("n").cast("double"))
                * (F.col("_cb").cast("double") / F.col("n").cast("double")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("_pt")
        )
        .groupBy()
        .agg(F.sum("_pt").alias("_pe"))
    )
    j = tot1.crossJoin(pe_all)
    po = F.col("_agree").cast("double") / F.col("n").cast("double")
    pe = F.coalesce(F.col("_pe").cast("double"), F.lit(0.0))
    kappa = F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
    return j.select(
        "n",
        "k_a",
        "k_b",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        kappa.alias("kappa"),
    )


def bh_adjust(
    df: DataFrame,
    test_col: str,
    p_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg FDR correction — the monitor OF the monitors:
    when a dashboard runs dozens of drift/change tests each window
    (:func:`chi_squared_drift`, :func:`ks_two_sample`, Pettitt, …),
    raw p < 0.05 guarantees false alarms; BH adjusts the family so the
    expected false-discovery rate stays at ``alpha``. Emits the
    step-up-adjusted q-values q_i = min_{j≥i} p_(j)·m/j and the reject
    verdicts.

    Scale shape: the input is a TEST-GRAIN relation (one row per
    hypothesis — dozens to thousands); one global sort window ranks the
    p-values and a reverse running-min folds the step-up in the same
    partitioning. Metadata-sized by construction.

    Determinism: ranking ties break on the test name; each p·m/rank
    term is a fixed-shape double ROUNDED to 9 before the running min;
    q caps at 1 and rounds to 6. NULL p-values are excluded. Returns
    one row per test: (test, p_value, rank, q_value, reject)."""
    if not (0 < alpha < 1):
        raise ValueError("bh_adjust needs 0 < alpha < 1")
    base = df.filter(F.col(p_col).isNotNull()).select(
        F.col(test_col).cast("string").alias("test"),
        F.col(p_col).cast("double").alias("p_value"),
    )
    w = Window.partitionBy()
    wrank = Window.orderBy(F.col("p_value").asc(), F.col("test").asc())
    ranked = base.withColumn("rank", F.row_number().over(wrank).cast("long")).withColumn(
        "_m", F.count(F.lit(1)).over(w).cast("long")
    )
    term = F.round(
        F.col("p_value") * F.col("_m").cast("double") / F.col("rank").cast("double"), 9
    )
    wrev = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    q = F.least(F.lit(1.0), F.min(term).over(wrev))
    out = ranked.withColumn("q_value", F.round(q, 6))
    return out.select(
        "test",
        F.round(F.col("p_value"), 6).alias("p_value"),
        "rank",
        "q_value",
        (F.col("q_value") <= F.lit(float(alpha))).alias("reject"),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Kendall τ-b rank correlation per key — the concordance view of
    monotone association (:func:`spearman_correlation` correlates rank
    VALUES; τ counts agreeing pairs, is more robust for tiny series,
    and its tie treatment τ-b = (C−D)/√((n₀−t_x)(n₀−t_y)) is exact
    integer arithmetic end to end).

    Scale shape: ONE self-join on the series key at the calendar-grain
    series contract (the Mann–Kendall discipline — feed daily/monthly
    aggregates, never raw events; the i<j pair relation is O(T²/2) per
    key), collapsing straight into a map-side-combined count of
    concordant/discordant/tied pairs.

    Determinism: comparisons run on the EXACT input values (pass
    DECIMAL aggregates); C, D, and all tie counts are exact LONGs; τ-b
    is one fixed-shape double rounded to 6, NULL when either axis is
    fully tied. Rows with NULL x or y are excluded; a unique
    ``tiebreak`` ordering is unnecessary (all i<j pairs are counted
    regardless of order). Returns one row per key: (*key_cols, n,
    concordant, discordant, tau_b)."""
    kcols = [F.col(c) for c in key_cols]
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *kcols,
        F.monotonically_increasing_id().alias("_rid"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    ).transform(lineage_cut)
    a = base.select(
        *[F.col(c).alias(f"_k{i}") for i, c in enumerate(key_cols)],
        F.col("_rid").alias("_ra"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
    )
    cond = [a[f"_k{i}"] == base[c] for i, c in enumerate(key_cols)]
    pairs = base.join(a, cond if cond else [F.lit(True)]).filter(
        F.col("_ra") < F.col("_rid")
    )
    sx = F.when(F.col("_x") > F.col("_xa"), 1).when(F.col("_x") < F.col("_xa"), -1).otherwise(0)
    sy = F.when(F.col("_y") > F.col("_ya"), 1).when(F.col("_y") < F.col("_ya"), -1).otherwise(0)
    prod = sx * sy
    agg = pairs.groupBy(*key_cols).agg(
        F.sum((prod > 0).cast("long")).cast("long").alias("concordant"),
        F.sum((prod < 0).cast("long")).cast("long").alias("discordant"),
        F.sum(((sx == 0) & (sy != 0)).cast("long")).cast("long").alias("_tx"),
        F.sum(((sy == 0) & (sx != 0)).cast("long")).cast("long").alias("_ty"),
        F.sum(((sx == 0) & (sy == 0)).cast("long")).cast("long").alias("_txy"),
    )
    counts = base.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = (
        agg.join(counts, list(key_cols)) if key_cols else agg.crossJoin(counts)
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("double")
    # ties ON x (regardless of y): pairs where sx == 0
    tx = (F.col("_tx") + F.col("_txy")).cast("double")
    ty = (F.col("_ty") + F.col("_txy")).cast("double")
    c, d = F.col("concordant").cast("double"), F.col("discordant").cast("double")
    denom = F.sqrt((n0 - tx) * (n0 - ty))
    tau = F.when(
        (n0 - tx > 0) & (n0 - ty > 0), F.round((c - d) / denom, 6)
    )
    return out.select(*key_cols, "n", "concordant", "discordant", tau.alias("tau_b"))


def hhi_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per key — the market-
    structure number regulators actually quote (Σ share² over the
    units' value shares, scaled ×10,000): the third lens on
    concentration next to :func:`gini_concentration` (dispersion) and
    :func:`theil_index` (decomposable inequality), with crisp
    conventional cuts (<1500 unconcentrated, 1500–2500 moderate,
    >2500 concentrated).

    Scale shape: one (key, group) map-side-combined sum collapses the
    value grain; totals ride a window over the group relation; the HHI
    folds per key. Nothing touches the raw grain twice.

    Determinism: sums are exact DECIMALs; each share² term is a
    fixed-shape double ROUNDED to 9 then DECIMAL-summed; HHI rounds to
    2, the effective-competitor count 1/Σs² to 4. Negative or NULL
    values are excluded (shares need a nonnegative measure). Returns
    one row per key: (*key_cols, n_groups, hhi, effective_n, verdict).
    """
    kcols = [F.col(c) for c in key_cols]
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
    v = F.col(value_col).cast("decimal(24,6)")
    cells = (
        df.filter(v.isNotNull() & (v >= 0))
        .select(*kcols, g.alias("_g"), v.alias("_v"))
        .groupBy(*key_cols, "_g")
        .agg(F.sum("_v").alias("_s"))
    )
    wk = Window.partitionBy(*kcols)
    cells = cells.withColumn("_tot", F.sum("_s").over(wk))
    share = F.col("_s").cast("double") / F.col("_tot").cast("double")
    term = F.when(
        F.col("_tot") > 0, F.round(share * share, 9).cast("decimal(28,9)")
    ).otherwise(F.lit(0).cast("decimal(28,9)"))
    agg = cells.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(term).alias("_ss"),
    )
    ss = F.col("_ss").cast("double")
    hhi = F.round(ss * F.lit(10000.0), 2)
    verdict = (
        F.when(hhi < 1500, "unconcentrated")
        .when(hhi <= 2500, "moderate")
        .otherwise("concentrated")
    )
    return agg.select(
        *key_cols,
        "n_groups",
        hhi.alias("hhi"),
        F.when(ss > 0, F.round(F.lit(1.0) / ss, 4)).alias("effective_n"),
        verdict.alias("verdict"),
    )


def two_proportion_test(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-proportion z-test with pooled variance — the experiment
    readout for RATES (:func:`welch_t_test` compares means; conversion,
    churn, and click-through comparisons need this one):
    z = (p̂_A − p̂_B) / √(p̂(1−p̂)(1/n_A + 1/n_B)) with the pooled p̂,
    plus the absolute difference and its unpooled 95% CI half-width.

    Scale shape: ONE map-side-combined scalar aggregate (four
    conditional integer sums) — the cheapest monitor shape, safe at any
    grain.

    Determinism: counts are exact LONGs; every derived number is a
    fixed-shape double rounded to 6. ``success_col`` > 0 counts as
    success; rows outside the two groups or with NULL success are
    excluded. Returns one row: (n_a, n_b, rate_a, rate_b, diff,
    ci95_halfwidth, z_stat); z NULL when a pooled-variance factor is 0
    (all successes or all failures)."""
    ina = (F.col(group_col) == F.lit(group_a)).cast("long")
    inb = (F.col(group_col) == F.lit(group_b)).cast("long")
    y = (F.col(success_col) > 0).cast("long")
    base = df.filter(
        F.col(group_col).isin(group_a, group_b) & F.col(success_col).isNotNull()
    ).select(ina.alias("_a"), inb.alias("_b"), y.alias("_y"))
    agg = base.groupBy().agg(
        F.sum("_a").cast("long").alias("n_a"),
        F.sum("_b").cast("long").alias("n_b"),
        F.sum(F.col("_a") * F.col("_y")).cast("long").alias("_sa"),
        F.sum(F.col("_b") * F.col("_y")).cast("long").alias("_sb"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    # ANSI-safe: an empty side NULLs every derived number instead of
    # dividing by zero (caught live at sf0.001, where no journey starts
    # with the rarer entry activity).
    pa = F.when(F.col("n_a") > 0, sa / na)
    pb = F.when(F.col("n_b") > 0, sb / nb)
    pool = F.when(F.col("n_a") + F.col("n_b") > 0, (sa + sb) / (na + nb))
    se_pooled = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)),
    )
    z = F.when(se_pooled > 0, F.round((pa - pb) / se_pooled, 6))
    se_unpooled = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.sqrt(pa * (F.lit(1.0) - pa) / na + pb * (F.lit(1.0) - pb) / nb),
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pa - pb, 6).alias("diff"),
        F.round(F.lit(1.959963984540054) * se_unpooled, 6).alias("ci95_halfwidth"),
        z.alias("z_stat"),
    )


def wilson_proportion_ci(
    df: DataFrame,
    key_cols: Sequence[str],
    success_col: str,
    z: float = 1.959963984540054,
) -> DataFrame:
    """Wilson score interval per key for a binary proportion — the CI
    every rate dashboard should draw instead of the Wald interval (Wald
    collapses to zero width at p̂ ∈ {0,1} and goes negative near the
    edges; Wilson stays inside [0,1] and behaves at small n):

        (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    One map-side-combined aggregate per key; counts exact; the interval
    is a fixed-shape double expression whose only transcendental is
    sqrt (IEEE-exact — the closed form needs no erf, which is why
    Wilson is oracle-checkable and a power calculator is not). ``z``
    defaults to the two-sided 95% normal quantile, embedded as a
    LITERAL in both engines (the periodogram no-libm discipline).
    ``success_col`` is integral 0/1; NULLs excluded. Returns
    (*key_cols, n, n_success, p_hat, ci_lo, ci_hi) rounded to 6."""
    zf = float(z)
    s = F.col(success_col).cast("long")
    base = df.filter(s.isNotNull()).select(
        *[F.col(c) for c in key_cols], s.alias("_s")
    )
    agg = base.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_s").cast("long").alias("n_success"),
    )
    n = F.col("n").cast("double")
    p = F.col("n_success").cast("double") / n
    z2 = F.lit(zf * zf)
    center = p + z2 / (F.lit(2.0) * n)
    margin = F.lit(zf) * F.sqrt(p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n))
    denom = F.lit(1.0) + z2 / n
    return agg.select(
        *key_cols,
        "n",
        "n_success",
        F.round(p, 6).alias("p_hat"),
        F.round((center - margin) / denom, 6).alias("ci_lo"),
        F.round((center + margin) / denom, 6).alias("ci_hi"),
    )


def contingency_profile(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Full contingency-table drill-down: per-cell observed/expected
    counts and STANDARDIZED residuals (o−e)/√e — which cells drive the
    dependence — plus the table-level χ², dof, and Cramér's V effect
    size √((χ²/n)/min(r−1, c−1)) on every row. The drill-down companion
    of the scalar dependence monitors (χ² says "drifted", mutual
    information says "how much", this says WHERE).

    One map-side-combined cell count (the only row-grain shuffle);
    margins, n, r, c, χ² and V all ride windows over the cell relation
    (metadata-sized). NULL levels are a real level (``__null__``).

    Determinism: counts exact; expected/residuals are fixed-shape
    doubles rounded to 6; the χ² fold is round-then-decimal (9 dp).
    Degenerate 1×C / R×1 tables emit NULL chi2/v (dof 0). Returns one
    row per cell: (row_level, col_level, observed, expected,
    std_residual, chi2, dof, cramers_v)."""
    r = F.coalesce(F.col(row_col).cast("string"), F.lit("__null__"))
    c = F.coalesce(F.col(col_col).cast("string"), F.lit("__null__"))
    cells = df.select(r.alias("row_level"), c.alias("col_level")).groupBy(
        "row_level", "col_level"
    ).agg(F.count(F.lit(1)).cast("long").alias("observed"))
    wall = Window.partitionBy()
    wr = Window.partitionBy("row_level")
    wc = Window.partitionBy("col_level")
    cur = (
        cells.withColumn("_n", F.sum("observed").over(wall).cast("long"))
        .withColumn("_rt", F.sum("observed").over(wr).cast("long"))
        .withColumn("_ct", F.sum("observed").over(wc).cast("long"))
        .withColumn(
            "_r", F.size(F.collect_set("row_level").over(wall)).cast("long")
        )
        .withColumn(
            "_c", F.size(F.collect_set("col_level").over(wall)).cast("long")
        )
    )
    exp = F.col("_rt").cast("double") * F.col("_ct").cast("double") / F.col(
        "_n"
    ).cast("double")
    term = F.round(
        (F.col("observed").cast("double") - exp) * (F.col("observed").cast("double") - exp)
        / exp,
        9,
    ).cast("decimal(28,9)")
    cur = cur.withColumn("_exp", exp).withColumn(
        "_chi2", F.sum(term).over(wall).cast("double")
    )
    dof = (F.col("_r") - 1) * (F.col("_c") - 1)
    mindim = F.least(F.col("_r") - 1, F.col("_c") - 1).cast("double")
    v = F.when(
        dof > 0,
        F.sqrt((F.col("_chi2") / F.col("_n").cast("double")) / mindim),
    )
    return cur.select(
        "row_level",
        "col_level",
        "observed",
        F.round(F.col("_exp"), 6).alias("expected"),
        F.round(
            (F.col("observed").cast("double") - F.col("_exp")) / F.sqrt(F.col("_exp")),
            6,
        ).alias("std_residual"),
        F.round(F.when(dof > 0, F.col("_chi2")), 6).alias("chi2"),
        dof.cast("long").alias("dof"),
        F.round(v, 6).alias("cramers_v"),
    )


def candidate_key_profile(
    df: DataFrame, combos: "Sequence[Sequence[str]]"
) -> DataFrame:
    """Uniqueness / candidate-key profiling: for each column combination,
    how close it comes to identifying rows — the discovery half of the
    dbt ``unique`` test (which asserts a KNOWN key; this measures every
    candidate). Distinctness counts the combo as a STRUCT, so null
    values participate like any other value (two (1, NULL) rows are one
    distinct combo, duplicating — Spark ``countDistinct(struct(...))``
    and DuckDB ``count(DISTINCT (a, b))`` agree on this). One exact
    distinct-aggregate shuffle per combo, unioned at the combo grain —
    the shuffle count is the (small, caller-chosen) combo list, never
    data-sized. Returns one row per combo:
    (combo, n_rows, n_distinct, dup_rows, is_unique)."""
    if not combos:
        raise ValueError("candidate_key_profile needs at least one combo")
    out = None
    for cols in combos:
        cols = list(cols)
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"combo {cols}: unknown columns {missing}")
        one = df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct(F.struct(*cols)).cast("long").alias("n_distinct"),
        ).select(
            F.lit(",".join(cols)).alias("combo"),
            "n_rows",
            "n_distinct",
            (F.col("n_rows") - F.col("n_distinct")).cast("long").alias("dup_rows"),
            (F.col("n_rows") == F.col("n_distinct")).cast("int").alias("is_unique"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def sprt_bernoulli(
    df: DataFrame,
    key_col: str,
    t_col: str,
    success_col: str,
    total_col: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per key, group-sequential
    form: after each step t the cumulative log-likelihood ratio
    llr = c1·ln(p1/p0) + c0·ln((1−p1)/(1−p0)) (c1/c0 = cumulative
    successes/failures) is compared against the decision bounds
    A = ln((1−β)/α), B = ln(β/(1−α)) — accept H1 above A, accept H0
    below B, keep sampling in between. The sequential counterpart of the
    fixed-horizon two-proportion z test in this battery.

    Determinism: cumulative counts are exact LONGs off one key-ordered
    window; the llr is two integer×constant multiplies and one add, with
    the ln constants computed ONCE in Python and embedded in both
    engines — no accumulation, no drift. Returns one row per (key, t):
    (key, t, n_seen, c1, llr, decision) with llr rounded to 6 and
    decision in ('accept_h1', 'accept_h0', 'continue')."""
    import math

    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0) or p0 == p1:
        raise ValueError("need 0 < p0, p1 < 1 and p0 != p1")
    if not (0.0 < alpha < 1.0 and 0.0 < beta < 1.0):
        raise ValueError("alpha/beta must be in (0, 1)")
    k1 = math.log(p1 / p0)
    k0 = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    w = Window.partitionBy("k").orderBy("t")
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(t_col).alias("t"),
        F.col(success_col).cast("long").alias("s"),
        F.col(total_col).cast("long").alias("n"),
    )
    cum = base.select(
        "k",
        "t",
        F.sum("s").over(w).alias("c1"),
        F.sum(F.col("n") - F.col("s")).over(w).alias("c0"),
        F.sum("n").over(w).alias("n_seen"),
    )
    llr = F.col("c1").cast("double") * F.lit(k1) + F.col("c0").cast("double") * F.lit(k0)
    decision = (
        F.when(llr > F.lit(upper), F.lit("accept_h1"))
        .when(llr < F.lit(lower), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return cum.select(
        F.col("k").alias(key_col),
        "t",
        "n_seen",
        "c1",
        F.round(llr, 6).alias("llr"),
        decision.alias("decision"),
    )


def sprt_oracle_sql(
    base_cte: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.2,
    key_name: str = "k",
) -> str:
    """DuckDB mirror of :func:`sprt_bernoulli`. ``base_cte`` exposes
    (k, t, s, n) at the step grain; the ln constants are the SAME Python
    floats interpolated here and into the Spark columns."""
    import math

    k1 = math.log(p1 / p0)
    k0 = math.log((1.0 - p1) / (1.0 - p0))
    upper = math.log((1.0 - beta) / alpha)
    lower = math.log(beta / (1.0 - alpha))
    return f"""
WITH base AS ({base_cte}),
cum AS (
  SELECT k, t,
         CAST(sum(s) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS c1,
         CAST(sum(n - s) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS c0,
         CAST(sum(n) OVER (PARTITION BY k ORDER BY t) AS BIGINT) AS n_seen
  FROM base
)
SELECT k AS {key_name}, t, n_seen, c1,
       round(CAST(c1 AS DOUBLE) * {k1!r} + CAST(c0 AS DOUBLE) * {k0!r}, 6) AS llr,
       CASE WHEN CAST(c1 AS DOUBLE) * {k1!r} + CAST(c0 AS DOUBLE) * {k0!r} > {upper!r}
              THEN 'accept_h1'
            WHEN CAST(c1 AS DOUBLE) * {k1!r} + CAST(c0 AS DOUBLE) * {k0!r} < {lower!r}
              THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
"""


def empirical_bayes_rates(
    df: DataFrame,
    key_col: str,
    success_col: str,
    total_col: str,
) -> DataFrame:
    """Beta-binomial empirical-Bayes rate shrinkage: per-key raw rates
    x/n shrink toward the population with strength fitted by the method
    of moments — α̂, β̂ from the mean and variance of the raw rates
    (James–Stein-style pooling; the small-n keys move most). The
    smoothing companion of the Wilson-CI row in this battery: Wilson
    widens the interval, this moves the point estimate.

    Determinism: raw rates are one double shape; the across-key moment
    sums fold round-9 DECIMALs (order-independent); α̂/β̂ derive from
    those exact sums with one expression shape and join back as a
    broadcast 1×1. Degenerate variance (all rates equal, var ≤ 0 after
    the moment identity) yields NULL α/β and shrunk = raw — visible, not
    silent. Returns (key, n, x, raw_rate, alpha, beta, shrunk_rate),
    rates rounded to 6."""
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(success_col).cast("long").alias("x"),
        F.col(total_col).cast("long").alias("n"),
    ).filter(F.col("n") > 0)
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    rated = base.select("k", "x", "n", rate.alias("r"))
    moments = rated.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum(F.round(F.col("r"), 9).cast("decimal(28,9)")).alias("sr"),
        F.sum(F.round(F.col("r") * F.col("r"), 9).cast("decimal(28,9)")).alias("srr"),
    )
    g = F.col("g").cast("double")
    mu = F.col("sr").cast("double") / g
    var = F.col("srr").cast("double") / g - mu * mu
    common = mu * (F.lit(1.0) - mu) / var - F.lit(1.0)
    ab = moments.select(
        F.when(var > 0, F.round(mu * common, 9)).alias("_alpha"),
        F.when(var > 0, F.round((F.lit(1.0) - mu) * common, 9)).alias("_beta"),
    )
    out = rated.crossJoin(F.broadcast(ab))
    shrunk = F.when(
        F.col("_alpha").isNotNull() & (F.col("_alpha") > 0) & (F.col("_beta") > 0),
        (F.col("x").cast("double") + F.col("_alpha"))
        / (F.col("n").cast("double") + F.col("_alpha") + F.col("_beta")),
    ).otherwise(F.col("r"))
    return out.select(
        F.col("k").alias(key_col),
        "n",
        "x",
        F.round(F.col("r"), 6).alias("raw_rate"),
        F.round(F.col("_alpha"), 6).alias("alpha"),
        F.round(F.col("_beta"), 6).alias("beta"),
        F.round(shrunk, 6).alias("shrunk_rate"),
    )


def empirical_bayes_oracle_sql(base_cte: str, key_name: str = "k") -> str:
    """DuckDB mirror of :func:`empirical_bayes_rates`. ``base_cte``
    exposes (k, x, n) at the key grain."""
    return f"""
WITH base AS (SELECT k, x, n FROM ({base_cte}) WHERE n > 0),
rated AS (
  SELECT k, x, n, CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS r FROM base
), moments AS (
  SELECT CAST(count(*) AS BIGINT) AS g,
         sum(CAST(round(r, 9) AS DECIMAL(28,9))) AS sr,
         sum(CAST(round(r * r, 9) AS DECIMAL(28,9))) AS srr
  FROM rated
), ab AS (
  SELECT
    CASE WHEN CAST(srr AS DOUBLE) / CAST(g AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) > 0
      THEN round((CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))
        * ((CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (1.0 - CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))
           / (CAST(srr AS DOUBLE) / CAST(g AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))) - 1.0), 9)
    END AS a,
    CASE WHEN CAST(srr AS DOUBLE) / CAST(g AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) > 0
      THEN round((1.0 - CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))
        * ((CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (1.0 - CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))
           / (CAST(srr AS DOUBLE) / CAST(g AS DOUBLE)
              - (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE)) * (CAST(sr AS DOUBLE) / CAST(g AS DOUBLE))) - 1.0), 9)
    END AS b
  FROM moments
)
SELECT rated.k AS {key_name}, rated.n, rated.x,
       round(r, 6) AS raw_rate,
       round(a, 6) AS alpha,
       round(b, 6) AS beta,
       round(CASE WHEN a IS NOT NULL AND a > 0 AND b > 0
                  THEN (CAST(x AS DOUBLE) + a) / (CAST(n AS DOUBLE) + a + b)
                  ELSE r END, 6) AS shrunk_rate
FROM rated CROSS JOIN ab
"""


def weighted_median(
    df: DataFrame,
    key_cols: "Sequence[str]",
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact WEIGHTED (lower) median per key: the smallest value v whose
    cumulative weight reaches half the total — the quantity-weighted
    companion of the exact rank-mirror medians in this battery (a
    volume-weighted "typical price" ignores how many units traded; this
    doesn't). Weights must be integral and positive (exact LONG sums).

    One key-ordered cumulative window ORDERED BY VALUE ALONE: the
    default RANGE frame gives every tied value the same cumulative
    weight in both engines, so no tie-break column is needed and the
    crossing value is fully deterministic. Returns
    (keys..., total_weight, weighted_median)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col("_v").asc())
    tot = Window.partitionBy(*keys)
    base = df.select(
        *keys,
        F.col(value_col).alias("_v"),
        F.col(weight_col).cast("long").alias("_wt"),
    ).filter(F.col("_wt") > 0)
    cum = base.select(
        *keys,
        "_v",
        F.sum("_wt").over(w).alias("_cw"),
        F.sum("_wt").over(tot).alias("_W"),
    )
    return (
        cum.filter(F.lit(2) * F.col("_cw") >= F.col("_W"))
        .groupBy(*keys)
        .agg(
            F.max("_W").cast("long").alias("total_weight"),
            F.min("_v").cast("double").alias("weighted_median"),
        )
    )


def weighted_median_oracle_sql(base_cte: str, key_exprs: "Sequence[str]") -> str:
    """DuckDB mirror of :func:`weighted_median`. ``base_cte`` exposes
    (keys..., v, wt) with wt integral positive."""
    ks = ", ".join(key_exprs)
    return f"""
WITH base AS (SELECT * FROM ({base_cte}) WHERE wt > 0),
cum AS (
  SELECT {ks}, v,
         CAST(sum(wt) OVER (PARTITION BY {ks} ORDER BY v ASC) AS BIGINT) AS cw,
         CAST(sum(wt) OVER (PARTITION BY {ks}) AS BIGINT) AS W
  FROM base
)
SELECT {ks}, max(W) AS total_weight, CAST(min(v) AS DOUBLE) AS weighted_median
FROM cum WHERE 2 * cw >= W
GROUP BY {ks}
"""


def pareto_concentration(
    df: DataFrame,
    key_cols: "Sequence[str]",
    member_col: str,
    value_col: str,
    threshold_pct: int = 80,
) -> DataFrame:
    """Pareto (80/20) concentration per key: the smallest number of
    members (ranked by value, descending) whose cumulative value reaches
    ``threshold_pct`` of the key's total — the business-facing view of
    the concentration family (:func:`theil_index` and Gini measure
    inequality abstractly; this answers "how many customers are 80% of
    revenue"). ``value_col`` must be exact DECIMAL.

    The threshold compare is EXACT integer-style decimal arithmetic —
    a member is needed while 100·cum_before < pct·total — no float
    share ever computed for the decision; the reported share divides
    exact counts (one double shape, rounded 6). One key-ordered window
    (value DESC, member ASC tie-break). Returns (keys..., n_members,
    n_top, top_share)."""
    if not (0 < int(threshold_pct) < 100):
        raise ValueError("threshold_pct must be in (0, 100)")
    keys = list(key_cols)
    pct = int(threshold_pct)
    w = Window.partitionBy(*keys).orderBy(
        F.col("_v").desc(), F.col("_m").asc()
    )
    tot = Window.partitionBy(*keys)
    base = df.select(
        *keys, F.col(member_col).alias("_m"), F.col(value_col).alias("_v")
    )
    cum = base.select(
        *keys,
        "_v",
        (F.sum("_v").over(w) - F.col("_v")).alias("_before"),
        F.sum("_v").over(tot).alias("_total"),
    )
    needed = (F.lit(100) * F.col("_before") < F.lit(pct) * F.col("_total")).cast(
        "int"
    )
    return (
        cum.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(needed).cast("long").alias("n_top"),
        )
        .select(
            *keys,
            "n_members",
            "n_top",
            F.round(
                F.col("n_top").cast("double") / F.col("n_members").cast("double"), 6
            ).alias("top_share"),
        )
    )


def pareto_oracle_sql(
    base_cte: str, key_exprs: "Sequence[str]", threshold_pct: int = 80
) -> str:
    """DuckDB mirror of :func:`pareto_concentration`. ``base_cte``
    exposes (keys..., m, v) with v exact decimal."""
    ks = ", ".join(key_exprs)
    pct = int(threshold_pct)
    return f"""
WITH base AS ({base_cte}),
cum AS (
  SELECT {ks}, v,
         sum(v) OVER (PARTITION BY {ks} ORDER BY v DESC, m ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - v AS before,
         sum(v) OVER (PARTITION BY {ks}) AS total
  FROM base
)
SELECT {ks}, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN 100 * before < {pct} * total THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
       round(CAST(sum(CASE WHEN 100 * before < {pct} * total THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS top_share
FROM cum GROUP BY {ks}
"""


def bootstrap_mean_ci(
    df: DataFrame,
    key_cols: "Sequence[str] | list[str]",
    t_col: str,
    v_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    salt: str = "boot",
) -> DataFrame:
    """Percentile-bootstrap confidence interval for the per-key mean —
    HASH-DETERMINISTIC resampling, so the \"random\" draws are identical
    in every engine and every run (the same md5 hash family as the
    CMS/HLL sketches; classic bootstrap randomness is exactly what an
    oracle-checked engine can't have).

    Resample b draws n indices ``hash32(salt_b_j_key) % n`` with
    replacement; each resample's SUM folds as DECIMAL (exact), resamples
    rank by that exact sum (tie-break b), and the CI bounds are the
    order statistics at ranks ``floor(α/2·B)`` and ``B+1−floor(α/2·B)``.
    The only floats are the final mean/se expressions, one shape on both
    engines.

    Scale: the grid is |keys|·B·n rows where n is the SERIES length
    (calendar-sized, never the event grain) — the resample join is a
    co-partitioned equi-join on (key, index), embarrassingly parallel in
    B. ``v_col`` must be an exact DECIMAL.

    Returns one row per key: (keys…, n_obs, n_boot, point_mean, ci_lo,
    ci_hi, se_boot).
    """
    if n_boot < 4:
        raise ValueError("n_boot must be >= 4")
    if not (0.0 < alpha < 1.0):
        raise ValueError("alpha must be in (0, 1)")
    lo_rank = int((alpha / 2.0) * n_boot)
    if lo_rank < 1:
        raise ValueError("alpha/2 * n_boot must be >= 1 (raise n_boot)")
    hi_rank = n_boot + 1 - lo_rank
    keys = list(key_cols)
    kexpr = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
    w_key = Window.partitionBy(*keys)
    base = df.select(
        *keys,
        (F.row_number().over(w_key.orderBy(F.col(t_col).asc())) - 1).alias("_i"),
        F.count(F.lit(1)).over(w_key).cast("long").alias("_n"),
        F.col(v_col).alias("_v"),
        kexpr.alias("_ks"),
    ).transform(lineage_cut)
    # each observation row hosts one draw slot j per resample b
    grid = base.select(
        *keys,
        "_n",
        "_ks",
        F.col("_i").alias("_j"),
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_b"),
    )
    draw_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}_"),
                    F.col("_b").cast("string"),
                    F.lit("_"),
                    F.col("_j").cast("string"),
                    F.lit("_"),
                    F.col("_ks"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    drawn = grid.withColumn("_tgt", draw_hash % F.col("_n"))
    vals = base.select(*keys, F.col("_i").alias("_tgt"), "_v")
    sums = (
        drawn.join(vals, [*keys, "_tgt"])
        .groupBy(*keys, "_b")
        .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).cast("long").alias("_n"))
    )
    ranked = sums.withColumn(
        "_r",
        F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col("_s").asc(), F.col("_b").asc())
        ),
    )
    s18 = F.col("_s").cast("decimal(18,2)")
    stats = ranked.groupBy(*keys).agg(
        F.max("_n").alias("_n"),
        F.min(F.when(F.col("_r") == lo_rank, F.col("_s"))).alias("_slo"),
        F.min(F.when(F.col("_r") == hi_rank, F.col("_s"))).alias("_shi"),
        F.sum(s18).alias("_ss"),
        F.sum(s18 * s18).alias("_ss2"),
    )
    point = df.groupBy(*keys).agg(
        F.sum(F.col(v_col)).alias("_pt"), F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    nd = F.col("_n").cast("double")
    bd = float(n_boot)
    var_sums = (
        F.col("_ss2").cast("double")
        - F.col("_ss").cast("double") * F.col("_ss").cast("double") / F.lit(bd)
    ) / F.lit(bd - 1.0)
    return point.join(stats, keys).select(
        *keys,
        "n_obs",
        F.lit(n_boot).cast("long").alias("n_boot"),
        F.round(F.col("_pt").cast("double") / F.col("n_obs").cast("double"), 6).alias(
            "point_mean"
        ),
        F.round(F.col("_slo").cast("double") / nd, 6).alias("ci_lo"),
        F.round(F.col("_shi").cast("double") / nd, 6).alias("ci_hi"),
        F.round(F.sqrt(F.greatest(var_sums, F.lit(0.0))) / nd, 6).alias("se_boot"),
    )


def hill_tail_index(
    df: DataFrame,
    key_cols: "Sequence[str] | list[str]",
    value_col: str,
    tiebreak_col: str,
    k: int = 50,
) -> DataFrame:
    """Hill estimator of the Pareto tail index per key: over the top-``k``
    order statistics x₍₁₎ ≥ … ≥ x₍ₖ₎,
    ``α̂ = (k−1) / Σᵢ₌₁^{k−1} ln(xᵢ / xₖ)`` — how heavy the upper tail is
    (α < 2: infinite variance). The tail-risk companion of
    :func:`pareto_concentration` / the Benford and Gini profiles.

    One rank window elects the top-k (value desc, tie-break asc —
    deterministic under ties); the log terms use the registry's
    round-then-decimal fold (9 dp, order-independent); the final α̂ is
    one fixed-shape float division. Keys with fewer than ``k`` positive
    values are DROPPED (no k-th order statistic exists); a zero log-sum
    (all top-k equal) reports a NULL α̂ — the honest degenerate answers.
    Everything after the rank window is |keys|-sized.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    keys = list(key_cols)
    v = F.col(value_col)
    base = df.filter(v > 0).select(
        *keys, v.alias("_x"), F.col(tiebreak_col).alias("_tb")
    )
    w = Window.partitionBy(*keys).orderBy(F.col("_x").desc(), F.col("_tb").asc())
    # lineage cut: ranked feeds both the k-th-order-statistic probe and the
    # terms join — without it the base scan re-runs per branch
    ranked = (
        base.select(*keys, "_x", F.row_number().over(w).alias("_rk"))
        .filter(F.col("_rk") <= k)
        .transform(lineage_cut)
    )
    xk = ranked.filter(F.col("_rk") == k).select(
        *keys, F.col("_x").alias("_xk")
    )
    terms = ranked.filter(F.col("_rk") < k).join(F.broadcast(xk), keys)
    log_term = F.round(
        F.log(F.col("_x").cast("double") / F.col("_xk").cast("double")), 9
    ).cast("decimal(28,9)")
    agg = terms.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.max(F.col("_xk").cast("double")).alias("x_k"),
        F.sum(log_term).alias("_slog"),
    )
    alpha = F.when(
        F.col("_slog") > 0,
        F.round(
            F.col("n_terms").cast("double") / F.col("_slog").cast("double"), 6
        ),
    )
    return agg.select(
        *keys,
        F.lit(k).cast("long").alias("k"),
        "n_terms",
        F.round(F.col("x_k"), 6).alias("x_k"),
        F.round(F.col("_slog").cast("double"), 6).alias("sum_log"),
        alpha.alias("hill_alpha"),
    )


def dispersion_index(
    df: DataFrame,
    key_cols: "Sequence[str] | list[str]",
    count_col: str,
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) per key over a count
    series — the Poisson-ness check: D ≈ 1 is Poisson, D > 1
    overdispersed (bursty), D < 1 underdispersed (regular); the χ²
    statistic (n−1)·D grades it. The count-data companion of the
    z-score/EWMA volume monitors (they assume a stable mean; this asks
    whether the VARIANCE is even compatible with one).

    Counts are exact integers, so Σc and Σc² are exact LONG sums and
    mean/variance are the only floats (one shape per engine, sample
    variance via the sum identity). Keys with n < 2 or zero mean yield
    NULL. One map-side-combined aggregate; output is |keys|-sized.
    """
    keys = list(key_cols)
    c = F.col(count_col).cast("long")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(c).alias("_s"),
        F.sum(c * c).alias("_ss"),
    )
    n = F.col("n_obs").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - F.lit(1.0))
    ok = (F.col("n_obs") >= 2) & (F.col("_s") > 0)
    d = var / mean
    return agg.select(
        *keys,
        "n_obs",
        F.round(mean, 6).alias("mean_count"),
        (F.round(F.when(ok, var), 6) + F.lit(0.0)).alias("var_count"),
        (F.round(F.when(ok, d), 6) + F.lit(0.0)).alias("dispersion_index"),
        (F.round(F.when(ok, (n - F.lit(1.0)) * d), 6) + F.lit(0.0)).alias("chi2"),
        F.when(ok, d > F.lit(1.0)).alias("overdispersed"),
    )
