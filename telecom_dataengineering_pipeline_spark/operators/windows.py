"""Window operators — batch analogs of the reference's Flink keyed state.

W3 — previous-event lookup per key (Flink ValueState,
``fraud_detection.py:85-93``) → ``F.lag`` over an event-time window.

W4 — trailing time-window count per key (Flink ListState pruned to 30 min,
``fraud_detection.py:95-100``) → ``rangeBetween`` over epoch-microseconds.

Both are one shuffle on the key; Spark sorts within partitions — exactly the
shape a 1000-executor cluster wants (no driver-side state, skew handled by
AQE only for joins, so extremely hot keys would need salting — telecom
customer keys are near-uniform).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..lineage import lineage_cut


def with_prev_event(
    df: DataFrame,
    key: str,
    ts_col: str,
    cols: Sequence[str],
    tie_break: str,
    prefix: str = "prev_",
) -> DataFrame:
    """Add ``prev_<c>`` for each requested column = value on the key's previous
    event ordered by (ts, tie_break)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tie_break))
    out = df
    for c in cols:
        out = out.withColumn(prefix + c, F.lag(c).over(w))
    return out


def sliding_count_by_time(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_seconds: int,
    count_col: str = "events_in_window",
) -> DataFrame:
    """Trailing-window event count per key: count of the key's events with
    ts in (current - window, current]. Uses microsecond epochs so Spark and
    any nanosecond-precision oracle agree after truncation."""
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key)
        .orderBy(us)
        .rangeBetween(-(window_seconds * 1_000_000 - 1), 0)
    )
    return df.withColumn(count_col, F.count(F.lit(1)).over(w))


def quantile_bucket_scores(
    df,
    metric_cols,
    k: int = 4,
    accuracy: int = 10000,
    suffix: str = "_bucket",
    exact: bool = False,
):
    """Quantile bucket (quartile/decile) scores WITHOUT a global window —
    the 100 TB replacement for ``ntile(k) OVER (ORDER BY metric)``, which
    funnels every row through one partition. One scalar aggregate
    computes k−1 approx-percentile cutoffs per metric, broadcasts the
    single cutoff row, and assigns buckets by comparison: zero global
    sorts, zero single-partition exchanges, cost = one extra map stage.

    The trade (stated, not hidden): boundaries come from a sketch
    (``accuracy`` trades memory for error), so bucket POPULATIONS are
    approximately equal instead of exactly equal, and ties land in one
    bucket together instead of splitting. Ascending convention: bucket 1
    holds the smallest values; NULL metrics get NULL buckets.

    ``exact=True`` upgrades the cutoffs to rank-exact at ANY scale —
    sketch proposes, exact refinement disposes: the proposed cutoff v for
    prob p is checked against the target order statistic r = ceil(p·n)
    (n = non-null count) with one conditional-count aggregate over all
    proposed cutoffs at once; when count(x<v) < r <= count(x<=v) fails,
    the true r-th smallest is recovered with a tiny TakeOrdered job on
    the narrow slice above/below v whose depth is bounded by the sketch's
    rank error (<= n/accuracy — at most a handful of rows at sane
    accuracy; guarded so a mis-sized sketch fails loudly instead of
    launching an unbounded sort). Still zero global sorts: TakeOrdered
    keeps k rows per partition. The refinement runs 2 extra jobs at
    plan-build time and bucket comparison uses plain literals, so the
    returned plan is pure map-side.

    ``exact=True`` contract (ADVICE r11): the refinement jobs run EAGERLY
    over ``df`` at call time and the collected cutoffs then score ``df``
    again — the input must be deterministic across those evaluations
    (cache/localCheckpoint any non-deterministic lineage first, as
    ``customer_rfm_segments_approx`` does), or the refined cutoffs can
    disagree with the data they score. An all-NULL (or empty) metric
    column skips refinement and emits NULL buckets, matching
    ``exact=False``."""
    from pyspark.sql import functions as F

    probs = [i / k for i in range(1, k)]
    sketch_aggs = [
        F.percentile_approx(
            F.col(c), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias(f"__cuts_{c}")
        for c in metric_cols
    ]
    if not exact:
        cuts = df.agg(*sketch_aggs)
        out = df.crossJoin(F.broadcast(cuts))
        for c in metric_cols:
            b = F.lit(1)
            for i in range(1, k):
                b = b + (
                    F.col(c) > F.element_at(F.col(f"__cuts_{c}"), i)
                ).cast("int")
            out = out.withColumn(
                f"{c}{suffix}", F.when(F.col(c).isNotNull(), b).cast("int")
            )
        return out.drop(*[f"__cuts_{c}" for c in metric_cols])

    import math

    stats = df.agg(
        *sketch_aggs,
        *[F.count(F.col(c)).alias(f"__n_{c}") for c in metric_cols],
    ).collect()[0]
    cond_aggs = []
    for c in metric_cols:
        # percentile_approx yields NULL for an all-NULL/empty column —
        # no cutoffs to check, no refinement (ADVICE r11 guard).
        for i, v in enumerate(stats[f"__cuts_{c}"] or []):
            cond_aggs.append(
                F.sum((F.col(c) < F.lit(v)).cast("long")).alias(f"__lt_{c}_{i}")
            )
            cond_aggs.append(
                F.sum((F.col(c) <= F.lit(v)).cast("long")).alias(f"__le_{c}_{i}")
            )
    counts = df.agg(*cond_aggs).collect()[0] if cond_aggs else None
    exact_cuts: dict[str, list] = {}
    for c in metric_cols:
        n_c = stats[f"__n_{c}"]
        if not n_c or stats[f"__cuts_{c}"] is None:
            # All-NULL column: every row's metric is NULL, so the
            # isNotNull guard below emits NULL buckets regardless of
            # cutoffs — same behavior as exact=False.
            exact_cuts[c] = []
            continue
        refined = []
        for i, p in enumerate(probs):
            r = math.ceil(p * n_c)
            v = stats[f"__cuts_{c}"][i]
            c_lt = counts[f"__lt_{c}_{i}"] or 0
            c_le = counts[f"__le_{c}_{i}"] or 0
            if c_lt < r <= c_le:
                refined.append(v)
                continue
            # Sketch rank error bound: a correction deeper than this means
            # the accuracy/n contract is broken — fail loudly.
            err_cap = max(4, 2 * math.ceil(n_c / max(accuracy, 1)))
            if c_le < r:  # true cutoff above v: (r - c_le)-th smallest > v
                depth = r - c_le
                slice_ = df.where(F.col(c) > F.lit(v)).orderBy(F.col(c).asc())
            else:  # c_lt >= r: true cutoff below v: (c_lt - r + 1)-th largest < v
                depth = c_lt - r + 1
                slice_ = df.where(F.col(c) < F.lit(v)).orderBy(F.col(c).desc())
            if depth > err_cap:
                raise ValueError(
                    f"quantile_bucket_scores(exact=True): sketch for {c!r} "
                    f"p={p} missed the target rank by {depth} > error cap "
                    f"{err_cap}; raise accuracy (n={n_c}, accuracy={accuracy})"
                )
            row = (
                slice_.select(c)
                .limit(depth)
                .agg(
                    (F.min(c) if c_lt >= r else F.max(c)).alias("__t")
                )
                .collect()[0]
            )
            refined.append(row["__t"])
        exact_cuts[c] = refined
    out = df
    for c in metric_cols:
        b = F.lit(1)
        for v in exact_cuts[c]:
            b = b + (F.col(c) > F.lit(v)).cast("int")
        out = out.withColumn(
            f"{c}{suffix}", F.when(F.col(c).isNotNull(), b).cast("int")
        )
    return out


def sequence_funnel(
    df,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps,
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
):
    """Deepest funnel step reached per user by an ORDERED subsequence of
    events (ClickHouse ``windowFunnel`` semantics): step k+1 counts only
    after step k matched, intervening other events are ignored, and with
    ``within_seconds`` the whole chain must fit inside a window opened by
    the step-1 match (greedy: the FIRST step-1 occurrence opens it).

    Scale shape: events are pre-filtered to the step names (usually a
    huge reduction), collapsed to one sorted per-user array in a single
    map-side-combined aggregate, and the greedy state machine runs as a
    higher-order ``aggregate`` over that array — per-user scalar state
    (depth, window start), no window function, no UDF, one shuffle on
    the user key. Ordering ties break on ``tiebreak_col`` (required
    deterministic order inside equal timestamps; defaults to the event
    name). Returns (user, funnel_depth, window_start_us)."""
    from pyspark.sql import functions as F

    if not steps:
        raise ValueError("sequence_funnel needs at least one step")
    tb = tiebreak_col or event_col
    filtered = df.filter(F.col(event_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("us"),
            F.col(tb).cast("string").alias("tb"),
            F.col(event_col).alias("ev"),
        ).alias("e"),
    )
    per_user = filtered.groupBy("user").agg(
        F.sort_array(F.collect_list("e")).alias("evs")
    )
    # state: (depth, t0) — the chained whens advance depth when the next
    # expected step arrives (and still fits the window for depth >= 1)
    limit_us = None if within_seconds is None else within_seconds * 1_000_000
    step_arr = F.array(*[F.lit(s) for s in steps])

    def advance(acc, e):
        expected = F.element_at(step_arr, acc["depth"] + 1)
        fits = (
            F.lit(True)
            if limit_us is None
            else (acc["depth"] == 0) | (e["us"] - acc["t0"] <= F.lit(limit_us))
        )
        matches = (acc["depth"] < len(steps)) & (e["ev"] == expected) & fits
        return F.struct(
            F.when(matches, acc["depth"] + 1).otherwise(acc["depth"]).alias("depth"),
            F.when(matches & (acc["depth"] == 0), e["us"])
            .otherwise(acc["t0"])
            .alias("t0"),
        )

    init = F.struct(F.lit(0).alias("depth"), F.lit(0).cast("long").alias("t0"))
    state = F.aggregate(F.col("evs"), init, advance)
    return per_user.select(
        F.col("user").alias(user_col),
        state["depth"].cast("int").alias("funnel_depth"),
        F.when(state["depth"] > 0, state["t0"]).alias("window_start_us"),
    )


def last_touch_attribution(
    df,
    user_col: str,
    ts_col: str,
    event_col: str,
    conversion: str,
    touch_events: Sequence[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
):
    """Last-touch marketing attribution: for every ``conversion`` event,
    the most recent STRICTLY PRECEDING touch event by the same user (and
    within ``within_seconds``, when set) — the attribution rollup every
    campaign mart starts from.

    One shuffle on the user key: events pre-filter to the touch set plus
    the conversion (usually a huge reduction), and the carry is a single
    ``last_value(..., ignorenulls=True)`` over rows up to the PREVIOUS
    event — no self-join, no as-of join against a second relation needed
    because touches and conversions share one stream. The touch's fields
    ride in separate last_value calls over the same frame; they are
    null/non-null together because the same CASE guards both. Ordering
    ties break on ``tiebreak_col`` (defaults to the event name). Returns
    (user, conversion_us, tb, touch_event, touch_us) — touch columns
    null when no touch qualifies."""
    if conversion in set(touch_events):
        raise ValueError("the conversion event cannot also be a touch event")
    tb = tiebreak_col or event_col
    names = [conversion, *touch_events]
    ev = df.filter(F.col(event_col).isin(names)).select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        F.col(event_col).alias("ev"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("us", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("ev").isin(list(touch_events))
    touch_ev = F.last(F.when(is_touch, F.col("ev")), ignorenulls=True).over(w)
    touch_us = F.last(F.when(is_touch, F.col("us")), ignorenulls=True).over(w)
    out = ev.withColumn("touch_event", touch_ev).withColumn("touch_us", touch_us)
    out = out.filter(F.col("ev") == conversion)
    if within_seconds is not None:
        fits = F.col("us") - F.col("touch_us") <= within_seconds * 1_000_000
        out = out.withColumn(
            "touch_event", F.when(fits, F.col("touch_event"))
        ).withColumn("touch_us", F.when(fits, F.col("touch_us")))
    return out.select(
        F.col("user").alias(user_col),
        F.col("us").alias("conversion_us"),
        "tb",
        "touch_event",
        "touch_us",
    )


def sessionize_events(
    df,
    user_col: str,
    ts_col: str,
    value_col: str,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
):
    """Gap-based sessionization, batch form — the twin of the streaming
    keyed-state sessionizer (``streaming/sessions.py``), same semantics
    bit-for-bit: a session breaks when the gap to the previous event of
    the same user exceeds ``gap_seconds``; per-event values accumulate as
    HALF-UP integer cents (both engines' ``round`` rule) and divide back
    once per session, so the sums are exact and engine-stable.

    One shuffle on the user key: the break flag is a ``lag`` over the
    (µs, tie-break)-ordered stream, the session sequence its running sum
    over the same window (two window functions, ONE exchange+sort), and
    the per-session rollup rides the same partitioning. ``is_open`` marks
    the user's last session (no successor gap has closed it) — the rows
    the streaming twin holds in state until the watermark passes.

    Returns (user, session_seq 1-based, start_us, last_us, n_events,
    sum_value, is_open)."""
    gap_us = int(gap_seconds) * 1_000_000
    tb = tiebreak_col or ts_col
    ev = df.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        F.round(F.col(value_col).cast("double") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user").orderBy("us", "tb")
    brk = F.when(
        F.lag("us").over(w).isNull() | (F.col("us") - F.lag("us").over(w) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user").orderBy("us", "tb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tagged = ev.withColumn("session_seq", F.sum(brk).over(run).cast("long"))
    sess = tagged.groupBy("user", "session_seq").agg(
        F.min("us").alias("start_us"),
        F.max("us").alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias("sum_value"),
    )
    per_user_last = Window.partitionBy("user")
    return sess.withColumn(
        "is_open", F.col("session_seq") == F.max("session_seq").over(per_user_last)
    ).select(
        F.col("user").alias(user_col),
        "session_seq",
        "start_us",
        "last_us",
        "n_events",
        "sum_value",
        "is_open",
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle — the classic product-analytics matrix:
    users are cohorted by the period of their FIRST event, and each cell
    (cohort, offset) counts how many of them were active ``offset``
    periods later. Complements the funnel (ordered steps within a user)
    and :func:`sessionize_events` (gap structure) with the long-horizon
    comeback view; ``lapsed_users``' EXCEPT is its 2-period special case.

    Scale shape: ONE user-keyed exchange computes each user's cohort
    (min period) and distinct active-period set in the same aggregate;
    the explode to (cohort, offset) cells is map-side, and the cell
    aggregate's grain is cohorts × offsets (calendar-sized, never
    user-sized). The per-cohort denominator rides a window over that
    post-agg grain — the single-scan discipline from seasonal_index (no
    join back onto the user relation, which Spark would re-derive).

    Every user is active at offset 0 by construction (the cohort IS
    their first period), so retention_rate at offset 0 is exactly 1.0
    and the cohort size needs no separate pass. ``period`` ∈ day / week /
    month (date_trunc grains with exact integer offset arithmetic);
    ``max_offset`` trims the triangle (the 100 TB guard when the stream
    spans years but the report wants 12 columns).

    Returns (cohort, period_offset, active_users, cohort_size,
    retention_rate) — cohort as an ISO date string, rate rounded to 6."""
    divisors = {"day": 1, "week": 7}
    if period not in ("day", "week", "month"):
        raise ValueError("period must be one of day/week/month")
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    users = (
        df.select(F.col(user_col).alias("u"), p.alias("_p"))
        .groupBy("u")
        .agg(
            F.min("_p").alias("_cohort"),
            F.collect_set("_p").alias("_periods"),
        )
    )
    cells = users.select(
        "_cohort", F.explode("_periods").alias("_active")
    )
    if period == "month":
        off = F.months_between(F.col("_active"), F.col("_cohort")).cast("long")
    else:
        off = (
            F.datediff(F.col("_active"), F.col("_cohort"))
            / F.lit(divisors[period])
        ).cast("long")
    cells = cells.select("_cohort", off.alias("period_offset"))
    if max_offset is not None:
        cells = cells.filter(F.col("period_offset") <= int(max_offset))
    agg = cells.groupBy("_cohort", "period_offset").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    )
    wc = Window.partitionBy("_cohort")
    size = F.max(
        F.when(F.col("period_offset") == 0, F.col("active_users"))
    ).over(wc)
    return agg.select(
        F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
        "period_offset",
        "active_users",
        size.cast("long").alias("cohort_size"),
        F.round(
            F.col("active_users").cast("double") / size.cast("double"), 6
        ).alias("retention_rate"),
    )


def interarrival_profile(
    df: DataFrame,
    key_cols: "list[str] | tuple[str, ...]",
    ts_col: str,
) -> DataFrame:
    """Per-key inter-arrival-time profile — the burstiness fingerprint
    between :func:`sessionize_events` (which CUTS on a gap threshold)
    and the sliding-window counters (which fix a horizon): how are the
    gaps themselves distributed? Emits the Goh–Barabási burstiness
    B = (σ−μ)/(σ+μ) ∈ [−1, 1]: B → −1 is a metronome (periodic
    heartbeat traffic), B ≈ 0 is Poisson, B → +1 is bursty (human /
    fraud-bot traffic) — the single number that separates machine from
    human event streams.

    One key-ordered window computes the lag gaps in INTEGER seconds;
    the same keyed partitioning carries the aggregate (no second
    shuffle). μ and σ come from exact integer Σg and Σg² via the
    closed-form sample variance n·Σg² − (Σg)², so every engine computes
    bit-identical doubles from identical integer sums — no float
    accumulation, no decimal recipe needed. Ties in ``ts_col`` produce
    0-gaps (honest for same-second events); the first event per key has
    no gap and is excluded by lag()'s NULL.

    Returns (*key_cols, n_events, n_gaps, mean_gap_s, min_gap_s,
    max_gap_s, std_gap_s, burstiness) with doubles rounded to 6; std
    and burstiness NULL when n_gaps < 2, burstiness NULL for all-zero
    gaps (σ+μ = 0)."""
    kcols = [F.col(c) for c in key_cols]
    ts = F.unix_timestamp(F.col(ts_col)).cast("long")
    wo = Window.partitionBy(*kcols).orderBy(
        F.col(ts_col).asc()
    )
    cur = df.select(*kcols, F.col(ts_col)).withColumn(
        "_gap", ts - F.lag(ts, 1).over(wo)
    )
    agg = cur.groupBy(*kcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("_gap").cast("long").alias("n_gaps"),
        F.sum("_gap").cast("long").alias("_s"),
        F.sum(F.col("_gap") * F.col("_gap")).cast("long").alias("_ss"),
        F.min("_gap").cast("long").alias("min_gap_s"),
        F.max("_gap").cast("long").alias("max_gap_s"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("_s").cast("double") / n
    var = (
        F.col("n_gaps").cast("double") * F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double")
    ) / (n * (n - F.lit(1.0)))
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    b = F.when(
        (std + mean) > 0, F.round((std - mean) / (std + mean), 6)
    )
    return agg.select(
        *key_cols,
        "n_events",
        "n_gaps",
        F.when(F.col("n_gaps") > 0, F.round(mean, 6)).alias("mean_gap_s"),
        "min_gap_s",
        "max_gap_s",
        F.when(F.col("n_gaps") > 1, F.round(std, 6)).alias("std_gap_s"),
        F.when(F.col("n_gaps") > 1, b).alias("burstiness"),
    )


def eventually_follows(
    df: DataFrame,
    case_col: str,
    order_col: str,
    activity_col: str,
) -> DataFrame:
    """Eventually-follows matrix over event logs — the process-mining
    relation under conformance checking: activity A eventually-follows
    into B within a case iff SOME occurrence of A precedes SOME
    occurrence of B, i.e. min_order(A) < max_order(B). The long-range
    complement of the adjacent-transition matrix (Markov transitions
    count only immediate successors; EF catches "signup … eventually
    purchase" across any number of intermediate events) and the
    relation a directly-follows process graph is mined from.

    Scale shape: one (case, activity) map-side-combined aggregate
    collapses the event grain to the case-activity profile (≤ |A| rows
    per case); the per-case pair fan-out self-joins THAT relation (|A|²
    per case, |A| = activity-alphabet size — bounded, never events²);
    pair support is one further map-side-combined count. No window, no
    events-grain self-join.

    Determinism: comparisons and counts are exact integers
    (``order_col`` must be integral and totally ordered — µs epochs in
    the registered queries; strict `<` keeps simultaneous A/B
    one-sided); support is one double division rounded to 6. Returns
    one row per ordered activity pair that co-occurs in ≥1 case:
    (activity_a, activity_b, n_cases_both, n_follows, support)."""
    base = df.filter(
        F.col(case_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(activity_col).isNotNull()
    ).select(
        F.col(case_col).alias("_case"),
        F.col(activity_col).alias("_act"),
        F.col(order_col).cast("long").alias("_t"),
    )
    prof = base.groupBy("_case", "_act").agg(
        F.min("_t").alias("_first"), F.max("_t").alias("_last")
    )
    a = prof.select(
        "_case", F.col("_act").alias("activity_a"), F.col("_first").alias("_fa")
    )
    b = prof.select(
        "_case", F.col("_act").alias("activity_b"), F.col("_last").alias("_lb")
    )
    pairs = a.join(b, "_case").filter(F.col("activity_a") != F.col("activity_b"))
    agg = pairs.groupBy("activity_a", "activity_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_cases_both"),
        F.sum((F.col("_fa") < F.col("_lb")).cast("int"))
        .cast("long")
        .alias("n_follows"),
    )
    return agg.select(
        "activity_a",
        "activity_b",
        "n_cases_both",
        "n_follows",
        F.round(
            F.col("n_follows").cast("double") / F.col("n_cases_both").cast("double"), 6
        ).alias("support"),
    )


def case_variants(
    df: DataFrame,
    case_col: str,
    activity_col: str,
    ts_col: str,
    tiebreak_col: str,
    max_steps: int = 5,
) -> DataFrame:
    """Process-mining variant analysis — collapse every case to its
    ordered activity path (capped at the first ``max_steps`` events)
    and count how the population distributes over paths. The
    trace-level summary ABOVE :func:`eventually_follows` (the matrix
    says which pairs ever follow; variants say which whole JOURNEYS
    dominate and how much of the volume the top paths explain).

    Scale shape: ONE case-keyed exchange — events collapse to a sorted
    per-case struct array inside the aggregate (map-side combined), the
    path truncates to ``max_steps`` BEFORE becoming a string, and the
    variant rollup + share/rank ride the post-agg grain (a window over
    variant rows, bounded by the activity-alphabet^max_steps, never by
    cases).

    Determinism: ordering is (event time in exact microseconds,
    ``tiebreak_col``) — pass a unique tie-break; counts are exact;
    share is one fixed-shape double rounded to 6; rank breaks count
    ties on the variant string. NULL case/activity/ts rows are
    excluded. Returns one row per variant: (variant, n_cases, share,
    rank)."""
    if max_steps < 1:
        raise ValueError("case_variants needs max_steps >= 1")
    base = df.filter(
        F.col(case_col).isNotNull()
        & F.col(activity_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(case_col).alias("_case"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(tiebreak_col).cast("string").alias("_tb"),
        F.col(activity_col).cast("string").alias("_act"),
    )
    per_case = base.groupBy("_case").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.sort_array(F.collect_list(F.struct("_us", "_tb", "_act"))),
                    1,
                    max_steps,
                ),
                lambda s: s["_act"],
            ),
            ">",
        ).alias("variant")
    )
    g = per_case.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_cases")
    )
    wall = Window.partitionBy()
    wrank = Window.orderBy(F.col("n_cases").desc(), F.col("variant").asc())
    g = g.withColumn("_tot", F.sum("n_cases").over(wall).cast("long"))
    return g.select(
        "variant",
        "n_cases",
        F.round(F.col("n_cases").cast("double") / F.col("_tot").cast("double"), 6).alias(
            "share"
        ),
        F.row_number().over(wrank).cast("long").alias("rank"),
    )


def case_cycle_profile(
    df: DataFrame,
    case_col: str,
    activity_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Cycle-time profile by entry activity — how long does a case take
    from first to last event, grouped by HOW the journey started? The
    duration lens on the same trace grain :func:`case_variants` counts:
    a funnel that starts with 'error' finishing 3× slower than one that
    starts with 'view' is the classic process-mining finding.

    Scale shape: ONE case-keyed exchange collapses events to (first
    activity, duration) — first-activity election and the min/max
    timestamps share a single aggregate via an ordered struct min — and
    the stats fold map-side over the entry-activity grain
    (alphabet-sized).

    Determinism: durations are exact microsecond LONGs (summed as
    DECIMAL); the first event elects by (time, ``tiebreak_col``); mean
    seconds is a fixed-shape double rounded to 6. Returns one row per
    entry activity: (first_activity, n_cases, mean_duration_s,
    min_duration_s, max_duration_s)."""
    base = df.filter(
        F.col(case_col).isNotNull()
        & F.col(activity_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(case_col).alias("_case"),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.col(tiebreak_col).cast("string").alias("_tb"),
        F.col(activity_col).cast("string").alias("_act"),
    )
    per_case = base.groupBy("_case").agg(
        F.min(F.struct("_us", "_tb", "_act")).alias("_first"),
        F.min("_us").alias("_lo"),
        F.max("_us").alias("_hi"),
    )
    g = per_case.select(
        F.col("_first._act").alias("first_activity"),
        (F.col("_hi") - F.col("_lo")).alias("_dur"),
    ).groupBy("first_activity").agg(
        F.count(F.lit(1)).cast("long").alias("n_cases"),
        F.sum(F.col("_dur").cast("decimal(24,0)")).alias("_sd"),
        F.min("_dur").alias("_mn"),
        F.max("_dur").alias("_mx"),
    )
    return g.select(
        "first_activity",
        "n_cases",
        F.round(
            F.col("_sd").cast("double")
            / F.col("n_cases").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean_duration_s"),
        F.round(F.col("_mn").cast("double") / F.lit(1000000.0), 6).alias(
            "min_duration_s"
        ),
        F.round(F.col("_mx").cast("double") / F.lit(1000000.0), 6).alias(
            "max_duration_s"
        ),
    )


def rolling_median(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_col: str,
    window: int = 7,
) -> DataFrame:
    """Exact rolling median over the last ``window`` rows per key — the
    robust sibling of the WMA/EWMA smoothers (one outlier day drags a
    mean for the whole window; the median shrugs it off), at the same
    calendar-grain series contract (feed daily/monthly aggregates, never
    raw events).

    Shape: ONE keyed sort window collects the trailing ``window`` values
    into an array (bounded: ``window`` elements per row — this is why
    the calendar-grain contract matters), sorts it in-expression, and
    elects the middle by integer order statistics: odd counts take the
    middle element, even counts average the two middles — the election
    indices are exact integers, so both engines pick identical elements.

    Determinism: pass an exact (decimal/integral) ``value_col``; the
    only double is the final middle(-pair average) expression, rounded
    to 6. ``order_col`` must be unique per key (a step/day index).
    Returns the series plus (n_in_window, rolling_median)."""
    if window < 1:
        raise ValueError("rolling_median needs window >= 1")
    kcols = [F.col(c) for c in key_cols]
    w = (
        Window.partitionBy(*kcols)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(int(window) - 1), Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col)).over(w))
    cur = df.withColumn("_arr", arr).withColumn(
        "_n", F.size("_arr").cast("long")
    )
    lo = F.element_at("_arr", ((F.col("_n") + 1) / 2).cast("int"))
    hi = F.element_at("_arr", (F.col("_n") / 2 + 1).cast("int"))
    med = F.round((lo.cast("double") + hi.cast("double")) / F.lit(2.0), 6)
    return cur.select(
        *key_cols,
        F.col(order_col),
        F.col(value_col),
        F.col("_n").alias("n_in_window"),
        med.alias("rolling_median"),
    )


def abc_classification(
    df: DataFrame,
    item_col: str,
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """ABC / Pareto classification — rank items by value contribution,
    accumulate the share, and band: 'A' while the running share is
    within ``a_cut`` (the vital few), 'B' to ``b_cut``, 'C' beyond (the
    trivial many). The inventory/revenue-concentration companion of the
    Gini/HHI monitors (they grade the WHOLE distribution; this labels
    each item).

    Shape: one item-grain rollup (exact decimal sum), then a single
    global sort window for rank and running share — item grain is
    metadata-sized next to the fact table (the eval-grain contract).
    Ties in value break on the item id, so the cumulative share (and
    therefore the class boundary) is deterministic cross-engine.

    Determinism: sums exact; share/cum_share are fixed-shape doubles
    rounded to 6; the class CASE compares the ROUNDED cumulative share
    against literal cuts (same rounded value both engines — comparisons
    on unrounded doubles at a band edge would be ulp-fragile). Returns
    (item, total_value, rank, share, cum_share, abc_class)."""
    if not 0 < a_cut < b_cut < 1:
        raise ValueError("need 0 < a_cut < b_cut < 1")
    items = df.groupBy(F.col(item_col).alias("item")).agg(
        F.sum(F.col(value_col)).alias("_tv")
    )
    wrank = Window.orderBy(F.col("_tv").desc(), F.col("item").asc())
    wcum = wrank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    cur = (
        items.withColumn("rank", F.row_number().over(wrank).cast("long"))
        .withColumn("_cum", F.sum("_tv").over(wcum))
        .withColumn("_all", F.sum("_tv").over(wall))
    )
    share = F.round(F.col("_tv").cast("double") / F.col("_all").cast("double"), 6)
    cum = F.round(F.col("_cum").cast("double") / F.col("_all").cast("double"), 6)
    cls = (
        F.when(cum <= F.lit(float(a_cut)), F.lit("A"))
        .when(cum <= F.lit(float(b_cut)), F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return cur.select(
        "item",
        F.col("_tv").cast("double").alias("total_value"),
        "rank",
        share.alias("share"),
        cum.alias("cum_share"),
        cls.alias("abc_class"),
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    step_col: str,
) -> DataFrame:
    """Daily growth accounting (the Social-Capital/a16z framework): for
    each step (day/week), split active users into NEW (first activity),
    RETAINED (also active the previous step), RESURRECTED (inactive the
    previous step but seen before), and report CHURNED (active the
    previous step, inactive now) — the decomposition every growth
    dashboard runs on top of the cohort-retention triangle (which slices
    by cohort; this slices by state transition). Identity:
    active(t) = new + retained + resurrected, and
    active(t) = active(t−1) + new + resurrected − churned.

    Scale shape: one distinct (user, step) projection, ONE user-keyed
    sort window for lag/first flags, then a step-grain rollup; churn
    re-enters as each activity row's NEXT-step gap counted onto step+1
    (no self-join against the calendar). Steps where nothing happened
    emit no row (callers gap-fill on a spine if they need zeros).

    ``step_col`` must be an integral step index (day number); counts
    are exact LONGs — nothing to round. Returns (step, active, new_users,
    retained, resurrected, churned_from_prev)."""
    ua = df.select(
        F.col(user_col).alias("u"), F.col(step_col).cast("long").alias("t")
    ).distinct()
    # lag AND lead ride the SAME window spec — one exchange + one sort —
    # and the flagged relation is lineage-cut so the state and churn
    # rollups read one materialization (plan-audit finding: separate
    # lag/lead passes cost 6 exchanges and a double scan)
    w = Window.partitionBy("u").orderBy(F.col("t").asc())
    flagged = (
        ua.withColumn("_prev", F.lag("t").over(w))
        .withColumn("_next", F.lead("t").over(w))
        .transform(lineage_cut)
    )
    state = flagged.select(
        "t",
        F.when(F.col("_prev").isNull(), 1).otherwise(0).alias("_new"),
        F.when(F.col("_prev") == F.col("t") - 1, 1).otherwise(0).alias("_ret"),
        F.when(
            F.col("_prev").isNotNull() & (F.col("_prev") < F.col("t") - 1), 1
        ).otherwise(0).alias("_res"),
    )
    active = state.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("active"),
        F.sum("_new").cast("long").alias("new_users"),
        F.sum("_ret").cast("long").alias("retained"),
        F.sum("_res").cast("long").alias("resurrected"),
    )
    # churned at step t+1 = active at t whose next activity is not t+1
    churn = (
        flagged.filter(F.col("_next").isNull() | (F.col("_next") > F.col("t") + 1))
        .select((F.col("t") + 1).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("churned_from_prev"))
    )
    return (
        active.join(churn, "t", "left")
        .select(
            F.col("t").alias("step"),
            "active",
            "new_users",
            "retained",
            "resurrected",
            F.coalesce(F.col("churned_from_prev"), F.lit(0)).cast("long").alias(
                "churned_from_prev"
            ),
        )
    )


def dwell_time_profile(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-in-state profile: how long users DWELL in each state before
    their next event — the duration-weighted view of the transition
    matrix (``eventually_follows``/``transitions`` count WHERE users go;
    this measures HOW LONG they sit first). Dwell of an event = µs until
    the same user's next event (any state); each user's LAST event has
    no successor and is excluded (open-ended dwell is censoring —
    survival territory, not a mean).

    One user-keyed sort window (lead over (µs, tie-break)) then a
    state-grain rollup. Durations are exact integer µs; the mean/max
    divide exact sums (double, rounded 6). Returns one row per state:
    (state, n_dwells, mean_dwell_s, max_dwell_s, total_dwell_s)."""
    tb = tiebreak_col or ts_col
    ev = df.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        F.col(state_col).alias("state"),
    )
    w = Window.partitionBy("u").orderBy(F.col("us").asc(), F.col("tb").asc())
    d = ev.withColumn("_next", F.lead("us").over(w)).filter(
        F.col("_next").isNotNull()
    ).withColumn("_dwell", F.col("_next") - F.col("us"))
    us_per_s = F.lit(1_000_000.0)
    return d.groupBy("state").agg(
        F.count(F.lit(1)).cast("long").alias("n_dwells"),
        F.round(
            F.sum("_dwell").cast("double")
            / F.count(F.lit(1)).cast("double")
            / us_per_s,
            6,
        ).alias("mean_dwell_s"),
        F.round(F.max("_dwell").cast("double") / us_per_s, 6).alias("max_dwell_s"),
        F.round(F.sum("_dwell").cast("double") / us_per_s, 6).alias("total_dwell_s"),
    )


def activity_streaks(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    — the classic streak kernel (daily-habit retention, SLA continuity).
    Distinct (user, day) first (events collapse to the day grain, so the
    shuffle moves user×day, never raw events), then the anchor trick:
    day − row_number() is constant exactly within a consecutive run, so
    one user-keyed sort window plus a groupBy yields every island with no
    self-join. Returns one row per streak:
    (user, start_day, end_day, streak_len)."""
    days = df.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    ).distinct()
    w = Window.partitionBy("u").orderBy("d")
    isl = days.withColumn(
        "_anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    return isl.groupBy("u", "_anchor").agg(
        F.min("d").alias("start_day"),
        F.max("d").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("streak_len"),
    ).select(
        F.col("u").alias(user_col), "start_day", "end_day", "streak_len"
    )


def position_based_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    conversion: str,
    touch_events: Sequence[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
    first_weight: float = 0.4,
    last_weight: float = 0.4,
) -> DataFrame:
    """Position-based (U-shaped) MULTI-touch attribution — the fractional
    companion of :func:`last_touch_attribution`: every conversion splits
    one unit of credit over ALL its qualifying touches (strictly
    preceding, within the window): the first touch gets ``first_weight``,
    the last ``last_weight``, middles share the remainder evenly; a lone
    touch gets 1.0, a pair splits (first+mid share)/(last+mid share) per
    the standard U-shape degeneration (0.5/0.5 at the defaults).

    One user-keyed sort window assigns each touch its NEXT conversion
    (running ``min`` over the descending (µs, tie-break) frame of a
    zero-padded conversion key — no self-join, touches and conversions
    share the stream exactly as in last-touch); positions and k then come
    from windows over the (user, conversion) grain. Credit fractions are
    rounded to 9 and should be folded as DECIMAL downstream so rollups
    stay order-independent. Returns one row per credited touch:
    (user, conv_us, conv_tb, touch_event, touch_us, k_touches, position,
    credit)."""
    if conversion in set(touch_events):
        raise ValueError("the conversion event cannot also be a touch event")
    fw, lw = float(first_weight), float(last_weight)
    if fw < 0 or lw < 0 or fw + lw > 1:
        raise ValueError("first/last weights must be >= 0 and sum to <= 1")
    tb = tiebreak_col or event_col
    names = [conversion, *touch_events]
    ev = df.filter(F.col(event_col).isin(names)).select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        F.col(event_col).alias("ev"),
    )
    is_conv = F.col("ev") == conversion
    # zero-padded (µs, tie-break) key: lexicographic order == event order,
    # so a running min over the "at-or-after" frame is the NEXT conversion
    conv_key = F.concat(F.lpad(F.col("us").cast("string"), 20, "0"), F.lit("|"), F.col("tb"))
    w_after = (
        Window.partitionBy("user")
        .orderBy(F.col("us").desc(), F.col("tb").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = ev.withColumn(
        "_ck", F.min(F.when(is_conv, conv_key)).over(w_after)
    )
    touches = tagged.filter(~is_conv & F.col("_ck").isNotNull()).withColumn(
        "_conv_us", F.substring("_ck", 1, 20).cast("long")
    )
    if within_seconds is not None:
        touches = touches.filter(
            F.col("_conv_us") - F.col("us") <= within_seconds * 1_000_000
        )
    grain = Window.partitionBy("user", "_ck")
    pos_w = grain.orderBy(F.col("us").asc(), F.col("tb").asc())
    ranked = touches.select(
        "user",
        "us",
        "tb",
        "ev",
        "_ck",
        "_conv_us",
        F.row_number().over(pos_w).alias("position"),
        F.count(F.lit(1)).over(grain).alias("k"),
    )
    mid_share = (F.lit(1.0) - F.lit(fw) - F.lit(lw)) / (F.col("k") - 2).cast("double")
    credit = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when((F.col("k") == 2) & (F.col("position") == 1), F.lit(fw + (1.0 - fw - lw) / 2.0))
        .when((F.col("k") == 2) & (F.col("position") == 2), F.lit(lw + (1.0 - fw - lw) / 2.0))
        .when(F.col("position") == 1, F.lit(fw))
        .when(F.col("position") == F.col("k"), F.lit(lw))
        .otherwise(mid_share)
    )
    return ranked.select(
        F.col("user").alias(user_col),
        F.col("_conv_us").alias("conv_us"),
        F.substring("_ck", 22, 2_000_000).alias("conv_tb"),
        F.col("ev").alias("touch_event"),
        F.col("us").alias("touch_us"),
        F.col("k").cast("long").alias("k_touches"),
        F.col("position").cast("long").alias("position"),
        F.round(credit, 9).alias("credit"),
    )


def time_to_convert(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    start_event: str,
    end_event: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-touch-to-conversion latency per user: the µs gap between a
    user's FIRST ``start_event`` and their first ``end_event`` at or
    after it — the funnel's time axis (``sequence_funnel`` counts who
    converts; this measures how long conversion takes). Users whose
    conversions all precede their first start, or who never convert,
    are excluded (they have no defined latency).

    Two stacked whole-partition windows over ONE user-keyed exchange:
    the first elects the user's first start key (exact string min on a
    zero-padded (µs, tie-break) key), the second the first conversion
    key AT OR AFTER it — so an out-of-funnel conversion BEFORE the first
    start neither qualifies nor blocks a later one. Returns one row per
    converted user: (user, start_us, convert_us, lag_s) with lag_s an
    exact integer-µs-derived double (µs/1e6, one division)."""
    tb = tiebreak_col or event_col
    ev = df.filter(F.col(event_col).isin([start_event, end_event])).select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        F.col(event_col).alias("ev"),
    )
    key = F.concat(F.lpad(F.col("us").cast("string"), 20, "0"), F.lit("|"), F.col("tb"))
    wu = Window.partitionBy("user")
    t1 = ev.withColumn("_k", key).withColumn(
        "_sk", F.min(F.when(F.col("ev") == start_event, key)).over(wu)
    )
    t2 = t1.withColumn(
        "_ek",
        F.min(
            F.when(
                (F.col("ev") == end_event) & (F.col("_k") >= F.col("_sk")),
                F.col("_k"),
            )
        ).over(wu),
    )
    per_user = (
        t2.groupBy("user")
        .agg(F.max("_sk").alias("_sk"), F.max("_ek").alias("_ek"))
        .filter(F.col("_sk").isNotNull() & F.col("_ek").isNotNull())
    )
    start_us = F.substring("_sk", 1, 20).cast("long")
    return per_user.select(
        F.col("user").alias(user_col),
        start_us.alias("start_us"),
        F.substring("_ek", 1, 20).cast("long").alias("convert_us"),
        (
            (F.substring("_ek", 1, 20).cast("long") - start_us).cast("double")
            / F.lit(1_000_000.0)
        ).alias("lag_s"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    bar: str = "yyyy-MM-dd",
) -> DataFrame:
    """OHLC resampling: per (key, bar) — open (first value by event
    order), high, low, close (last), count, and the exact-decimal total;
    the financial candlestick kernel applied to any measured stream.
    ``bar`` is a date_format pattern (day bars by default).

    One hash aggregate over (key, bar): open/close elect the min/max
    zero-padded (µs, tie-break, value-string) key — pure MIN/MAX, no
    window, no sort, so the bar build is a single exchange at the bar
    grain. Values fold as DECIMAL(14,2) (round-then-decimal recipe);
    open/close decode from the elected key's value suffix, exactly."""
    tb = tiebreak_col or ts_col
    v = F.round(F.col(value_col), 2).cast("decimal(14,2)")
    base = df.select(
        F.col(key_col).alias("k"),
        F.date_format(F.col(ts_col), bar).alias("bar"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(tb).cast("string").alias("tb"),
        v.alias("v"),
    )
    # event-ordered election key; the value rides behind a second
    # separator so min/max compare on (us, tb) and carry v along
    ekey = F.concat(
        F.lpad(F.col("us").cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(F.col("tb"), 24, "0"),
        F.lit("|"),
        F.col("v").cast("string"),
    )
    agg = base.groupBy("k", "bar").agg(
        F.min(ekey).alias("_first"),
        F.max(ekey).alias("_last"),
        F.min("v").alias("_low"),
        F.max("v").alias("_high"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v").alias("_total"),
    )
    val_of = lambda c: F.substring_index(c, "|", -1).cast("decimal(14,2)")  # noqa: E731
    return agg.select(
        F.col("k").alias(key_col),
        "bar",
        val_of(F.col("_first")).cast("double").alias("open"),
        F.col("_high").cast("double").alias("high"),
        F.col("_low").cast("double").alias("low"),
        val_of(F.col("_last")).cast("double").alias("close"),
        "n_events",
        F.col("_total").cast("double").alias("total"),
    )


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    value_scale: int = 2,
) -> DataFrame:
    """Cohort lifetime-value curves: users cohort by their FIRST activity
    month; each cohort's revenue accumulates over cohort age (months
    since first activity) and normalizes per cohort member — the revenue
    companion of :func:`cohort_retention` (that counts who comes back;
    this counts what they're worth by age). ``ts_col`` may be a
    timestamp or date; ``value_col`` folds as DECIMAL(16,
    ``value_scale``) so cumulative sums stay exact.

    Two shuffles total: the first-activity aggregate (user grain) rides
    the same user-keyed exchange as the base rollup; the cohort×age
    grain is months², metadata-sized at any corpus. The cumulative sum
    is an exact decimal window over age. Returns one row per
    (cohort_month, age_months): (cohort_month, age_months, cohort_users,
    n_buyers, period_revenue, cum_revenue, ltv_per_user), money as
    doubles rounded 6 derived from exact sums with one expression
    shape."""
    midx = (F.year(F.col(ts_col)) * 12 + F.month(F.col(ts_col))).cast("long")
    v = F.col(value_col).cast(f"decimal(16,{int(value_scale)})")
    base = df.select(
        F.col(user_col).alias("u"), midx.alias("m"), v.alias("v")
    )
    firsts = base.groupBy("u").agg(F.min("m").alias("cohort_m"))
    cohort_sizes = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    aged = base.join(firsts, "u").select(
        "cohort_m", (F.col("m") - F.col("cohort_m")).cast("long").alias("age"),
        "u", "v",
    )
    grain = aged.groupBy("cohort_m", "age").agg(
        F.countDistinct("u").cast("long").alias("n_buyers"),
        F.sum("v").alias("_rev"),
    )
    w = Window.partitionBy("cohort_m").orderBy("age")
    cum = grain.withColumn("_cum", F.sum("_rev").over(w))
    out = cum.join(F.broadcast(cohort_sizes), "cohort_m")
    return out.select(
        F.col("cohort_m").alias("cohort_month"),
        F.col("age").alias("age_months"),
        "cohort_users",
        "n_buyers",
        F.round(F.col("_rev").cast("double"), 6).alias("period_revenue"),
        F.round(F.col("_cum").cast("double"), 6).alias("cum_revenue"),
        F.round(
            F.col("_cum").cast("double") / F.col("cohort_users").cast("double"), 6
        ).alias("ltv_per_user"),
    )


def time_decay_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    conversion: str,
    touch_events: Sequence[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
    half_life_seconds: int = 3600,
) -> DataFrame:
    """Time-decay multi-touch attribution: each conversion splits one unit
    of credit over its qualifying touches with EXPONENTIAL half-life decay
    — a touch ``half_life_seconds`` older than a fresher one earns half
    the weight. The recency-weighted sibling of
    :func:`position_based_attribution` (U-shape) and
    :func:`last_touch_attribution` (winner-take-all).

    Rides the position-based kernel (same next-conversion running-min
    window — no self-join); the decay is EXACT arithmetic: age buckets
    are integer floor-divisions of the µs gap (``DIV``, never float
    division — a float ratio can round UP across the bucket boundary),
    raw weights are exact binary reciprocals ``1 / (1 << age)`` (ages
    clamped at 62 so the shift stays in LONG range), and the
    per-conversion weight sum is order-independent because with a
    bounded ``within_seconds`` the age range is small, so the partial
    sums of reciprocal powers of two stay inside double's 53-bit
    significand. Shares round to 9 for the cross-engine hash; fold them
    as DECIMAL(20,9) downstream.

    Cross-engine exactness precondition: the age span must stay under
    ~46 half-lives (2⁻⁰ + … + 2⁻⁴⁶ still fits the 53-bit significand
    with headroom for the touch count). ``within_seconds=None`` — or a
    ``within_seconds / half_life_seconds`` ratio above 46 — lets ages
    reach the 62 clamp, where the window sum of 2⁻⁶²-granularity weights
    can lose exactness and credit becomes order/ulp-sensitive across
    engines; a ``UserWarning`` flags it (results stay deterministic
    within one engine — only the cross-engine hash contract weakens).

    Returns one row per credited touch: (user, conv_us, conv_tb,
    touch_event, touch_us, age_units, credit).
    """
    if half_life_seconds < 1:
        raise ValueError("half_life_seconds must be >= 1")
    if within_seconds is None or within_seconds / half_life_seconds > 46:
        import warnings

        warnings.warn(
            "time_decay_attribution: age span exceeds 46 half-lives "
            f"(within_seconds={within_seconds}, half_life_seconds="
            f"{half_life_seconds}); per-conversion weight sums can lose "
            "exactness and credit is no longer cross-engine hash-stable",
            UserWarning,
            stacklevel=2,
        )
    rows = position_based_attribution(
        df,
        user_col,
        ts_col,
        event_col,
        conversion,
        touch_events,
        within_seconds=within_seconds,
        tiebreak_col=tiebreak_col,
    )
    age = F.least(
        F.expr(f"(conv_us - touch_us) DIV {half_life_seconds * 1_000_000}"),
        F.lit(62).cast("long"),
    )
    grain = Window.partitionBy(user_col, "conv_us", "conv_tb")
    return (
        rows.withColumn("age_units", age)
        .withColumn(
            "_w",
            F.expr(
                "1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(age_units AS INT)) AS DOUBLE)"
            ),
        )
        .withColumn("credit", F.round(F.col("_w") / F.sum("_w").over(grain), 9))
        .select(
            user_col,
            "conv_us",
            "conv_tb",
            "touch_event",
            "touch_us",
            F.col("age_units").cast("long").alias("age_units"),
            "credit",
        )
    )


def sequence_ngrams(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    n: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Sequential-pattern mining at the n-gram grain: every run of ``n``
    CONSECUTIVE events per user becomes one pattern occurrence; the output
    is the corpus-wide pattern support table (occurrences + distinct
    users + support rank). The n>1 generalization of the first-order
    :func:`event_transition_matrix` — trigrams expose the paths a Markov
    matrix marginalizes away.

    One user-keyed sort window produces the (n−1) leads; the aggregate
    shuffles on the pattern key, whose cardinality is bounded by the
    event-type alphabet to the n-th power — metadata-sized however big
    the event table is. The final rank window runs over that pattern
    relation, not the events. Ties rank deterministically
    (count desc, then pattern lexicographic asc).
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    tb = tiebreak_col or event_col
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col)).asc(), F.col(tb).asc()
    )
    steps = [F.col(event_col).alias("e1")] + [
        F.lead(F.col(event_col), i).over(w).alias(f"e{i + 1}") for i in range(1, n)
    ]
    grams = df.select(F.col(user_col).alias("_u"), *steps).filter(
        F.col(f"e{n}").isNotNull()
    )
    pattern_cols = [f"e{i + 1}" for i in range(n)]
    counts = grams.groupBy(*pattern_cols).agg(
        F.count(F.lit(1)).cast("long").alias("support"),
        F.countDistinct("_u").cast("long").alias("n_users"),
    )
    rank_w = Window.orderBy(
        F.col("support").desc(), *[F.col(c).asc() for c in pattern_cols]
    )
    return counts.withColumn(
        "pattern_rank", F.row_number().over(rank_w).cast("long")
    )


def linear_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    conversion: str,
    touch_events: Sequence[str],
    within_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: each conversion's
    unit of credit splits evenly over its k qualifying touches — the
    fourth standard model next to last-touch, U-shaped and time-decay,
    and the convention-free baseline the others are compared against.
    Same next-conversion kernel (one running-min window, no self-join);
    1/k rounds to 9 for the cross-engine hash (fold as DECIMAL(20,9))."""
    rows = position_based_attribution(
        df,
        user_col,
        ts_col,
        event_col,
        conversion,
        touch_events,
        within_seconds=within_seconds,
        tiebreak_col=tiebreak_col,
    )
    return rows.select(
        user_col,
        "conv_us",
        "conv_tb",
        "touch_event",
        "touch_us",
        "k_touches",
        F.round(F.lit(1.0) / F.col("k_touches").cast("double"), 9).alias("credit"),
    )


def markov_transition_entropy(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-state Markov entropy of user journeys: for each current event
    type, the Shannon entropy of the NEXT-event distribution — how
    predictable the journey is from each state (0 nats = deterministic
    next step), plus the state's stationary weight so Σ weight·H is the
    chain's entropy rate. The information-theoretic summary of
    :func:`event_transition_matrix`'s rows (and the conditional
    companion of the daily event-mix entropy monitor).

    Exactness: transition counts are exact; each −p·ln p term uses the
    round-then-decimal fold (9 dp) so the per-state sum is
    order-independent; weights are one fixed-shape division. The lag
    runs on the user-keyed exchange every sequence query shares; the
    entropy folds over the (src, dst) pair grain — alphabet², metadata-
    sized, so its single-partition global-total window is sanctioned.

    Returns one row per state: (state, n_transitions, n_next_states,
    h_nats, weight, rate_term).
    """
    tb = tiebreak_col or event_col
    w = Window.partitionBy(user_col).orderBy(
        F.unix_micros(F.col(ts_col)).asc(), F.col(tb).asc()
    )
    seq = df.select(
        F.col(event_col).alias("src"),
        F.lead(F.col(event_col)).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = F.sum("n").over(Window.partitionBy("src")).cast("long")
    total = F.sum("n").over(Window.partitionBy()).cast("long")
    p = F.col("n").cast("double") / F.col("t").cast("double")
    term = F.round(-(p * F.log(p)), 9).cast("decimal(28,9)")
    cells = pairs.select("src", "n", t.alias("t"), total.alias("total")).select(
        "src", "n", "t", "total", term.alias("_term")
    )
    out = cells.groupBy("src").agg(
        F.max("t").alias("n_transitions"),
        F.count(F.lit(1)).cast("long").alias("n_next_states"),
        F.sum("_term").alias("_h"),
        F.max("total").alias("_tot"),
    )
    h = F.col("_h").cast("double")
    wgt = F.col("n_transitions").cast("double") / F.col("_tot").cast("double")
    return out.select(
        F.col("src").alias("state"),
        "n_transitions",
        "n_next_states",
        (F.round(h, 6) + F.lit(0.0)).alias("h_nats"),
        F.round(wgt, 6).alias("weight"),
        (F.round(wgt * h, 6) + F.lit(0.0)).alias("rate_term"),
    )
