"""Stateful streaming EWMA — the streaming twin of
``operators/trend.py::ewma_control_chart``'s recurrence, following the
codebase's batch≡stream discipline (fraud, sessions, dedup-ingest,
funnel): the same ``z_t = λ·x_t + (1−λ)·z_{t−1}`` fold, held as per-key
keyed state in ``applyInPandasWithState`` so the monitor advances
incrementally as series points arrive instead of re-pivoting history.

This is the reference's observability monitor
(``monitoring/pipeline_observability.py``) moved onto the stream: the
batch chart re-reads the whole series each run to draw retrospective
control limits; the streaming twin carries TWO SCALARS of state per
series key (current EWMA, points seen) and scores each new point on
arrival. Control limits need the center/σ of a BASELINE period — pass
them in (from the batch chart or any agg) and the stream flags
excursions immediately; omit them and it emits the smoothed level only.

Parity contract (pinned in tests): the streamed EWMA after consuming
steps 0..t equals the batch operator's ``_e{t}`` chain value bit-for-bit
— the fold performs the identical IEEE multiply/add sequence, and
micro-batch boundaries are invisible because the state carries the exact
running value across them. State store is O(keys), never O(points)."""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # workers must rebuild these closures without /root/repo on sys.path
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

# state: (current EWMA, number of points folded in)
EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)

EWMA_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ewma", DoubleType()),
        StructField("n_points", LongType()),
        StructField("last_us", LongType()),
        StructField("is_out", BooleanType()),
    ]
)


def make_ewma_tracker(
    lam: float,
    center: float | None = None,
    halfwidth: float | None = None,
):
    """Build the applyInPandasWithState function closed over λ and the
    (optional) baseline control band ``center ± halfwidth``. Emits one
    snapshot row per (batch, active key): the post-batch EWMA, how many
    points it has folded, the last event time, and the band verdict
    (NULL when no band was configured)."""
    lam = float(lam)
    if not 0.0 < lam <= 1.0:
        raise ValueError("lam must be in (0, 1]")
    one_minus = 1.0 - lam

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        ewma, n = state.get if state.exists else (0.0, 0)
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        # same ordering key as the batch pivot's step order: (µs, tb)
        batch = batch.sort_values(["us", "tb"])
        last_us = 0
        for ev in batch.itertuples(index=False):
            x = float(ev.x)
            # identical IEEE op sequence to the batch column chain:
            # first point initializes (z0 = x0), then mul/add per point
            ewma = x if n == 0 else lam * x + one_minus * ewma
            n += 1
            last_us = int(ev.us)
        state.update((ewma, n))
        out = None
        if center is not None and halfwidth is not None:
            out = bool(ewma > center + halfwidth or ewma < center - halfwidth)
        yield pd.DataFrame(
            {
                "key": [k],
                "ewma": [ewma],
                "n_points": [n],
                "last_us": [last_us],
                "is_out": [out],
            }
        )

    return track


def ewma_stream(
    series: DataFrame,
    lam: float = 0.3,
    center: float | None = None,
    halfwidth: float | None = None,
) -> DataFrame:
    """series(key string, us long, tb string, x double) stream → per-key
    EWMA snapshots. Callers pre-aggregate to the series grain upstream
    (one point per (key, step) — same contract as the batch chart's
    pivot) and project the ordering key: ``us`` event-time µs, ``tb``
    deterministic tie-break. Update output mode: one snapshot row per
    (micro-batch, active key)."""
    return series.groupBy("key").applyInPandasWithState(
        make_ewma_tracker(lam, center=center, halfwidth=halfwidth),
        EWMA_OUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Jensen–Shannon drift — the streaming twin of
# quality/monitors.py::js_divergence, same batch≡stream discipline as the
# EWMA tracker above: state is the per-key category-count vector
# (O(categories), never O(events)); each micro-batch folds its counts in
# and re-scores the accumulated mix against a REFERENCE mix fixed at
# construction (the baseline window's counts). Parity contract (pinned in
# tests): after consuming the whole stream, the emitted JSD equals the
# batch operator on the same two windows — the Python twin reproduces the
# engine arithmetic exactly (shortest-repr HALF_UP rounding at 9 dp, an
# exact decimal term sum, the same /ln(2) literal).
# ---------------------------------------------------------------------------

import math as _math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql.types import ArrayType

JSD_STATE_SCHEMA = StructType(
    [
        StructField("cats", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)

JSD_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_cur", LongType()),
        StructField("n_categories", LongType()),
        StructField("jsd_nats", DoubleType()),
        StructField("jsd_bits", DoubleType()),
        StructField("status", StringType()),
    ]
)


def _round_half_up(x: float, n: int) -> float:
    """Twin of Spark's Round expression: HALF_UP on the shortest decimal
    repr of the double (BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def jsd_score(ref_counts: "dict[str, int]", cur_counts: "dict[str, int]"):
    """Exact Python twin of the batch js_divergence fold: per-category
    p·ln(p/m) terms rounded HALF_UP at 9 dp, summed as exact Decimals,
    halved and /ln(2) as doubles. Returns (n_categories, jsd_nats,
    jsd_bits, status_unrounded_bits)."""
    na = sum(ref_counts.values())
    nb = sum(cur_counts.values())
    cats = set(ref_counts) | set(cur_counts)
    tp = Decimal(0)
    tq = Decimal(0)
    for c in cats:
        a = ref_counts.get(c, 0)
        b = cur_counts.get(c, 0)
        p = a / na if na else 0.0
        q = b / nb if nb else 0.0
        m = (p + q) / 2.0
        if a > 0:
            tp += Decimal(repr(_round_half_up(p * _math.log(p / m), 9)))
        if b > 0:
            tq += Decimal(repr(_round_half_up(q * _math.log(q / m), 9)))
    jsd = (float(tp) + float(tq)) / 2.0
    bits = jsd / _math.log(2.0)
    if na == 0 or nb == 0:
        status = "no_reference"
    elif bits < 0.05:
        status = "stable"
    elif bits < 0.2:
        status = "moderate_shift"
    else:
        status = "major_shift"
    return len(cats), jsd, bits, status


def make_jsd_tracker(ref_counts: "dict[str, int]"):
    """Build the applyInPandasWithState function closed over the
    reference category counts. Input rows carry a ``cat`` column
    (pre-coalesced: NULL categories arrive as ``__null__``). Emits one
    snapshot row per (batch, active key) scoring the ACCUMULATED current
    mix against the reference."""
    ref = {str(k): int(v) for k, v in ref_counts.items()}
    if not ref:
        raise ValueError("jsd tracker needs a non-empty reference mix")

    def track(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            cats, counts = state.get
            d = dict(zip(list(cats), [int(c) for c in counts]))
        else:
            d = {}
        for pdf in pdf_iter:
            for c, n in pdf["cat"].value_counts().items():
                d[str(c)] = d.get(str(c), 0) + int(n)
        state.update((list(d.keys()), [int(v) for v in d.values()]))
        n_cats, jsd, bits, status = jsd_score(ref, d)
        yield pd.DataFrame(
            {
                "key": [k],
                "n_cur": [sum(d.values())],
                "n_categories": [n_cats],
                "jsd_nats": [_round_half_up(jsd, 6)],
                "jsd_bits": [_round_half_up(bits, 6)],
                "status": [status],
            }
        )

    return track


def jsd_stream(stream: DataFrame, ref_counts: "dict[str, int]") -> DataFrame:
    """stream(key string, cat string) → per-key drift snapshots vs the
    fixed reference mix. Update output mode: one snapshot per
    (micro-batch, active key); the final snapshot scores the whole
    accumulated window (the batch-parity point)."""
    return stream.groupBy("key").applyInPandasWithState(
        make_jsd_tracker(ref_counts),
        JSD_OUT_SCHEMA,
        JSD_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
