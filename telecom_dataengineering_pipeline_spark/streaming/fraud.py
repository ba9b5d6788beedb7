"""Stateful streaming fraud detection — the Flink job re-expressed on
Structured Streaming (reference ``streaming/flink_jobs/fraud_detection.py``).

``applyInPandasWithState`` holds per-customer state exactly like the Flink
``KeyedProcessFunction``:

- ValueState (last call's ts/lat/lon, fraud_detection.py:85-93) → the
  ``last_*`` fields of the state tuple,
- ListState of recent call timestamps pruned to the trailing window
  (fraud_detection.py:95-100) → the ``recent_ts`` list in state,
- per-event emission of 0..2 alerts with severity escalation
  (fraud_detection.py:124-204).

Events inside a micro-batch are processed one at a time in event-time order
(ts, event_id) so the rule semantics match the per-event Flink callbacks and
the batch window queries in ``queries/fraud.py`` — which are the oracle the
stream is tested against (tests/test_streaming.py).

This is the one place the engine uses a Python UDF surface: keyed mutable
state is exactly what ``applyInPandasWithState`` exists for. Data arrives
Arrow-batched per key group; state is a tuple of primitives + a pruned
timestamp list, so per-key state stays O(window size).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.functions import col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EARTH_RADIUS_KM = 6371.0

# The stateful detector is shipped to Python workers via cloudpickle. By
# default functions in an importable module are pickled BY REFERENCE, which
# breaks when the driver process added this repo to sys.path but the workers
# didn't (e.g. an external harness importing __spark_entry__ from another
# cwd). Register this module for by-value pickling so the closure is fully
# self-contained on the wire.
import sys as _sys

try:  # pragma: no cover - depends on pyspark internals
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass


@dataclass
class FraudConfig:
    # reference production thresholds (fraud_detection.py:55-59)
    min_distance_km: float = 500.0
    speed_alert_kmh: float = 600.0
    speed_high_kmh: float = 2000.0
    velocity_window_s: int = 1800
    velocity_alert: int = 25
    velocity_high: int = 50


ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("alert_type", StringType()),
        StructField("alert_id", StringType()),
        StructField("severity", StringType()),
        StructField("metric", DoubleType()),
    ]
)

# state: last event (us, lat, lon) + recent event micro-timestamps
STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_lat", DoubleType()),
        StructField("last_lon", DoubleType()),
        StructField("recent_us", StringType()),  # comma-joined pruned list
    ]
)


def _haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    a = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2)) * math.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def make_detector(cfg: FraudConfig):
    """Build the applyInPandasWithState function closed over the config."""

    def detect(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            last_us, last_lat, last_lon, recent_csv = state.get
            recent = [int(x) for x in recent_csv.split(",")] if recent_csv else []
        else:
            last_us, last_lat, last_lon, recent = None, None, None, []

        rows = []
        events = pd.concat(list(pdf_iter), ignore_index=True)
        events = events.sort_values(["us", "event_id"])  # event-time order
        for ev in events.itertuples(index=False):
            us, lat, lon, event_id = int(ev.us), float(ev.lat), float(ev.lon), int(ev.event_id)
            # rule 1: impossible travel (skip same-location repeats,
            # fraud_detection.py:133)
            if last_us is not None and (lat != last_lat or lon != last_lon):
                dist = _haversine_km(last_lat, last_lon, lat, lon)
                dt_h = (us - last_us) / 3.6e9
                if dist >= cfg.min_distance_km and dt_h > 0:
                    speed = dist / dt_h
                    if speed >= cfg.speed_alert_kmh:
                        rows.append(
                            (
                                user_id,
                                event_id,
                                "IMPOSSIBLE_TRAVEL",
                                f"IMP_TRAVEL_{event_id}",
                                "HIGH" if speed >= cfg.speed_high_kmh else "MEDIUM",
                                round(speed, 3),
                            )
                        )
            # rule 2: velocity — prune trailing window, then count
            window_us = cfg.velocity_window_s * 1_000_000
            recent = [t for t in recent if t > us - window_us]
            recent.append(us)
            n = len(recent)
            if n >= cfg.velocity_alert:
                rows.append(
                    (
                        user_id,
                        event_id,
                        "VELOCITY_FRAUD",
                        f"VELOCITY_{event_id}",
                        "HIGH" if n >= cfg.velocity_high else "MEDIUM",
                        float(n),
                    )
                )
            last_us, last_lat, last_lon = us, lat, lon

        state.update((last_us, last_lat, last_lon, ",".join(str(t) for t in recent)))
        yield pd.DataFrame(
            rows, columns=["user_id", "event_id", "alert_type", "alert_id", "severity", "metric"]
        )

    return detect


def fraud_alerts_stream(located_events: DataFrame, cfg: FraudConfig | None = None) -> DataFrame:
    """events(user_id, event_id, us, lat, lon) stream → alert stream.

    Callers add the watermark upstream (T1: bounded out-of-orderness —
    ``withWatermark("ts", "30 seconds")`` mirrors fraud_detection.py:227).
    """
    cfg = cfg or FraudConfig()
    return located_events.groupBy(col("user_id")).applyInPandasWithState(
        make_detector(cfg),
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
