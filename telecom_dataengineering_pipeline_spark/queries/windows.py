"""Window-function queries (SURVEY.md §2.5 W1–W4 batch forms).

W1 lives in relational.py (``latest_event_per_user_type``); here are the
lag/sliding-window shapes that back the fraud rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import sliding_count_by_time, with_prev_event
from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# W3: per-key previous-event lookup via lag (Flink ValueState analog,
# fraud_detection.py:85-93) — inter-event deltas per user.
# ---------------------------------------------------------------------------

_DELTAS_ORACLE = """
SELECT user_id, event_id,
       prev_event_id,
       CAST(CASE WHEN prev_us IS NULL THEN NULL
            ELSE (us - prev_us) // 1000000 END AS BIGINT) AS seconds_since_prev,
       round(value - prev_value, 2) AS value_delta,
       (us - prev_us < 600 * 1000000) AS within_10min
FROM (
  SELECT user_id, event_id, value, epoch_us(ts) AS us,
         lag(event_id) OVER w AS prev_event_id,
         lag(epoch_us(ts)) OVER w AS prev_us,
         lag(value) OVER w AS prev_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
)
"""


@register("user_event_deltas", oracle=_DELTAS_ORACLE, tags=("W3",))
def user_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    prev = with_prev_event(
        ev, key="user_id", ts_col="ts", cols=["event_id", "us", "value"], tie_break="event_id"
    )
    dt_us = F.col("us") - F.col("prev_us")
    return prev.select(
        "user_id",
        "event_id",
        "prev_event_id",
        F.floor(dt_us / 1_000_000).cast("long").alias("seconds_since_prev"),
        F.round(F.col("value") - F.col("prev_value"), 2).alias("value_delta"),
        (dt_us < 600 * 1_000_000).alias("within_10min"),
    )


# ---------------------------------------------------------------------------
# W4: trailing time-window count per key (Flink ListState sliding window,
# fraud_detection.py:95-100) — events per user in the trailing 24 h.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
SELECT user_id, event_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS events_in_window
FROM events
"""


@register("user_sliding_window_counts", oracle=_SLIDING_ORACLE, tags=("W4",), bench=True)
def user_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counted = sliding_count_by_time(
        ev, key="user_id", ts_col="ts", window_seconds=86400
    )
    return counted.select("user_id", "event_id", "events_in_window")
