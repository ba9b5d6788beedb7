"""Stream-stream interval joins.

Beyond the reference's single-stream stateful rules: correlating two live
event streams (e.g. call events ⋈ network-probe alarms on tower within a
time window) needs Spark's watermarked stream-stream join — both sides
buffer state bounded by their watermarks, and the interval condition lets
the engine evict state deterministically.

The join condition must give Spark a time bound in BOTH directions
(``r.ts BETWEEN l.ts - lower AND l.ts + upper``) or state grows without
bound — that constraint is the entire design; the rest is a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    left_watermark: str = "30 seconds",
    right_watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """right events within [left.ts - lower, left.ts + upper] per key.

    Both inputs may be streaming (watermarks applied here) or batch (the
    same function then runs the batch analog for parity testing).
    """
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(left_ts, left_watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, right_watermark)
    lk = f"l_{key}"
    l = l.withColumnRenamed(key, lk)
    cond = (
        (F.col(lk) == F.col(key))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return l.join(r, cond, how)
