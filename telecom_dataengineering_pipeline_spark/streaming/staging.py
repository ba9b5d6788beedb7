"""Staging helpers for the file-source streaming gate queries.

The day-split recipe (stage N parquet shards, ``maxFilesPerTrigger=1``,
``availableNow``) relies on Spark's ``FileStreamSource`` picking the shards
in chronological order — but the source orders candidate files by
MODIFICATION TIME, and two back-to-back parquet writes can land on the
same filesystem timestamp tick, letting a tie reorder the triggers and
(for order-sensitive keyed state like the trigram/funnel streams) emit
wrong rows. ``pin_staging_mtimes`` makes trigger order deterministic by
stamping every file in shard ``b{i}`` with a strictly increasing mtime.
"""

from __future__ import annotations

import os


def pin_staging_mtimes(staging: str, shards: int, step_seconds: int = 10) -> None:
    """Stamp each ``staging/b{i}`` shard's files with mtime ``base + i·step``
    (base = now − shards·step, so stamps stay in the past). Call AFTER all
    shard writes, BEFORE ``readStream`` starts. A missing or file-less
    shard dir raises — ``os.walk`` would otherwise silently no-op and the
    mis-staged query would stream in undefined order."""
    import time

    base = time.time() - shards * step_seconds
    for i in range(shards):
        shard_dir = os.path.join(staging, f"b{i}")
        ts = base + i * step_seconds
        stamped = 0
        for root, _dirs, files in os.walk(shard_dir):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))
                stamped += 1
        if stamped == 0:
            raise FileNotFoundError(
                f"pin_staging_mtimes: shard {shard_dir} is missing or empty "
                f"— staging wrote fewer than {shards} shards"
            )
