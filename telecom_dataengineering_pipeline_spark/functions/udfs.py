"""Thin UDF registration surface.

The reference registers **no** SQL UDFs anywhere (SURVEY §2.11 — dbt macros
are compile-time templating; GX checks are declarative), so every relational
operator in this engine is Catalyst built-ins. This module exists for the one
escape hatch §2.11 calls for: when a user genuinely needs custom row-level
compute, it should enter through an Arrow-vectorized ``pandas_udf`` — never a
row-at-a-time Python UDF — and be registered once per session so it is usable
from both the DataFrame API and ``spark.sql``.

Scale notes:
- Pandas UDFs move data JVM→Arrow→pandas in columnar batches
  (``spark.sql.execution.arrow.maxRecordsPerBatch``); they cost one
  serialization boundary but vectorize ~10-100× over row UDFs.
- A UDF is an optimizer black box: no predicate pushdown through it, no
  codegen. Keep UDFs out of filters that could prune scans.
- Modules defining UDFs are cloudpickled by reference; consumers that only
  put the repo on the driver's ``sys.path`` would crash workers, so this
  module registers itself for by-value pickling (same convention as
  ``llmprep.multimodal`` / ``streaming.fraud``).
"""

from __future__ import annotations

import sys as _sys
from typing import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from pyspark import cloudpickle as _cp

_cp.register_pickle_by_value(_sys.modules[__name__])

# name -> (vectorized fn: pd.Series -> pd.Series, return DDL type)
_UDFS: dict[str, tuple[Callable, str]] = {}


def engine_udf(name: str, returns: str) -> Callable:
    """Decorator: declare a vectorized UDF under ``name``. The function body
    receives/returns ``pd.Series`` (one Arrow batch per call)."""

    def deco(fn: Callable) -> Callable:
        _UDFS[name] = (fn, returns)
        return fn

    return deco


def register_udfs(spark: SparkSession) -> list[str]:
    """Register every declared UDF on ``spark`` (idempotent — re-registering
    replaces). Returns the registered names; after this, each is callable
    from SQL (``SELECT sigmoid(x)``) and via ``F.expr``/``F.call_udf``."""
    names = []
    for name, (fn, returns) in _UDFS.items():
        spark.udf.register(name, F.pandas_udf(fn, returns))
        names.append(name)
    return names


# --- Example registrations (each documents a batch-vectorized pattern) -----


@engine_udf("sigmoid", "double")
def sigmoid(x: pd.Series) -> pd.Series:
    """Numpy-vectorized scalar math — the canonical pandas-UDF use."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-x.astype("float64")))


@engine_udf("luhn_valid", "boolean")
def luhn_valid(s: pd.Series) -> pd.Series:
    """Luhn checksum over digit strings (IMEI-style validation) — string
    compute that has no Catalyst built-in but stays batch-vectorized."""

    def one(v: object) -> object:
        if v is None:
            return None
        digits = [int(c) for c in str(v) if c.isdigit()]
        if not digits:
            return False
        total = 0
        for i, d in enumerate(reversed(digits)):
            if i % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    return s.map(one)
