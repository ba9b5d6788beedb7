"""Surrogate keys and record hashes.

Reproduces the reference's dbt macro semantics
(``dbt_project/macros/generate_surrogate_key.sql:7-14``): MD5 over the
``'|'``-joined fields, each field ``coalesce(cast(f as varchar), 'UNKNOWN')``.
Pure column expressions — codegen-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _norm(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("string"), F.lit("UNKNOWN"))


def surrogate_key(*cols: Column | str) -> Column:
    """md5(field1 | field2 | ...) with 'UNKNOWN' null sentinels."""
    return F.md5(F.concat_ws("|", *[_norm(c) for c in cols]))


def record_hash(*cols: Column | str) -> Column:
    """Change-detection hash (reference ``crm_batch_ingestor.py:105``,
    ``dim_customers.sql:84-89`` ``_record_hash``)."""
    return F.md5(F.concat_ws("||", *[_norm(c) for c in cols]))
