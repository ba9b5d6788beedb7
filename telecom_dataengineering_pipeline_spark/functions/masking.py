"""PII masking expressions (reference ``dim_customers.sql:35-38``):

- name  -> first initial + '***'           (SUBSTR + CONCAT)
- email -> first 2 chars + '***' + domain  (REGEXP_REPLACE with capture groups)
- phone -> last 4 digits exposed
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mask_name(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.substring(c, 1, 1), F.lit("***"))


def mask_email(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"(.{2}).+(@.+)", r"$1***$2")


def mask_phone(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("***-***-"), F.substring(c, -4, 4))
