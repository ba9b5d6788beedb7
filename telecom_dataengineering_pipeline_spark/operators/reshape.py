"""Reshape operators: wide→long (melt / UNPIVOT) as a pure map-side
expression. The reference's marts pivot metrics wide for BI
(``event_type_pivot`` covers that direction); the inverse — melting a
wide metrics row into (entity, metric, value) rows for generic
monitoring/storage — is the same ``stack`` expression family, zero
shuffles, output = |rows| × |value_cols|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
    value_type: str = "double",
) -> DataFrame:
    """UNPIVOT: one output row per (input row, value column). All melted
    values cast to one ``value_type`` (SQL UNPIVOT's common-type rule,
    explicit here). Pure projection + generator — no shuffle, no UDF;
    Spark's own ``unpivot`` exists but this stays on the stack() path
    that whole-stage codegen fuses, and pins the cast rule."""
    if not value_cols:
        raise ValueError("melt needs at least one value column")

    def _lit(s: str) -> str:  # SQL string literal, quotes escaped
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def _ident(s: str) -> str:  # backtick-quoted identifier
        return "`" + s.replace("`", "``") + "`"

    pairs = ", ".join(
        f"{_lit(c)}, CAST({_ident(c)} AS {value_type})" for c in value_cols
    )
    stacked = F.expr(
        f"stack({len(value_cols)}, {pairs}) "
        f"AS ({_ident(var_name)}, {_ident(value_name)})"
    )
    return df.select(*id_cols, stacked)
