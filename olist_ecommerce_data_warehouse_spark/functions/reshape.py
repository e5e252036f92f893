"""Reshape helpers: UNPIVOT (melt) — the inverse of ``.pivot()``.

Spark's ``.pivot()`` turns rows into columns; the reverse (wide →
long) has no DataFrame method before 3.4's ``unpivot``, and even then
the ``stack()`` SQL expression is the portable classic.  This helper
wraps it with proper escaping and typing: each selected value column
becomes one output row ``(id_cols…, name, value)``.

Pure projection + generator — no shuffle, row count multiplies by
len(value_cols), columns prune at the scan as usual.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    name_col: str = "name",
    value_col: str = "value",
) -> DataFrame:
    """Wide → long: one output row per (input row, value column).
    Value columns are cast to a common type by Spark's stack
    resolution; mixed incompatible types raise at analysis (by
    design — silent stringification would corrupt numerics)."""
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    expr = f"stack({len(value_cols)}, {pairs}) as (`{name_col}`, `{value_col}`)"
    return df.select(*[F.col(c) for c in id_cols], F.expr(expr))
