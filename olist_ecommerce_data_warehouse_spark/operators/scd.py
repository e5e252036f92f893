"""Slowly-changing-dimension Type 2 builder.

The reference's ``gold.dim_customer`` carries SCD-2 scaffolding —
``effective_start_date`` / ``effective_end_date`` / ``is_current``
(06_create_gold_tables.sql:60-62) — but its load is a full-refresh
SCD-1 (07_etl_silver_to_gold.sql:99-116), so the columns never change
state.  This operator supplies the declared-but-unshipped capability
as a real engine primitive.

Semantics: given an attribute-change history (one row per version of
a natural key, stamped with the version's effective timestamp),
produce the standard SCD-2 shape — each version effective from its
own timestamp until the next version's (NULL for the current one).

Scale: one window partitioned by the natural key — shuffles the
history by key once; no global window, no driver-side state.  At
100 TB the history table is itself incremental (late versions land in
their key's partition), which is exactly the shape Structured
Streaming's ``applyInPandasWithState`` variant consumes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_history(
    history: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    *,
    start_col: str = "effective_start",
    end_col: str = "effective_end",
    current_col: str = "is_current",
) -> DataFrame:
    """history(key..., attrs..., ts) → SCD-2 rows.

    ``end_col`` is the NEXT version's start (half-open intervals,
    standard Kimball); NULL end ⇔ ``current_col`` = 1."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    return (
        history.withColumn(start_col, F.col(ts_col))
        .withColumn(end_col, nxt)
        .withColumn(
            current_col, F.when(F.col(end_col).isNull(), 1).otherwise(0)
        )
        .drop(ts_col)
    )
