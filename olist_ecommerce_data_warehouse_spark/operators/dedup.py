"""Deduplication operators (SURVEY.md §2.4 A1–A3, §2.5 W1).

Two reference patterns plus the scale-path notes:

- ``distinct_dedup`` — GROUP BY the normalized keys with no aggregates
  (geolocation collapse, sp_load_silver_geolocation.sql:40-43).  One
  hash-aggregate shuffle on the dedup key; map-side partial aggregation
  collapses most duplicates before the exchange, so the shuffle volume
  is ~the number of DISTINCT keys, not input rows — this is why it
  survives 100 TB.
- ``keep_latest`` — ROW_NUMBER() PARTITION BY key ORDER BY ts DESC,
  keep rn=1 (review dedup, sp_load_silver_order_reviews.sql:33-36,67).
  Ties on the timestamp are nondeterministic in both T-SQL and Spark,
  so callers MUST pass a total-ordering tiebreaker.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distinct_dedup(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """A1/A3: project the (normalized) key expressions and collapse
    duplicates.  ``df.select(...).distinct()`` ≡ GROUP BY with no
    aggregates — Catalyst plans both as HashAggregate."""
    return df.select(*cols).distinct()


def keep_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """A2/W1: keep exactly one row per key — the latest under
    ``order_cols`` (descending already applied by the caller; include
    a unique tiebreaker for determinism)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
