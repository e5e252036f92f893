"""Deterministic surrogate-key assignment (SURVEY.md §2.5 W2).

The reference uses ``INT IDENTITY(1,1)`` reseeded to 0 on every full
load (06_create_gold_tables.sql:55,...; reseed
07_etl_silver_to_gold.sql:198,291), i.e. dense 1-based keys in
natural-key order.  ``monotonically_increasing_id`` is partition-
dependent (nondeterministic across runs/cluster layouts) so it is
banned here.

Two implementations with identical output:

- ``add_surrogate_key_simple`` — one global ROW_NUMBER() window.
  Correct at any scale but serializes the final numbering through a
  single partition; fine for dimension tables (≤ tens of millions).
- ``add_surrogate_key`` — scalable two-phase numbering: range-
  repartition by the order key, count rows per partition, broadcast
  the per-partition offsets, then number locally.  No single-partition
  bottleneck; the only full shuffle is the range partitioning itself
  (which a global window would need anyway).  Use for fact-size
  tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key_simple(
    df: DataFrame, order_cols: Sequence[str], sk_col: str = "sk"
) -> DataFrame:
    """Dense 1-based key via a single global window (dimension-size)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(sk_col, F.row_number().over(w))


def add_surrogate_key(
    df: DataFrame,
    order_cols: Sequence[str],
    sk_col: str = "sk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based key in ``order_cols`` order without a global
    single-partition window.

    Phase 1: range-repartition on the order key (total order across
    partitions, sorted within after ``sortWithinPartitions``).
    Phase 2: per-partition ROW_NUMBER + broadcast-joined cumulative
    offset of all earlier partitions.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # CORRECTNESS: both the offsets branch and the data branch below
    # consume `ranged`.  As two logical subtrees they would each plan
    # their own range exchange, and repartitionByRange boundaries come
    # from SAMPLING — if exchange reuse doesn't kick in, the two
    # evaluations can pick different boundaries, so the broadcast
    # offsets no longer describe the partitions the data actually
    # landed in (observed as intermittently shifted keys).  An eager
    # localCheckpoint pins ONE physical layout that both branches
    # read; it also halves the work (shuffle+sort runs once).
    ranged = ranged.localCheckpoint(eager=True)
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    local_w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(sk_col, (F.row_number().over(local_w) + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__offset")
    )
