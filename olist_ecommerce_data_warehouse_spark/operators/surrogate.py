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
- ``add_surrogate_key`` — scalable two-phase numbering over a
  DETERMINISTIC order-preserving bucketing of the leading order
  column: numeric/temporal keys map linearly between their exact
  MIN/MAX, string keys bucket by 2-char prefix.  Per-bucket
  ROW_NUMBER + a broadcast cumulative offset of all lower buckets
  gives the dense global numbering with no single-partition
  bottleneck.

Why deterministic bucketing instead of ``repartitionByRange``: range
partition boundaries come from SAMPLING, so two evaluations of the
same plan can land rows in different partitions — the round-1
implementation pinned one layout with an eager ``localCheckpoint``,
which truncates lineage: an executor loss at 100 TB killed the job
instead of recomputing.  A bucket that is a pure function of the row
needs no pinning at all — every recomputation (task retry, lost
cached block, a driver that builds several plans before executing
them) lands every row in the same bucket, and full lineage is kept,
so the operator is fault-tolerant at cluster scale.

Cost model: one extra map-side MIN/MAX aggregation job (numeric path
only, collected as a single row — the same footprint as AQE's stats
collection), one narrow groupBy for bucket counts, one shuffle by
bucket for the windowed numbering.  Linear bucketing skews when key
values cluster; that affects only this final numbering stage and only
its partition balance, never results.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__bucket"


def add_surrogate_key_simple(
    df: DataFrame, order_cols: Sequence[str], sk_col: str = "sk"
) -> DataFrame:
    """Dense 1-based key via a single global window (dimension-size)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn(sk_col, F.row_number().over(w))


def _bucket_col(
    df: DataFrame, col: str, parts: int, stats_src: DataFrame | None = None
) -> Column:
    """Deterministic, monotone-non-decreasing bucket of ``col``.

    Monotonicity is what makes per-bucket numbering + cumulative
    offsets equal a global ROW_NUMBER: every row of a lower bucket
    precedes every row of a higher one in key order.  NULL keys sort
    first under Spark's default ASC NULLS FIRST, so they map to the
    lowest bucket (numeric: coalesce→bucket 0; string: NULL prefix
    coalesces to '' which is the lexicographic minimum).

    ``stats_src`` (round 11, guide §5 driver-side cost): an optional
    CHEAPER relation to compute the min/max bounds on — any relation
    whose ``col`` values are a SUPERSET of ``df``'s (e.g. the raw key
    column of a table ``df`` was built from by inner joins/filters).
    Correctness needs only that the bounds CONTAIN the data: the
    bucketing stays monotone for any containing bounds, and the
    per-bucket numbering + offsets still compose to the same global
    dense rank — only bucket BOUNDARIES move, never the output.  The
    win is twofold: the stats job plans/scans a bare column instead of
    the whole join tree (at 100 TB: a column scan, not a fact build),
    and the big query's own planning no longer embeds that evaluation."""
    dtype = dict(df.dtypes)[col]
    if dtype == "string":
        # 2-char prefix: lexicographic prefix order is consistent with
        # full-string order (equal prefixes share a bucket, where the
        # in-bucket ORDER BY disambiguates)
        return F.coalesce(F.substring(F.col(col), 1, 2), F.lit(""))
    if dtype == "date":
        v = F.unix_date(F.col(col)).cast("double")
    else:  # integral, floating, decimal, timestamp
        v = F.col(col).cast("double")
    row = (stats_src if stats_src is not None else df).agg(
        F.min(v).alias("mn"), F.max(v).alias("mx")
    ).first()
    mn, mx = row["mn"], row["mx"]
    if mn is None or mx is None or mx <= mn:
        return F.lit(0)
    # floor((v-mn)/span*parts) is monotone non-decreasing in v even
    # under double rounding (each FP op preserves weak order), clamped
    # into [0, parts-1]
    raw = F.floor((v - F.lit(float(mn))) / F.lit(float(mx - mn)) * F.lit(parts))
    return F.coalesce(
        F.least(F.greatest(raw, F.lit(0)), F.lit(parts - 1)).cast("int"), F.lit(0)
    )


def add_surrogate_key(
    df: DataFrame,
    order_cols: Sequence[str],
    sk_col: str = "sk",
    num_partitions: int | None = None,
    stats_src: DataFrame | None = None,
) -> DataFrame:
    """Dense 1-based key in ``order_cols`` order without a global
    single-partition window.

    Phase 1: assign each row its deterministic order-preserving bucket
    (``_bucket_col``) and count rows per bucket (narrow map-side agg).
    Phase 2: ROW_NUMBER within each bucket + the broadcast cumulative
    count of all lower buckets.  Both phases are pure functions of the
    data — no sampling, no checkpoint, full lineage.

    ``stats_src``: optional cheaper relation for the bucket-bound
    min/max (must contain every ``order_cols[0]`` value of ``df`` —
    see ``_bucket_col``; identical output keys by monotonicity)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    bucketed = df.withColumn(
        _BUCKET, _bucket_col(df, order_cols[0], parts, stats_src=stats_src)
    )
    offsets = (
        bucketed.groupBy(_BUCKET)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(_BUCKET, "__offset")
    )
    local_w = Window.partitionBy(_BUCKET).orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offsets), _BUCKET)
        .withColumn(sk_col, (F.row_number().over(local_w) + F.col("__offset")).cast("bigint"))
        .drop(_BUCKET, "__offset")
    )
