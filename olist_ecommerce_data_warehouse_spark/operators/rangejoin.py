"""Range (interval) join — point-in-interval matching at scale.

Spark has no native range join (the reference has none either —
SURVEY.md §2.3 — this is extension surface): a naive formulation
``events JOIN intervals ON ts BETWEEN start AND end`` plans a
BroadcastNestedLoopJoin or cartesian filter, quadratic at corpus
scale.  The scalable rewrite is BUCKETIZATION (the same trick
Databricks' range-join optimization and KDB's window joins apply):

1. pick a bin width W (≈ median interval length);
2. each interval row replicates to every W-bin it overlaps
   (``sequence(floor(start/W), floor(end/W))`` + explode — fan-out =
   interval_length/W + 1, bounded by construction);
3. each point row maps to exactly ONE bin (floor(ts/W));
4. equi-join on the bin (hash shuffle, AQE-skew-splittable), then the
   exact predicate ``start <= ts <= end`` filters bin-mates that don't
   truly overlap.

Every true match shares the point's bin with one of the interval's
replicas, so the rewrite is LOSSLESS (asserted against the naive
theta join in tests); a point matching k intervals emits k rows,
exactly like the theta join.  Longer-than-W intervals cost replicas,
never correctness.  Timestamps are handled as epoch seconds (micros
truncated toward -inf by floor-division semantics of ``F.floor``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width_sec: int = 3600,
    how: str = "inner",
    max_bins_per_interval: int = 10_000,
) -> DataFrame:
    """Join each ``points`` row to every ``intervals`` row whose
    [start, end] contains its timestamp (inclusive bounds, the SQL
    BETWEEN contract).  ``how``: 'inner' or 'left' (unmatched points
    kept with NULL interval columns — each point maps to exactly ONE
    bin, so a (point, interval) match hits exactly one replica and a
    plain left outer join gives exact left semantics).  Column sets
    must be disjoint; both sides' columns pass through.

    Guard rails: inverted intervals (end < start — bad data; no point
    can satisfy the BETWEEN anyway) are filtered out instead of
    letting ``sequence`` build a DESCENDING bin list that replicates
    the row everywhere; an interval spanning more than
    ``max_bins_per_interval`` bins raises at execution (a 9999-12-31
    sentinel end would otherwise materialize a ~70M-element array per
    row — pick a wider ``bin_width_sec`` or cap the sentinel first)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner/left, got {how!r}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"range_join: overlapping column names {sorted(overlap)}")
    if "__bin" in points.columns or "__bin" in intervals.columns:
        raise ValueError("range_join: '__bin' is a reserved column name")
    w = F.lit(int(bin_width_sec))
    p_bin = F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    i_lo = F.floor(F.unix_timestamp(F.col(start_col)) / w)
    i_hi = F.floor(F.unix_timestamp(F.col(end_col)) / w)
    span_ok = (i_hi - i_lo) < F.lit(int(max_bins_per_interval))
    exploded = (
        intervals.filter(F.col(end_col) >= F.col(start_col))
        .withColumn(
            "__bin",
            F.explode(
                F.when(span_ok, F.sequence(i_lo, i_hi)).otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "range_join: interval spans more than "
                                f"{max_bins_per_interval} bins of {bin_width_sec}s — "
                                "widen bin_width_sec or cap sentinel end dates; "
                                "offending start="
                            ),
                            F.col(start_col).cast("string"),
                        )
                    )
                )
            ),
        )
    )
    p = points.withColumn("__bin", p_bin)
    cond = (
        (p["__bin"] == exploded["__bin"])
        & (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return p.join(exploded, cond, how).drop("__bin")
