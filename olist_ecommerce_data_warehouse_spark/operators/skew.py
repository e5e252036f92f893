"""Hot-key skew handling: deterministic salted equi-join.

AQE's skew-join splitting (on in session.py) handles most skew by
splitting oversized post-shuffle partitions.  Salting is the explicit
fallback for the pathological case AQE can't fix: ONE join key so hot
that even a split partition is dominated by a single key group (the
geolocation-zip analog from the reference's ~1M-row table,
sp_load_silver_geolocation.sql:40-43, scaled to 100 TB).

Mechanics: the skewed side gets a deterministic per-row salt in
[0, n); the other side replicates each row n times (one per salt).
The join key becomes (key, salt), so a hot key's rows spread over n
shuffle partitions instead of one.  Row-level results are identical
to the unsalted join — every skewed row meets exactly one replica of
each matching row.

The salt is ``pmod(xxhash64(all columns), n)`` — deterministic across
runs/retries (``rand()`` would break task-retry idempotency and
correctness hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _salted_core(
    skewed: DataFrame, other: DataFrame, on: list[str], how: str, num_salts: int
) -> DataFrame:
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)).cast("int"),
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
    hot_min_rows: int | None = None,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with hot-key salting.

    ``other`` is replicated ``num_salts``× (keep it the smaller side —
    typically the dim/lookup side that is too big to broadcast but far
    smaller than the skewed fact side).  Output columns = join keys +
    both sides' non-key columns, exactly like ``skewed.join(other, on,
    how)``.

    ``hot_min_rows``: PARTIAL salting — the production shape.  One
    cheap key-count aggregate (map-side partial, output = |hot keys|,
    broadcast back) splits the data: only keys with ≥ ``hot_min_rows``
    rows on the skewed side take the salted path; the cold majority
    joins plain, paying zero replication.  The two joins union to the
    identical row set — every skewed row lands in exactly one branch,
    so the guarantee is unchanged.  ``None`` = salt everything (the
    simple shape; also the fallback when the hot set can't be known).
    At 100 TB the hot set is small by definition (that's what makes a
    key hot), so its broadcast is bounded.

    ``how`` is restricted to inner/left/left_semi/left_anti: the
    row-identity guarantee holds only when unmatched ``other`` rows
    never surface.  Under right/full outer each unmatched ``other``
    row would survive once per salt replica (num_salts duplicates);
    for those, salt the other side instead (swap the arguments)."""
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
               "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched replicated rows; "
            f"use one of {sorted(allowed)} (or swap sides)"
        )
    if hot_min_rows is None:
        return _salted_core(skewed, other, on, how, num_salts)
    hot = (
        skewed.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("__kn"))
        .filter(F.col("__kn") >= hot_min_rows)
        .select(*on)
    )
    skew_hot = skewed.join(F.broadcast(hot), on, "left_semi")
    skew_cold = skewed.join(F.broadcast(hot), on, "left_anti")
    other_hot = other.join(F.broadcast(hot), on, "left_semi")
    hot_joined = _salted_core(skew_hot, other_hot, on, how, num_salts)
    cold_joined = skew_cold.join(other, on, how)
    return hot_joined.unionByName(cold_joined)
