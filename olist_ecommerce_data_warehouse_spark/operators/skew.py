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


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with hot-key salting.

    ``other`` is replicated ``num_salts``× (keep it the smaller side —
    typically the dim/lookup side that is too big to broadcast but far
    smaller than the skewed fact side).  Output columns = join keys +
    both sides' non-key columns, exactly like ``skewed.join(other, on,
    how)``."""
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts)).cast("int"),
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(replicated, [*on, SALT_COL], how).drop(SALT_COL)
