"""MERGE/upsert: incremental table maintenance as a pure DataFrame
transform.

The reference maintains every table by full refresh (TRUNCATE +
INSERT..SELECT — `01_create_database_and_schemas.sql:156` design rule,
`07_etl_silver_to_gold.sql:197-198`), which is the right call at Olist
scale but untenable at 100 TB: reloading a petabyte fact table to apply
a day of changes is the canonical scale failure.  This operator is the
incremental counterpart — ANSI ``MERGE INTO`` semantics (SQL:2003;
Delta/Iceberg ``MERGE`` is the same contract) expressed as ONE
null-safe full-outer join:

- matched (key in both) → source values win; flagged ``update`` only
  when a compared column actually differs (null-safely), else
  ``unchanged`` — so downstream writers can skip no-op rows;
- source-only → ``insert``;
- target-only → ``keep`` (or dropped when ``delete_missing`` — the
  full-sync variant).

Scale shape: one shuffle on the merge key for each side (co-located if
both are bucketed by key — ``sources/bucketed.py`` — in which case the
join plans with zero Exchange), no window, no driver state.  The
output feeds an overwrite of affected partitions (or a Delta MERGE on
real deployments); the operator itself stays engine-portable.

Determinism: column resolution is ``coalesce``-free — presence flags
pick a side explicitly, so a NULL update value correctly overwrites a
non-NULL target value (the classic coalesce-merge bug)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    delete_missing: bool = False,
    action_col: str = "__merge_action",
    null_safe_keys: bool = False,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``; returns the merged
    table with ``action_col`` ∈ insert/update/unchanged/keep.

    Both sides must share the same schema.  ``compare_cols`` limits
    change detection (default: all non-key columns).  With
    ``delete_missing`` target-only rows are dropped instead of kept
    (full-sync semantics; the default is incremental-batch semantics
    where absence from a delta feed means "no change").

    ``null_safe_keys``: merge keys are primary keys and plain equality
    (the SQL MERGE contract — NULL-keyed rows never match) is the
    default because it keeps the join on RAW key columns, which is what
    lets co-located bucketed tables plan with zero Exchange
    (``tests/test_plan_quality.py::test_bucketed_merge_upsert_zero_
    exchange``); ``eqNullSafe`` wraps the key in an expression and
    silently disables the bucket join.  Opt in only for nullable keys,
    accepting the shuffle.  VALUE comparison is always null-safe."""
    non_key = [c for c in target.columns if c not in keys]
    if source.columns != target.columns:
        raise ValueError(
            f"merge_upsert: schemas differ: {source.columns} vs {target.columns}"
        )
    compare = non_key if compare_cols is None else compare_cols

    t = target.select(
        *[F.col(c).alias(f"__t_{c}") for c in target.columns],
        F.lit(1).alias("__in_t"),
    )
    s = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns],
        F.lit(1).alias("__in_s"),
    )
    cond = None
    for k in keys:
        tk, sk = F.col(f"__t_{k}"), F.col(f"__s_{k}")
        c = tk.eqNullSafe(sk) if null_safe_keys else (tk == sk)
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    in_t = F.col("__in_t").isNotNull()
    in_s = F.col("__in_s").isNotNull()
    differs = None
    for c in compare:
        d = ~F.col(f"__t_{c}").eqNullSafe(F.col(f"__s_{c}"))
        differs = d if differs is None else (differs | d)
    if differs is None:  # key-only table
        differs = F.lit(False)

    action = (
        F.when(in_t & in_s & differs, "update")
        .when(in_t & in_s, "unchanged")
        .when(in_s, "insert")
        .otherwise("keep")
    )
    # explicit side pick per column — source wins whenever present
    # (even with NULL values: no coalesce)
    out_cols = [
        F.when(in_s, F.col(f"__s_{c}")).otherwise(F.col(f"__t_{c}")).alias(c)
        for c in target.columns
    ]
    merged = joined.select(*out_cols, action.alias(action_col))
    if delete_missing:
        merged = merged.filter(F.col(action_col) != "keep")
    return merged
