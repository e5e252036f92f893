"""Decorator-based plan registry.

Each plan is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string for DuckDB (driver contract in
``__spark_entry__.py``).  Column names/aliases MUST match between the
Spark result and the oracle — the driver sorts columns by name before
hashing.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


def release_stale_checkpoints(spark: SparkSession) -> None:
    """Unpersist every persistent RDD left behind by earlier plans.

    Some operators pin an eager ``localCheckpoint`` (surrogate-key
    range layout, shingle tables).  Spark never frees those blocks on
    its own, so across a 50-plan bench/correctness run they accumulate
    in executor storage and degrade every later query (observed: a
    sub-second projection ballooning to 50 s from GC pressure).  Plans
    run strictly sequentially in every harness, so at plan-construction
    time the previous plan is fully materialized and its checkpoints
    are dead weight — safe to drop.  (localCheckpoint truncates
    lineage, so this is ONLY safe between plans, never within one.)
    """
    for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        # blocking: async removal races the next plan's eager
        # checkpoint writes on block-manager locks (observed as a 15 s
        # plan intermittently taking 57 s when following another
        # checkpointing plan)
        jrdd.unpersist(True)
    # ContextCleaner frees shuffle files / broadcasts only when the
    # driver GC collects their weak refs — on a 48 g heap that almost
    # never happens on its own, and heavy shuffle plans degrade
    # monotonically across a 50-plan session (measured 6 s → 40 s for
    # the same query).  One explicit GC per plan keeps the session
    # flat and costs ~100 ms on an idle heap.
    spark.sparkContext._jvm.System.gc()


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkFn], SparkFn]:
    """Register a plan under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate plan name {name!r}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_stale_checkpoints(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return wrapped

    return deco
