"""Decorator-based plan registry.

Each plan is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string for DuckDB (driver contract in
``__spark_entry__.py``).  Column names/aliases MUST match between the
Spark result and the oracle — the driver sorts columns by name before
hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


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
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
