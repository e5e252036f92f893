"""Bucketed-table storage: the co-located-join layout for repeated
fact⨝fact joins at 100 TB.

A join between two fact tables (orders ⨝ lineitem on orderkey) pays a
full shuffle of BOTH sides every time it runs.  Writing both tables
bucketed by the join key — ``bucketBy(n, key)`` + ``sortBy`` via
``saveAsTable`` (bucket metadata lives in the session catalog; plain
``.parquet()`` writes cannot carry it) — pins each key to a
deterministic bucket file on disk, so EVERY subsequent join/aggregate
on that key runs with ZERO Exchange: Catalyst reads matching buckets
pairwise (``SortMergeJoin`` over pre-bucketed scans).  For a pipeline
that joins the same facts daily, the one-time bucketed write amortizes
the shuffle away from every downstream run — the single biggest
recurring-shuffle eliminator Spark offers without an external service
(the open-source analog of a co-located MPP distribution key).

Sizing at 100 TB: pick ``num_buckets`` so one bucket of the LARGER
table ≈ 100–200 MB (e.g. 100 TB / 128 MB ≈ 800k buckets is too many
files — shard by partition column first, then ~1k buckets per
partition).  Both sides MUST use the same bucket count (or a multiple,
with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
shuffle-free plan to apply.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed parquet
    table.  ``sortBy`` additionally sorts within each bucket file, so a
    downstream sort-merge join skips its sort as well — the scan
    delivers rows join-ready.

    Write-then-swap: the replacement is written to a staging table
    FIRST, and only after that write commits is the old table dropped
    and the staging table renamed in.  (Plain overwrite keeps the OLD
    bucket spec if the table exists — silently changing the layout
    contract — and drop-before-write destroys the only copy if the
    write fails midway.  The remaining non-atomic window is two
    metadata operations, not the data write; a metastore with atomic
    rename, or Delta/Iceberg, closes it entirely.)"""
    spark = df.sparkSession
    staging = f"{table_name}__staging"
    spark.sql(f"DROP TABLE IF EXISTS {staging}")
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(staging)
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table_name}")


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back THROUGH THE CATALOG — reading the
    parquet paths directly would drop the bucket metadata and with it
    the shuffle-free join."""
    return spark.table(table_name)
