"""Ingest/audit plans (SURVEY.md §2.1 S1–S3, S6–S7).

These prove the source/sink/audit surface under the driver's oracle
gate, not just in unit tests:

- ``csv_roundtrip_ingest``: parquet → quoted CSV (embedded newlines
  intact) → all-string bronze read (multiLine) → newline repair →
  typed cast.  The oracle applies the same repair to the original
  rows, so a hash match proves the CSV parser + repair semantics are
  lossless.
- ``audit_load_summary``: runs real audited loads and reports the
  reference's post-load summary; rows_inserted must equal the table
  counts the oracle computes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.plans.registry import query
from olist_ecommerce_data_warehouse_spark.sources.audit import AuditLog
from olist_ecommerce_data_warehouse_spark.sources.csv import (
    read_csv_bronze,
    strip_embedded_newlines,
)


@query(
    "csv_roundtrip_ingest",
    oracle="""
    SELECT doc_id,
           replace(replace(text, chr(13), ''), chr(10), ' ') AS text,
           lang
    FROM documents
    """,
)
def csv_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3: bulk CSV source with header skip, UTF-8, quoted fields
    and embedded-newline handling (sp_bulk_load_bronze,
    03_load_csv_to_bronze.sql:15-74 + the pandas repair at
    dataset_olist/fix_order_reviews_dataset.py:9-17, both in-engine).

    The documents table round-trips through a quoted CSV file: the
    write keeps embedded newlines inside quotes, the bronze read
    parses them back with ``multiLine`` (no pre-pass needed), the
    repair collapses them exactly like the reference, then bronze
    strings are cast to silver types.  Matching the oracle proves the
    whole path is lossless."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    scratch = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")
    csv_dir = os.path.join(scratch, "csv_roundtrip_" + os.path.basename(sf_dir.rstrip("/")))
    (
        docs.write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"')
        .csv(csv_dir)
    )
    bronze = read_csv_bronze(
        spark, csv_dir, ["doc_id", "text", "lang"], escape='"', multi_line=True
    )
    repaired = strip_embedded_newlines(bronze, ["text"])
    return repaired.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text", "lang"
    )


@query(
    "audit_load_summary",
    oracle="""
    SELECT * FROM (
        SELECT CAST(2 AS BIGINT) AS run_id, 'silver' AS target_schema,
               'nation' AS target_table, 'SUCCESS' AS status,
               (SELECT COUNT(*) FROM nation) AS rows_inserted
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'silver', 'region', 'SUCCESS',
               (SELECT COUNT(*) FROM region)
    ) ORDER BY run_id DESC
    """,
)
def audit_load_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6+S7: audit lifecycle (STARTED → SUCCESS with rows_inserted,
    02_create_tables_bronze.sql:110-124) + the post-load summary
    report (03_load_csv_to_bronze.sql:121-125), demonstrated on two
    real audited loads.  Timestamp columns are excluded — they are
    SYSDATETIME-style nondeterministic by design (§1.2)."""
    log = AuditLog(spark)
    for name in ("region", "nation"):
        run_id, started = log.start_run(name, "silver", name)
        df = table(spark, sf_dir, name)
        log.finish_run(run_id, started, rows_inserted=df.count())
    terminal = log.to_df().filter(F.col("status").isin("SUCCESS", "FAILED"))
    return terminal.select(
        "run_id", "target_schema", "target_table", "status", "rows_inserted"
    ).orderBy(F.desc("run_id"))
