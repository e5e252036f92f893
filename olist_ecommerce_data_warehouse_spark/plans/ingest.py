"""Ingest/audit plan (SURVEY.md §2.1 S1–S3, S6–S7, §2.9 C4).

``csv_roundtrip_ingest`` proves the whole source/sink/audit surface
under the driver's oracle gate, not just in unit tests: parquet →
quoted CSV (embedded newlines intact) → all-string bronze read
(multiLine) → newline repair → typed cast, the load wrapped in the
reference's STARTED → SUCCESS audit lifecycle.  The oracle applies
the same repair to the original rows and pins the audit outcome
(run_id, status, rows_inserted), so a hash match proves the CSV
parser + repair semantics are lossless AND the audit recorded the
true inserted-row count.
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
           lang,
           CAST(1 AS BIGINT) AS run_id,
           'SUCCESS' AS status,
           (SELECT COUNT(*) FROM documents) AS rows_inserted
    FROM documents
    """,
)
def csv_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3: bulk CSV source with header skip, UTF-8, quoted fields
    and embedded-newline handling (sp_bulk_load_bronze,
    03_load_csv_to_bronze.sql:15-74 + the pandas repair at
    dataset_olist/fix_order_reviews_dataset.py:9-17, both in-engine),
    wrapped in the S6/C4 audit lifecycle with the S7 summary columns
    (02_create_tables_bronze.sql:110-124, 03_load_csv_to_bronze.sql:121-125).

    The documents table round-trips through a quoted CSV file: the
    write keeps embedded newlines inside quotes, the bronze read
    parses them back with ``multiLine`` (no pre-pass needed), the
    repair collapses them exactly like the reference, then bronze
    strings are cast to silver types.  The load runs STARTED→SUCCESS
    through ``AuditLog`` and every output row carries the terminal
    audit columns (a one-row broadcast, no extra shuffle); timestamp
    audit columns are excluded — SYSDATETIME-style nondeterministic by
    design (§1.2).  Matching the oracle proves the path is lossless
    and rows_inserted equals the true count."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    scratch = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")
    csv_dir = os.path.join(scratch, "csv_roundtrip_" + os.path.basename(sf_dir.rstrip("/")))
    (
        docs.write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"')
        .csv(csv_dir)
    )
    log = AuditLog(spark)
    run_id, started = log.start_run(
        "documents.csv", "bronze", "documents", source_path=csv_dir
    )
    bronze = read_csv_bronze(
        spark, csv_dir, ["doc_id", "text", "lang"], escape='"', multi_line=True
    )
    repaired = strip_embedded_newlines(bronze, ["text"])
    typed = repaired.select(F.col("doc_id").cast("bigint").alias("doc_id"), "text", "lang")
    log.finish_run(run_id, started, rows_inserted=typed.count())
    audit_row = (
        log.to_df()
        .filter(F.col("status").isin("SUCCESS", "FAILED"))
        .select("run_id", "status", "rows_inserted")
    )
    return typed.crossJoin(F.broadcast(audit_row))
