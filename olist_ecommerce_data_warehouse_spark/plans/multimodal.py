"""Multimodal-column plans (extension tier).

``multimodal_metadata`` is oracle-checked (binary plumbing that SQL
can express: byte lengths, content hashes, per-kind rollups).  The
mapInPandas decode/frame-sample operators are genuinely non-SQL
(Arrow-batched Python kernels) → registered rows-only, with exact
assertions in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.operators.multimodal import (
    decode_media,
    sample_frames,
    synthesize_media,
)
from olist_ecommerce_data_warehouse_spark.plans.registry import query


@query(
    "multimodal_metadata",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               encode(text) AS payload
        FROM documents
    )
    SELECT kind,
           COUNT(*) AS n_media,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           MIN(octet_length(payload)) AS min_bytes,
           MAX(octet_length(payload)) AS max_bytes
    FROM media
    GROUP BY kind
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata rollup: payloads stay opaque bytes; the
    engine aggregates octet lengths per media kind — the
    storage-accounting query every multimodal corpus needs."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    n_bytes = F.octet_length("payload")
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(n_bytes).cast("bigint").alias("total_bytes"),
        F.min(n_bytes).alias("min_bytes"),
        F.max(n_bytes).alias("max_bytes"),
    )


@query("multimodal_decode_stub", oracle=None)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stubbed kernel — see
    operators.multimodal): binary → typed (width, height, channels)
    metadata.  Non-SQL-expressible; exact-value tests live in
    tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    return decode_media(media)


@query("multimodal_frame_sample", oracle=None)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads via mapInPandas fan-out
    (1 row → n_frames rows).  Non-SQL-expressible; exact-value tests
    in tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    return sample_frames(media)
