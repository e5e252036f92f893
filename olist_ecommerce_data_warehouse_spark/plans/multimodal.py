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


@query(
    "multimodal_decode_stub",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text
        FROM documents
    )
    SELECT media_id, kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(16 + CASE WHEN length(text) >= 1
                          THEN ascii(substr(text, 1, 1)) ELSE 0 END % 64 AS INT) AS width,
           CAST(16 + CASE WHEN length(text) >= 2
                          THEN ascii(substr(text, 2, 1)) ELSE 0 END % 64 AS INT) AS height,
           CAST(CASE kind WHEN 'audio' THEN 1 ELSE 3 END AS INT) AS n_channels
    FROM media
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stubbed kernel — see
    operators.multimodal): binary → typed (width, height, channels)
    metadata.  The fake decode is a pure function of the payload bytes
    (width/height from the first two bytes), so it IS SQL-expressible:
    the oracle recomputes it with character ops — byte-identical here
    because the documents fixture is ASCII-only (asserted across all
    SFs; the Spark kernel itself is byte-true for any input).
    Exact-value kernel tests live in tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    return decode_media(media)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id, text,
               greatest(octet_length(encode(text)) // 4, 1) AS step
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    frames AS (
        SELECT media_id,
               i AS frame_no,
               substr(text, i * step + 1, step) AS chunk
        FROM media CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    )
    SELECT media_id, frame_no,
           CAST(octet_length(encode(chunk)) AS BIGINT) AS frame_len,
           md5(chunk) AS frame_md5
    FROM frames
    WHERE chunk <> ''
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads via mapInPandas fan-out
    (1 row → n_frames rows of binary frame slices).  The plan projects
    each frame to (byte length, md5) so the fan-out, slicing offsets
    and frame CONTENT are all driver-verifiable: the oracle recomputes
    the evenly-spaced slices in SQL (character ops ≡ byte ops on the
    ASCII-only fixture; the kernel is byte-true for any input) and an
    md5 mismatch on any slice would fail the hash gate.  The raw
    binary frames remain available from operators.multimodal.sample_frames;
    exact-value kernel tests in tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return frames.select(
        "media_id",
        "frame_no",
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )
