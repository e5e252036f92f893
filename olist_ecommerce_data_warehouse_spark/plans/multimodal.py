"""Multimodal-column plans (extension tier).

ALL plans here are oracle-checked — no rows-only registrations
(``test_every_plan_is_oracled`` enforces this repo-wide).
``multimodal_metadata`` is straight SQL-expressible binary plumbing;
the mapInPandas decode/frame-sample kernels are oracle-checked too,
because the stubbed decode is a pure function of the payload bytes
that the SQL oracle recomputes with character ops (byte-identical on
the ASCII-only fixture).  Exact-value kernel assertions additionally
live in tests/test_multimodal.py."""

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
    "multimodal_decode_frames",
    oracle="""
    WITH media AS (
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               text
        FROM documents
    ),
    decoded AS (
        SELECT media_id, kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(16 + CASE WHEN length(text) >= 1
                              THEN ascii(substr(text, 1, 1)) ELSE 0 END % 64 AS INT) AS width,
               CAST(16 + CASE WHEN length(text) >= 2
                              THEN ascii(substr(text, 2, 1)) ELSE 0 END % 64 AS INT) AS height,
               CAST(CASE kind WHEN 'audio' THEN 1 ELSE 3 END AS INT) AS n_channels
        FROM media
    ),
    vid AS (
        SELECT media_id, text,
               greatest(octet_length(encode(text)) // 4, 1) AS step
        FROM media WHERE kind = 'video'
    ),
    frames AS (
        SELECT media_id, i AS frame_no,
               substr(text, i * step + 1, step) AS chunk
        FROM vid CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
    )
    SELECT d.media_id, d.kind, d.n_bytes, d.width, d.height, d.n_channels,
           f.frame_no,
           CAST(octet_length(encode(f.chunk)) AS BIGINT) AS frame_len,
           md5(f.chunk) AS frame_md5
    FROM decoded d
    LEFT JOIN (SELECT * FROM frames WHERE chunk <> '') f
           ON d.media_id = f.media_id
    """,
)
def multimodal_decode_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode + video frame sampling in one
    inventory (merged registry slot — formerly ``multimodal_decode_
    stub`` + ``multimodal_frame_sample``; both kernels stay fully
    oracle-checked).

    Decode (stubbed kernel — see operators.multimodal): binary → typed
    (width, height, channels) metadata; the fake decode is a pure
    function of the payload bytes, so the oracle recomputes it with
    character ops (byte-identical on the ASCII-only fixture; the Spark
    kernel is byte-true for any input).  Frame sampling fans each
    video payload out to 4 evenly-spaced binary slices via
    mapInPandas; each frame projects to (byte length, md5) so slicing
    offsets and CONTENT are hash-verified.  The LEFT JOIN keeps one
    row per image/audio medium (frame columns NULL) and one row per
    sampled frame for video — the per-medium grain a multimodal
    training pipeline feeds downstream.  Exact-value kernel tests in
    tests/test_multimodal.py."""
    media = synthesize_media(table(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    frames = sample_frames(media).select(
        F.col("media_id").alias("f_media_id"),
        "frame_no",
        F.octet_length("frame_bytes").cast("bigint").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )
    return decoded.join(
        frames, decoded.media_id == frames.f_media_id, "left"
    ).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_channels",
        "frame_no", "frame_len", "frame_md5",
    )
