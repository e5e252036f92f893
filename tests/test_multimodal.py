"""Exact-value tests for the non-SQL multimodal operators (the
mapInPandas decode + frame-sample kernels)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.operators.multimodal import (
    decode_media,
    sample_frames,
    synthesize_media,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(table(spark, SF_DIR, "documents"))


def test_decode_metadata_deterministic(spark, media):
    docs = {r["doc_id"]: r["text"] for r in table(spark, SF_DIR, "documents").collect()}
    decoded = {r["media_id"]: r for r in decode_media(media).collect()}
    assert set(decoded) == set(docs)
    for mid, row in decoded.items():
        blob = docs[mid].encode("utf-8")
        assert row["n_bytes"] == len(blob)
        assert row["width"] == 16 + blob[0] % 64
        assert row["height"] == 16 + blob[1] % 64
        assert row["n_channels"] in (1, 3)


def test_decode_real_path_is_marked_stub(spark, media):
    with pytest.raises(Exception) as ei:
        decode_media(media, real_decode=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling_reassembles_prefix(spark, media):
    frames = sample_frames(media, n_frames=4)
    got = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.octet_length("frame_bytes")).alias("nb")
    )
    rows = {r["media_id"]: r for r in got.collect()}
    videos = {r["media_id"]: r["payload"] for r in media.filter(F.col("kind") == "video").collect()}
    assert set(rows) == set(videos)
    for mid, r in rows.items():
        assert r["n"] == 4
        step = max(len(videos[mid]) // 4, 1)
        assert r["nb"] == 4 * step  # evenly spaced slices
    # frame bytes are the actual payload slices
    one = frames.filter(F.col("frame_no") == 0).first()
    assert bytes(one["frame_bytes"]) == bytes(videos[one["media_id"]])[: len(one["frame_bytes"])]
