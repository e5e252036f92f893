"""Multimodal columns (extension tier): opaque ``binary`` payloads +
typed metadata, with decode / feature-extract / frame-sample as
Arrow-batched ``mapInPandas`` operators.

Real image/audio decoding libraries are not available in this
container, so the decode kernels are STUBBED: ``decode_media`` with
``real_decode=True`` raises ``NotImplementedError`` at the exact point
a PIL/ffmpeg call would go, and the default path computes a
deterministic fake decode from the payload bytes.  Everything
Spark-side — the binary schema, the mapInPandas batch iteration, the
output schemas, the partitioning — is real and tested.

Scale notes: payloads stay opaque bytes end-to-end (no driver
collect); mapInPandas streams Arrow batches per partition, so memory
is bounded by batch size not partition size; pair with
``spark.sql.files.maxPartitionBytes`` to keep per-task byte volume
sane when payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: payload =
    UTF-8 bytes of the text (an opaque blob as far as the engine is
    concerned), kind cycled by doc_id."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        "source",
    )


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas decode: binary in → typed metadata out.

    Fake decode (default): width/height/channels derived
    deterministically from payload bytes.  ``real_decode=True`` marks
    where PIL/soundfile/ffmpeg would run."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image/audio decode needs PIL/soundfile/ffmpeg, "
                    "not present in this environment; fake-decode path is "
                    "the tested default"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda b: b[0] if len(b) else 0)
            second = payloads.map(lambda b: b[1] if len(b) > 1 else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (16 + first % 64).astype("int32"),
                    "height": (16 + second % 64).astype("int32"),
                    "n_channels": pdf["kind"].map({"image": 3, "video": 3, "audio": 1}).astype(
                        "int32"
                    ),
                }
            )

    # project before the Arrow exchange — every extra column is real
    # serialization bytes per batch (mapInPandas gets no column pruning
    # from Catalyst; the kernel declares what it reads)
    return media.select("media_id", "kind", "payload").mapInPandas(kernel, DECODED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: split the blob into
    ``n_frames`` evenly spaced byte slices (stand-in for keyframe
    extraction), one output row per frame — mapInPandas so a single
    input row can fan out."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for _, row in pdf.iterrows():
                blob = row["payload"]
                step = max(len(blob) // n_frames, 1)
                for i in range(n_frames):
                    chunk = blob[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    out_ids.append(row["media_id"])
                    out_nos.append(i)
                    out_frames.append(bytes(chunk))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_no": pd.Series(out_nos, dtype="int32"),
                    "frame_bytes": pd.Series(out_frames, dtype=object),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(kernel, FRAME_SCHEMA)
    )
