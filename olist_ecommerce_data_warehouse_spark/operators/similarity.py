"""Vector similarity search (extension tier: brute-force cosine top-k
baseline + IVF-bucketed scale path).

Determinism strategy: embedding floats are quantized to BIGINT at 1e-6
resolution (``floor(double(x) * 1e6)`` — float→double is exact and
floor of one fp product is bit-deterministic in every IEEE engine), so
dot products and squared norms are EXACT integer arithmetic —
order-independent, hash-identical with any ANSI-SQL oracle.  The final
cosine divides two exact integers under one sqrt — correctly-rounded
IEEE ops, so bits still match.  Quantization error at 1e-6 on O(1)
embeddings is far below any meaningful similarity delta (the same
trade int8-quantized ANN indexes make, much coarser).

Scale notes: brute-force is the correctness baseline (O(Q·N·d) but
embarrassingly parallel map-side work after broadcasting Q query
vectors — no shuffle until top-k).  The IVF variant buckets vectors by
nearest centroid so each query scans only nprobe clusters — the
standard billion-scale layout; cluster assignment is one broadcast
join + argmin, i.e. a narrow map."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantized(col: Column | str) -> Column:
    """array<float> → array<bigint> at 1e-6 resolution (exact ops)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def norm_sq_q(a: Column) -> Column:
    return dot_q(a, a)


def cosine_q(a: Column, b: Column) -> Column:
    """Cosine over quantized vectors: exact-int dot / sqrt(na)·sqrt(nb)."""
    return dot_q(a, b).cast("double") / (
        F.sqrt(norm_sq_q(a).cast("double")) * F.sqrt(norm_sq_q(b).cast("double"))
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for each query vector.

    ``queries``: (query_id, qvec quantized); ``corpus``: (vec_id, cvec
    quantized).  The query side is broadcast (Q ≪ N); scoring is pure
    map-side; the only shuffle is the per-query top-k window.

    Per-vector ``sqrt(norm²)`` is projected BELOW the join so each of
    the O(Q·N) scored pairs does one dot product instead of three
    array aggregates — same float ops as dot/(√na·√nb), bit-identical
    cosine."""
    q = queries.withColumn("__qn", F.sqrt(norm_sq_q(F.col("qvec")).cast("double")))
    c = corpus.withColumn("__cn", F.sqrt(norm_sq_q(F.col("cvec")).cast("double")))
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = dot_q(F.col("qvec"), F.col("cvec")).cast("double") / (
        F.col("__qn") * F.col("__cn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def blocked_cosine_pairs(
    blocked: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.99,
) -> DataFrame:
    """All qualifying cosine pairs (id_a < id_b, cosine ≥ threshold)
    within each block, via a per-block integer Gram matrix in numpy —
    the vectorized-Pandas-UDF scale path for embedding near-dup.

    Each block (an IVF/LSH bucket at scale — here the corpus label)
    becomes ONE ``applyInPandas`` group: stack the block's quantized
    vectors into an int64 (n, d) matrix, one ``M @ Mᵀ`` gives every
    pairwise dot exactly (int64 — no float accumulation), norms come
    off the diagonal, and the upper triangle is thresholded in bulk.
    Identical bits to the JVM expression path: exact integer dots, one
    correctly-rounded IEEE division per pair.

    Why not a pair-level join: a blocked self-join evaluates the
    d-element dot per pair through interpreted Catalyst lambdas and
    ships both vectors per candidate row.  Here each vector crosses
    Arrow once and the O(n²d) work runs as one C-loop matmul.  Blocks
    must fit an executor (bucket sizing at scale: n·d·8 bytes plus the
    n² Gram — cap bucket size accordingly)."""
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{id_col}_a bigint, {id_col}_b bigint, cosine double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        m = np.stack([np.asarray(v, dtype=np.int64) for v in pdf[vec_col]])
        gram = m @ m.T
        norms = np.sqrt(np.diag(gram).astype(np.float64))
        cos = gram.astype(np.float64) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= threshold
        return pd.DataFrame(
            {
                f"{id_col}_a": ids[ia][keep],
                f"{id_col}_b": ids[ib][keep],
                "cosine": cos[ia, ib][keep],
            }
        )

    return blocked.select(block_col, id_col, vec_col).groupBy(block_col).applyInPandas(
        kernel, out_schema
    )
