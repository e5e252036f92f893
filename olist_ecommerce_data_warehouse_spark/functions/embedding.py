"""Embedding-column utilities: normalization and int8 quantization.

The billion-vector storage story: float32 embeddings at 100 TB scale
are mostly DEAD WEIGHT for retrieval — production ANN systems store
int8-quantized vectors (4× smaller, SIMD-friendlier) and keep cosine
fidelity by normalizing first.  These are the column-level primitives;
they compose with the IVF/brute-force search operators (which run on
the library's exact-int64 grid regardless).

All expressions are built-in higher-order array functions (JVM-side;
no Python in the path).  Note Catalyst evaluates higher-order lambdas
interpreted per element — fine for these narrow per-row transforms
(one pass per vector), NOT for hot aggregation loops (see the MinHash
fold lesson, operators/textdedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_norm(col: Column | str) -> Column:
    """||v||₂ as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def l2_normalize(col: Column | str) -> Column:
    """v / ||v||₂ (array<double>); zero vectors pass through unchanged
    (guard against division by zero)."""
    c = F.col(col) if isinstance(col, str) else col
    n = l2_norm(c)
    return F.when(n == 0.0, c.cast("array<double>")).otherwise(
        F.transform(c, lambda x: x.cast("double") / n)
    )


def quantize_int8(col: Column | str, scale: Column | None = None) -> Column:
    """Symmetric int8 quantization: round(v / s * 127) clamped to
    [-127, 127], with s = max|v| per vector by default (the standard
    per-vector absmax scheme).  Returns array<tinyint>; pair with the
    per-vector scale (``absmax``) to dequantize."""
    c = F.col(col) if isinstance(col, str) else col
    s = absmax(c) if scale is None else scale
    q = F.transform(
        c,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(x.cast("double") / s * 127).cast("int")),
        ).cast("tinyint"),
    )
    # zero scale (all-zero vector) → all-zero codes
    return F.when(s == 0.0, F.transform(c, lambda x: F.lit(0).cast("tinyint"))).otherwise(q)


def absmax(col: Column | str) -> Column:
    """max|vᵢ| as double — the per-vector quantization scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        c, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def dequantize_int8(codes: Column | str, scale: Column) -> Column:
    """int8 codes + per-vector scale → array<double> approximation of
    the original vector (max abs error ≤ scale/254 per component)."""
    c = F.col(codes) if isinstance(codes, str) else codes
    return F.transform(c, lambda q: q.cast("double") * scale / 127.0)
