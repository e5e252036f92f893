"""DSIR — Data Selection via Importance Resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The selection-family member the quality classifier and perplexity
filter don't cover: given a small TARGET sample (the domain you want
more of — e.g. encyclopedic text, code, a benchmark's training split)
and the RAW corpus, select raw documents whose hashed-n-gram
distribution looks like the target, by importance resampling under
two bag-of-hashed-ngrams models:

  features  x_d[b]   — hashed uni+bigram counts folded into B buckets
                       (the same hashing trick / shared rolling-hash
                       machinery as the fasttext-style classifier;
                       DSIR's paper uses B = 10^4, the default here);
  models    p̂_t[b] = (t_b + α) / (T + αB)   (target, add-α smoothed)
            p̂_r[b] = (r_b + α) / (R + αB)   (raw)
  weight    log ŵ_d = Σ_b x_d[b] · λ[b],  λ[b] = ln p̂_t[b] − ln p̂_r[b]
  selection Gumbel-top-k:  key_d = log ŵ_d + g_d  with g_d standard
            Gumbel  ⇒  the top-n by key is an exact sample without
            replacement with P(d) ∝ ŵ_d  (Vieira 2014) — the paper's
            importance resampling, deterministically.

Dataflow at 100 TB: the two bucket-count tables and the λ table are
MODEL-sized (≤ B rows) — one aggregation over each corpus builds
them, λ broadcasts, per-doc scoring is a map-side join + one integer
aggregate, and the top-n is a TakeOrdered (per-partition heads, no
global sort).  Nothing corpus-sized ever sits on the driver.

Determinism (the ngram_lm policy): float ``ln`` appears exactly ONCE
per bucket — λ[b] quantizes to fixed-point ``lam_fp = round(λ·2^20)``
as a pure function of the integer tuple (t_b, T, r_b, R, B, α) — and
ONCE per document for the Gumbel noise, whose uniform input is
``(pmod(xxhash64(id, seed), 2^31) + 0.5) / 2^31`` (a pure function of
id and seed — replayable, partitioning-independent).  Per-doc weights
are INTEGER sums of cnt·lam_fp, so scores are bit-stable under any
repartitioning.  ``ln`` itself is libm (1-ulp across engines), so the
operator is pytest-gated like the LM: integer machinery exact,
per-bucket log-ratios within quantization tolerance of a driver-side
reference.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.operators.quality import quality_features
from olist_ecommerce_data_warehouse_spark.operators.textdedup import mix32

DSIR_BUCKETS = 10_000  # the paper's order of magnitude
FP_BITS = 20
_FP = 1 << FP_BITS
_UM = 1 << 31  # uniform grid for the Gumbel input


def dsir_feature_counts(
    docs: DataFrame,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, bucket, cnt) — hashed uni+bigram counts folded into
    ``buckets`` (same feature stream as the quality classifier, DSIR's
    smaller bucket space).  One explode + one aggregation."""
    h = F.explode(quality_features(text_col)).alias("h")
    return (
        docs.select(F.col(id_col), h)
        .select(id_col, (mix32(F.col("h")) % F.lit(buckets)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_totals(
    docs: DataFrame, buckets: int, text_col: str
) -> DataFrame:
    """(bucket, c) corpus-wide — the bag-of-hashed-ngrams model, one
    aggregation, ≤ ``buckets`` output rows."""
    h = F.explode(quality_features(text_col)).alias("h")
    return (
        docs.select(h)
        .select((mix32(F.col("h")) % F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_ratio(
    target: DataFrame,
    raw: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
    text_col: str = "text",
) -> tuple[DataFrame, int]:
    """Fixed-point log-ratio table: returns ``(lam, lam0_fp)`` where
    ``lam`` is (bucket, lam_fp) for every bucket seen in EITHER corpus
    and ``lam0_fp`` is the constant ratio of a bucket seen in NEITHER
    (t_b = r_b = 0 ⇒ λ0 = ln(R+αB) − ln(T+αB)) — document features
    hashing to an unseen bucket still carry that prior, they don't
    silently weigh 0.  Model-sized everywhere: two corpus aggregates,
    one ≤B-row full-outer join, two scalar totals."""
    tc = _bucket_totals(target, buckets, text_col)
    rc = _bucket_totals(raw, buckets, text_col)
    t_total = tc.agg(F.sum("c")).collect()[0][0] or 0
    r_total = rc.agg(F.sum("c")).collect()[0][0] or 0
    log_t_denom = math.log(t_total + alpha * buckets)
    log_r_denom = math.log(r_total + alpha * buckets)
    lam0_fp = round((log_r_denom - log_t_denom) * _FP)
    lam = (
        tc.withColumnRenamed("c", "t_b")
        .join(rc.withColumnRenamed("c", "r_b"), "bucket", "full")
        .select(
            "bucket",
            F.round(
                (
                    F.log((F.coalesce("t_b", F.lit(0)) + F.lit(alpha)).cast("double"))
                    - F.lit(log_t_denom)
                    - F.log((F.coalesce("r_b", F.lit(0)) + F.lit(alpha)).cast("double"))
                    + F.lit(log_r_denom)
                )
                * F.lit(float(_FP))
            )
            .cast("bigint")
            .alias("lam_fp"),
        )
    )
    return lam, lam0_fp


def dsir_score(
    docs: DataFrame,
    lam: DataFrame,
    lam0_fp: int,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_features, weight_fp) — integer fixed-point log
    importance weight per document (bit-stable under partitioning).
    Featureless docs score (0, 0): no evidence either way."""
    fc = dsir_feature_counts(docs, buckets, id_col, text_col)
    scored = (
        fc.join(F.broadcast(lam), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_features"),
            F.sum(
                F.col("cnt") * F.coalesce(F.col("lam_fp"), F.lit(lam0_fp))
            ).alias("weight_fp"),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        F.coalesce("weight_fp", F.lit(0)).alias("weight_fp"),
    )


def gumbel_key(weight_fp_col, id_col, seed: int = 0):
    """key_fp = weight_fp + round(Gumbel(u)·2^20) with u a pure
    function of (id, seed): top-n by this key samples without
    replacement with P ∝ exp(weight) — the Gumbel-top-k trick.  The
    0.5/2^31 offset keeps u strictly inside (0, 1)."""
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_UM)) + F.lit(0.5)
    ) / F.lit(float(_UM))
    g = -F.log(-F.log(u))
    return (F.col(weight_fp_col) + F.round(g * F.lit(float(_FP))).cast("bigint")).alias(
        "key_fp"
    )


def dsir_resample(
    scored: DataFrame, n: int, seed: int = 0, id_col: str = "doc_id"
) -> DataFrame:
    """Top-``n`` Gumbel keys = an importance-resampled selection
    (without replacement, P ∝ exp(weight)).  TakeOrdered shape:
    per-partition heads merge on the driver, no global sort; ties
    break to the lower id for determinism."""
    keyed = scored.select(id_col, "weight_fp", gumbel_key("weight_fp", id_col, seed))
    return keyed.orderBy(F.desc("key_fp"), F.col(id_col)).limit(n)


# --------------------------------------------------------- reference twin


def dsir_reference(
    doc_feats: dict[int, dict[int, int]],
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    buckets: int = DSIR_BUCKETS,
    alpha: int = 1,
) -> tuple[dict[int, int], int, dict[int, int]]:
    """Driver-side reference: returns (lam_fp table, lam0_fp,
    weight_fp per doc) from pre-hashed feature counts — the
    distributed integer machinery must match bucket-for-bucket within
    the documented ±1 fp quantization tolerance of libm ``ln``, and
    EXACTLY once the λ table is fixed."""
    t_total = sum(target_counts.values())
    r_total = sum(raw_counts.values())
    log_t_denom = math.log(t_total + alpha * buckets)
    log_r_denom = math.log(r_total + alpha * buckets)
    lam0_fp = round((log_r_denom - log_t_denom) * _FP)
    lam = {
        b: round(
            (
                math.log(target_counts.get(b, 0) + alpha)
                - log_t_denom
                - math.log(raw_counts.get(b, 0) + alpha)
                + log_r_denom
            )
            * _FP
        )
        for b in set(target_counts) | set(raw_counts)
    }
    weights = {
        d: sum(cnt * lam.get(b, lam0_fp) for b, cnt in feats.items())
        for d, feats in doc_feats.items()
    }
    return lam, lam0_fp, weights
