"""Bigram language model trained in-loop → CCNet-style perplexity
filtering.

The fourth member of the in-loop-training family (k-means → IVF, pair
counts → BPE merges, labeled updates → perceptron, and now corpus
counts → an n-gram LM): CCNet (Wenzek et al. 2020) and Gopher (Rae et
al. 2021) both gate web documents on language-model perplexity, and at
100 TB you want that model TRAINED on (a clean slice of) the corpus by
the same engine that scores it.  A bigram model with add-one smoothing
is the smallest LM that exercises the full shape:

  train:  one explode + two aggregations →
            bigram(prev, w, c_bw), context(prev, c_u), vocab size V
  score:  p(w|u) = (c(u,w) + 1) / (c(u) + V)
          logprob(doc) = Σ ln p(w_i | w_{i-1})   (BOS-padded)

Dataflow at 100 TB: the model tables are MODEL-sized (distinct corpus
bigrams), not corpus-sized — they broadcast, so scoring is a pure
map-side join + aggregation with map-side partials and training is one
shuffle per aggregate.  If the bigram table ever outgrows broadcast
(web-scale vocabularies), drop the `F.broadcast` hints below and let
AQE pick a shuffle join — the rest is unchanged.

Determinism: floating-point SUM order varies with partitioning, so the
engine never sums raw doubles.  Each scored bigram's log-probability is
quantized ONCE to a fixed-point integer (``lp_fp = round(ln(p)·2^20)``,
a per-row pure function of the integer triple (c_bw, c_u, V)), and the
per-document score is an INTEGER sum — bit-stable under any
repartitioning (asserted in tests).  The one honest caveat: ``ln`` is
libm, deterministic within a platform but only 1-ulp-specified across
engines, so this operator is pytest-gated (driver-side reference
trainer + scorer, counts exact, log-probs within quantization
tolerance) rather than DuckDB-hash-gated — same policy as the
perceptron's oscillating-batch caveat: document, don't hide.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

BOS = "<s>"
FP_BITS = 20  # fixed-point scale for log-probs: lp_fp = round(ln(p) * 2^20)
_FP = 1 << FP_BITS


def _bigram_pairs(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id_col, prev, w) — one row per BOS-padded adjacent token pair.
    Shares the engine tokenizer (`functions.text.tokens`) and the
    zip_with-over-shifted-slices shape of `operators.textdedup`."""
    return _bigram_pairs_from_expr(docs, tokens(text_col), id_col)


def _bigram_pairs_from_tokens(
    tok: DataFrame, toks_col: str = "toks", id_col: str = "doc_id"
) -> DataFrame:
    """:func:`_bigram_pairs` over a PRE-TOKENIZED table — the
    shared-scan shape (round 9, see dsir_feature_counts_from_tokens):
    corpus_mixing tokenizes once and both feature streams derive from
    the persisted token table."""
    return _bigram_pairs_from_expr(tok, F.col(toks_col), id_col)


def _bigram_pairs_from_expr(docs: DataFrame, toks_expr, id_col: str) -> DataFrame:
    toks = F.concat(F.array(F.lit(BOS)), toks_expr)
    n = F.size("t")
    return (
        docs.select(F.col(id_col), toks.alias("t"))
        .select(
            id_col,
            F.explode(
                F.zip_with(
                    F.slice("t", 1, F.greatest(n - 1, F.lit(0))),
                    F.slice("t", 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("prev"), b.alias("w")),
                )
            ).alias("p"),
        )
        .select(id_col, "p.prev", "p.w")
    )


def ngram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_fn=None,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the bigram model: returns ``(bigram, context, V)`` where
    ``bigram`` is (prev, w, c_bw), ``context`` is (prev, c_u) with
    c_u = Σ_w c_bw, and ``V`` is the predicted-vocabulary size
    (distinct w, BOS excluded — BOS is never predicted).

    One explode + one groupBy for the bigram table; the context table
    and V are model-sized rollups of it (no second corpus pass).
    ``persist_fn`` overrides how the model table is cached (registry
    plans pass ``track_persist`` so the session releases it between
    plans; the default plain persist suits one-shot callers)."""
    return ngram_lm_train_from_pairs(
        _bigram_pairs(docs, text_col, id_col), persist_fn
    )


def ngram_lm_train_from_pairs(
    pairs: DataFrame, persist_fn=None
) -> tuple[DataFrame, DataFrame, int]:
    """:func:`ngram_lm_train` over a PRE-COMPUTED (id, prev, w) pair
    table — the shared-scan shape (the DSIR single-pass device): when
    the same documents are both trained on and scored (CCNet trains on
    the clean split, scores everything), explode the corpus into pairs
    ONCE, persist, and derive the training aggregate from a filtered
    view of it instead of tokenizing the corpus a second time."""
    bigram = pairs.groupBy("prev", "w").agg(F.count("*").alias("c_bw"))
    bigram = (persist_fn or (lambda df: df.persist()))(bigram)
    context = bigram.groupBy("prev").agg(F.sum("c_bw").alias("c_u"))
    v = bigram.select("w").distinct().count()
    return bigram, context, v


def ngram_lm_train_from_pairs_lazy(
    pairs: DataFrame, persist_fn
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Collect-free trainer (round 9): V comes back as a one-row
    broadcastable DataFrame ``(__v: double)`` instead of a collected
    scalar — :func:`ngram_lm_score_from_pairs` accepts it directly,
    folding the vocabulary count into the scoring query's own
    broadcast stages, so no ``collect()`` ever blocks construction.

    ``persist_fn`` caveat: the three broadcast subtrees the scoring
    query derives from ``bigram`` (bigram itself, context, V) are
    prepared CONCURRENTLY by Spark's broadcast-exchange thread pool.
    Pass an EAGER persist (one count job fills the pairs and bigram
    caches sequentially before any broadcast build) unless the caller
    accepts the cold-cache race — per-block write locks serialize
    most of it, but duplicated-compute windows and run-to-run
    variance remain (observed as "Block ... already exists" warns)."""
    bigram = persist_fn(pairs.groupBy("prev", "w").agg(F.count("*").alias("c_bw")))
    vdf = bigram.agg(F.countDistinct("w").cast("double").alias("__v"))
    context = bigram.groupBy("prev").agg(F.sum("c_bw").alias("c_u"))
    return bigram, context, vdf


def ngram_lm_score(
    docs: DataFrame,
    bigram: DataFrame,
    context: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *keep_cols, n_bigrams, oov_bigrams, logprob_fp,
    avg_logprob, ppl) under add-one smoothing.  ``logprob_fp`` is the
    integer fixed-point sum (deterministic under any partitioning);
    ``avg_logprob`` / ``ppl`` are presentation doubles derived from it.
    Empty docs (no tokens) score n_bigrams=0, ppl=NULL.  ``keep_cols``
    names doc columns carried through (e.g. the CCNet grouping
    language) so callers don't pay a second corpus join to reunite
    scores with grouping keys."""
    return ngram_lm_score_from_pairs(
        docs,
        _bigram_pairs(docs, text_col, id_col),
        bigram,
        context,
        vocab_size,
        id_col=id_col,
        keep_cols=keep_cols,
    )


def ngram_lm_score_from_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    bigram: DataFrame,
    context: DataFrame,
    vocab_size: int | DataFrame,
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`ngram_lm_score` over a PRE-COMPUTED (id, prev, w) pair
    table — pair with :func:`ngram_lm_train_from_pairs` so train and
    score share ONE corpus explode.

    ``vocab_size`` may be the collected int, or the one-row
    ``(__v: double)`` DataFrame from
    :func:`ngram_lm_train_from_pairs_lazy` — then V joins in as a
    broadcast instead of a driver scalar and construction runs no job.
    The smoothing denominator is identical either way: c_u and V are
    exact integers far below 2^53, so the double-typed sum is the same
    value the int expression produced."""
    joined = pairs.join(F.broadcast(bigram), ["prev", "w"], "left").join(
        F.broadcast(context), "prev", "left"
    )
    if isinstance(vocab_size, DataFrame):
        joined = joined.crossJoin(F.broadcast(vocab_size))
        denom = F.coalesce("c_u", F.lit(0)).cast("double") + F.col("__v")
    else:
        denom = (F.coalesce("c_u", F.lit(0)) + F.lit(vocab_size)).cast("double")
    scored = (
        joined
        .select(
            id_col,
            F.col("c_bw").isNull().cast("bigint").alias("oov"),
            F.round(
                F.log(
                    (F.coalesce("c_bw", F.lit(0)) + F.lit(1)).cast("double")
                    / denom
                )
                * F.lit(float(_FP))
            )
            .cast("bigint")
            .alias("lp_fp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.sum("oov").alias("oov_bigrams"),
        F.sum("lp_fp").alias("logprob_fp"),
    )
    # a filter must rule on EVERY doc — empty docs have no bigram rows,
    # so join the aggregate back onto the doc list (zero-evidence rows:
    # n_bigrams=0, ppl NULL)
    base = docs.select(id_col, *keep_cols).join(agg, id_col, "left")
    avg = F.col("logprob_fp") / F.lit(float(_FP)) / F.col("n_bigrams")
    return base.select(
        id_col,
        *keep_cols,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("oov_bigrams", F.lit(0)).alias("oov_bigrams"),
        F.coalesce("logprob_fp", F.lit(0)).alias("logprob_fp"),
        avg.alias("avg_logprob"),
        F.exp(-avg).alias("ppl"),
    )


def ppl_sketch_bounds(
    scored: DataFrame,
    by_col: str = "lang",
    ppl_col: str = "ppl",
    accuracy: int = 10000,
) -> DataFrame:
    """(by_col, __b) — the approximate per-group tertile boundaries of
    :func:`ppl_buckets`, exposed separately (round 11) so a caller
    that also computes the exact tertiles can broadcast BOTH boundary
    tables onto one pass over the scored corpus instead of joining two
    full assignments back together on the document id."""
    return scored.filter(F.col(ppl_col).isNotNull()).groupBy(by_col).agg(
        F.percentile_approx(ppl_col, [1.0 / 3.0, 2.0 / 3.0], accuracy).alias(
            "__b"
        )
    )


def ppl_sketch_bucket_col(ppl_col: str = "ppl"):
    """The sketch bucket expression over a row carrying ``__b`` (from
    a broadcast of :func:`ppl_sketch_bounds`) — the assignment half of
    :func:`ppl_buckets`, one definition for both composition styles."""
    p = F.col(ppl_col)
    return (
        F.when(p.isNull(), F.lit("unscored"))
        .when(p <= F.col("__b")[0], F.lit("head"))
        .when(p <= F.col("__b")[1], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def ppl_buckets(
    scored: DataFrame,
    by_col: str = "lang",
    ppl_col: str = "ppl",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet's head/middle/tail split: per-``by_col`` perplexity
    tertiles (lower ppl = closer to the LM's training distribution =
    ``head``).  Scale shape: ONE aggregation computes approximate
    tertile boundaries per group (`percentile_approx`, a mergeable
    sketch — no global sort, unlike ntile(3) over a window), the tiny
    boundary table broadcasts, and assignment is a pure map.  Docs
    with NULL ppl (no bigrams) get bucket ``unscored`` — no evidence
    either way, callers decide their fate."""
    bounds = ppl_sketch_bounds(scored, by_col, ppl_col, accuracy)
    joined = scored.join(F.broadcast(bounds), by_col, "left")
    return joined.withColumn("ppl_bucket", ppl_sketch_bucket_col(ppl_col)).drop(
        "__b"
    )


def ppl_tertiles_fp(
    scored: DataFrame, by_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet head/middle/tail, EXACTLY and driver-gateably — the
    integer twin of the :func:`ppl_buckets` sketch (round 7, closing
    the round-6 verdict's #3 via the DSIR λ device: the only float op
    in the whole path is the per-model-row ``ln`` that
    :func:`ngram_lm_score` already quantized ONCE to 2^-20 fixed
    point; everything after is int64).

    Rank key: ``avg_fp = logprob_fp div n_bigrams`` (both engines
    truncate toward zero — Spark ``div``, DuckDB ``//``), the mean
    log-prob snapped onto the fixed-point grid.  Perplexity is
    ``exp(-avg)`` — monotone DECREASING in avg — so CCNet's
    lowest-ppl-third 'head' is the HIGHEST-avg_fp third and no ``exp``
    is ever evaluated.

    Exactness at scale without a corpus sort: distinct avg_fp values
    are bounded by the GRID (|avg| ≤ ~25·2^20 ≈ 2.6e7 values), not the
    corpus, so per-group value counts + one cumulative sum over that
    model-sized table yield exact tertile boundaries (b1 = largest
    value whose descending cumulative count reaches ⌈N/3⌉, b2 at
    ⌈2N/3⌉); the two-row-per-group boundary table broadcasts and
    assignment is a pure map.  Ties at a boundary all land in the
    higher bucket — deterministic, identical in the SQL replay.  Docs
    with no bigrams get bucket ``unscored`` and NULL avg_fp (no
    evidence either way — the :func:`ppl_buckets` convention)."""
    withavg = scored.withColumn("avg_fp", ppl_avg_fp_col())
    bounds = ppl_tertile_bounds_fp(withavg, by_col)
    return (
        withavg.join(F.broadcast(bounds), by_col, "left")
        .withColumn("ppl_bucket", ppl_tertile_bucket_col())
        .drop("__b1", "__b2")
    )


def ppl_avg_fp_col():
    """``avg_fp = logprob_fp div n_bigrams`` (NULL when unscored) —
    the grid-quantized rank key of :func:`ppl_tertiles_fp`, exposed so
    callers composing the bounds manually add the identical column."""
    return F.when(F.col("n_bigrams") > 0, F.expr("logprob_fp div n_bigrams"))


def ppl_tertile_bucket_col():
    """The exact-tertile bucket expression over a row carrying
    ``avg_fp``/``__b1``/``__b2`` (from a broadcast of
    :func:`ppl_tertile_bounds_fp`) — the assignment half of
    :func:`ppl_tertiles_fp`, one definition for both composition
    styles."""
    return (
        F.when(~(F.col("n_bigrams") > 0), F.lit("unscored"))
        .when(F.col("avg_fp") >= F.col("__b1"), F.lit("head"))
        .when(F.col("avg_fp") >= F.col("__b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def ppl_tertile_bounds_fp(withavg: DataFrame, by_col: str = "lang") -> DataFrame:
    """(by_col, __b1, __b2) — the exact per-group tertile boundaries
    over a scored table already carrying ``avg_fp``
    (:func:`ppl_avg_fp_col`).  Exposed separately (round 11) for the
    same one-pass composition as :func:`ppl_sketch_bounds`.

    Shuffle budget: TWO exchanges, both model-sized — the value-count
    aggregate (map-side partials collapse the corpus to the fixed-point
    grid before the shuffle) and the per-group window repartition.
    The per-group total is the MAX of the descending running count
    over the same window partitioning (one more window function, zero
    extra shuffles) — round 11 replaced the separate ``tot`` rollup +
    broadcast join, which cost a third model-sized exchange and its
    own AQE stage wave."""
    from pyspark.sql import Window

    has = F.col("n_bigrams") > 0
    vc = (
        withavg.filter(has)
        .groupBy(by_col, "avg_fp")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    win = (
        Window.partitionBy(by_col)
        .orderBy(F.desc("avg_fp"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Σ __cnt per group ≡ the final value of the descending running
    # sum ≡ its unbounded MAX — same partitioning, so both window
    # functions share one WindowExec input ordering
    tot_win = Window.partitionBy(by_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.withColumn("__cum", F.sum("__cnt").over(win)).withColumn(
        "__n", F.max("__cum").over(tot_win)
    )
    return cum.groupBy(by_col).agg(
        F.max(
            F.when(F.col("__cum") >= F.expr("(__n + 2) div 3"), F.col("avg_fp"))
        ).alias("__b1"),
        F.max(
            F.when(
                F.col("__cum") >= F.expr("(2 * __n + 2) div 3"), F.col("avg_fp")
            )
        ).alias("__b2"),
    )


def perplexity_gate(scored: DataFrame, max_ppl: float) -> DataFrame:
    """CCNet-style keep/drop: pass docs whose perplexity under the
    corpus LM is ≤ ``max_ppl`` (empty docs pass — no evidence against
    them, matching the Gopher convention of only gating on measured
    signals)."""
    return scored.withColumn(
        "ppl_pass", F.coalesce(F.col("ppl") <= F.lit(max_ppl), F.lit(True))
    )


# ---------------------------------------------------------------------------
# driver-side reference (tests pin the distributed path against this)


def _ref_pairs(texts: dict[int, list[str]]) -> dict[int, list[tuple[str, str]]]:
    return {
        d: list(zip([BOS] + t, t)) for d, t in texts.items()
    }


def _half_up(x: float) -> int:
    """Spark's ROUND is HALF_UP (away from zero); Python's round() is
    banker's — use this in the reference so the two can only diverge by
    libm ulps, never by rounding mode."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def ngram_lm_train_reference(
    texts: dict[int, list[str]],
) -> tuple[dict[tuple[str, str], int], dict[str, int], int]:
    """Reference trainer over pre-tokenized docs — the distributed
    trainer must produce identical integer tables."""
    bigram: dict[tuple[str, str], int] = {}
    for ps in _ref_pairs(texts).values():
        for p in ps:
            bigram[p] = bigram.get(p, 0) + 1
    context: dict[str, int] = {}
    for (u, _), c in bigram.items():
        context[u] = context.get(u, 0) + c
    v = len({w for (_, w) in bigram})
    return bigram, context, v


def ngram_lm_score_reference(
    texts: dict[int, list[str]],
    bigram: dict[tuple[str, str], int],
    context: dict[str, int],
    vocab_size: int,
) -> dict[int, tuple[int, int, int]]:
    """doc_id → (n_bigrams, oov_bigrams, logprob_fp) using Python's
    libm; tests allow ±1 fixed-point unit per bigram vs the JVM."""
    out = {}
    for d, ps in _ref_pairs(texts).items():
        if not ps:
            continue
        oov, lp = 0, 0
        for p in ps:
            c_bw = bigram.get(p, 0)
            if c_bw == 0:
                oov += 1
            c_u = context.get(p[0], 0)
            lp += _half_up(math.log((c_bw + 1) / (c_u + vocab_size)) * _FP)
        out[d] = (len(ps), oov, lp)
    return out
