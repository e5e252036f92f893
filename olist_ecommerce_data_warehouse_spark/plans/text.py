"""Text-analysis plans (extension tier: language-ID, quality scoring,
token counting, fingerprinting — BASELINE.json north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.functions.text import (
    LANG_MARKERS,
    SCRIPT_EVIDENCE,
    bpe_pretoken_count,
    distinct_token_count,
    fingerprint_md5,
    marker_hits,
    script_char_count,
    token_count,
    tokens,
    toks_sql,
)
from olist_ecommerce_data_warehouse_spark.operators.textdedup import hex2int_sql, hex_to_long
from olist_ecommerce_data_warehouse_spark.plans.registry import query


@query(
    "text_metrics",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len({toks_sql()}) AS n_tokens,
               len(list_distinct({toks_sql()})) AS n_distinct_tokens,
               len(regexp_extract_all(text, ' ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+'))
                   AS n_bpe_pretokens,
               len(list_filter({toks_sql()},
                               x -> x IN ('the','a','of','and'))) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_chars_actual, n_tokens, n_distinct_tokens, n_bpe_pretokens,
           CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS type_token_ratio,
           n_stop,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_chars_actual AS DOUBLE) / n_tokens AS avg_token_span,
           CASE WHEN n_tokens >= 20
                 AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.6
                THEN 1 ELSE 0 END AS passes_quality
    FROM t
    """,
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics + C4-style quality scoring in one
    pass: whitespace/regex tokenizer, distinct-token (vocabulary)
    count, type-token ratio, stopword-ratio / length heuristics with a
    boolean quality gate.  Pure map-side array expressions over one
    scan — no shuffle, scales with input splits.  (Formerly two
    registry slots — ``text_token_stats`` + ``text_quality_score`` —
    merged to free a slot for the contamination-check plan; both
    operator families stay fully oracle-checked here.)"""
    d = table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    n_dis = distinct_token_count("text")
    n_stop = marker_hits("text", ["the", "a", "of", "and"])
    stop_ratio = n_stop.cast("double") / n_tok
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct_tokens"),
        bpe_pretoken_count("text").alias("n_bpe_pretokens"),
        (n_dis.cast("double") / n_tok).alias("type_token_ratio"),
        n_stop.alias("n_stop"),
        stop_ratio.alias("stopword_ratio"),
        (F.length("text").cast("double") / n_tok).alias("avg_token_span"),
        F.when((n_tok >= 20) & stop_ratio.between(0.01, 0.6), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    score = f"len(list_filter({toks_sql()}, x -> x IN ({markers})))"
    if lang in SCRIPT_EVIDENCE:
        # script-class characters are evidence too (see text_lang_id)
        score += f" + len(regexp_extract_all(text, '{SCRIPT_EVIDENCE[lang]}'))"
    return score


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_actual,
               {_lang_score_sql("en")} AS score_en,
               {_lang_score_sql("zh")} AS score_zh,
               {_lang_score_sql("es")} AS score_es,
               {_lang_score_sql("de")} AS score_de,
               {_lang_score_sql("fr")} AS score_fr
        FROM documents
    )
    SELECT doc_id, lang_actual, score_en, score_zh, score_es, score_de, score_fr,
           CASE greatest(score_en, score_zh, score_es, score_de, score_fr)
                WHEN score_en THEN 'en' WHEN score_zh THEN 'zh'
                WHEN score_es THEN 'es' WHEN score_de THEN 'de'
                ELSE 'fr' END AS lang_predicted
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: per-language evidence scores → argmax
    with a fixed precedence order (en,zh,es,de,fr) for ties.  Evidence
    is marker-token hits PLUS script-class character counts
    (SCRIPT_EVIDENCE): a Chinese document contains no Latin marker
    words, but every Han character it contains is a unit of `zh`
    evidence — so `zh` is reachable from actual CJK text, not only
    from the synthetic-corpus marker vocabulary.  The production shape
    (char-n-gram profiles → argmax) is identical; only the evidence
    table changes."""
    d = table(spark, sf_dir, "documents")
    scores = {lang: marker_hits("text", m) for lang, m in LANG_MARKERS.items()}
    for lang, script_re in SCRIPT_EVIDENCE.items():
        scores[lang] = scores[lang] + script_char_count("text", script_re)
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["en"] == best, "en")
        .when(scores["zh"] == best, "zh")
        .when(scores["es"] == best, "es")
        .when(scores["de"] == best, "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[scores[lg].alias(f"score_{lg}") for lg in ("en", "zh", "es", "de", "fr")],
        pred.alias("lang_predicted"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp_md5,
           substr(md5(regexp_replace(trim(text), '\\s+', ' ', 'g')), 1, 16) AS fp_prefix
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized content
    (portable); the engine also exposes xxhash64 for the fast internal
    path (functions.text.fingerprint_xxhash)."""
    d = table(spark, sf_dir, "documents")
    fp = fingerprint_md5("text")
    return d.select("doc_id", fp.alias("fp_md5"), F.substring(fp, 1, 16).alias("fp_prefix"))


TOKS_SQL = toks_sql()


def _grams_all_sql(n: int) -> str:
    """Non-distinct n-gram multiset (repetition needs OCCURRENCES —
    list_distinct would erase the signal the plan measures)."""
    return (
        f"list_transform(generate_series(1, greatest(len({TOKS_SQL}) - {n - 1}, 0)), "
        f"i -> array_to_string(({TOKS_SQL})[i:i+{n - 1}], ' '))"
    )


def _gram_hash_sql(col: str) -> str:
    """SQL twin of the Spark-side gram hash: md5 → first 8 hex chars →
    BIGINT.  Counting/joining on the 8-byte hash instead of the ~40-byte
    gram string cuts shuffle volume ~5×; md5 is identical in both
    engines, so the (astronomically rare) collision merges the same two
    grams on BOTH sides — results stay hash-equal and the stats remain
    a faithful heuristic."""
    return hex2int_sql(f"md5({col})")


@query(
    "text_repetition",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, 2 AS n, unnest({_grams_all_sql(2)}) AS gram FROM documents
        UNION ALL
        SELECT doc_id, 3 AS n, unnest({_grams_all_sql(3)}) AS gram FROM documents
    ),
    hashed AS (
        SELECT doc_id, n, {_gram_hash_sql("gram")} AS gh FROM g
    ),
    counts AS (
        SELECT doc_id, n, gh, COUNT(*) AS c
        FROM hashed GROUP BY doc_id, n, gh
    ),
    per_doc AS (
        SELECT doc_id, n,
               SUM(c) AS total,
               MAX(c) AS top_c,
               SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ
        FROM counts GROUP BY doc_id, n
    ),
    wide AS (
        SELECT doc_id,
               MAX(CASE WHEN n = 2 THEN total END) AS n_2grams,
               MAX(CASE WHEN n = 2 THEN top_c END) AS top2,
               MAX(CASE WHEN n = 3 THEN total END) AS n_3grams,
               MAX(CASE WHEN n = 3 THEN dup_occ END) AS dup3
        FROM per_doc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_2grams AS BIGINT) AS n_2grams,
           CAST(top2 AS DOUBLE) / n_2grams AS top_2gram_frac,
           CAST(n_3grams AS BIGINT) AS n_3grams,
           CAST(dup3 AS DOUBLE) / n_3grams AS dup_3gram_frac,
           CASE WHEN CAST(top2 AS DOUBLE) / n_2grams < 0.20
                 AND CAST(dup3 AS DOUBLE) / n_3grams < 0.60
                THEN 1 ELSE 0 END AS passes_repetition
    FROM wide
    WHERE n_2grams IS NOT NULL AND n_3grams IS NOT NULL
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/boilerplate quality signals (the Gopher repetition
    filters, Rae et al. 2021 — adopted verbatim by MassiveText, Dolma,
    RefinedWeb): fraction of all 2-gram occurrences taken by the single
    most frequent 2-gram, and fraction of 3-gram occurrences whose gram
    repeats within the document.  Degenerate machine-generated or
    template text scores high on both; the gate thresholds (top-2-gram
    < 20%, duplicated-3-gram < 60%) are the published ones.

    Shape: explode the NON-distinct n-gram multisets (occurrences are
    the signal) tagged with n, one (doc, n, gram) count aggregation,
    one (doc, n) rollup, conditional-agg pivot back to one row per doc.
    Both shuffles key on doc_id-led composites — no skew (a gram's
    count is bounded by document length), map-side partials collapse
    repeats, scales with corpus size not vocabulary.  Docs shorter than
    the n-gram order produce no rows and are excluded identically in
    both engines."""
    from olist_ecommerce_data_warehouse_spark.operators.textdedup import shingles

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def grams_all(n: int):
        # multiset shingles: occurrences ARE the signal (short-doc
        # guard lives in the shared shingles helper)
        return shingles("text", n=n, distinct=False)

    g = d.select(
        "doc_id", F.lit(2).alias("n"), F.explode(grams_all(2)).alias("gram")
    ).unionByName(
        d.select("doc_id", F.lit(3).alias("n"), F.explode(grams_all(3)).alias("gram"))
    )
    # count on the 8-byte md5-derived hash, not the gram string: the
    # count shuffle carries ints (~5× less volume); see _gram_hash_sql
    # for why the rare collision is harmless (both engines agree)
    hashed = g.select(
        "doc_id", "n", hex_to_long(F.substring(F.md5("gram"), 1, 8)).alias("gh")
    )
    counts = hashed.groupBy("doc_id", "n", "gh").agg(F.count(F.lit(1)).alias("c"))
    per_doc = counts.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top_c"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_occ"),
    )
    wide = per_doc.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("total"))).alias("n_2grams"),
        F.max(F.when(F.col("n") == 2, F.col("top_c"))).alias("top2"),
        F.max(F.when(F.col("n") == 3, F.col("total"))).alias("n_3grams"),
        F.max(F.when(F.col("n") == 3, F.col("dup_occ"))).alias("dup3"),
    )
    top_frac = F.col("top2").cast("double") / F.col("n_2grams")
    dup_frac = F.col("dup3").cast("double") / F.col("n_3grams")
    return wide.filter(
        F.col("n_2grams").isNotNull() & F.col("n_3grams").isNotNull()
    ).select(
        "doc_id",
        F.col("n_2grams").cast("bigint").alias("n_2grams"),
        top_frac.alias("top_2gram_frac"),
        F.col("n_3grams").cast("bigint").alias("n_3grams"),
        dup_frac.alias("dup_3gram_frac"),
        F.when((top_frac < 0.20) & (dup_frac < 0.60), 1).otherwise(0).alias("passes_repetition"),
    )
