"""Text-analysis plans (extension tier: language-ID, quality scoring,
token counting, fingerprinting — BASELINE.json north star)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.functions.text import (
    LANG_MARKERS,
    distinct_token_count,
    fingerprint_md5,
    marker_hits,
    token_count,
    tokens,
)
from olist_ecommerce_data_warehouse_spark.plans.registry import query


@query(
    "text_metrics",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len(regexp_extract_all(text, '[a-z]+')) AS n_tokens,
               len(list_distinct(regexp_extract_all(text, '[a-z]+'))) AS n_distinct_tokens,
               len(list_filter(regexp_extract_all(text, '[a-z]+'),
                               x -> x IN ('the','a','of','and'))) AS n_stop
        FROM documents
    )
    SELECT doc_id, n_chars_actual, n_tokens, n_distinct_tokens,
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
    return f"len(list_filter(regexp_extract_all(text, '[a-z]+'), x -> x IN ({markers})))"


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
    """Language-ID heuristic: per-language marker-token evidence
    scores → argmax with a fixed precedence order (en,zh,es,de,fr) for
    ties.  The production shape (char-n-gram profiles → argmax) is
    identical; only the marker table changes."""
    d = table(spark, sf_dir, "documents")
    scores = {lang: marker_hits("text", m) for lang, m in LANG_MARKERS.items()}
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
