"""Text-analysis column functions (extension tier, SURVEY.md §7 E).

LLM-data-pipeline text ops over the ``documents`` table: tokenization,
quality heuristics, language-ID scoring, fingerprinting.  All pure
``pyspark.sql.functions`` array/regexp expressions — no Python UDFs, so
they run JVM-side inside whole-stage codegen and scale linearly with
input splits (no shuffle at all until an aggregate consumes them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"

# Deterministic marker vocabularies for the language-ID heuristic.
# Real deployments would use character n-gram profiles; the heuristic
# structure (per-language evidence score → argmax) is the same.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "value", "row"],
    "zh": ["table", "big"],
    "es": ["data", "line"],
    "de": ["merge", "hash"],
    "fr": ["join", "window"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Tokenize: all `[a-z]+` runs (array<string>)."""
    return F.regexp_extract_all(_c(col), F.lit(TOKEN_RE), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def marker_hits(col: Column | str, markers: list[str]) -> Column:
    """How many tokens are in the marker set (with multiplicity)."""
    toks = tokens(col)
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def fingerprint_md5(col: Column | str) -> Column:
    """Full-content fingerprint: md5 of the whitespace-normalized
    text.  Portable across engines (DuckDB md5 == Spark md5)."""
    normalized = F.regexp_replace(F.trim(_c(col)), r"\s+", " ")
    return F.md5(normalized)


def fingerprint_xxhash(col: Column | str) -> Column:
    """64-bit engine-internal fingerprint (xxhash64 — fast JVM path,
    not portable to the oracle; used by dedup internals)."""
    return F.xxhash64(_c(col))
