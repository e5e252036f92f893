"""Near-duplicate detection operators (extension tier — the LLM-corpus
dedup family: exact, n-gram Jaccard, MinHash+LSH banding, SimHash).

Everything is expressed with JVM-side array/regexp/hash expressions
(no Python UDFs) and is deliberately *portable*: hash values derive
from md5 hex strings via an explicit hex→int expansion, so an ANSI-SQL
oracle computes bit-identical signatures.

Scale notes (100 TB posture):

- exact dedup: one hash-aggregate on the content fingerprint; map-side
  partial agg collapses dupes before the shuffle.
- n-gram Jaccard via shingle self-join is quadratic in the worst case
  — it is the *verifier*, run only on candidate pairs.
- MinHash+LSH is the scale path: signatures are a narrow map + one
  groupBy(doc); banding turns all-pairs into an equi-join on
  (band, signature) whose output is only the collision set.  Hot
  bands (boilerplate docs) are the skew risk → AQE skew-join or
  salt the band key.
- SimHash: one narrow aggregation per doc; pairing again via banding
  (prefix buckets) at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.functions.text import tokens

HEX_DIGITS = "0123456789abcdef"

# MinHash parameters: K hash functions in B bands of R rows (K = B*R).
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4


def hex_to_long(col: Column, width: int = 8) -> Column:
    """hex-string → BIGINT.  One JVM base-conversion call; the SQL
    oracle computes the identical value with a portable positional
    expansion sum(strpos(ch_j)-1) * 16^(width-j) — same number either
    way for lowercase md5 hex, so hashes stay engine-independent."""
    return F.conv(col, 16, 10).cast("bigint")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (space-joined)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded distinct-shingle table."""
    return docs.select(
        F.col(id_col), F.explode(shingles(text_col)).alias("shingle")
    )


def minhash_band_signatures(
    sh: DataFrame,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """(doc_id, band, sig): per-doc MinHash signature split into LSH
    bands, where hash_i(s) = hex_to_long(md5(i || ':' || s)[:8]) —
    32-bit range, portable.

    Single-shuffle formulation: each shingle row expands to its
    k-vector of hashes map-side, and ONE groupBy(doc_id) folds them
    with an elementwise minimum (collect_list order is irrelevant —
    min is commutative, so this stays deterministic).  Band signatures
    are then a narrow projection.  The naive shape
    (explode ×k → groupBy(doc,i) → groupBy(doc,band)) shuffles k×
    more rows through two wide stages."""
    hs = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: hex_to_long(
            F.substring(
                F.md5(F.concat(i.cast("string"), F.lit(":"), F.col("shingle"))), 1, 8
            )
        ),
    )
    ceiling = F.array_repeat(F.lit(16**8).cast("bigint"), k)
    per_doc = (
        sh.select("doc_id", hs.alias("hs"))
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.collect_list("hs"),
                ceiling,
                lambda acc, h: F.zip_with(acc, h, lambda a, b: F.least(a, b)),
            ).alias("mh_arr")
        )
    )
    sig = F.md5(
        F.concat_ws(
            "|",
            F.transform(
                F.slice("mh_arr", F.col("band") * rows + 1, rows),
                lambda m: m.cast("string"),
            ),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
            "mh_arr",
        )
        .select("doc_id", "band", sig.alias("sig"))
    )


def lsh_candidate_pairs(bands_df: DataFrame) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in ≥1 band — the LSH
    equi-join that replaces all-pairs comparison."""
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_from_inter(inter: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_inter) + per-doc shingle counts → exact
    Jaccard.  ``inter`` must hold the shared-shingle count per pair."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard, computed only for candidate pairs:
    |A∩B| via a shingle equi-join restricted to the pairs, |A|,|B|
    from per-doc shingle counts."""
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return jaccard_from_inter(inter, sh)


def simhash64(col: Column | str, bits: int = 32) -> Column:
    """SimHash over the token multiset: per-token 32-bit hash
    (portable md5-derived), signed bit votes, sign → bit, assembled
    into a BIGINT.  Pure array expressions — per-doc, no shuffle.

    Single-pass formulation: the token-hash array is evaluated once
    per row and ALL bit counters accumulate together in one
    ``aggregate`` with an array<bigint> accumulator (a per-bit
    aggregate would re-evaluate the hash array ``bits`` times — at
    32 bits that is a ~30× blowup of the row expression)."""
    toks = tokens(col)
    hashes = F.transform(toks, lambda t: hex_to_long(F.substring(F.md5(t), 1, 8)))
    pows = F.array(*[F.lit(2**j).cast("bigint") for j in range(bits)])
    zeros = F.array_repeat(F.lit(0).cast("bigint"), bits)
    # votes[j] = sum over tokens of (bit_j(hash) ? +1 : -1)
    votes = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            pows,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint"),
        ),
    )
    # signature = sum over j of (votes[j] > 0 ? 2^j : 0)
    return F.aggregate(
        F.zip_with(
            votes, pows, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
