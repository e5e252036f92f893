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
    """Portable hex-string → BIGINT: positional expansion
    sum(hexval(ch_j) * 16^(width-j)).  Matches the same arithmetic in
    ANSI SQL (strpos-based), unlike conv()/from_hex which differ or
    don't exist across engines."""
    total = F.lit(0).cast("bigint")
    for j in range(1, width + 1):
        ch = F.substring(col, j, 1)
        val = (F.instr(F.lit(HEX_DIGITS), ch) - 1).cast("bigint")
        total = total + val * F.lit(16 ** (width - j)).cast("bigint")
    return total


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


def minhash_values(sh: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, i, mh): per-doc minimum of hash_i over its shingles,
    where hash_i(s) = hex_to_long(md5(i || ':' || s)[:8]) — 32-bit
    range, portable."""
    with_i = sh.select(
        "doc_id", "shingle", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i")
    )
    h = hex_to_long(
        F.substring(F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("shingle"))), 1, 8)
    )
    return with_i.select("doc_id", "i", h.alias("hv")).groupBy("doc_id", "i").agg(
        F.min("hv").alias("mh")
    )


def band_signatures(mh: DataFrame, bands: int = MINHASH_BANDS, rows: int = MINHASH_ROWS) -> DataFrame:
    """(doc_id, band, sig): md5 over the band's row-ordered minhashes.
    collect_list has no ordering guarantee, so rows are gathered as
    (i, mh) structs and sort_array pins the order deterministically."""
    banded = mh.withColumn("band", (F.col("i") / rows).cast("int"))
    return (
        banded.groupBy("doc_id", "band")
        .agg(F.sort_array(F.collect_list(F.struct("i", "mh"))).alias("rows"))
        .select(
            "doc_id",
            "band",
            F.md5(
                F.concat_ws("|", F.transform("rows", lambda r: r["mh"].cast("string")))
            ).alias("sig"),
        )
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


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard, computed only for candidate pairs:
    |A∩B| via a shingle equi-join restricted to the pairs, |A|,|B|
    from per-doc shingle counts."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
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
