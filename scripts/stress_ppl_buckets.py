"""CCNet head/middle/tail bucket accuracy at 100× (round-6 verdict
#8): `ppl_buckets` splits per-language perplexity into tertiles with a
`percentile_approx` SKETCH (mergeable, no global sort — the 100 TB
shape); its boundary error is pinned at sf0.1 but sketch error
compounds with group size, so this re-runs the LM stress at 500k docs
and compares, per language:

- sketch tertile boundaries vs EXACT percentiles (same 1/3, 2/3
  probabilities via Spark's exact `percentile`),
- the realized bucket sizes under the sketch boundaries vs the ideal
  n/3 thirds.

Replicas get a distinct "r{r}" token appended so their perplexities
SPREAD (each replica adds one novel-context bigram) instead of
stacking 100-deep ties at every boundary — ties would make thirds
unattainable for ANY boundary and the comparison meaningless; the
residual tie mass from the base corpus is reported alongside.

Usage: python scripts/stress_ppl_buckets.py [replicas] (default 100).
Prints one JSON line; measured table in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from olist_ecommerce_data_warehouse_spark.operators.ngram_lm import (  # noqa: E402
    ngram_lm_score,
    ngram_lm_train,
    ppl_buckets,
    ppl_tertiles_fp,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("stress_ppl_buckets")
    out: dict = {"replicas": n}

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs = (
        docs0.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        .select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" r"), F.col("__r").cast("string")
            ).alias("text"),
            "lang",
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    docs.persist()
    out["n_docs"] = docs.count()

    t0 = time.perf_counter()
    bigram, context, v = ngram_lm_train(docs)
    scored = ngram_lm_score(docs, bigram, context, v).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    scored.persist()
    n_scored = scored.filter(F.col("ppl").isNotNull()).count()
    out["train_score_sec"] = round(time.perf_counter() - t0, 1)
    out["scored_docs"] = n_scored

    # sketch boundaries (the operator's own path) vs exact percentiles
    t0 = time.perf_counter()
    bucketed = ppl_buckets(scored)
    sizes = {
        (r["lang"], r["ppl_bucket"]): r["n"]
        for r in bucketed.groupBy("lang", "ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["bucket_sec"] = round(time.perf_counter() - t0, 1)

    sk = {
        r["lang"]: r["__b"]
        for r in scored.filter(F.col("ppl").isNotNull())
        .groupBy("lang")
        .agg(
            F.percentile_approx("ppl", [1.0 / 3.0, 2.0 / 3.0], 10000).alias("__b")
        )
        .collect()
    }
    ex = {
        r["lang"]: r["__b"]
        for r in scored.filter(F.col("ppl").isNotNull())
        .groupBy("lang")
        .agg(
            F.expr(
                "percentile(ppl, array(CAST(1.0/3 AS DOUBLE), "
                "CAST(2.0/3 AS DOUBLE)))"
            ).alias("__b")
        )
        .collect()
    }
    per_lang = {}
    worst_rel = 0.0
    worst_size_dev = 0.0
    for lang in sorted(ex):
        n_l = sum(
            v for (lg, b), v in sizes.items() if lg == lang and b != "unscored"
        )
        rel = [
            abs(sk[lang][i] - ex[lang][i]) / ex[lang][i] for i in range(2)
        ]
        devs = [
            abs(sizes.get((lang, b), 0) - n_l / 3.0) / (n_l / 3.0)
            for b in ("head", "middle", "tail")
        ]
        # tie mass at the sketch boundaries (docs whose ppl EQUALS a
        # boundary value — the irreducible assignment ambiguity)
        ties = (
            scored.filter(
                (F.col("lang") == lang)
                & F.col("ppl").isin([float(sk[lang][0]), float(sk[lang][1])])
            ).count()
        )
        per_lang[lang] = {
            "n": n_l,
            "boundary_rel_err": [round(x, 6) for x in rel],
            "bucket_size_dev": [round(x, 4) for x in devs],
            "tie_mass_at_boundaries": ties,
        }
        worst_rel = max(worst_rel, *rel)
        worst_size_dev = max(worst_size_dev, *devs)
    out["per_lang"] = per_lang
    out["worst_boundary_rel_err"] = round(worst_rel, 6)
    out["worst_bucket_size_dev"] = round(worst_size_dev, 4)

    # EXACT integer tertiles (round 7 — the driver-gated twin inside
    # corpus_mixing kind='ccnet'): claims under test at 500k docs —
    # (a) the grid value-count table stays MODEL-sized (distinct
    # avg_fp values ≪ corpus, so the cumulative-sum window is cheap),
    # (b) realized buckets are exact thirds up to boundary-tie mass
    # (ties all land in the higher bucket by contract), (c) wall is
    # comparable to the sketch path (both are one agg + broadcast map)
    t0 = time.perf_counter()
    exact = ppl_tertiles_fp(scored, by_col="lang")
    esizes = {
        (r["lang"], r["ppl_bucket"]): r["n"]
        for r in exact.groupBy("lang", "ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["exact_bucket_sec"] = round(time.perf_counter() - t0, 1)
    out["grid_values"] = (
        scored.filter(F.col("n_bigrams") > 0)
        .select("lang", F.expr("logprob_fp div n_bigrams").alias("a"))
        .groupBy("lang", "a")
        .count()
        .count()
    )
    exact_dev = 0.0
    for lang in sorted(ex):
        n_l = sum(
            v for (lg, b), v in esizes.items() if lg == lang and b != "unscored"
        )
        devs = [
            abs(esizes.get((lang, b), 0) - n_l / 3.0) / (n_l / 3.0)
            for b in ("head", "middle", "tail")
        ]
        per_lang[lang]["exact_bucket_size_dev"] = [round(x, 4) for x in devs]
        exact_dev = max(exact_dev, *devs)
    out["worst_exact_bucket_size_dev"] = round(exact_dev, 4)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
