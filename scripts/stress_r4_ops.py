"""Round-4 operator stress: the three new capabilities at 20–100×
driver scale, measuring the properties their 100 TB posture claims.

1. quality classifier @ 100× docs (500k): cost must stay linear —
   it is one feature-HOF map + exploded-row codegen'd weight math +
   one map-side-partial agg (shuffle = one row/doc).
2. SemDeDup @ 20× embeddings (100k vectors, k scaled to n): the
   SCALING rule under test is k ∝ n/target_cluster_size — pair work
   is Σ n_c², bounded only if clusters stay capped.  Reports the max
   cluster size so the known failure mode (a mega-cluster re-creating
   all-pairs) is VISIBLE, not assumed away.
3. BPE training @ 100× corpus: the word-frequency compression claim —
   corpus tokens grow 100× but the distinct-word table (what every
   merge round actually scans) grows only by the injected copy-tokens,
   so per-round cost is ~flat after the first aggregate.

Usage: python scripts/stress_r4_ops.py [doc_replicas] [emb_replicas]
(defaults 100, 20).  Prints one JSON line; measured table in
SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from olist_ecommerce_data_warehouse_spark.operators.bpe import (  # noqa: E402
    bpe_train,
    word_counts,
)
from olist_ecommerce_data_warehouse_spark.operators.kmeans import (  # noqa: E402
    kmeans_assign,
    kmeans_train,
)
from olist_ecommerce_data_warehouse_spark.operators.quality import (  # noqa: E402
    quality_scored,
)
from olist_ecommerce_data_warehouse_spark.operators.similarity import (  # noqa: E402
    blocked_cosine_pairs,
    quantized,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    doc_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    emb_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stress_r4_ops")
    out: dict = {"doc_replicas": doc_n, "emb_replicas": emb_n}

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docs = (
        docs0.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(doc_n - 1))))
        .select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.concat(
                F.lit("copy"), F.col("__r").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
        )
    )

    # 1. quality classifier at 100× docs — ONE corpus pass: total and
    # pass counts come from a single aggregate (round 5; the previous
    # count() + filtered count() shape ran the classifier twice and
    # doubled the reported wall)
    t0 = time.time()
    qc = quality_scored(docs)
    row = qc.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("qc_pass").alias("passed")
    ).collect()[0]
    out["qc"] = {
        "docs": int(row["docs"]),
        "passed": int(row["passed"]),
        "wall_sec": round(time.time() - t0, 1),
    }

    # 2. SemDeDup at 20× embeddings with k ∝ n
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = emb0.select("vec_id", quantized("embedding").alias("v"))
    corpus = (
        base.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(emb_n - 1))))
        .select(
            (F.col("vec_id") + F.col("__r") * 1_000_000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("v", 1) + F.col("__r") * 797),
                F.slice("v", 2, F.size("v") - 1),
            ).alias("v"),
        )
    )
    n_vec = corpus.count()
    k = max(8, n_vec // 800)  # target ~800 vectors per cluster
    t0 = time.time()
    cents = kmeans_train(corpus, vec_col="v", k=k, n_iter=2, pre_quantized=True)
    t_train = time.time() - t0
    t0 = time.time()
    assigned = kmeans_assign(
        corpus, cents, vec_col="v", pre_quantized=True, keep_vec=True
    ).persist()
    sizes = assigned.groupBy("cluster").count()
    max_cluster = sizes.agg(F.max("count")).collect()[0][0]
    pairs = blocked_cosine_pairs(
        assigned, block_col="cluster", vec_col="v", threshold=0.99
    ).count()
    assigned.unpersist()
    out["semdedup"] = {
        "vectors": n_vec,
        "k": k,
        "max_cluster": max_cluster,
        "pairs_ge_099": pairs,
        "train_sec": round(t_train, 1),
        "assign_score_sec": round(time.time() - t0, 1),
    }

    # 2b. capped SemDeDup on the mega-cluster adversary: 40 families
    # × 1000 near-copies — k-means cannot separate a family, so the
    # cap machinery (local re-cluster + force-chunk) must bound every
    # Gram block
    from olist_ecommerce_data_warehouse_spark.operators.similarity import (
        semdedup_pairs,
        split_overcap_blocks,
    )

    fam = (
        base.limit(40)
        .withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(999))))
        .select(
            (F.col("vec_id") * 1000 + F.col("__r")).alias("vec_id"),
            F.concat(
                F.array(F.element_at("v", 1) + F.col("__r")),
                F.slice("v", 2, F.size("v") - 1),
            ).alias("v"),
        )
    )
    t0 = time.time()
    fcents = kmeans_train(fam, vec_col="v", k=40, n_iter=2, pre_quantized=True)
    assigned = kmeans_assign(
        fam, fcents, vec_col="v", pre_quantized=True, keep_vec=True
    )
    raw_max = (
        assigned.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
    )
    bounded = split_overcap_blocks(assigned, cap=500, sub_k=8, rounds=2)
    cap_max = bounded.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
    capped_pairs = semdedup_pairs(
        fam, fcents, threshold=0.999, cluster_cap=500
    ).count()
    out["semdedup_capped"] = {
        "vectors": 40000,
        "families": 40,
        "uncapped_max_block": raw_max,
        "capped_max_block": cap_max,
        "pairs": capped_pairs,
        "wall_sec": round(time.time() - t0, 1),
    }

    # 3. BPE training at 100× corpus
    t0 = time.time()
    wc = word_counts(docs).persist()
    distinct_words = wc.count()
    total_tokens = wc.agg(F.sum("n")).collect()[0][0]
    t_wc = time.time() - t0
    t0 = time.time()
    merges = bpe_train(docs, n_merges=8)
    out["bpe"] = {
        "corpus_tokens": int(total_tokens),
        "distinct_words": distinct_words,
        "wordcount_sec": round(t_wc, 1),
        "merges": len(merges),
        "train_sec": round(time.time() - t0, 1),
    }
    wc.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
