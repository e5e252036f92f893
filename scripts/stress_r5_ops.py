"""Scale stress for the round-5 operators: Gopher rule battery and
DSIR at 100× docs (500k), PQ train/encode/ADC at 20× embeddings (10k
vectors, k ∝ corpus like the SemDeDup stress).

Claims under test (SCALING.md):
- gopher_flags is a pure codegen map — linear, scan-bound;
- DSIR is two model-sized aggregates + a broadcast-join integer score
  (one corpus pass each for the models, one for scoring) + a
  TakeOrdered — nothing corpus-sized on the driver;
- PQ training is m small-model Lloyd loops, encoding one Arrow map,
  and ADC search never emits more than n_queries × partitions × k.

Usage: python scripts/stress_r5_ops.py [doc_replicas] [emb_replicas]
(defaults 100, 20).  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from olist_ecommerce_data_warehouse_spark.functions.text import gopher_flags  # noqa: E402
from olist_ecommerce_data_warehouse_spark.operators.dsir import (  # noqa: E402
    dsir_log_ratio,
    dsir_resample,
    dsir_score,
)
from olist_ecommerce_data_warehouse_spark.operators.pq import (  # noqa: E402
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    doc_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    emb_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stress_r5_ops")
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

    # 1. Gopher battery at 100×: one aggregate over the flag columns
    t0 = time.time()
    flags = gopher_flags("text")
    agg = docs.select(*[v.alias(k) for k, v in flags.items()]).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("gopher_pass").alias("passed"),
        *[
            F.sum(k).alias(k)
            for k in flags
            if k not in ("gopher_n_words", "gopher_pass")
        ],
    )
    row = agg.collect()[0].asDict()
    out["gopher"] = {**{k: int(v) for k, v in row.items()},
                     "wall_sec": round(time.time() - t0, 1)}

    # 2. DSIR at 100×: target = the docs mentioning 'data' (a domain
    # sample), raw = everything; score + resample 10k
    t0 = time.time()
    # target = a deterministic slice of the docs mentioning 'data'
    # (the corpus's content-derived domain, same label the classifier
    # stresses use)
    target = docs.filter(F.col("text").contains("data") & (F.col("doc_id") % 17 == 0))
    lam, lam0 = dsir_log_ratio(target, docs, buckets=10_000)
    t_model = time.time()
    scored = dsir_score(docs, lam, lam0, buckets=10_000)
    picked = dsir_resample(scored, 10_000, seed=1)
    n_picked = picked.count()
    pick_rate_target_like = (
        picked.join(docs, "doc_id")
        .filter(F.col("text").contains("data"))
        .count()
    )
    out["dsir"] = {
        "docs": docs.count(),
        "target_docs": target.count(),
        "lambda_buckets": lam.count(),
        "model_wall_sec": round(t_model - t0, 1),
        "picked": n_picked,
        "picked_target_like": pick_rate_target_like,
        "total_wall_sec": round(time.time() - t0, 1),
    }

    # 3. PQ at 20× embeddings: m=4, k=64 codebooks, full encode + ADC
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = (
        emb0.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(emb_n - 1))))
        .select(
            (F.col("vec_id") + F.col("__r") * 1_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + (F.col("__r") % 13).cast("double") / 997.0
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    n_vec = corpus.count()
    t0 = time.time()
    books = pq_train(corpus, m=4, k=64, n_iter=2)
    t_train = time.time()
    enc = pq_encode(corpus, books).localCheckpoint(eager=True)
    stats = enc.agg(
        F.count(F.lit(1)).alias("n"), F.avg("recon_err").alias("avg_err")
    ).collect()[0]
    t_enc = time.time()
    queries = corpus.filter(F.col("vec_id") % 1000 == 0)
    top = pq_adc_topk(enc, books, queries, top_k=5)
    n_results = top.count()
    out["pq"] = {
        "vectors": n_vec,
        "m": 4,
        "k": 64,
        "train_wall_sec": round(t_train - t0, 1),
        "encode_wall_sec": round(t_enc - t_train, 1),
        "encoded": int(stats["n"]),
        "avg_recon_err": float(stats["avg_err"]),
        "queries": queries.count(),
        "adc_results": n_results,
        "adc_wall_sec": round(time.time() - t_enc, 1),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
