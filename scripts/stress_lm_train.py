"""In-loop-training stress at 100× driver scale: the round-4 trained
operators whose 100 TB posture is "per-round work = one broadcast join
+ one aggregation over the corpus; model stays model-sized".

1. bigram-LM training @ 100× docs (500k, ~27.6M tokens): one explode +
   two aggs; the model (distinct corpus bigrams) must stay tiny vs the
   corpus — report its row count and train wall.
2. bigram-LM scoring of the full corpus under that model: broadcast
   join + integer-sum agg — linear, one shuffle row per doc.
3. perceptron training over the 2^20-bucket hashed quality features
   with a content-derived label (doc mentions 'data'): batch mode,
   5 rounds — per-round wall must be flat (each round re-scans the
   cached feature matrix once), and training errors must FALL.
4. mini-batch PEGASOS (round 5) on the SAME features/label: K=10
   deterministic batches, 50 rounds = 5 epochs — must reach <5%
   training error where full-batch collapsed to the majority class
   (22.04%), at ~the same total corpus-scan budget (each round
   touches 1/K of the feature matrix).

Usage: python scripts/stress_lm_train.py [doc_replicas] (default 100).
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
)
from olist_ecommerce_data_warehouse_spark.operators.perceptron import (  # noqa: E402
    pegasos_train,
    perceptron_score,
    perceptron_train,
)
from olist_ecommerce_data_warehouse_spark.operators.quality import (  # noqa: E402
    quality_feature_counts,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    doc_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("stress_lm_train")
    out: dict = {"doc_replicas": doc_n}

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    docs = (
        docs0.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(doc_n - 1))))
        .select(
            (F.col("doc_id") + F.col("__r") * 1_000_000).alias("doc_id"),
            F.concat(
                F.lit("copy"), F.col("__r").cast("string"), F.lit(" "), F.col("text")
            ).alias("text"),
        )
    ).persist()
    n_docs = docs.count()

    # 1. train the bigram LM on the full replicated corpus
    t0 = time.time()
    bigram, context, v = ngram_lm_train(docs)
    model_rows = bigram.count()
    out["lm_train"] = {
        "docs": n_docs,
        "model_bigrams": model_rows,
        "vocab": v,
        "wall_sec": round(time.time() - t0, 1),
    }

    # 2. score every doc under it
    t0 = time.time()
    scored = ngram_lm_score(docs, bigram, context, v)
    med = scored.agg(
        F.count("*").alias("n"),
        F.expr("percentile_approx(ppl, 0.5)").alias("ppl_med"),
    ).collect()[0]
    out["lm_score"] = {
        "docs": med["n"],
        "ppl_median": round(float(med["ppl_med"]), 2),
        "wall_sec": round(time.time() - t0, 1),
    }

    # 3. perceptron on hashed quality features, content-derived label
    t0 = time.time()
    feats = quality_feature_counts(docs)
    labels = docs.select(
        "doc_id",
        F.when(F.col("text").contains("data"), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    t_feat = time.time()
    w = perceptron_train(feats, labels, rounds=5)
    t_train = time.time()
    errors = (
        perceptron_score(feats, w)
        .join(labels, "doc_id")
        .filter(F.col("y") * F.col("score") <= 0)
        .count()
    )
    pos = labels.filter("y = 1").count()
    out["perceptron"] = {
        "feature_rows": feats.count(),
        "label_pos": pos,
        "rounds": 5,
        "train_wall_sec": round(t_train - t_feat, 1),
        "errors_after": errors,
        "error_rate": round(errors / n_docs, 4),
        "total_wall_sec": round(time.time() - t0, 1),
    }

    # 4. mini-batch PEGASOS on the same features/label (round 5)
    t0 = time.time()
    rounds, k = 50, 10
    wp = pegasos_train(feats, labels, rounds=rounds, c=100, batches=k)
    t_train = time.time()
    errors_p = (
        perceptron_score(feats, wp)
        .join(labels, "doc_id")
        .filter(F.col("y") * F.col("score") <= 0)
        .count()
    )
    out["pegasos"] = {
        "rounds": rounds,
        "batches": k,
        "epochs": rounds // k,
        "train_wall_sec": round(t_train - t0, 1),
        "per_round_wall_sec": round((t_train - t0) / rounds, 2),
        "errors_after": errors_p,
        "error_rate": round(errors_p / n_docs, 4),
        "total_wall_sec": round(time.time() - t0, 1),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
