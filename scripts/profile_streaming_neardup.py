"""One-shot profile of the STATEFUL streaming near-dup path (round 11,
VERDICT r10 #9 — §2.1: know where the micro-batch time goes before
round 12 touches it).

Lands the sf documents (plus forced duplicates) as N parquet drops,
runs ``streaming_lsh_neardup`` over a file source with
``trigger(availableNow=True)``, and prints per-micro-batch progress:
wall, input rows, and the stateful operator's own metrics (state rows,
memory, commit/processing times) — the map a future optimization
starts from.

Usage: python scripts/profile_streaming_neardup.py [n_drops] [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_drops = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from olist_ecommerce_data_warehouse_spark.catalog import table
    from olist_ecommerce_data_warehouse_spark.session import get_spark
    from olist_ecommerce_data_warehouse_spark.streaming.neardup import (
        streaming_lsh_neardup,
    )

    spark = get_spark("profile_streaming_neardup")
    base = tempfile.mkdtemp(prefix="neardup_prof_")
    src = os.path.join(base, "src")
    os.makedirs(src)

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dupes)
    n = corpus.count()
    for i in range(n_drops):
        stage = os.path.join(base, f"stage_{i}")
        corpus.filter(F.pmod(F.col("doc_id"), n_drops) == i).coalesce(1).write.parquet(
            stage
        )
        for j, p in enumerate(sorted(glob.glob(f"{stage}/part-*.parquet"))):
            shutil.copy(p, f"{src}/drop{i}_{j}.parquet")

    stream = spark.readStream.schema(corpus.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_lsh_neardup(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    print(f"corpus rows: {n}, drops: {n_drops}")
    for p in q.recentProgress:
        so = (p.get("stateOperators") or [{}])[0]
        print(
            json.dumps(
                {
                    "batchId": p.get("batchId"),
                    "durationMs": p.get("durationMs"),
                    "numInputRows": p.get("numInputRows"),
                    "stateRows": so.get("numRowsTotal"),
                    "stateMemBytes": so.get("memoryUsedBytes"),
                    "stateCommitMs": so.get("commitTimeMs"),
                }
            )
        )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
