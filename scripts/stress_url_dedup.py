"""URL-canonicalization dedup stress at 100× driver scale.

The claim under test (SCALING.md / README): `canonicalize_url` is pure
codegen string/array expressions, so URL-level dedup is a MAP + one
hash aggregate — cost linear in rows, shuffle only the distinct
canonical URLs (map-side partials collapse the copies first).

500k rows (sf0.1 documents × replicas with disjoint doc_ids) each get
a messy URL derived like the dedup_exact kind='url' plan (uppercase
scheme/host, www., default ports, trailing slash, tracking-polluted
scrambled query, fragment), then collapse by canonical form.

Usage: python scripts/stress_url_dedup.py [replicas]   (default 100)
Prints one JSON line; measured row recorded in SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from olist_ecommerce_data_warehouse_spark.catalog import table  # noqa: E402
from olist_ecommerce_data_warehouse_spark.functions.url import (  # noqa: E402
    canonicalize_url,
)
from olist_ecommerce_data_warehouse_spark.plans.llm_dedup import (  # noqa: E402
    _messy_url,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("stress_url_dedup", cpus=32)
    sf = "/root/testdata/sf0.1"

    docs = table(spark, sf, "documents").select("doc_id", "source")
    n_base = docs.count()
    # disjoint-id replication: replica r shifts ids by r*1e6, so mod-
    # derived URL components repeat across replicas (real collapse)
    # while ids stay unique
    rep = spark.range(replicas).select((F.col("id") * 1_000_000).alias("__shift"))
    # spread the replicated rows across all cores: the broadcast
    # cross-join inherits the single-file scan's 1-2 partitions, which
    # would time the 32-core map on 2 tasks (at 100 TB the scan is
    # already wide — this repartition models that, it is not operator
    # cost)
    big = (
        docs.crossJoin(rep)
        .select((F.col("doc_id") + F.col("__shift")).alias("doc_id"), "source")
        .repartition(64)
    )

    t0 = time.time()
    out = (
        big.select(canonicalize_url(_messy_url()).alias("canon"))
        .groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = out.agg(
        F.count(F.lit(1)).alias("groups"),
        F.sum("n").alias("rows"),
        F.max("n").alias("max_group"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "rows": int(stats["rows"]),
                "base_docs": n_base,
                "replicas": replicas,
                "distinct_canonical": int(stats["groups"]),
                "max_group": int(stats["max_group"]),
                "wall_s": wall,
                "rows_per_s": int(stats["rows"] / wall),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
