"""Benchmark harness (driver contract).

Runs every registered plan at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is fully materialized via the ``noop`` sink (forces the
whole plan — scan, shuffle, agg — without write-side cost).  A warmup
run of the flagship query absorbs JVM/codegen startup so per-query
numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from olist_ecommerce_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from olist_ecommerce_data_warehouse_spark.plans.registry import (  # noqa: E402
    release_stale_checkpoints,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402


def run_plan(spark, name: str, sf_dir: str) -> float:
    # cross-plan cleanup runs BEFORE the clock: it is session hygiene,
    # not part of the measured query.  release_stale_checkpoints frees
    # tracked persists (and GCs only then); the unconditional GC here
    # keeps ContextCleaner draining shuffle/broadcast state of the
    # previous plan across a 50-plan session without charging any
    # query for it (round 1 charged it to the next plan's clock —
    # left_enrich_broadcast "cost" 6.2 s of other plans' garbage)
    release_stale_checkpoints(spark)
    spark.sparkContext._jvm.System.gc()
    # plan construction is INSIDE the timed region: some plans trigger
    # small jobs at build time (surrogate min/max stats), and that
    # work must show up in the number
    t0 = time.perf_counter()
    df = REGISTRY[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("olist_spark_bench")

    run_plan(spark, "flagship_revenue_by_brand", sf_dir)  # warmup

    # best-of-2 per query: single-shot numbers on this box carry
    # sporadic 2-3x environment outliers that rotate between queries
    # run-to-run; the min of two passes is the steady-state cost
    timings: dict[str, float] = {}
    for name in sorted(REGISTRY):
        timings[name] = round(min(run_plan(spark, name, sf_dir) for _ in range(2)), 4)

    out = {
        "metric": "total_wall_sec_all_queries",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
