"""Per-plan wall + shuffle-volume probe for correctness-at-scale
sweeps (round 9, verdict task 4 — the sf10 table in SCALING.md).

Runs the named plans Spark-side only (no oracle) in ONE session with
the Spark UI status API enabled, and records for each plan: wall
seconds, rows, and the total shuffle read/write bytes of the stages
the plan ran — the direct evidence for "no shuffle blowup" claims at
10×/100× scale.

Usage:
    python scripts/shuffle_probe.py <sf_dir> plan1,plan2,...
Prints one JSON line per plan and a PROBE_SUMMARY line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402


def build_session() -> SparkSession:
    """get_spark()'s config with the UI status API turned on (the
    engine session keeps it off; the probe needs /api/v1 stages)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shuffle_probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", os.environ.get("PROBE_UI_PORT", "4050"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )


def stage_metrics(port: int, app_id: str) -> dict[int, tuple[int, int]]:
    url = f"http://127.0.0.1:{port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return {
        s["stageId"]: (s.get("shuffleReadBytes", 0), s.get("shuffleWriteBytes", 0))
        for s in stages
    }


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    spark = build_session()
    # the ACTUALLY-BOUND port, not the requested one — Spark's port
    # retry moves the UI when 4050 is held by a concurrent session,
    # and querying the requested port would then read a foreign app
    # (404) or nothing at all
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    from olist_ecommerce_data_warehouse_spark.plans import REGISTRY
    from olist_ecommerce_data_warehouse_spark.plans.registry import (
        release_stale_checkpoints,
    )

    # session warmup: JVM codegen + Arrow worker pool (bench.py shape)
    REGISTRY["flagship_revenue_by_brand"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    for name in names:
        release_stale_checkpoints(spark)
        seen = set(stage_metrics(port, app_id))
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = stage_metrics(port, app_id)
        new = {k: v for k, v in after.items() if k not in seen}
        rd = sum(v[0] for v in new.values())
        wr = sum(v[1] for v in new.values())
        results[name] = {
            "wall_sec": round(wall, 2),
            "stages": len(new),
            "shuffle_read_mb": round(rd / 1e6, 1),
            "shuffle_write_mb": round(wr / 1e6, 1),
        }
        print(json.dumps({"plan": name, **results[name]}), flush=True)
    print("PROBE_SUMMARY " + json.dumps({"sf_dir": sf_dir, "plans": results}),
          flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
