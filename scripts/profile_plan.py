"""Per-plan job/stage profiler (optimization round 10, guide §1).

Runs one registry plan N times under the bench's own methodology
(release_stale_checkpoints + System.gc outside the clock, noop sink
inside it) with the Spark event log enabled, then parses the log into
a per-job table: wall seconds, stage count, task count, shuffle
read/write bytes, and the job's first stage name — the view the Spark
UI would give if it were enabled, reduced to what plan surgery needs
(how many sequential jobs a plan runs, and where the seconds go).

Usage:
    python scripts/profile_plan.py <plan> [--runs 2] [--sf-dir DIR]
    python scripts/profile_plan.py --list
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("plan", nargs="?")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    from olist_ecommerce_data_warehouse_spark.plans import REGISTRY

    if args.list or not args.plan:
        print("\n".join(sorted(REGISTRY)))
        return

    evdir = f"/tmp/spark-events-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    # inject event-log confs at JVM-launch time: SparkSession.builder
    # returns a FRESH Builder per access, so pre-configuring one does
    # not reach get_spark's own builder — submit args do
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.dir={evdir} pyspark-shell"
    )

    from olist_ecommerce_data_warehouse_spark.plans.registry import (
        release_stale_checkpoints,
    )
    from olist_ecommerce_data_warehouse_spark.session import get_spark

    spark = get_spark("profile_plan")
    sc = spark.sparkContext

    walls = []
    for r in range(args.runs):
        release_stale_checkpoints(spark)
        sc._jvm.System.gc()
        sc.setJobDescription(f"profile:{args.plan}:run{r}")
        t0 = time.perf_counter()
        df = REGISTRY[args.plan].fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
    spark.stop()

    logs = sorted(glob.glob(f"{evdir}/*"), key=os.path.getmtime)
    latest = logs[-1]
    if os.path.isdir(latest):  # Spark 4 rolling event-log layout
        parts = sorted(glob.glob(f"{latest}/events*"))
    else:
        parts = [latest]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    lines: list[str] = []
    for p in parts:
        if p.endswith(".zstd"):
            import subprocess

            raw = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout.decode()
            lines.extend(raw.splitlines())
        else:
            with open(p) as f:
                lines.extend(f)
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "t0": ev["Submission Time"],
                "desc": props.get("spark.job.description", ""),
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                "callsite": (ev.get("Stage Infos") or [{}])[-1].get("Stage Name", ""),
            }
        elif k == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
        elif k == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
            stages[si["Stage ID"]] = {
                "name": si.get("Stage Name", ""),
                "tasks": si.get("Number of Tasks", 0),
                "sh_r": int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0) or 0)
                + int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0) or 0),
                "sh_w": int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0) or 0),
                "in_b": int(acc.get("internal.metrics.input.bytesRead", 0) or 0),
            }

    for r, w in enumerate(walls):
        print(f"run {r}: wall {w:.3f}s")
    print(f"\n{'job':>4} {'run':>4} {'sec':>8} {'stages':>6} {'tasks':>6} "
          f"{'shuf_r_mb':>10} {'shuf_w_mb':>10} {'in_mb':>8}  first-stage")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        desc = j["desc"]
        run = desc.split(":run")[-1] if ":run" in desc else "-"
        ss = [stages[s] for s in j["stages"] if s in stages]
        sec = (j["t1"] - j["t0"]) / 1000.0
        print(
            f"{jid:>4} {run:>4} {sec:>8.3f} {len(ss):>6} "
            f"{sum(s['tasks'] for s in ss):>6} "
            f"{sum(s['sh_r'] for s in ss) / 1e6:>10.2f} "
            f"{sum(s['sh_w'] for s in ss) / 1e6:>10.2f} "
            f"{sum(s['in_b'] for s in ss) / 1e6:>8.2f}  {j['callsite'][:60]}"
        )


if __name__ == "__main__":
    main()
