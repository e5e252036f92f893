"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); the configs below are
chosen so the same logical plans scale to a multi-executor cluster:

- ``spark.sql.adaptive.enabled`` — AQE re-plans at runtime (coalesce
  shuffle partitions, convert to broadcast joins, split skewed
  partitions).  At 100 TB this is what absorbs key skew in the big
  fact-fact joins without hand-tuned salting in the common case.
- ``spark.sql.shuffle.partitions`` — sized to cores locally; on a real
  cluster leave AQE's coalescing to right-size post-shuffle partitions
  (initial value ~2-3× total cores).
- ``spark.sql.session.timeZone=UTC`` — pins timestamp semantics so
  results are reproducible and comparable to an ANSI-SQL oracle.
- ANSI mode is left at the Spark 4 default (ON); every potentially
  failing cast in this engine uses ``try_cast``/``try_to_timestamp``
  explicitly (reference semantics: T-SQL TRY_CAST/TRY_CONVERT, e.g.
  ``05_ETL_load_bronze_to_silver/sp_load_silver_orders.sql:37-41``),
  so plans behave identically under ANSI on or off.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "olist_spark_engine", *, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all
    local cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # RIGHT-SIZED heap, not max: in local mode the driver JVM hosts
        # all executor threads, and GC cost scales with heap size.  A
        # 48 g heap measured 35-44 s for the ngram-dedup plan with 95%
        # of stage time in GC (231 s summed GC vs 5 s CPU in one
        # stage); the identical plan on 8 g runs in ~5 s.  sf0.1 work
        # fits comfortably in 8 g; a real cluster sizes executor heaps
        # to partition volume the same way (8-16 g per executor is the
        # standard guidance — giant heaps trade pause time for nothing).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # G1 (JDK default): region-based collection keeps pauses
        # proportional to garbage, not heap.  ParallelGC was tried for
        # batch throughput and loses at every heap size once the
        # session churns (full-heap compactions stall all 32 task
        # threads at once).
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        # Reliable checkpoints (cut_lineage when a checkpoint dir is
        # set) write files Spark otherwise NEVER deletes during the
        # app, and unpersist() is a no-op on them — without this flag
        # every iterative operator (CC, k-means, BPE, perceptron)
        # leaks checkpoint files for the app lifetime.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
