"""Streaming incremental upsert — the ``foreachBatch`` + MERGE pattern
that keeps a warehouse table continuously current from a stream.

Every production "stream into the warehouse" pipeline is this shape
(Structured Streaming's own docs recommend it; Delta's streaming MERGE
is the same loop with a transactional table format underneath):

  micro-batch → dedup within batch (keep latest per key) →
  MERGE into target → commit

The merge step reuses ``operators.merge.merge_upsert`` — the batch and
streaming paths share one implementation, so semantics cannot drift.

Exactly-once notes (the part people get wrong):
- the checkpoint makes micro-batch REPLAY possible after failure, so
  the sink must be IDEMPOTENT per batch — MERGE on keys is exactly
  that (replaying a batch re-applies the same updates; an append sink
  would duplicate);
- within a batch, multiple CDC rows per key collapse to the latest by
  ``order_col`` BEFORE merging — merge is then key-unique by
  construction;
- plain parquet is not transactional: the merged result is pinned with
  ``persist()+count()`` before the overwrite (lazy plans would
  otherwise truncate the target mid-read — the classic
  read-then-overwrite self-join bug), which leaves a small
  non-atomicity window on crash *during* the write.  A real deployment
  puts Delta/Iceberg under this exact loop for the atomic swap; the
  operator keeps the engine-portable contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.operators.merge import merge_upsert


def upsert_batch(
    batch_df: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
) -> None:
    """Apply one micro-batch to the parquet table at ``target_path``:
    keep the latest row per key within the batch, MERGE into the
    current target (create it on first batch).  Idempotent: replaying
    the same batch yields the same table."""
    spark = batch_df.sparkSession
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
    latest = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    from pyspark.errors import AnalysisException

    try:
        target = spark.read.parquet(target_path)
        target.schema  # force resolution: missing path raises HERE
    except AnalysisException as ex:
        # ONLY the first-batch missing-target case may fall back to the
        # bare batch.  Any other error (schema drift, corrupt footer,
        # transient FS failure) must PROPAGATE: swallowing it would make
        # the overwrite below silently replace the whole table with one
        # micro-batch — unrecoverable data loss.
        if "PATH_NOT_FOUND" not in str(ex) and "Path does not exist" not in str(ex):
            raise
        target = None
    merged = latest if target is None else merge_upsert(target, latest, keys).drop(
        "__merge_action"
    )
    # pin the result before overwriting its own input
    merged.persist()
    merged.count()
    try:
        merged.write.mode("overwrite").parquet(target_path)
    finally:
        merged.unpersist()


def streaming_upsert(
    stream: DataFrame,
    target_path: str,
    checkpoint: str,
    keys: list[str],
    order_col: str = "ts",
    query_name: str = "streaming_upsert",
):
    """Continuously MERGE ``stream`` into the parquet table at
    ``target_path``.  Returns the started StreamingQuery
    (``availableNow`` trigger: drains everything currently available
    then stops — the incremental-backfill mode; a production run swaps
    in a processingTime trigger, same code path)."""
    return (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: upsert_batch(bdf, target_path, keys, order_col)
        )
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
