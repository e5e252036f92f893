"""Lineage cutting for loop-consumed DataFrames.

An iterative operator (CC label propagation, Lloyd k-means, BPE merge
rounds, perceptron rounds) that merely ``persist()``s its
loop-invariant input keeps the DATA cached but re-embeds the full
upstream LOGICAL PLAN in every round's Catalyst analysis — driver
cost O(upstream tree size × rounds), invisible in executor metrics
and independent of data volume, so a bigger cluster does not help
(the driver is one JVM there too).  Measured in this repo: the CC
loop went 1.3 s → 5.6 s at sf0.1 with byte-identical execution work
when its candidate pipeline's expression forest widened; cutting the
edge lineage restored it (SCALING.md "Driver-side replanning").

``cut_lineage`` materializes the DataFrame ONCE and truncates its
plan: a reliable checkpoint (fault-tolerant — blocks survive executor
loss) when the session has a checkpoint dir, ``localCheckpoint``
otherwise.  The localCheckpoint trade is documented and deliberate:
these inputs are CANDIDATE/FEATURE pipelines whose recompute-on-loss
costs the same work the checkpoint write already did, and the loops
that consume them re-derive nothing else from the lineage.

Release semantics differ between the two forms, and callers must not
assume ``unpersist()`` frees either one the way it frees a plain
persist:

- ``localCheckpoint`` stores its blocks in the executor block store —
  ``unpersist()`` releases them.
- a RELIABLE checkpoint writes files under the checkpoint dir and
  re-reads them from disk each round; ``unpersist()`` is a no-op on
  those files, and Spark only deletes them at the end of the app when
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set in
  :func:`session.get_spark` for exactly this reason — without it every
  iterative-operator call leaks checkpoint files for the app
  lifetime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its logical plan (see module
    doc for when and why).  Reliable checkpoint if the session has a
    checkpoint dir, localCheckpoint otherwise."""
    spark = df.sparkSession
    if spark.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
