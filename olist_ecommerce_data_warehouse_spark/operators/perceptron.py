"""Distributed integer batch perceptron — a linear classifier TRAINED
in the query, exactly cross-engine replayable.

Completes the in-loop-training trilogy (k-means → IVF index, pair
counting → BPE merges, and now labeled classification): production
pipelines train their fasttext-style language/quality models ON the
corpus; this operator is that training loop in its simplest form that
is still exactly replayable by an ANSI-SQL oracle — every quantity is
an integer, so there is no float-summation order or learning-rate
rounding to diverge on.

Batch perceptron update (Rosenblatt, batch form): with sparse hashed
features x_d (bucket → count) and labels y_d ∈ {−1, +1},

  round t:  score_d = Σ_b w_t[b] · x_d[b]          (join + agg)
            M       = {d : y_d · score_d ≤ 0}      (misclassified;
                                                    0 counts — w_0 = 0
                                                    must update)
            w_{t+1}[b] = w_t[b] + Σ_{d ∈ M} y_d · x_d[b]

Each round is ONE broadcast join (the weight vector is bounded by the
bucket space — model-sized, not corpus-sized) plus one aggregation —
the same small-model/big-data loop as Lloyd.

Two update modes, both integer-exact:

- ``batch`` (default): the full misclassified-sum update above.
  Caveat measured on the driver corpus: with unit step and large
  count features, full-batch updates OSCILLATE between the two class
  extremes on hard/inseparable labels (round t predicts everything
  one way, t+1 the other) — the classic lr=1 batch-perceptron
  pathology.  Fine for the dataflow shape; not a model you'd ship.
- ``max_violator``: per round, update with the SINGLE worst
  misclassified document (most negative y·score; ties → lowest id) —
  the classic sequential perceptron driven by an argmax, so the
  Novikoff convergence theorem applies on separable data: with enough
  rounds it reaches ZERO training errors (asserted in tests).  Each
  round adds one tiny argmin collect, the same driver-argmax shape as
  a BPE merge round.

A fixed round budget (no convergence probe) keeps runs comparable and
the SQL replay (``perceptron_oracle_ctes``) finite.

``averaged=True`` returns the AVERAGED perceptron (Freund & Schapire
1999): Σ_t w_t over the round budget instead of the last iterate —
the standard fix for exactly the lr=1 oscillation measured above
(SCALING.md's 500k-doc run collapsed to the majority class in batch
mode).  The 1/T normalization is dropped because it changes neither
sign nor ranking, so the averaged model stays all-integer and exactly
SQL-replayable; the accumulator update is one model-sized join per
round, nothing corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.operators.lineage import cut_lineage


def _merge_weights(a: DataFrame | None, b: DataFrame) -> DataFrame:
    """a ⊕ b on (bucket, w): null-safe full-outer sum, zero rows
    dropped — both operands are model-sized."""
    if a is None:
        return b.filter(F.col("w") != 0)
    return (
        a.join(b.withColumnRenamed("w", "d"), "bucket", "full")
        .select(
            "bucket",
            (
                F.coalesce(F.col("w"), F.lit(0)) + F.coalesce(F.col("d"), F.lit(0))
            ).alias("w"),
        )
        .filter(F.col("w") != 0)
    )


def perceptron_train(
    features: DataFrame,
    labels: DataFrame,
    rounds: int = 2,
    id_col: str = "doc_id",
    max_violator: bool = False,
    averaged: bool = False,
) -> DataFrame:
    """(bucket, w) after ``rounds`` updates from w=0 (see module notes
    for the two modes); with ``averaged`` the returned w is Σ_t w_t
    over the round budget (unnormalized averaged perceptron — same
    sign/ranking, all integers).

    ``features``: (id_col, bucket, cnt) sparse integer counts;
    ``labels``: (id_col, y) with y ∈ {−1, +1}.  Deterministic on any
    partitioning: every aggregate is an integer SUM, and the
    max-violator pick breaks ties to the lowest id."""
    feats = features.join(labels, id_col).select(
        id_col, "bucket", F.col("cnt").cast("bigint").alias("cnt"), "y"
    )
    if rounds > 0:
        # lineage CUT, not persisted: the per-round scoring join and
        # violation aggregate re-analyze feats' upstream (the hashed
        # feature pipeline is WIDE — uni+bigram explodes) once per
        # round otherwise (operators/lineage.py)
        feats = cut_lineage(feats)
    w = None  # bucket -> weight; None = all zeros
    acc = None  # averaged mode: running Σ_t w_t
    try:
        rounds_done = 0
        for _ in range(rounds):
            if w is None:
                scored = feats.select(
                    id_col, "y", F.lit(0).cast("bigint").alias("score")
                ).distinct()
            else:
                scored = (
                    feats.join(F.broadcast(w), "bucket", "left")
                    .groupBy(id_col, "y")
                    .agg(
                        F.sum(
                            F.col("cnt") * F.coalesce(F.col("w"), F.lit(0))
                        ).alias("score")
                    )
                )
            mis = scored.filter(F.col("y") * F.col("score") <= 0)
            if max_violator:
                worst = (
                    mis.orderBy((F.col("y") * F.col("score")).asc(), F.col(id_col))
                    .limit(1)
                    .select(id_col)
                    .collect()
                )
                if not worst:
                    break  # separated: zero training errors
                mis = feats.sparkSession.createDataFrame(
                    [(worst[0][0],)], f"{id_col} bigint"
                )
            else:
                mis = mis.select(id_col)
            delta = (
                feats.join(mis, id_col)
                .groupBy("bucket")
                .agg(F.sum(F.col("y") * F.col("cnt")).alias("d"))
            ).select("bucket", F.col("d").alias("w"))
            w = _merge_weights(w, delta).localCheckpoint(eager=True)
            rounds_done += 1
            if averaged:
                acc = _merge_weights(acc, w).localCheckpoint(eager=True)
    finally:
        if rounds > 0:
            feats.unpersist()
    if averaged and w is not None and rounds_done < rounds:
        # separated early: w is constant for the remaining rounds, and
        # the average (like the SQL replay's no-op tail rounds) counts
        # those copies too
        tail = w.select("bucket", (F.col("w") * F.lit(rounds - rounds_done)).alias("w"))
        acc = _merge_weights(acc, tail)
    out = acc if averaged else w
    if out is None:
        spark = features.sparkSession
        return spark.createDataFrame([], "bucket bigint, w bigint")
    return out


def perceptron_score(
    features: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, score) — Σ w[bucket]·cnt per document under the
    trained weights (missing buckets weigh 0; docs with no features
    score 0 only if they appear in ``features``)."""
    return (
        features.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("cnt").cast("bigint") * F.coalesce(F.col("w"), F.lit(0))
            ).alias("score")
        )
    )


def perceptron_train_reference(
    feat_rows: list[tuple[int, int, int]],
    label_map: dict[int, int],
    rounds: int,
    max_violator: bool = False,
    averaged: bool = False,
) -> dict[int, int]:
    """Driver-side reference trainer over (doc_id, bucket, cnt) rows —
    the distributed trainer must produce identical weights."""
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for d, b, c in feat_rows:
        if d in label_map:
            by_doc.setdefault(d, []).append((b, c))
    w: dict[int, int] = {}
    acc: dict[int, int] = {}
    for _ in range(rounds):
        scores = {
            d: sum(c * w.get(b, 0) for b, c in fs) for d, fs in by_doc.items()
        }
        viol = [
            (label_map[d] * scores[d], d)
            for d in by_doc
            if label_map[d] * scores[d] <= 0
        ]
        if viol:
            if max_violator:
                viol = [min(viol)]
            for _, d in viol:
                y = label_map[d]
                for b, c in by_doc[d]:
                    w[b] = w.get(b, 0) + y * c
            w = {b: v for b, v in w.items() if v != 0}
        for b, v in w.items():
            acc[b] = acc.get(b, 0) + v
    if averaged:
        return {b: v for b, v in acc.items() if v != 0}
    return w


def perceptron_oracle_ctes(
    rounds: int,
    feats_cte: str = "pfeats",
    labels_cte: str = "plabels",
    max_violator: bool = False,
) -> str:
    """SQL replay of :func:`perceptron_train` as unrolled-round CTEs
    (the trained-IVF/BPE oracle device): expects ``feats_cte(doc_id,
    bucket, cnt)`` and ``labels_cte(doc_id, y)`` to exist; emits
    ``pw{rounds}(bucket, w)`` plus ``pscores(doc_id, score)`` under
    the final weights, and ``pavg(bucket, w)`` = Σ_t pw_t — the
    averaged-perceptron replay (separated rounds are no-ops in the
    unrolled chain, so their constant-w copies are counted exactly as
    the engine's early-break tail does).  No leading WITH."""
    parts = [
        f"""pf AS (
        SELECT f.doc_id, f.bucket, CAST(f.cnt AS BIGINT) AS cnt, l.y
        FROM {feats_cte} f JOIN {labels_cte} l USING (doc_id)
    )""",
        """pw0 AS (SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w WHERE FALSE)""",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""pscore{p} AS (
        SELECT pf.doc_id, pf.y,
               CAST(COALESCE(SUM(pf.cnt * w.w), 0) AS BIGINT) AS score
        FROM pf LEFT JOIN pw{p} w USING (bucket)
        GROUP BY pf.doc_id, pf.y
    )"""
        )
        if max_violator:
            mis_sql = (
                f"SELECT doc_id FROM pscore{p} WHERE y * score <= 0 "
                f"ORDER BY y * score ASC, doc_id LIMIT 1"
            )
        else:
            mis_sql = f"SELECT doc_id FROM pscore{p} WHERE y * score <= 0"
        parts.append(
            f"""pdelta{i} AS (
        SELECT pf.bucket, CAST(SUM(pf.y * pf.cnt) AS BIGINT) AS d
        FROM pf JOIN ({mis_sql}) m
          USING (doc_id)
        GROUP BY pf.bucket
    )"""
        )
        parts.append(
            f"""pw{i} AS (
        SELECT bucket, w FROM (
            SELECT COALESCE(a.bucket, b.bucket) AS bucket,
                   COALESCE(a.w, 0) + COALESCE(b.d, 0) AS w
            FROM pw{p} a FULL OUTER JOIN pdelta{i} b ON a.bucket = b.bucket
        ) WHERE w != 0
    )"""
        )
    parts.append(
        f"""pscores AS (
        SELECT f.doc_id,
               CAST(COALESCE(SUM(f.cnt * w.w), 0) AS BIGINT) AS score
        FROM {feats_cte} f LEFT JOIN pw{rounds} w USING (bucket)
        GROUP BY f.doc_id
    )"""
    )
    if rounds > 0:
        union = " UNION ALL ".join(
            f"SELECT bucket, w FROM pw{i}" for i in range(1, rounds + 1)
        )
        parts.append(
            f"""pavg AS (
        SELECT bucket, CAST(SUM(w) AS BIGINT) AS w
        FROM ({union}) GROUP BY bucket HAVING SUM(w) != 0
    )"""
        )
    else:
        parts.append(
            """pavg AS (SELECT CAST(NULL AS BIGINT) AS bucket, CAST(NULL AS BIGINT) AS w WHERE FALSE)"""
        )
    return ",\n    ".join(parts)
