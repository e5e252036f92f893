"""Similarity-search plans (extension tier: ANN over the embeddings
table — brute-force cosine baseline, IVF-bucketed scale path,
embedding-cosine near-dup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.operators.similarity import (
    blocked_cosine_pairs,
    brute_force_topk,
    ivf_assign,
    ivf_probes,
    ivf_topk,
    quantized,
)
from olist_ecommerce_data_warehouse_spark.plans.registry import query

QVEC_SQL = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT))"


def _dot_sql(a: str, b: str) -> str:
    return f"CAST(list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2])) AS BIGINT)"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"CAST({_dot_sql(a, b)} AS DOUBLE) / "
        f"(sqrt(CAST({_dot_sql(a, a)} AS DOUBLE)) * sqrt(CAST({_dot_sql(b, b)} AS DOUBLE)))"
    )


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, {QVEC_SQL} AS qvec
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (SELECT vec_id, {QVEC_SQL} AS cvec FROM embeddings),
    scored AS (
        SELECT query_id, vec_id, {_cos_sql("qvec", "cvec")} AS cosine
        FROM c CROSS JOIN q
        WHERE vec_id != query_id
    )
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 — the exact-ANN baseline.  Query
    vectors broadcast; scoring is map-side exact-integer math over
    quantized vectors (see operators.similarity); one shuffle for the
    per-query top-k window.  At 100 TB the same plan holds: Q queries
    broadcast against a partitioned corpus."""
    emb = table(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", quantized("embedding").alias("cvec"))
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), quantized("embedding").alias("qvec")
    )
    return brute_force_topk(queries, corpus, k=5).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank"
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH c AS (SELECT vec_id, label, {QVEC_SQL} AS cvec FROM embeddings),
    cents AS (SELECT vec_id AS centroid_id, cvec AS centvec FROM c WHERE vec_id < 8),
    assign AS (
        SELECT vec_id, cvec, centroid_id FROM (
            SELECT c.vec_id, c.cvec, cents.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY {_dot_sql("c.cvec", "c.cvec")}
                             - 2 * {_dot_sql("c.cvec", "cents.centvec")}
                             + {_dot_sql("cents.centvec", "cents.centvec")},
                             cents.centroid_id) AS rn
            FROM c CROSS JOIN cents
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, cvec AS qvec FROM c WHERE vec_id % 50 = 0),
    probes AS (
        SELECT query_id, qvec, centroid_id FROM (
            SELECT q.query_id, q.qvec, cents.centroid_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_dot_sql("q.qvec", "q.qvec")}
                             - 2 * {_dot_sql("q.qvec", "cents.centvec")}
                             + {_dot_sql("cents.centvec", "cents.centvec")},
                             cents.centroid_id) AS rn
            FROM q CROSS JOIN cents
        ) WHERE rn <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id, {_cos_sql("p.qvec", "a.cvec")} AS cosine
        FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
        WHERE a.vec_id != p.query_id
    )
    SELECT query_id, vec_id AS neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5 — the billion-scale layout:
    vectors are assigned to their nearest of 8 deterministic seed
    centroids (exact-integer L2² argmin in one narrow Arrow kernel —
    operators.similarity.ivf_assign); each query probes its 2 nearest
    clusters (driver-side over the broadcast-sized query×centroid sets)
    and scores ONLY those clusters' members, one Gram matmul per
    cluster with per-cluster partial top-k (ivf_topk).  Cluster
    assignment is the partition key at scale, so a query touches
    nprobe/nlist of the corpus and the shuffle after scoring carries ≤
    nprobe·k rows per query.

    Centroids here are deterministic SEEDS so the DuckDB oracle can
    rebuild the identical index (Lloyd's loop is not one SQL query);
    the production path trains them with
    ``operators.kmeans.kmeans_train`` (distributed Lloyd, bit-
    deterministic integer means) and plugs into this same
    assign/probe/score pipeline unchanged — recall parity and the
    inertia win are pinned in
    ``tests/test_operators.py::test_kmeans_trained_ivf_search_end_to_end``."""
    emb = table(spark, sf_dir, "embeddings")
    c = emb.select("vec_id", quantized("embedding").alias("cvec"))
    cents = (
        c.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("centroid_id"), F.col("cvec").alias("centvec"))
    )
    q = c.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("cvec").alias("qvec")
    )
    assigned = ivf_assign(c, cents)
    probes = ivf_probes(q, cents, nprobe=2)
    return ivf_topk(assigned, probes, k=5).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "cosine", "rank"
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH base AS (SELECT vec_id, label, {QVEC_SQL} AS v FROM embeddings),
    corrupted AS (
        SELECT vec_id, label, v FROM base
        UNION ALL
        SELECT vec_id + 10000, label,
               list_concat([v[1] + 1000], v[2:]) AS v
        FROM base WHERE vec_id % 7 = 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_cos_sql("a.v", "b.v")} AS cosine
    FROM corrupted a JOIN corrupted b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql("a.v", "b.v")} >= 0.99
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: deterministic near-copies injected
    (first component nudged), candidate pairs blocked on the coarse
    cluster label (the realistic prefilter — at scale the blocking key
    is an IVF/LSH bucket), exact quantized cosine ≥ 0.99.

    Pair scoring runs as one int64 Gram matmul per block
    (operators.similarity.blocked_cosine_pairs, Arrow-batched numpy) —
    bit-identical to the JVM expression path but without interpreted
    per-pair array lambdas."""
    emb = table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "label", quantized("embedding").alias("v"))
    perturbed = base.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        "label",
        F.concat(
            F.array(F.element_at("v", 1) + 1000), F.slice("v", 2, F.size("v") - 1)
        ).alias("v"),
    )
    corrupted = base.unionAll(perturbed)
    return blocked_cosine_pairs(corrupted, threshold=0.99).select(
        F.col("vec_id_a").alias("vec_a"),
        F.col("vec_id_b").alias("vec_b"),
        "cosine",
    )
