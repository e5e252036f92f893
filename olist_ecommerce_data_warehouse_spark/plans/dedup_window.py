"""Dedup + window plans (SURVEY.md §2.4 A1–A3, §2.5 W1–W3, §2.6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.catalog import table
from olist_ecommerce_data_warehouse_spark.operators.datedim import build_date_dim
from olist_ecommerce_data_warehouse_spark.operators.dedup import keep_latest
from olist_ecommerce_data_warehouse_spark.operators.surrogate import add_surrogate_key
from olist_ecommerce_data_warehouse_spark.plans.registry import query


@query(
    "dedup_keep_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/W1: windowed keep-latest dedup — ROW_NUMBER PARTITION BY key
    ORDER BY ts DESC, rn=1 (review dedup,
    sp_load_silver_order_reviews.sql:33-36,67) with a deterministic
    event_id tiebreaker (the reference's timestamp ties are
    nondeterministic — pinned here).  One shuffle on the dedup key."""
    ev = table(spark, sf_dir, "events")
    return keep_latest(
        ev.select("user_id", "event_id", "ts", "event_type"),
        ["user_id"],
        [F.desc("ts"), F.desc("event_id")],
    )


@query(
    "surrogate_keys",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) AS BIGINT) AS customer_sk,
           c_custkey, c_name, c_mktsegment
    FROM customer
    """,
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: deterministic dense 1-based surrogate keys in natural-key
    order (IDENTITY(1,1) + reseed, 06_create_gold_tables.sql:55,
    07_etl_silver_to_gold.sql:198) — scalable two-phase numbering, no
    global single-partition window."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return add_surrogate_key(c, ["c_custkey"], sk_col="customer_sk").select(
        "customer_sk", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "date_dimension",
    oracle="""
    WITH days AS (
        SELECT CAST(unnest(generate_series(DATE '1992-01-01', DATE '1998-12-31',
                                           INTERVAL 1 DAY)) AS DATE) AS d
        UNION ALL SELECT DATE '1900-01-01'
    )
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           strftime(d, '%Y-%m-%d') AS day_str,
           year(d) AS yr, month(d) AS mo, day(d) AS day_of_month,
           quarter(d) AS qtr, week(d) AS iso_week, isodow(d) AS iso_dow,
           monthname(d) AS month_name, dayname(d) AS day_name,
           CASE WHEN isodow(d) IN (6,7) THEN 1 ELSE 0 END AS is_weekend,
           CASE WHEN d = DATE '1900-01-01' THEN 1 ELSE 0 END AS is_unknown
    FROM days
    """,
)
def date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: dim_date generation — the reference's recursive-CTE
    calendar + 1900-01-01 sentinel (07_etl_silver_to_gold.sql:30-82)
    replaced by sequence+explode (no recursion, no driver loop).
    Range covers the orders table's 1992–1998 dates."""
    return build_date_dim(spark, dt.date(1992, 1, 1), dt.date(1998, 12, 31))


# NOTE (round 2): the former ``dedup_distinct_projection`` and
# ``window_topk_per_group`` plans were registry-slot redundancy — A1/A3
# are driver-proven by cleanse_accent_fold_dedup / gold_dim_customer /
# multikey_left_distinct, and W1/O2 by dedup_keep_latest /
# flagship_revenue_by_brand.  Their slots now carry the corpus-prep
# plans (plans/corpus.py: train_eval_split, sequence_packing); the
# distinct_dedup operator itself stays unit-tested in
# tests/test_operators.py.
