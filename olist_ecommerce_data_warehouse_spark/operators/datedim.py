"""Date-dimension generator (SURVEY.md §2.5 W3).

The reference builds dim_date with a recursive CTE stepping one day at
a time plus a 1900-01-01 'unknown' sentinel row
(07_etl_silver_to_gold.sql:30-82, OPTION (MAXRECURSION 0)).  Spark
needs no recursion: ``sequence(start, stop, interval 1 day)`` +
``explode`` generates the calendar in one narrow map stage, fully
parallel and O(days) — no driver loop, no shuffle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENTINEL = dt.date(1900, 1, 1)  # 'unknown date' row, date_key = 19000101


def build_date_dim(
    spark: SparkSession,
    start: dt.date,
    end: dt.date,
    include_sentinel: bool = True,
) -> DataFrame:
    """Calendar dimension with the reference's attribute set
    (07_etl_silver_to_gold.sql:60-80): yyyyMMdd int key, calendar
    parts, ISO week/day-of-week, English month/day names, weekend
    flag.  The calendar date itself is emitted as a 'yyyy-MM-dd'
    string (day_str) — DATE-typed outputs drift across engines."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start.isoformat()).cast("date"),
                F.lit(end.isoformat()).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    if include_sentinel:
        sentinel = spark.range(1).select(F.lit(SENTINEL.isoformat()).cast("date").alias("d"))
        days = sentinel.unionAll(days)
    return days.select(
        F.date_format("d", "yyyyMMdd").cast("int").alias("date_key"),
        F.date_format("d", "yyyy-MM-dd").alias("day_str"),
        F.year("d").alias("yr"),
        F.month("d").alias("mo"),
        F.dayofmonth("d").alias("day_of_month"),
        F.quarter("d").alias("qtr"),
        F.weekofyear("d").alias("iso_week"),
        (F.weekday("d") + 1).alias("iso_dow"),
        F.date_format("d", "MMMM").alias("month_name"),
        F.date_format("d", "EEEE").alias("day_name"),
        F.when((F.weekday("d") + 1).isin(6, 7), 1).otherwise(0).alias("is_weekend"),
        F.when(F.col("d") == F.lit(SENTINEL.isoformat()).cast("date"), 1)
        .otherwise(0)
        .alias("is_unknown"),
    )
