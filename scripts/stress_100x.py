"""100× fact-tier stress run (sf1-equivalent: 60M-row lineitem).

Extends the 10× methodology in SCALING.md one order of magnitude
further, to the regime where DATA VOLUME (not per-query fixed costs)
dominates: sf0.1's fact tables are replicated 100× with disjoint key
spaces (replica r offsets every orderkey by r·10M — no artificial key
collisions, cardinalities scale exactly 100×), written to parquet
(the honest scan path — at this volume a cache would spill anyway and
a real sf1 lives on storage), and the two star-schema shapes from the
10× run are measured best-of-2 at 1× and 100× from the same parquet
layout:

- pricing-summary wide agg: shipdate filter (pushed to the scan) +
  2-key groupBy with 7 aggregates — map-side partials bound the
  shuffle by |groups| × partitions at ANY scale;
- fact⨝fact join + rollup: lineitem ⨝ orders on orderkey (both sides
  hash-shuffled — the one genuinely volume-proportional shuffle in the
  star build) + order-priority rollup.

Usage: python scripts/stress_100x.py [replicas] (default 100).
Prints one JSON line; the measured table lives in SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from olist_ecommerce_data_warehouse_spark.functions.numeric import (  # noqa: E402
    as_out,
    dec,
    money,
)
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # > any sf0.1 orderkey → replica key spaces disjoint


def replicate(df, n: int, key_cols: list[str]):
    """n disjoint-key copies: explode a replica index, offset every key
    column by r·KEY_STRIDE.  Pure map + explode — no shuffle."""
    rep = df.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    for k in key_cols:
        rep = rep.withColumn(k, F.col(k) + F.col("__r") * KEY_STRIDE)
    return rep.drop("__r")


def pricing_summary_shape(li):
    disc_price = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 4, 2)
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_out(F.sum(money("l_quantity"))).alias("sum_qty"),
            as_out(F.sum(disc_price)).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def fact_join_shape(li, o):
    return (
        li.select("l_orderkey", "l_quantity")
        .join(o.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            as_out(F.sum(money("l_quantity"))).alias("sum_qty"),
        )
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("stress_100x")
    tmp = Path(tempfile.mkdtemp(prefix="stress100x_"))
    out: dict = {"replicas": n}
    try:
        li0 = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o0 = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        t0 = time.perf_counter()
        replicate(li0, n, ["l_orderkey"]).write.parquet(str(tmp / "lineitem"))
        replicate(o0, n, ["o_orderkey"]).write.parquet(str(tmp / "orders"))
        out["gen_sec"] = round(time.perf_counter() - t0, 1)
        # 1× from the same parquet layout for a like-for-like ratio
        replicate(li0, 1, ["l_orderkey"]).write.parquet(str(tmp / "lineitem1"))
        replicate(o0, 1, ["o_orderkey"]).write.parquet(str(tmp / "orders1"))

        li_n = spark.read.parquet(str(tmp / "lineitem"))
        o_n = spark.read.parquet(str(tmp / "orders"))
        li_1 = spark.read.parquet(str(tmp / "lineitem1"))
        o_1 = spark.read.parquet(str(tmp / "orders1"))
        out["lineitem_rows"] = li_n.count()
        out["orders_rows"] = o_n.count()

        timed(pricing_summary_shape(li_1))  # warmup codegen
        for name, mk1, mkn in (
            ("pricing_summary", lambda: pricing_summary_shape(li_1),
             lambda: pricing_summary_shape(li_n)),
            ("fact_join_rollup", lambda: fact_join_shape(li_1, o_1),
             lambda: fact_join_shape(li_n, o_n)),
        ):
            t1 = min(timed(mk1()) for _ in range(2))
            tn = min(timed(mkn()) for _ in range(2))
            out[name] = {
                "sec_1x": round(t1, 2),
                f"sec_{n}x": round(tn, 2),
                "ratio": round(tn / t1, 1),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
