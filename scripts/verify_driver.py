import sys, json, traceback
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as e
from olist_ecommerce_data_warehouse_spark.session import get_spark
sys.path.insert(0, "/root/repo/tests")
from conftest import canonical_rows

import os
SF = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark("verify")
n = len(e.entry(spark).collect())
print("entry rows:", n, flush=True)
assert n > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracles = e.oracle_sql()
fails = []
for name, fn in e.queries().items():
    try:
        spdf = fn(spark, SF).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only {len(spdf)}", flush=True)
            continue
        odf = con.execute(oracles[name]).fetchdf()
        srows, orows = canonical_rows(spdf), canonical_rows(odf)
        ok = srows == orows
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(spdf)} vs {len(odf)})", flush=True)
        if not ok:
            fails.append(name)
            # show first diff
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print("  first diff row", i, "spark:", a[:4], "oracle:", b[:4], flush=True)
                    break
    except Exception as ex:
        print(f"{name}: ERROR {ex}", flush=True)
        fails.append(name)
print("FAILS:", fails, flush=True)
spark.stop()
sys.exit(1 if fails else 0)
