"""Synthesize an sf1 directory (10× sf0.1) for the full-registry
correctness-at-scale sweep (round-6 verdict #6): every table from
/root/testdata/sf0.1 replicated 10× with FK-consistent key offsets,
written to .scratch/sf1 (gitignored — /root/testdata is read-only).

Replication rules:

- region/nation: fixed dimensions, copied as-is (every FK into them
  stays valid).
- customer/supplier/part/orders/lineitem/events: replica r offsets
  every surrogate/foreign key by r·10^7 (larger than any base key), so
  joins resolve within a replica exactly as they did at sf0.1 —
  row counts scale 10×, join fan-outs stay identical.
- documents: replica r>0 gets a distinct "copyN " token prefix (the
  stress-script recipe) so replicas are NEAR-duplicates, not exact
  ones — the dedup tier sees 10-copy near-dup families, which is the
  adversarial regime worth testing; n_chars is recomputed from the new
  text (the column is derived, and several plans read it).
- embeddings: replica r>0 perturbs component 0 by r/997 (distinct
  vectors, same cluster structure — k-means/IVF/PQ/SemDeDup still see
  the base geometry plus near-dup families).

Deterministic throughout — the sweep's oracle side re-derives
everything from these parquet files alone.

Usage: python scripts/gen_sf1.py [replicas] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / ".scratch" / "sf1"
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({n})) AS r")

    def gen(table: str, select: str, where: str = "") -> None:
        con.execute(
            f"""COPY (
                SELECT {select}
                FROM read_parquet('{SRC}/{table}.parquet') t CROSS JOIN reps
                {where}
            ) TO '{out}/{table}.parquet' (FORMAT PARQUET)"""
        )
        n_rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n_rows}", flush=True)

    # fixed dims: one copy only
    gen("region", "t.*", "WHERE reps.r = 0")
    gen("nation", "t.*", "WHERE reps.r = 0")
    gen(
        "customer",
        f"t.c_custkey + reps.r * {OFF} AS c_custkey, t.c_name, t.c_nationkey, "
        "t.c_acctbal, t.c_mktsegment",
    )
    gen(
        "supplier",
        f"t.s_suppkey + reps.r * {OFF} AS s_suppkey, t.s_name, t.s_nationkey, "
        "t.s_acctbal",
    )
    gen(
        "part",
        f"t.p_partkey + reps.r * {OFF} AS p_partkey, t.p_name, t.p_brand, "
        "t.p_type, t.p_size, t.p_retailprice",
    )
    gen(
        "orders",
        f"t.o_orderkey + reps.r * {OFF} AS o_orderkey, "
        f"t.o_custkey + reps.r * {OFF} AS o_custkey, t.o_orderstatus, "
        "t.o_totalprice, t.o_orderdate, t.o_orderpriority",
    )
    gen(
        "lineitem",
        f"t.l_orderkey + reps.r * {OFF} AS l_orderkey, "
        f"t.l_partkey + reps.r * {OFF} AS l_partkey, "
        f"t.l_suppkey + reps.r * {OFF} AS l_suppkey, "
        "t.l_linenumber, t.l_quantity, t.l_extendedprice, t.l_discount, "
        "t.l_tax, t.l_returnflag, t.l_linestatus, t.l_shipdate",
    )
    gen(
        "events",
        f"t.event_id + reps.r * {OFF} AS event_id, t.ts, "
        f"t.user_id + reps.r * {OFF} AS user_id, t.event_type, t.value, t.props",
    )
    gen(
        "documents",
        f"t.doc_id + reps.r * {OFF} AS doc_id, "
        "CASE WHEN reps.r = 0 THEN t.text "
        "     ELSE 'copy' || CAST(reps.r AS VARCHAR) || ' ' || t.text END AS text, "
        "t.lang, t.source, "
        "CAST(length(CASE WHEN reps.r = 0 THEN t.text "
        "     ELSE 'copy' || CAST(reps.r AS VARCHAR) || ' ' || t.text END) "
        "     AS BIGINT) AS n_chars",
    )
    gen(
        "embeddings",
        f"t.vec_id + reps.r * {OFF} AS vec_id, "
        "CASE WHEN reps.r = 0 THEN t.embedding ELSE "
        "list_concat([CAST(t.embedding[1] + reps.r / 997.0 AS FLOAT)], "
        "t.embedding[2:]) END AS embedding, t.label",
    )


if __name__ == "__main__":
    main()
