"""Regenerate PLANS.md: committed physical-plan evidence for five
representative plans.  Keeps each `explain("formatted")` output to the
operator TREE plus the scan-detail nodes (PushedFilters/ReadSchema) —
the parts plan-shape claims rest on — because full node details of the
iterative CC plan run to megabytes of unrolled lineage."""

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from olist_ecommerce_data_warehouse_spark.plans import REGISTRY  # noqa: E402
from olist_ecommerce_data_warehouse_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

PICKS = {
    "flagship_revenue_by_brand": "Broadcast dim joins + partial agg + TakeOrderedAndProject; lineitem scan pruned to the needed columns.",
    "gold_fact_lineitem": "3-way SK resolution: dims broadcast, the single genuine shuffle is orders join lineitem on orderkey; two-phase surrogate keys, no global window.",
    "dedup_minhash_lsh": "Shingle explode stays narrow; 16 codegen'd MIN aggregates (map-side partials); banded equi-join replaces all-pairs.",
    "dedup_cluster_cc": "Edge pipeline materialized once; min-label loop over endpoints only — the executed plan reads the loop's cached labels (InMemoryTableScan).",
    "contamination_check": "Runtime filter first: the train gram stream passes a broadcast LEFT-SEMI join against the eval gram set before the distinct hash-aggregate, so only overlapping grams reach a shuffle; overlap is then a plain equi-join on the 8-byte gram hash; both document scans pruned.",
    "asof_click_attribution": "Both temporal-join primitives: the as-of branch is one user-keyed window (union + running last), the interval branch is the bucketized range join — interval replicas via sequence+explode, EQUI-join on the bin, exact BETWEEN filter; no BroadcastNestedLoopJoin anywhere.",
    "text_lang_id": "The classifier-merge shape: lang evidence stays a pure map over the documents scan; the quality head explodes 8-byte feature hashes, runs the mix32 weight math as codegen'd row expressions, partial-aggregates map-side (shuffle = one row per doc) and joins back on doc_id.",
}


def trimmed_formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    tree, _, details = text.partition("\n\n")
    keep: list[str] = []
    for block in details.split("\n\n"):
        if "Scan parquet" in block or "PushedFilters" in block or "ReadSchema" in block:
            keep.append(block.strip())
    out = tree.strip()
    if keep:
        out += "\n\n" + "\n\n".join(keep[:6])
    lines = out.splitlines()
    if len(lines) > 120:
        out = "\n".join(lines[:120]) + f"\n… ({len(lines) - 120} more lines trimmed)"
    return out


def main() -> None:
    spark = get_spark("plans", cpus=8)
    out = io.StringIO()
    out.write(
        """# PLANS — physical-plan evidence (generated, sf0.001)

Trimmed `df.explain("formatted")` output (operator tree + scan details)
for five representative plans, committed so plan-shape claims in
README/COVERAGE are checkable without running Spark.  Regenerate with
`python scripts/gen_plans.py`.  Shapes to look for: pruned `ReadSchema`
and `PushedFilters` at scans, `BroadcastHashJoin` for dim lookups,
`HashAggregate` partial+final pairs (map-side combine), no
`CartesianProduct`, and `InMemoryTableScan` where the iterative CC loop
reads its cached labels.

"""
    )
    for name, note in PICKS.items():
        df = REGISTRY[name].fn(spark, SF)
        out.write(f"## {name}\n\n{note}\n\n```\n{trimmed_formatted(df)}\n```\n\n")
    Path(__file__).resolve().parents[1].joinpath("PLANS.md").write_text(out.getvalue())
    print("written", len(out.getvalue()))
    spark.stop()


if __name__ == "__main__":
    main()
