"""Property-based tests (hypothesis) for the invariants whose failure
modes are silent: prefix-filter candidate generation must NEVER drop a
true near-dup pair (a lost pair is undetectable downstream), and the
scalable surrogate-key numbering must be exactly the single-window
numbering for arbitrary key distributions (negative, clustered,
string)."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olist_ecommerce_data_warehouse_spark.operators.surrogate import (
    add_surrogate_key,
    add_surrogate_key_simple,
)
from olist_ecommerce_data_warehouse_spark.operators.textdedup import (
    jaccard_on_pairs,
    prefix_filter_candidates,
    shingle_table,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_VOCAB = ["alpha", "bravo", "cat", "dog", "echo", "fox", "gum", "hat"]


def _py_shingles(toks: list[str], n: int = 3) -> set[str]:
    """Python twin of operators.textdedup.shingles (distinct word
    n-grams, space-joined)."""
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=3, max_size=10),
        min_size=2,
        max_size=7,
    )
)
def test_prefix_filter_pipeline_equals_ground_truth(spark, docs):
    """End-to-end: candidates ⊇ every true pair with J ≥ 3/5, and the
    verified output equals the brute-force ground truth exactly —
    including pairs at exactly the 0.6 boundary (the float-ceil trap)."""
    sets = {i: _py_shingles(t) for i, t in enumerate(docs)}
    truth = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        # integer cross-multiplication, no float: J >= 3/5
        if 5 * inter >= 3 * union:
            truth[(a, b)] = inter / union
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sh = shingle_table(df)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in prefix_filter_candidates(sh, t_num=3, t_den=5).collect()
    }
    assert set(truth) <= cand, f"prefix filter dropped true pairs: {set(truth) - cand}"
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_on_pairs(
            prefix_filter_candidates(sh, t_num=3, t_den=5), sh
        )
        .filter(F.col("jaccard") >= 0.6)
        .collect()
    }
    assert verified == {k: v for k, v in truth.items()}, (verified, truth)


@_SETTINGS
@given(
    keys=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=40, unique=True
    )
)
def test_surrogate_key_matches_simple_for_any_keys(spark, keys):
    """Two-phase bucketed numbering ≡ global-window numbering for any
    integer key distribution (negative, clustered, single-value)."""
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    fast = {r["k"]: r["sk"] for r in add_surrogate_key(df, ["k"], num_partitions=5).collect()}
    slow = {r["k"]: r["sk"] for r in add_surrogate_key_simple(df, ["k"]).collect()}
    assert fast == slow


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Iterative min-label propagation ≡ classic union-find for ANY
    small graph (self-loops, parallel edges, disconnected vertices,
    long chains)."""
    from olist_ecommerce_data_warehouse_spark.operators.graph import connected_components

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical truth: every vertex → minimum id in its component
    comp: dict[int, list[int]] = {}
    for v in range(n):
        comp.setdefault(find(v), []).append(v)
    truth = {v: min(members) for members in comp.values() for v in members}

    verts = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edf = spark.createDataFrame(edges, "src long, dst long") if edges else (
        spark.createDataFrame([], "src long, dst long")
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(verts, edf, max_iter=20).collect()
    }
    assert got == truth
