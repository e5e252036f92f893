"""Physical-plan quality gates (the 100 TB posture, asserted).

Correctness tests prove WHAT each plan computes; these prove the plan
SHAPE is the one that survives a 1000-executor scale-up:

- dimension lookups run as broadcast joins (no shuffle of the fact
  side for a dim resolution);
- filters and column projections reach the parquet scan (pushdown /
  pruning — a scan reading every column for a 2-column projection is
  wrong at any scale);
- hot paths stay inside whole-stage codegen;
- fact-side surrogate keys never fall into a global single-partition
  window (the one WindowExec shape that cannot scale).
"""

from __future__ import annotations

from olist_ecommerce_data_warehouse_spark.plans import REGISTRY
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_broadcast(spark):
    """Every dim resolution in the star build must be a broadcast
    join — fact rows never shuffle to look up a dim row."""
    plan = _plan(spark, "gold_fact_lineitem")
    assert "BroadcastHashJoin" in plan
    # part/supplier dims resolve via broadcast; orders⨝lineitem is the
    # one legitimate shuffle join (fact-fact on orderkey)
    assert plan.count("BroadcastHashJoin") >= 2


def test_flagship_projection_prunes_scan(spark):
    """The flagship scan must read only the columns the query needs —
    ReadSchema at the lineitem scan stays narrow."""
    plan = _plan(spark, "flagship_revenue_by_brand")
    # lineitem has 16 columns; the flagship needs ≤5 of them
    for ln in plan.splitlines():
        if "ReadSchema" in ln and "l_orderkey" in ln:
            n_cols = ln.count(":")
            assert n_cols <= 6, f"lineitem scan reads too many columns: {ln}"


def test_filter_pushdown_reaches_scan(spark):
    """A plan filtering on a scanned column must push the predicate
    into the parquet source (PushedFilters non-empty)."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [" in plan


def test_hot_path_in_codegen(spark):
    """The cleansing projections must run inside whole-stage codegen
    (no interpreted per-row fallback in the simple-transform tier)."""
    plan = _plan(spark, "cleanse_decimal_comma")
    # executedPlan.toString marks codegen'd operators with a "*(n) "
    # prefix (WholeStageCodegen subtree n)
    assert "*(1) Project" in plan or "WholeStageCodegen" in plan


def test_fact_sk_no_global_window(spark):
    """The fact-size surrogate-key path must not plan a global
    single-partition window over the fact rows: every window in the
    two-phase numbering is partitioned (the only unpartitioned window
    allowed is the tiny per-bucket offsets rollup, which windows over
    bucket counts, not data rows)."""
    from olist_ecommerce_data_warehouse_spark.catalog import table
    from olist_ecommerce_data_warehouse_spark.operators.surrogate import add_surrogate_key

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber")
    df = add_surrogate_key(li, ["l_orderkey", "l_linenumber"], sk_col="sk")
    plan = df._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        ln
        for ln in plan.splitlines()
        if "Window" in ln and "row_number" in ln and "__bucket" not in ln
    ]
    assert not data_windows, f"global window over data rows: {data_windows}"


def test_corpus_plans_shuffle_budget(spark):
    """The MIXING kind is a pure map + explode with ZERO shuffles —
    asserted on the operator subplan, since round 6 merged the DSIR
    kind into the corpus_mixing registry slot and DSIR legitimately
    shuffles for its model-sized bucket aggregates.  Its 3-domain
    config takes the inline-conditional weight path (small configs pay
    no broadcast build; >32 domains auto-switch to the broadcast-joined
    weights table, asserted in test_sample_by_weight_thousand_domains);
    sequence_packing pays exactly one shuffle — the per-stream window,
    whose partitioning the greedy Arrow stage reuses."""
    from olist_ecommerce_data_warehouse_spark.catalog import table
    from olist_ecommerce_data_warehouse_spark.operators.sampling import (
        sample_by_weight,
    )
    from olist_ecommerce_data_warehouse_spark.plans.corpus import MIX_WEIGHTS

    d = table(spark, SF_DIR, "documents").select("doc_id", "lang")
    mix = sample_by_weight(
        d, MIX_WEIGHTS, source_col="lang", id_col="doc_id", salt=":mix"
    )
    mix_plan = mix._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in mix_plan, mix_plan
    pack_plan = _plan(spark, "sequence_packing")
    assert pack_plan.count("Exchange") == 1, pack_plan


def test_text_lang_id_single_join_fanin(spark):
    """Round 7 collapsed text_lang_id's four doc_id-joined branches
    (lang evidence / qc head / labels / trained qt head — the round-6
    verdict's fan-in finding) into one base projection joined ONCE
    with one fused aggregation over the persisted feature table.  The
    executed plan must hold that shape: exactly one corpus-grain join
    (sort-merge on doc_id) and an Exchange budget of 5 (feature-table
    build, per-bucket agg reuse, head aggregation, two join sides) —
    the old shape paid 3 corpus-wide joins and a second full feature
    explode.

    Round 10 adds the scan-width rebalance (catalog.spread — the
    single-row-group scan plans 1 task otherwise, guide §2.5), which
    shows up as RoundRobinPartitioning exchanges of the RAW rows
    (repeated in the printed plan wherever the cached feats subtree is
    inlined).  Those are the deliberate fix, not fan-in regressions —
    the budget pins the KEYED exchanges (join/agg shuffles), which is
    what the round-7 collapse was about."""
    plan = _plan(spark, "text_lang_id")
    assert plan.count("SortMergeJoin") == 1, plan
    keyed = plan.count("Exchange") - plan.count("Exchange RoundRobinPartitioning")
    assert keyed <= 5, plan
    # ADVICE r10: the round-robin count is capped too — the budget
    # above must not become a blind spot where unintended repartitions
    # accumulate (the deliberate spread() inlines as 3 RR exchanges in
    # this printed plan today; 4 leaves one re-inlining of headroom)
    assert plan.count("Exchange RoundRobinPartitioning") <= 4, plan


def test_ann_plans_no_cartesian(spark):
    """The ANN rewrite must keep all-pairs scoring out of the plan:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere — scoring
    happens inside the Arrow Gram kernels, not a join."""
    for name in ("ann_cosine_topk", "ann_ivf_topk"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_semdedup_blocked_scoring_shape(spark):
    """SemDeDup (dedup_embedding_cosine kind='semdedup') must score
    pairs only inside per-cluster Arrow groups: the executed plan
    carries FlatMapGroupsInPandas for both blocking strategies and no
    pair-level join (CartesianProduct / BroadcastNestedLoopJoin), and
    cluster assignment stays a narrow mapInPandas — no shuffle join
    reuniting (id, cluster) with vectors."""
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 2  # label + semdedup blocks
    assert "MapInPandas" in plan  # keep_vec assignment kernel


def test_minhash_signature_fold_is_partial_min(spark):
    """The MinHash signature fold must run as k map-side partial MIN
    aggregates in a codegen'd HashAggregate — not the round-1 30s shape
    (collect_list of per-shingle hash vectors folded by interpreted
    higher-order ``aggregate`` lambdas).  collect_list may still appear
    downstream (the Jaccard VERIFY stage builds per-doc shingle
    arrays), and ``zip_with`` appears legitimately in the shingle
    BUILDER (the per-row n-gram concat fold) — the banned shape is the
    per-signature ``aggregate(`` fold."""
    plan = _plan(spark, "dedup_minhash_lsh")
    assert "partial_min" in plan
    assert "HashAggregate" in plan
    assert "aggregate(" not in plan.replace(
        "HashAggregate(", ""
    ).replace("ObjectHashAggregate(", "")


def test_new_round2_plans_no_cartesian_and_pruned(spark):
    """The round-2 additions keep the scale invariants: no cartesian /
    nested-loop joins anywhere, and the documents scan stays pruned to
    the columns the plan needs."""
    for name in ("dedup_cluster_cc", "contamination_check"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        for ln in plan.splitlines():
            if "ReadSchema: struct<" in ln and "doc_id" in ln:
                schema = ln.split("ReadSchema: struct<", 1)[1].rsplit(">", 1)[0]
                n_cols = schema.count(",") + 1
                # documents has 5 columns; both plans need ≤2
                assert n_cols <= 2, f"{name} scan too wide: {ln}"


def test_bucketed_merge_upsert_zero_exchange(spark):
    """MERGE on co-located (bucketed-by-key) tables must plan with ZERO
    Exchange — the incremental-maintenance shape for a 100 TB fact
    table: the daily delta joins the base without shuffling either
    side."""
    import shutil

    from olist_ecommerce_data_warehouse_spark.catalog import table
    from olist_ecommerce_data_warehouse_spark.operators.merge import merge_upsert
    from olist_ecommerce_data_warehouse_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )

    # pre-clean leftover managed-table dirs (warehouse.dir is a static
    # conf; same pattern as tests/test_bucketed.py)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("m_base", "m_delta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
    base = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    delta = base.limit(500).withColumn("o_totalprice", base.o_totalprice * 2)
    write_bucketed(base, "m_base", ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"])
    write_bucketed(delta, "m_delta", ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"])
    merged = merge_upsert(
        read_table(spark, "m_base"), read_table(spark, "m_delta"), ["o_orderkey"]
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["o_orderkey"]: r for r in merged.collect()}
    n_updates = sum(1 for r in got.values() if r["__merge_action"] == "update")
    assert n_updates == 500
    assert len(got) == base.count()


def test_round3_plan_shapes(spark):
    """Shape budget for the round-3 plans: embedding_quantize is one
    narrow Arrow pass (ZERO Exchange); merge_upsert_incremental is one
    full-outer sort-merge join — exactly two Exchanges (one per side),
    no window, no broadcast-nested-loop; both mixing and quantize stay
    window-free."""
    q_plan = _plan(spark, "embedding_quantize")
    assert "Exchange" not in q_plan, q_plan
    assert "MapInPandas" in q_plan

    m_plan = _plan(spark, "merge_upsert_incremental")
    assert m_plan.count("Exchange") == 2, m_plan
    assert "SortMergeJoin" in m_plan and "FullOuter" in m_plan
    assert "BroadcastNestedLoopJoin" not in m_plan
    assert "Window" not in m_plan


def test_sequence_packing_single_exchange(spark):
    """The packing plan computes BOTH layouts (window cumsum + greedy
    Arrow fold) off ONE hash exchange on the stream key: the window's
    partitioning satisfies the packer's groupBy clustering, so adding
    the greedy stage must not add a shuffle."""
    plan = _plan(spark, "sequence_packing")
    assert plan.count("Exchange") == 1, plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Window" in plan


def test_range_join_branch_is_hash_join(spark):
    """The interval branch of asof_click_attribution must plan the
    bucketized rewrite as an EQUI-join on the bin (hash/sort-merge
    shuffle, AQE-splittable) — a naive BETWEEN theta join would plan a
    BroadcastNestedLoopJoin, quadratic at corpus scale.  The oracle IS
    that naive theta join, so the driver's hash gate plus this shape
    gate together prove 'same rows, scalable plan'."""
    plan = _plan(spark, "asof_click_attribution")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the bin equi-join is a real join (broadcast or shuffled hash) and
    # the window-explosion side stays bounded (Generate = the sequence
    # explode of interval replicas)
    assert "Generate" in plan and "explode" in plan
    assert "Join" in plan


def test_morton_gate_adds_no_scan(spark):
    """The round-5 Z-order gate rides the EXISTING single-pass
    aggregate of approx_aggregates: the plan still scans events
    exactly 3 times (two partial-distinct counts + one sketch/morton
    aggregate) and the Morton key stays inside whole-stage codegen —
    the gate must cost an expression, not a pass."""
    plan = _plan(spark, "approx_aggregates")
    n_scans = sum(
        1 for ln in plan.splitlines() if "Scan parquet" in ln and "events" in ln
    )
    assert n_scans == 3, f"events scanned {n_scans}x"
    assert "CartesianProduct" not in plan


def test_multimodal_metadata_is_pure_map_rollup(spark):
    """The multimodal gate plan is ~20 synthesize→decode→aggregate
    branches; its 100 TB shape must stay 'Arrow map + tiny rollup':
    ZERO joins of any kind, zero windows, and every Exchange a
    single-row partial-aggregate fan-in (one per branch — budget 20).
    The three synthesize_real_containers consumers must share ONE
    persisted synthesis (InMemoryTableScan), not re-run it (the
    round-7 1.94x finding)."""
    plan = _plan(spark, "multimodal_metadata")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
               "BroadcastNestedLoopJoin", "Window"):
        assert op not in plan, (op, plan[:2000])
    assert plan.count("Exchange") <= 20, plan.count("Exchange")
    assert plan.count("InMemoryTableScan") >= 3


def test_ivf_index_reconstruction_runs_no_write_jobs(spark):
    """Round 9 (ADVICE r07/r08 residue): the persistent IVF index is
    published ONCE to a content-addressed dir (tmp write + atomic
    rename); re-constructing the ann_ivf_topk DataFrame — e.g. an
    .explain()-only caller — must run strictly fewer jobs than the
    publishing construction and ZERO write jobs (the index dir stays
    byte-identical, publish() returns without saving, and the cached
    centroids make the reload collect nothing)."""
    import os
    import shutil

    from olist_ecommerce_data_warehouse_spark.operators import ann_index
    from olist_ecommerce_data_warehouse_spark.plans import REGISTRY

    # hermetic start regardless of test order: force the first
    # construction to really publish and really collect centroids
    scratch_pre = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    if os.path.isdir(scratch_pre):
        for d in os.listdir(scratch_pre):
            if d.startswith("ivf_index_"):
                shutil.rmtree(os.path.join(scratch_pre, d), ignore_errors=True)
    ann_index._CENTROID_CACHE.clear()

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def construct(group):
        sc.setJobGroup(group, group)
        try:
            df = REGISTRY["ann_ivf_topk"].fn(spark, SF_DIR)
            df.explain()  # explain-only caller: no action
        finally:
            sc.setJobGroup(None, None)
        return len(tracker.getJobIdsForGroup(group))

    n_first = construct("ivf-construct-1")  # publishes (dir was cleared)
    scratch = scratch_pre
    idx_dirs = sorted(
        d for d in os.listdir(scratch) if d.startswith("ivf_index_") and "_v" in d
    )
    assert idx_dirs, "published index dir missing"
    newest = os.path.join(scratch, idx_dirs[-1])

    def content_sig(root):
        # per-FILE (relpath, size, mtime): reconstruction must not
        # rewrite any index byte.  The dir's own mtime is exempt — the
        # GC's last-use touch (publish-reuse/load) legitimately bumps
        # it so a live index never ages out under a reader.
        sig = []
        for dp, _, fns in os.walk(root):
            for fn in fns:
                p = os.path.join(dp, fn)
                st = os.stat(p)
                sig.append((os.path.relpath(p, root), st.st_size, st.st_mtime))
        return sorted(sig)

    files_before = content_sig(newest)

    n_second = construct("ivf-construct-2")
    assert content_sig(newest) == files_before, "index dir was rewritten"
    assert os.path.getmtime(newest) > 0  # dir itself may be touched
    # kmeans/probes collects are inherent (model-sized driver state);
    # the two index-write jobs and the centroid-load job must be gone
    assert n_second < n_first, (n_first, n_second)


def test_py_mode_labels_match_executed_plans(spark):
    """bench.py's two-mode rig model (round 10) normalizes each plan
    by its execution mode's calibration factor — so the PY_MODE_PLANS
    label set must EQUAL reality across the whole registry: the set
    of plans whose optimized plan contains a Python/Arrow eval node,
    derived here for all 50 plans, must be exactly the labeled set (a
    plan that gains or loses a Python kernel must move between modes,
    or its normalization silently uses the wrong drift axis — and an
    over-labeled plan would normalize JVM drift by the Python
    factor)."""
    import bench

    py_nodes = (
        "MapInPandas",
        "FlatMapGroupsInPandas",
        "ArrowEvalPython",
        "BatchEvalPython",
        "FlatMapCoGroupsInPandas",
        "PythonMapInArrow",
    )
    derived = set()
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, SF_DIR)
        s = df._jdf.queryExecution().optimizedPlan().toString()
        if any(n in s for n in py_nodes):
            derived.add(name)
    assert derived == bench.PY_MODE_PLANS, (
        f"labels drifted: unlabeled-but-Python {sorted(derived - bench.PY_MODE_PLANS)}, "
        f"labeled-but-JVM {sorted(bench.PY_MODE_PLANS - derived)}"
    )


def test_session_factory_cluster_topology_support():
    """Round-10 local-cluster smoke support (verdict r09 task 2): the
    session factory must resolve a ``SPARK_GRAFT_MASTER`` local-cluster
    URL to its true total core count (shuffle partitioning is sized to
    cluster width, not the local cpu arg), and the executor package
    zip must actually contain the package — the smoke's first failure
    was an empty zip shipping cleanly and dying later as an
    executor-side ModuleNotFoundError."""
    import os
    import zipfile

    from olist_ecommerce_data_warehouse_spark.session import _master, _package_zip

    # pin the env var both ways so the test holds even when the whole
    # suite itself runs under SPARK_GRAFT_MASTER (the round-10
    # local-cluster sweep does exactly that)
    saved = os.environ.pop("SPARK_GRAFT_MASTER", None)
    try:
        assert _master(32) == ("local[32]", 32)
        os.environ["SPARK_GRAFT_MASTER"] = "local-cluster[2,4,4096]"
        assert _master(32) == ("local-cluster[2,4,4096]", 8)
    finally:
        if saved is None:
            os.environ.pop("SPARK_GRAFT_MASTER", None)
        else:
            os.environ["SPARK_GRAFT_MASTER"] = saved

    path = _package_zip()
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
    assert "olist_ecommerce_data_warehouse_spark/__init__.py" in names
    assert "olist_ecommerce_data_warehouse_spark/operators/similarity.py" in names
    assert len(names) > 30


def test_ivf_publish_routes_scheme_paths_through_hadoop_fs(spark, tmp_path):
    """The round-10 FS seam: a scheme'd index location (here
    ``file://`` — same Hadoop FileSystem API route as hdfs://s3a://)
    must round-trip the full write-once lifecycle — publish-if-absent,
    zero-write reuse with a last-use touch, load + partition-pruned
    search — without any driver-local ``os`` call touching the path.
    Also pins the classic Hadoop rename pitfall: rename onto an
    existing directory moves the source INSIDE it instead of failing,
    so a race loser must detect the nested-move signature and clean
    it up (``_rename_if_absent``)."""
    import os
    import time

    from olist_ecommerce_data_warehouse_spark.operators import ann_index
    from olist_ecommerce_data_warehouse_spark.operators.ann_index import (
        IVFIndex,
        _hadoop_fs,
        _rename_if_absent,
    )

    vectors = spark.createDataFrame(
        [(i, [int(i % 7), int(i % 11), int(3 * i % 13), 1]) for i in range(64)],
        "vec_id long, embedding array<bigint>",
    )
    idx = IVFIndex.build(vectors, k=2, n_iter=1, pre_quantized=True)

    uri = f"file://{tmp_path}/ivf_index_hadooproute_v1"
    local = tmp_path / "ivf_index_hadooproute_v1"
    assert idx.publish(uri) is True
    assert (local / "centroids").exists() and (local / "assigned").exists()
    # no orphaned tmp dir
    assert not [p for p in os.listdir(tmp_path) if ".tmp-" in p]

    # reuse: returns False, writes nothing, bumps the last-use mtime
    before = os.path.getmtime(local)
    sig_before = sorted(
        (os.path.relpath(os.path.join(dp, f), local), os.path.getsize(os.path.join(dp, f)))
        for dp, _, fs_ in os.walk(local) for f in fs_
    )
    time.sleep(0.05)
    assert idx.publish(uri) is False
    assert os.path.getmtime(local) >= before
    sig_after = sorted(
        (os.path.relpath(os.path.join(dp, f), local), os.path.getsize(os.path.join(dp, f)))
        for dp, _, fs_ in os.walk(local) for f in fs_
    )
    assert sig_after == sig_before  # byte-stable reuse

    # load through the scheme'd path: cache keys on the URI verbatim,
    # search answers from the partitioned layout
    ann_index._CENTROID_CACHE.pop(uri, None)
    loaded = IVFIndex.load(spark, uri)
    assert uri in ann_index._CENTROID_CACHE
    q = spark.createDataFrame(
        [(0, [1, 2, 3, 1])], "query_id long, qvec array<bigint>"
    )
    rows = loaded.search(q, k=3, nprobe=2).collect()
    assert 0 < len(rows) <= 3

    # the rename pitfall, deterministically: dst already exists (the
    # race winner), loser's tmp must NOT end up nested inside it
    fs, path_cls, dst = _hadoop_fs(spark, uri)
    tmp_uri = f"{uri}.tmp-loser"
    os.makedirs(tmp_path / "ivf_index_hadooproute_v1.tmp-loser/centroids")
    assert _rename_if_absent(fs, path_cls, path_cls(tmp_uri), dst) is False
    assert not (local / "ivf_index_hadooproute_v1.tmp-loser").exists()  # no nested stray
    assert not (tmp_path / "ivf_index_hadooproute_v1.tmp-loser").exists()  # tmp cleaned
    assert (local / "centroids").exists()  # winner's index intact
