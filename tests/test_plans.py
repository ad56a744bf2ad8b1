"""Physical-plan audits: the properties that matter at 100 TB.

These pin the *plan shape*, not timings: filters must reach the parquet
scan, dimension sides must broadcast, aggregates must be partial
(map-side combine), top-k must be TakeOrderedAndProject, and no hot
path may fall back to row-at-a-time Python evaluation. A regression
here is a scale regression even when small-SF results stay correct.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "scan_filter")
    assert "PushedFilters" in plan and ("IsNotNull" in plan or "GreaterThan" in plan)
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_dimension_join_broadcasts(spark):
    plan = _plan(spark, "join_two_way")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan
    assert "CartesianProduct" not in plan


def test_threeway_join_no_cartesian(spark):
    plan = _plan(spark, "threeway_join_arith")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_aggregate_is_partial_hash(spark):
    plan = _plan(spark, "agg_pricing_summary")
    # partial + final HashAggregate = map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_knn_is_top_k_not_full_sort(spark):
    plan = _plan(spark, "knn_cosine")
    assert "TakeOrderedAndProject" in plan


def test_exact_dedup_shuffles_hashes_not_documents(spark):
    plan = _plan(spark, "exact_dedup")
    assert "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_no_python_eval_in_jvm_operator_paths(spark):
    """Everything except the LSH probe family (deliberate Arrow-batched
    pandas kernels) must stay fully JVM-side."""
    for name in (
        "scan_filter",
        "agg_pricing_summary",
        "topk_per_group",
        "knn_cosine",
        "pairwise_cosine",
        "exact_dedup",
        "ngram_jaccard",
        "simhash",
        "doc_fingerprint",
        "token_stats",
        "quality_lang",
    ):
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_seminaive_insert_never_shuffles_accumulated_closure(spark):
    """The insertion-maintenance anti-join (recursion.seminaive_insert
    minus_acc) must stream the accumulated closure once per round under
    broadcast hash joins — a shuffled sort-merge join of the 1M-pair acc
    per iteration would dominate maintenance cost at scale."""
    from pyspark.sql import functions as F

    from inputlayer_spark.engine import IQLEngine

    eng = IQLEngine(spark)
    eng.execute("+edge[" + ", ".join(f"({i}, {i+1})" for i in range(30)) + "]")
    eng.execute(
        "+path(X, Y) <- edge(X, Y)\n+path(X, Z) <- edge(X, Y), path(Y, Z)"
    )
    eng.query("?path(X, Y)").count()  # pin the fixpoint

    captured = []
    import inputlayer_spark.recursion as rec

    orig = rec.seminaive_insert

    def spy(*a, **k):
        out = orig(*a, **k)
        if out:
            captured.extend(out.values())
        return out

    try:
        rec.seminaive_insert = spy
        eng.execute("+edge[(100, 0)]")  # prepend: delta cone spans the chain
    finally:
        rec.seminaive_insert = orig
    assert captured, "maintenance did not run"
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    # the maintained frame is checkpointed; audit the NEXT delta's plan
    # instead: build one minus_acc step by hand over the live acc
    acc = eng._cached_view_get("path")
    cand = spark.createDataFrame([(0, 1), (7, 9)], acc.schema)
    existing = acc.join(F.broadcast(cand), on=list(cand.columns), how="left_semi")
    step = cand.join(F.broadcast(existing), on=list(cand.columns), how="left_anti")
    plan = step._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan  # acc never shuffles


def test_sampling_ops_are_narrow_jvm_plans(spark):
    """hash_sample must be a pure narrow filter (no shuffle — it runs
    inside the scan stage at 100 TB); chunking stays JVM-side
    (generator/explode, no Python eval)."""
    plan = _plan(spark, "hash_sample")
    assert "Exchange" not in plan  # no shuffle anywhere
    assert "BatchEvalPython" not in plan
    plan2 = _plan(spark, "chunk_documents")
    assert "BatchEvalPython" not in plan2
    assert "Generate" in plan2  # posexplode runs as a JVM generator


def test_disconnected_body_order_joins_before_crossing(spark):
    """Greedy left-deep join ordering (compiler.compile_body; reference
    join planning src/join_planning/mod.rs): a body whose literal order
    would cross-join two atoms before the connecting atom arrives —
    same-generation's `edge(A,X), edge(B,Y), sg(A,B)` — must compile to
    two equi-joins, never a |E|² cartesian/nested-loop product."""
    from pyspark.sql import functions as F

    from inputlayer_spark.compiler import compile_body
    from inputlayer_spark.ast_nodes import Atom, Var

    edge = spark.range(200).select(
        (F.col("id") / 2).cast("long").alias("p"), F.col("id").alias("c")
    )
    sg = edge.select(F.col("c").alias("a"), F.col("c").alias("b"))

    def resolve(name):
        return {"edge": edge, "sg": sg}[name]

    body = (
        Atom("edge", (Var("A"), Var("X"))),
        Atom("edge", (Var("B"), Var("Y"))),
        Atom("sg", (Var("A"), Var("B"))),
    )
    df = compile_body(body, resolve)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the result is the honest conjunction
    n = df.count()
    want = (
        edge.alias("e1")
        .join(sg, F.col("e1.p") == sg.a)
        .join(edge.alias("e2"), F.col("e2.p") == sg.b)
        .count()
    )
    assert n == want


def test_asof_join_single_shuffle_no_cartesian(spark):
    """The as-of join must be the union-and-carry plan: ONE exchange
    on the key feeding a Window — never a CartesianProduct or a
    range-condition nested loop, and no Python evaluation."""
    plan = _plan(spark, "asof_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_pack_sequences_no_global_single_partition_window(spark):
    """Packing's prefix sum must stay distributed: the window is
    partitioned by the range-partition id (SinglePartition would be
    the 100 TB bottleneck), the per-partition offsets attach as a pure
    map-side element_at over __pid (r13 — previously a broadcast join
    of a driver-built P-row frame), and range partitioning does the
    global ordering."""
    plan = _plan(spark, "pack_sequences")
    # the running sum windows over the range-partition id, never over
    # an empty (global) partition spec; the range exchange itself sits
    # behind the pinning localCheckpoint so it is not in this plan text
    assert "windowspecdefinition(__pid" in plan
    assert "SinglePartition" not in plan
    # offsets are an expression, not a join: no join operator at all
    # may appear in the packing plan
    assert "element_at" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_dedup_lines_blocklist_is_broadcast_anti_join(spark):
    """Line dedup anti-joins the (small) blocklist via broadcast and
    never materializes a cartesian pair space."""
    plan = _plan(spark, "dedup_lines")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_sessionize_single_key_shuffle(spark):
    plan = _plan(spark, "sessionize")
    assert "Window" in plan
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_keep_canonical_plan_no_window_sort(spark):
    """Survivor selection must stay a map-side-combinable aggregate +
    semi-join: a Window/Sort formulation would serialize each cluster
    through a sort at 100 TB."""
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.dedup import keep_canonical

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    clusters = docs.select(
        "doc_id", (F.col("doc_id") % 7).alias("cluster_id")
    )
    out = keep_canonical(docs, clusters)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(mode)
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    # partial + final aggregate pair = map-side combine of min_by (the
    # struct-ordered comparator plans as SortAggregate; what matters is
    # the PARTIAL pass — the shuffle then carries <=1 candidate per
    # cluster per partition, unlike a Window over all doc rows)
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2
    assert "partial_min_by" in plan
    assert "LeftSemi" in plan


def test_tfidf_dfreq_never_hint_broadcast(spark):
    """The document-frequency side of tfidf is the distinct-token
    table — unbounded (heavy-tailed) on an open-tokenizer web corpus,
    so a forced broadcast is a driver-OOM scale-killer at 100 TB. The
    logical plan must carry NO broadcast hint: the join is allowed to
    become a broadcast join only when Catalyst/AQE *measures* the side
    under the threshold, never by fiat."""
    df = entry.queries()["tfidf"](spark, SF_DIR)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    # a broadcast() hint survives into the optimized Join node as
    # leftHint/rightHint=(strategy=broadcast)
    assert "strategy=broadcast" not in logical
    assert "ResolvedHint" not in logical
    # and the physical plan keeps the hot path JVM-side
    plan = _plan(spark, "tfidf")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lm_score_counts_never_hint_broadcast(spark):
    """lm_score's bigram-count and prefix-count tables are unbounded on
    an open-tokenizer web corpus (same heavy tail as tfidf's dfreq) —
    the joins back to the per-document bigram stream must carry NO
    broadcast hint; only a Catalyst/AQE measurement may broadcast."""
    df = entry.queries()["lm_score"](spark, SF_DIR)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical
    assert "ResolvedHint" not in logical
    plan = _plan(spark, "lm_score")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_source_filter_broadcasts_the_source_table(spark):
    """filter_by_source_quality's surviving-source table is bounded by
    the DOMAIN count — broadcasting it is the intended plan (the corpus
    pays one map-side semi-join, no shuffle). This pins the contrast
    with tfidf/lm_score, whose token-keyed tables must never be
    hint-broadcast."""
    df = entry.queries()["source_filter"](spark, SF_DIR)
    plan = _plan(spark, "source_filter")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_substring_dedup_shuffles_hashes_not_spans(spark):
    """dedup_spans' exploded window rows are (id, start, md5) — the
    shuffle key is a fixed-width hash, never span text; the duplicated
    set is boilerplate-small and broadcast into the semi-join (the
    dedup_lines discipline). No cartesian, no Python in the path."""
    plan = _plan(spark, "substring_dedup")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine on the dup count


def test_dsir_weight_table_is_bucket_bounded_broadcast(spark):
    """dsir_weights' log-likelihood-ratio table is `buckets`-sized BY
    CONSTRUCTION (hash % B), so its broadcast is the intended plan —
    the legitimate contrast to tfidf/lm_score's unbounded token-keyed
    tables. The corpus-side gram stream must never be the broadcast
    side."""
    plan = _plan(spark, "dsir_weights")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bm25_query_terms_filter_before_aggregation(spark):
    """bm25_search keeps only |q|-term postings: the isin() literal
    filter must appear below the tf aggregate (the corpus never
    shuffles non-query tokens), dfreq is broadcast, and the final
    top-k is TakeOrdered, not a global sort."""
    plan = _plan(spark, "bm25_search")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_semantic_dedup_pairs_join_on_cluster_key(spark):
    """semantic_dedup's pair comparison must be an equi-join on the
    cluster id (per-cluster local product), NEVER a corpus cartesian;
    the kmeans assignment itself stays a narrow scan against literal
    centroids."""
    plan = _plan(spark, "semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_gopher_quality_is_one_narrow_codegen_scan(spark):
    """The Gopher rule battery is pure column arithmetic over one
    tokenization: no shuffle (no Exchange), no join, no Python — one
    scan-projection pass (the array-lambda gates are CodegenFallback
    but still JVM-side), the cheapest possible 100 TB shape."""
    plan = _plan(spark, "gopher_quality")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_gopher_repetition_is_one_narrow_codegen_scan(spark):
    """The §A.1.2 repetition battery must keep gopher_quality's shape:
    all thirteen per-document fractions are per-row array expressions
    (split/sort/adjacency/window-coverage) over one scan — no Exchange,
    no Join, no Python anywhere in the physical plan. At 100 TB this is
    a map-only pass whose cost is bounded by per-document length, never
    by corpus size."""
    plan = _plan(spark, "gopher_repetition")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_c4_clean_is_one_narrow_codegen_scan(spark):
    """The C4 battery is line/page regex+array work over one scan —
    no Exchange, no Join, no Python. Same map-only 100 TB shape as
    the Gopher batteries."""
    plan = _plan(spark, "c4_clean")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_web_pipeline_is_straight_line(spark, monkeypatch):
    """The trilogy composition must stay a LINEAR chain: metadata rides
    the operators' `carry` passthrough, never a join-back to the input.
    A join-back re-evaluates the upstream subtree once per branch — the
    v1 formulation ran the NFC pandas_udf (and the whole c4/gopher
    chain above it) multiple times and measured 8.0x growth at 100x
    where every individual stage is <=0.9x. Pin: exactly ONE
    ArrowEvalPython in the physical plan (the NFC kernel), and no Join
    anywhere before the survivor aggregation.

    r14: below the input-size guard the cleaned pages are lazily
    PINNED (the chain evaluates once inside the pin; downstream reads
    the pinned leaf), so the corpus-scale straight-line shape is
    asserted with the guard forced off, and the pinned bench-scale
    shape separately."""
    # corpus-scale shape (guard disabled => no pin): the LINEAR chain
    monkeypatch.setattr(entry, "_PIN_MAX_BYTES", -1)
    plan = _plan(spark, "web_pipeline")
    # formatted explain lists every node twice (tree + detail): one
    # physical ArrowEvalPython node == exactly one tree-form occurrence
    assert plan.count("ArrowEvalPython (") == 1
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    # bench-scale shape (guard active): downstream of the pin the plan
    # reads a checkpointed leaf — the cleaning chain appears ONCE, in
    # the pin's own materialization, not 2-3x via filter pushdown
    # substitution (r13's measured +1.8 s)
    monkeypatch.setattr(entry, "_PIN_MAX_BYTES", 1 << 30)
    plan2 = _plan(spark, "web_pipeline")
    assert "ExistingRDD" in plan2
    assert "Join" not in plan2
    assert "CartesianProduct" not in plan2
    assert "BatchEvalPython" not in plan2


def test_normalize_text_is_arrow_batched_map_only(spark):
    """normalize_text's NFC step is the one justified Python kernel
    (Spark has no JVM unicode-normalize builtin): it must run as
    Arrow-batched ArrowEvalPython — NEVER row-at-a-time BatchEvalPython
    — and the operator stays a map-only pass: no Exchange, no Join.
    The regexp chain around it is ordinary codegen."""
    plan = _plan(spark, "normalize_text")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_incremental_dedup_tags_broadcast_is_cap_guarded(spark, monkeypatch):
    """VERDICT r10 #2: the (id, __new) tags frame in incremental_dedup
    is corpus ∪ batch — corpus-sized by construction — so its broadcast
    hint must be cap-guarded like every other adaptive site in dedup.py.
    Above the cap the analyzed plan must carry NO broadcast hint
    anywhere in the DAG (the verify-candidate hint is cap-guarded too);
    under the cap the hints come back. AQE may still choose a physical
    broadcast from size estimates — the pin is about the unconditional
    HINT, which overrides size estimation at any scale."""
    from inputlayer_spark.operators import dedup

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(40)
    )
    batch = docs.filter("doc_id % 5 = 0")
    corpus = docs.filter("doc_id % 5 != 0")

    monkeypatch.setattr(dedup, "BROADCAST_CAP", 0)
    out = dedup.incremental_dedup(batch, corpus, "doc_id", "text", num_perm=8, bands=4)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed

    monkeypatch.setattr(dedup, "BROADCAST_CAP", 2_000_000)
    out2 = dedup.incremental_dedup(batch, corpus, "doc_id", "text", num_perm=8, bands=4)
    analyzed2 = out2._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in analyzed2


def test_source_filter_broadcast_is_cap_guarded(spark, monkeypatch):
    """VERDICT r10 #5: filter_by_source_quality's surviving-source set
    is bounded by the domain count, but web-scale domain sets reach
    tens of millions — the broadcast hint must disappear past the cap
    (the dedup_lines discipline) and the semi-join fall back to a
    shuffle AQE can re-plan."""
    from inputlayer_spark.operators import dedup, sampling

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .limit(40)
    )
    monkeypatch.setattr(dedup, "BROADCAST_CAP", 0)
    out = sampling.filter_by_source_quality(docs, "source", "text", min_docs=1)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed

    monkeypatch.setattr(dedup, "BROADCAST_CAP", 2_000_000)
    out2 = sampling.filter_by_source_quality(docs, "source", "text", min_docs=1)
    analyzed2 = out2._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in analyzed2


def test_indexed_dedup_key_pushdown_reaches_parquet_scan(
    spark, tmp_path, monkeypatch
):
    """r12: incremental_dedup_indexed's batch-key pushdown, pinned in
    two halves (the operator localCheckpoints its output, so the final
    DF's lineage can't show the scan):

    1. the operator really injects a `key IN (...)` filter on the band
       artifact in auto mode under the cap (spied via DataFrame.where —
       the operator's only .where call is the pushdown site);
    2. that exact filter shape on the artifact's on-disk layout reaches
       the PARQUET SCAN as PushedFilters — not a post-scan Filter only
       — which is what turns the per-batch candidate probe into
       row-group skips on a key-clustered artifact."""
    # pyspark 4: pyspark.sql.DataFrame is the ABC; the sessions here
    # build classic (non-Connect) frames, so spy on the concrete class
    from pyspark.sql.classic.dataframe import DataFrame

    from inputlayer_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_indexed,
        minhash_band_rows,
        doc_shingle_arrays,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    batch = docs.filter("doc_id % 17 = 0")
    corpus = docs.filter("doc_id % 17 != 0")
    h, b, a = build_dedup_index(corpus, "doc_id", "text", 16, 8, 2)
    bdir = str(tmp_path / "bands")
    b.repartitionByRange(F.col("key")).sortWithinPartitions("key").write.parquet(bdir)
    b_disk = spark.read.parquet(bdir)

    where_conds = []
    orig_where = DataFrame.where

    def spy(self, cond):
        where_conds.append(str(cond))
        return orig_where(self, cond)

    monkeypatch.setattr(DataFrame, "where", spy)
    surv, _, _, _ = incremental_dedup_indexed(
        batch, h, b_disk, a, "doc_id", "text", num_perm=16, bands=8, shingle_n=2,
        key_pushdown="auto",
    )
    assert surv.count() > 0
    assert any("in(key" in c.lower().replace(" ", "")
               or "keyin" in c.lower().replace(" ", "")
               for c in where_conds), where_conds
    monkeypatch.undo()

    # the same filter shape, pushed into the artifact scan
    keys = [
        r["key"]
        for r in minhash_band_rows(
            doc_shingle_arrays(batch, "doc_id", "text", 2), 16, 8
        ).select("key").distinct().collect()
    ]
    filtered = b_disk.where(F.col("key").isin(keys))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(key" in plan, plan[:4000]
    assert filtered.count() > 0  # the pruned probe still finds its rows


def test_indexed_dedup_hash_pushdown_reaches_parquet_scan(spark, tmp_path):
    """r13 (VERDICT r12 #5): the exact stage's batch-hash pushdown —
    the batch's distinct md5 set as an `IN (...)` filter — reaches the
    __h-clustered hash artifact's PARQUET SCAN as PushedFilters, so the
    per-batch anti-join stops paying a full O(corpus) artifact scan.
    Unlike the band-key filter this one is EXACT (artifact hashes
    outside the batch set can never witness the anti-join), so it needs
    no equi-join arbiter behind it."""
    from inputlayer_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup_indexed,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    batch = docs.filter("doc_id % 17 = 0")
    corpus = docs.filter("doc_id % 17 != 0")
    h, b, a = build_dedup_index(corpus, "doc_id", "text", 16, 8, 2)
    hdir = str(tmp_path / "hashes")
    h.repartitionByRange(F.col("__h")).sortWithinPartitions("__h").write.parquet(hdir)
    h_disk = spark.read.parquet(hdir)

    # operator-level: survivors identical with the pushdown forced
    base, _, _, _ = incremental_dedup_indexed(
        batch, h_disk, b, a, "doc_id", "text", num_perm=16, bands=8, shingle_n=2,
    )
    push, _, _, _ = incremental_dedup_indexed(
        batch, h_disk, b, a, "doc_id", "text", num_perm=16, bands=8, shingle_n=2,
        hash_pushdown=True,
    )
    assert sorted(r["doc_id"] for r in push.collect()) == sorted(
        r["doc_id"] for r in base.collect()
    )

    # plan-level: the same filter shape lands in PushedFilters
    hs = [r["h"] for r in batch.selectExpr("md5(text) as h").distinct().collect()]
    filtered = h_disk.where(F.col("__h").isin(hs))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(__h" in plan, plan[:4000]
