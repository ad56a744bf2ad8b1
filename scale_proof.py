"""Scale proof-point: headline queries at sf0.01 / sf0.1 / sf1 (10×).

Purpose (VERDICT r2 #4 / r3 #4): demonstrate how per-query wall-clock
grows with data volume on local[32]. The reference's BASELINE.md anchors
are millisecond-scale single-process numbers on tiny data; Spark carries
a fixed ~0.3-0.9 s per-action floor (job scheduling, codegen dispatch,
stage barriers) that is *invariant in data volume*. If query time is
flat or strongly sublinear across a 100× SF sweep, the floor — not the
per-row work — dominates at bench scale, and the floor amortizes to
nothing at the 100 TB design point.

sf1 is derived deterministically from sf0.1 (the driver ships no larger
SF): every fact table is unioned as 10 copies with all entity keys
shifted by copy_index * 10_000_000, preserving join fan-out and key
cardinality ratios while multiplying volume 10×. Document texts get a
per-copy suffix token so text operators see distinct content; dimension
tables (region, nation) stay fixed, as they would at any SF. Written as
32-partition parquet so scans parallelize (the sf0.1 single-row-group
files do not).

Usage:
    python scale_proof.py             # builds .scale/sf1 if missing
    python scale_proof.py --rebuild   # force-rebuild sf1
    python scale_proof.py --min3      # adjudication protocol: 3
        sequential fresh-JVM runs on a quiet box, min per (query, sf)
        cell, per-run totals + protocol embedded in the JSON — the
        same protocol as BENCH_r08_min3.json (the r8 adjudication
        showed a single noisy run inflates EVERY row 1.3-6x, so
        cross-run minima are the only attributable signal)

Prints per-SF timings as a markdown table + one JSON line; results are
recorded in BASELINE.md ("Scale proof" section).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

OFF = 10_000_000
COPIES = 10
SF1_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1")

# (table, {col: kind}) — kind "key" gets the copy offset, "text" gets a
# distinguishing suffix; everything else is carried through unchanged.
SCALED = {
    "customer": {"c_custkey": "key"},
    "supplier": {"s_suppkey": "key"},
    "part": {"p_partkey": "key"},
    "orders": {"o_orderkey": "key", "o_custkey": "key"},
    "lineitem": {"l_orderkey": "key", "l_partkey": "key", "l_suppkey": "key"},
    "events": {"event_id": "key", "user_id": "key"},
    "documents": {"doc_id": "key", "text": "text"},
    "embeddings": {"vec_id": "key"},
}
PASSTHROUGH = ("region", "nation")

QUERIES = [
    # relational core — data volume scales 10× per step
    "scan_filter",
    "join_two_way",
    "threeway_join_arith",
    "agg_pricing_summary",
    "topk_per_group",
    "antijoin",
    # subplan sharing (CSE): two rules over one persisted customer⋈nation
    # view — the shared-view build is the scaling part, the second
    # consumer rides the InMemoryRelation at every SF
    "shared_subplan",
    # recursion (VERDICT r4 Missing #1: the sweep must cover the
    # reference's headline). The graphs derive from orders, so edge
    # count grows with SF; transitive_closure_large exceeds the 100k
    # driver-local cap at sf0.1 and sf1 — those rows time the
    # DISTRIBUTED doubling loop on ≥1M-pair closures.
    "transitive_closure",
    "transitive_closure_large",
    "reach_bound_large",
    "shortest_path",
    # general (non-doubling) recursion: same-generation on the
    # SF-stepped tree (511/1023/2047 nodes -> 87k/349k/1.4M sg
    # pairs), forced onto the distributed general semi-naive
    # loop (VERDICT r5 Missing #3)
    "same_generation",
    # global-order ops: the two-phase distributed prefix scan must
    # scale linearly with rows, never collapse to one partition —
    # packing lays chunks end-to-end, shuffle ranks the whole corpus
    "pack_sequences",
    "global_shuffle",
    # temporal / text — events & documents scale too
    "time_decay_sum",
    "doc_fingerprint",
    "quality_lang",
    "exact_dedup",
    "minhash_lsh",
    # vector: brute force grows linearly with the corpus, the pruned
    # paths should stay flat — the contrast is the point
    "knn_cosine",
    "knn_lsh",
    "knn_lsh_selective",
    "hnsw_knn",
    "ivf_knn",
    # round-7 curation operators (VERDICT r7 #5): plan audits say
    # scale-safe — one key shuffle (asof, sessionize), md5-key shuffle
    # + broadcast-anti blocklist (dedup_lines), |groups|-row collect
    # (rebalance), pure hash expressions (splits) — measure it
    "asof_join",
    "sessionize",
    "dedup_lines",
    "rebalance_mixture",
    "train_val_test_split",
    # deterministic k-means: per-round narrow scan + k*dim-row agg —
    # time should track the scan, never a shuffle of the corpus
    "topic_clusters",
    # text-aggregation family (round 9): vocabulary is one explode +
    # token hash-agg; tfidf is the r8 weak-item fix — the dfreq side
    # now rides the token-key shuffle join instead of a forced
    # broadcast, so its growth curve is the proof the fix holds at
    # 100x (the broadcast would have collected the distinct-token
    # table to the driver)
    "vocabulary",
    "tfidf",
    "lm_score",
    # planted-skew twin: 'zq' appended at ~25% of corpus token mass —
    # the stopword-skew shape of real web text on the token-keyed
    # shuffles; partial aggregation absorbs the agg side and AQE
    # skew-split rebalances the join side, so growth should stay in
    # lm_score's linear-work class (VERDICT r10 stretch #8)
    "lm_score_skewed",
    "source_filter",
    # round-10 wave: substring_dedup's window-hash shuffle should be
    # token-volume-bound linear (vocabulary's class); dsir_weights is
    # two bucket aggregates + a B-row broadcast (flat join cost);
    # bm25_search prunes to |q|-term postings at the explode (the
    # IN-filter is the scale story); semantic_dedup's pair join is
    # cluster-key-confined (k fixed here, so the densest-cluster
    # product grows — at 100 TB k scales with n, see the docstring)
    "substring_dedup",
    "dsir_weights",
    "bm25_search",
    "semantic_dedup",
    # cross-snapshot dedup (VERDICT r10 #2: bench+correctness rows but
    # no 100x evidence until now): exact stage is an md5-key anti-join,
    # near stage rides the minhash_lsh banding self-join — with the
    # corpus-sized tags broadcast now cap-guarded, growth should sit in
    # minhash_lsh's class
    "incremental_dedup",
    # gopher_quality is a single corpus scan (should track scan time);
    # bpe_merges' round cost is vocabulary-bound — distinct words grow
    # sublinearly in the corpus, and the suffixed sf1 copies add ~10
    # new word types per original, so rounds stay cheap
    "gopher_quality",
    "bpe_merges",
    # round-10 second wave: gopher_repetition and c4_clean are
    # Exchange-free per-doc array passes (cost bounded by doc length x
    # doc count — scan-class growth expected); normalize_text adds the
    # Arrow transfer of the corpus through the NFC pandas_udf — its
    # growth curve measures the Python-kernel tax at volume
    "gopher_repetition",
    "normalize_text",
    "c4_clean",
    # the trilogy composition: normalize's Arrow pass + c4/gopher
    # filters + one md5-key shuffle for survivors + a |sources|-row
    # aggregate — growth should track the corpus scan like its stages
    "web_pipeline",
]


def build_sf1(spark) -> None:
    src = "/root/testdata/sf0.1"
    tmp = SF1_DIR + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    copies = spark.range(COPIES).toDF("__c")
    for t, mods in SCALED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        out = df.crossJoin(copies)
        for c, kind in mods.items():
            if kind == "key":
                out = out.withColumn(c, F.col(c) + F.col("__c") * F.lit(OFF))
            elif kind == "text":
                out = out.withColumn(
                    c,
                    F.when(F.col("__c") == 0, F.col(c)).otherwise(
                        F.concat(F.col(c), F.lit(" v"), F.col("__c").cast("string"))
                    ),
                )
        out.drop("__c").repartition(32).write.mode("overwrite").parquet(
            f"{tmp}/{t}.parquet"
        )
    for t in PASSTHROUGH:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{tmp}/{t}.parquet")
    shutil.rmtree(SF1_DIR, ignore_errors=True)
    os.replace(tmp, SF1_DIR)


def min3_orchestrate() -> None:
    """Run the sweep three times in fresh sequential JVMs (quiet-box
    protocol), take the min per (query, sf) cell, embed the per-run
    results so outliers stay attributable."""
    import subprocess

    out_path = os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALE_min3.json")
    runs = []
    for i in range(3):
        run_out = f"{out_path}.run{i + 1}"
        env = dict(os.environ, SPARK_GRAFT_SCALE_OUT=run_out)
        argv = [sys.executable, os.path.abspath(__file__)]
        if "--rebuild" in sys.argv and i == 0:
            argv.append("--rebuild")
        print(f"# min3 pass {i + 1}/3 ...", file=sys.stderr)
        subprocess.run(argv, check=True, env=env)
        with open(run_out) as fh:
            runs.append(json.load(fh))
        os.remove(run_out)
    names = list(runs[0]["results"])
    labels = list(runs[0]["results"][names[0]])
    results = {
        name: {
            lbl: min(r["results"][name][lbl] for r in runs)
            for lbl in labels
        }
        for name in names
    }
    payload = {
        "metric": "scale_proof_min3",
        "unit": "sec",
        "protocol": (
            "3 sequential fresh-JVM runs on a quiet box; min per "
            "(query, sf) cell; per-run totals embedded (same protocol "
            "as BENCH_r08_min3.json)"
        ),
        "results": results,
        "rows": runs[0]["rows"],
        "growth_100x": {
            name: round(
                results[name][labels[-1]] / max(results[name][labels[0]], 1e-9),
                2,
            )
            for name in names
        },
        "per_run_totals": [
            round(sum(sum(r["results"][n].values()) for n in names), 2)
            for r in runs
        ],
        "per_run_results": [r["results"] for r in runs],
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload[k] for k in
                      ("metric", "growth_100x", "per_run_totals")}))


def main() -> None:
    from inputlayer_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("scale-proof")
    spark.sparkContext.setLogLevel("ERROR")

    if "--rebuild" in sys.argv:
        shutil.rmtree(SF1_DIR, ignore_errors=True)
    if not os.path.isdir(SF1_DIR):
        print("# building sf1 (10x of sf0.1) ...", file=sys.stderr)
        t0 = time.perf_counter()
        build_sf1(spark)
        print(f"# built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    sf_dirs = [
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", "/root/testdata/sf0.1"),
        ("1 (10x derived)", SF1_DIR),
    ]
    qs = entry.queries()
    # same protocol as bench.py: JIT-warm the heavy codegen once, build
    # index artifacts outside the timed region, min-of-2 per query
    qs["minhash_lsh"](spark, "/root/testdata/sf0.001").count()

    # SPARK_GRAFT_SCALE_ONLY="a,b": sweep a subset (e.g. newly added
    # rows) — merge into the full artifact with merge-by-hand or jq
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    queries = [q for q in QUERIES if q in only.split(",")] if only else QUERIES

    results: dict[str, dict[str, float]] = {name: {} for name in queries}
    rows_seen: dict[str, dict[str, int]] = {name: {} for name in queries}
    for label, d in sf_dirs:
        entry.warmup(spark, d)
        for name in queries:
            fn = qs[name]
            best, n = None, 0
            for _ in range(2):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            results[name][label] = round(best, 3)
            rows_seen[name][label] = n
            print(f"# sf{label} {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    labels = [lbl for lbl, _ in sf_dirs]
    print("| query | " + " | ".join(f"sf{lbl}" for lbl in labels) + " | 100× growth |")
    print("|---|" + "---|" * (len(labels) + 1))
    for name in queries:
        r = results[name]
        growth = r[labels[-1]] / max(r[labels[0]], 1e-9)
        print(
            f"| {name} | "
            + " | ".join(f"{r[lbl]:.2f}s" for lbl in labels)
            + f" | {growth:.1f}× |"
        )
    payload = {
        "metric": "scale_proof",
        "unit": "sec",
        "results": results,
        "rows": rows_seen,
        "growth_100x": {
            name: round(
                results[name][labels[-1]] / max(results[name][labels[0]], 1e-9), 2
            )
            for name in queries
        },
    }
    print(json.dumps(payload))
    # machine-diffable artifact (VERDICT r4 #7): growth factors persist
    # per round so the next round diffs JSON, not prose
    out_path = os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALE_r06.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    if "--min3" in sys.argv:
        min3_orchestrate()
    else:
        main()
