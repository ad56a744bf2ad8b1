"""Round-14 measurement: bench.py's stream_recursive_batch /
incr_recursive_* sections replicated with an event log + job
descriptions, so the micro-batch cost can be attributed job by job
(guide §1). Measurement-only; bench.py unchanged."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events-r14s"


def main() -> None:
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from inputlayer_spark.session import _DEFAULTS
    from inputlayer_spark.engine import IQLEngine
    from inputlayer_spark.streaming import IncrementalMaintainer

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    evlog = os.environ.get("R14S_EVLOG", "1") == "1"
    b = SparkSession.builder.appName("profile_r14s").master(f"local[{cpus}]")
    if evlog:
        b = b.config("spark.eventLog.enabled", "true").config(
            "spark.eventLog.dir", EVDIR
        )
    for k, v in _DEFAULTS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    eng2 = IQLEngine(spark)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    edges = (
        orders.select(
            (F.col("o_orderkey") % 1500).cast("long").alias("src"),
            (F.col("o_custkey") % 1500).cast("long").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    eng2.register("edge", edges)
    eng2.execute(
        "+reach(X, Y) <- edge(X, Y)\n+reach(X, Z) <- edge(X, Y), reach(Y, Z)"
    )
    n_pairs = eng2.query("?reach(X, Y)").count()
    print(f"closure={n_pairs}", flush=True)

    # bench.py's incr_recursive_requery section verbatim
    best = None
    for cycle in range(2):
        vals = ", ".join(
            f"({1500 + cycle * 10 + i}, {(i * 7 + cycle) % 1400})"
            for i in range(10)
        )
        t0 = time.perf_counter()
        eng2.execute(f"+edge[{vals}]")
        eng2.query("?reach(X, Y)").count()
        dt = time.perf_counter() - t0
        print(f"requery#{cycle}: {dt:.3f}s", flush=True)
        best = dt if best is None or dt < best else best
    # ... and incr_recursive_retract
    for cycle in range(3):
        t0 = time.perf_counter()
        eng2.execute(f"-edge(3, S) <- edge(3, S), S < {300 * (cycle + 1)}")
        eng2.query("?reach(X, Y)").count()
        print(f"retract#{cycle}: {time.perf_counter()-t0:.3f}s", flush=True)

    schema = T.StructType(
        [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    )
    src_dir = tempfile.mkdtemp(prefix="r14-stream-src-")
    ckpt = tempfile.mkdtemp(prefix="r14-stream-ckpt-")
    try:
        m = IncrementalMaintainer(eng2, "edge", src_dir, schema, ckpt, refresh=False)
        for cycle in range(2):
            batch = spark.createDataFrame(
                [(2000 + cycle * 10 + i, (i * 11 + cycle) % 1400) for i in range(10)],
                schema,
            )
            batch.coalesce(1).write.mode("append").parquet(src_dir)
            spark.sparkContext.setJobDescription(f"r14s:batch#{cycle}")
            t0 = time.perf_counter()
            m.process_available()
            eng2.query("?reach(X, Y)").count()
            print(f"batch#{cycle}: {time.perf_counter()-t0:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    spark.stop()
    if not evlog:
        return
    path = os.path.join(EVDIR, app_id)
    if not os.path.isfile(path):
        import glob

        cands = glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
        path = cands[0] if cands else path
    jobs: dict = {}
    starts: dict = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except Exception:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                starts[ev["Job ID"]] = (
                    ev.get("Properties", {}).get("spark.job.description", ""),
                    ev["Submission Time"],
                )
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in starts:
                    desc, t0j = starts[jid]
                    jobs.setdefault(desc, []).append(
                        (jid, (ev["Completion Time"] - t0j) / 1000.0)
                    )
    for desc, js in sorted(jobs.items()):
        if not desc.startswith("r14s:"):
            continue
        total = sum(d for _, d in js)
        print(f"\n{desc}: {len(js)} jobs, sum={total:.2f}s")
        for jid, d in sorted(js, key=lambda x: -x[1])[:16]:
            print(f"  job {jid}: {d:.3f}s")


if __name__ == "__main__":
    main()
