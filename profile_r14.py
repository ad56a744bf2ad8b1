"""Round-14 measurement harness (guide §1: measure first).

Profiles individual bench queries OUTSIDE bench.py so optimization work
can attribute time before touching code:

  python profile_r14.py time q1 q2 ...     # min-of-N count() timing, per-pass
  python profile_r14.py jobs q1 q2 ...     # single pass + per-job wall-clock
                                           # breakdown from the event log
  python profile_r14.py explain q1 ...     # dump .explain('formatted') to
                                           # plans/r14/<q>_<tag>.txt
  python profile_r14.py noop q1 ...        # time with the noop sink instead
                                           # of count() (guide §1.4)

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
R14_TAG (explain file suffix, default "before"), R14_PASSES (default 3).

This is a measurement tool only — bench.py's methodology is unchanged.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events-r14"


def get_session(event_log: bool):
    os.makedirs(EVDIR, exist_ok=True)
    # session defaults come from inputlayer_spark.session; the event log
    # is the only extra knob, and only for the `jobs` mode
    if event_log:
        from pyspark.sql import SparkSession

        from inputlayer_spark.session import _DEFAULTS

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        b = (
            SparkSession.builder.appName("profile_r14")
            .master(f"local[{cpus}]")
            .config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", EVDIR)
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
        for k, v in _DEFAULTS.items():
            b = b.config(k, v)
        return b.getOrCreate()
    from inputlayer_spark.session import get_spark

    return get_spark("profile_r14")


def warm(spark, entry, names):
    for t in (
        "nation", "customer", "orders", "lineitem",
        "events", "documents", "embeddings",
    ):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    entry.warmup(spark, SF_DIR)
    os.environ["SPARK_GRAFT_TC_ANCHOR_WARM"] = "1"
    try:
        qs = entry.queries()
        for name in names:
            qs[name](spark, "/root/testdata/sf0.001").count()
    finally:
        os.environ.pop("SPARK_GRAFT_TC_ANCHOR_WARM", None)


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]

    import __spark_entry__ as entry

    spark = get_session(event_log=(mode == "jobs"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    warm(spark, entry, names)

    if mode in ("time", "noop"):
        passes = int(os.environ.get("R14_PASSES", "3"))
        for name in names:
            best, times = None, []
            for _ in range(passes):
                t0 = time.perf_counter()
                df = qs[name](spark, SF_DIR)
                if mode == "noop":
                    df.write.format("noop").mode("overwrite").save()
                    n = -1
                else:
                    n = df.count()
                dt = time.perf_counter() - t0
                times.append(round(dt, 3))
                best = dt if best is None or dt < best else best
            print(f"{name}: min={best:.3f}s passes={times} rows={n}")
    elif mode == "build":
        # Construction-only timing: how long does building the DataFrame
        # (py4j round-trips, plan assembly) take, with no action run.
        # Separates driver-side query-construction cost (guide §5/§7.3)
        # from execution. Round-trip count comes from cProfile over the
        # py4j send_command primitive.
        import cProfile
        import pstats

        passes = int(os.environ.get("R14_PASSES", "3"))
        for name in names:
            best, times = None, []
            for _ in range(passes):
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR)
                dt = time.perf_counter() - t0
                times.append(round(dt, 3))
                best = dt if best is None or dt < best else best
            pr = cProfile.Profile()
            pr.enable()
            qs[name](spark, SF_DIR)
            pr.disable()
            st = pstats.Stats(pr)
            rt = 0
            for (fn, _ln, func), (_cc, nc, _tt, _ct, _callers) in st.stats.items():
                if "java_gateway" in fn and func == "send_command":
                    rt += nc
            print(f"{name}: build min={best:.3f}s passes={times} py4j_round_trips={rt}")
    elif mode == "explain":
        tag = os.environ.get("R14_TAG", "before")
        os.makedirs("plans/r14", exist_ok=True)
        for name in names:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r14/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
    elif mode == "jobs":
        app_id = spark.sparkContext.applicationId
        for name in names:
            # two passes, labelled separately: pass 2 is the steady
            # state bench.py's min-of-2 actually measures
            for p in (1, 2):
                spark.sparkContext.setJobDescription(f"r14:{name}#{p}")
                t0 = time.perf_counter()
                n = qs[name](spark, SF_DIR).count()
                dt = time.perf_counter() - t0
                print(f"{name}#{p}: {dt:.3f}s rows={n}", flush=True)
        spark.sparkContext.setJobDescription(None)
        spark.stop()
        # parse the event log: per-job wall clock grouped by description
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
                    desc = ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    )
                    starts[ev["Job ID"]] = (desc, ev["Submission Time"])
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in starts:
                        desc, t0j = starts[jid]
                        jobs.setdefault(desc, []).append(
                            (jid, (ev["Completion Time"] - t0j) / 1000.0)
                        )
        for desc, js in jobs.items():
            if not desc.startswith("r14:"):
                continue
            total = sum(d for _, d in js)
            top = sorted(js, key=lambda x: -x[1])[:12]
            print(f"\n{desc}: {len(js)} jobs, sum={total:.2f}s")
            for jid, d in top:
                print(f"  job {jid}: {d:.3f}s")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
