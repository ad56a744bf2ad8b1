"""SKEW_r12 experiment: force the shuffle-join fallback under planted
token skew and measure whether AQE's skew-split actually balances it.

Context (VERDICT r11 #3): `lm_score_skewed` plants a hot token ('zq')
carrying ~25% of the corpus's token mass, but at tested scales AQE
stat-broadcasts both token-count tables — no shuffle join exists for
the hot key to skew, so the r11 row measured explode volume, not the
mitigation. The claimed mitigation at true web scale (where the bigram
table CANNOT broadcast) is: the joins compile to sort-merge, and
`spark.sql.adaptive.skewJoin` splits the hot partition. This probe
forces that world with `spark.sql.autoBroadcastJoinThreshold=-1`
(disabling both plan-time and AQE runtime broadcasts) and runs the
skewed pipeline twice in fresh JVMs:

  - skew_split_on   — adaptive.skewJoin.enabled=true  (the default)
  - skew_split_off  — adaptive.skewJoin.enabled=false (the straggler
                      world the mitigation must beat)

Evidence captured per config, from the final adaptive plan and the
Spark REST API's per-stage task summaries:

  - the executed plan carries SortMergeJoin (the fallback really
    compiled to a shuffle join; no broadcast anywhere),
  - with skew-split ON the plan's AQEShuffleRead nodes show skew
    handling and the worst join stage's max/median task runtime stays
    near 1, while OFF shows the hot-partition straggler (max >> median),
  - wall-clock for the full query.

Writes SKEW_r12.json. Run on a quiet box, nothing else on the JVM.

Usage:
    python skew_fallback_probe.py             # orchestrates both configs
    python skew_fallback_probe.py --child on|off|salted  # (internal) one config
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = 4047


def _rest(app_path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{UI_PORT}/api/v1/{app_path}", timeout=30
    ) as r:
        return json.loads(r.read().decode())


def child(mode: str) -> None:
    skew_on = mode != "off"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from inputlayer_spark.session import _DEFAULTS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName("skew-probe").master(f"local[{cpus}]")
    )
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    builder = (
        builder.config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        # the forced-fallback world: no broadcast at plan time OR from
        # AQE runtime stats — every join shuffles
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if skew_on else "false",
        )
        # make skew-split decisive at this volume (defaults target
        # 256m partitions; the probe's shuffle is tens of MB)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from inputlayer_spark.functions.text import lm_score
    from inputlayer_spark.functions.text import tokens as _tokens

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    txt = F.coalesce(F.col("text"), F.lit(""))
    n_hot = F.floor(F.size(_tokens(txt)) / F.lit(3)).cast("int")
    hot = F.array_join(F.array_repeat(F.lit("zq"), n_hot), " ")
    skewed = docs.select("doc_id", F.concat_ws(" ", txt, hot).alias("text"))

    # mode "salted": the operator-level mitigation — hot_keys= wires
    # operators/skew.salted_join into the C(w1) join (VERDICT r11 #3)
    out = lm_score(
        skewed, "doc_id", "text",
        hot_keys=["zq"] if mode == "salted" else None,
    )
    t0 = time.perf_counter()
    n = out.count()
    wall = time.perf_counter() - t0

    plan = out._jdf.queryExecution().executedPlan().toString()
    app_id = spark.sparkContext.applicationId
    stages = _rest(f"applications/{app_id}/stages?status=complete")
    # the skew-sensitive stages read shuffled token keys: rank by
    # shuffle-read volume and keep the top 5 summaries
    stages.sort(key=lambda s: s.get("shuffleReadBytes", 0), reverse=True)
    worst = []
    for s in stages[:5]:
        sid, att = s["stageId"], s["attemptId"]
        try:
            q = _rest(
                f"applications/{app_id}/stages/{sid}/{att}/taskSummary"
                "?quantiles=0.5,1.0"
            )
        except Exception:
            continue
        med, mx = q["executorRunTime"]
        worst.append(
            {
                "stage": sid,
                "name": s.get("name", "")[:80],
                "tasks": s.get("numCompleteTasks"),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
                "run_ms_median": med,
                "run_ms_max": mx,
                "max_over_median": round(mx / max(med, 1.0), 2),
                "shuffle_read_mb_max_task": round(
                    q["shuffleReadMetrics"]["readBytes"][1] / 2**20, 2
                )
                if "shuffleReadMetrics" in q
                else None,
            }
        )
    payload = {
        "config": {
            "on": "skew_split_on",
            "off": "skew_split_off",
            "salted": "salted_hot_keys",
        }[mode],
        "rows": n,
        "wall_sec": round(wall, 2),
        "sort_merge_join_in_plan": "SortMergeJoin" in plan,
        "broadcast_in_plan": "BroadcastHashJoin" in plan,
        "skew_marker_in_plan": "skew" in plan.lower(),
        "worst_shuffle_stages": worst,
    }
    with open(os.environ["SKEW_PROBE_OUT"], "w") as fh:
        json.dump(payload, fh, indent=1)
    spark.stop()


def orchestrate() -> None:
    import subprocess

    results = []
    for mode in ("on", "off", "salted"):
        out = f"/tmp/skew_probe_{mode}.json"
        env = dict(os.environ, SKEW_PROBE_OUT=out)
        print(f"# skew probe: split {mode} ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode],
            check=True,
            env=env,
        )
        with open(out) as fh:
            results.append(json.load(fh))
    payload = {
        "metric": "skew_fallback_probe",
        "sf_dir": SF_DIR,
        "protocol": (
            "lm_score_skewed pipeline with autoBroadcastJoinThreshold=-1 "
            "(plan-time AND AQE runtime broadcasts disabled) so the "
            "token-count joins compile to sort-merge; fresh JVM per "
            "config; REST taskSummary quantiles for the top shuffle "
            "stages"
        ),
        "configs": {r["config"]: r for r in results},
    }
    with open("SKEW_r12.json", "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({
        c: {
            "wall_sec": r["wall_sec"],
            "smj": r["sort_merge_join_in_plan"],
            "worst_ratio": max(
                (s["max_over_median"] for s in r["worst_shuffle_stages"]),
                default=None,
            ),
        }
        for c, r in payload["configs"].items()
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        orchestrate()
