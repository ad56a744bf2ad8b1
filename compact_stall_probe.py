"""COMPACT_STALL_r13: measure the inline auto-compaction stall.

VERDICT r12 #6: `auto_compact_every` runs the full three-artifact index
fold inside `_on_batch`'s critical section, so the unlucky micro-batch's
latency includes the whole compaction. This probe measures that stall at
a realistic local index size (the sf0.1 corpus: ~60k docs, ~8M band
rows — the same artifact scale the SCALE sweeps use), plus the per-batch
cost around it, so the `compact_async=` default and the docstring budget
rest on a number instead of an adjective.

Protocol: fresh JVM; corpus = sf0.1 documents; build the deduper's base
index (untimed create-time work); run three direct batches (~50 docs,
ids 0/1/2) with a hand-written commits ledger marking 0/1 committed;
time (a) a plain accepted batch, (b) `compact_index()` +
`compact_survivors()` — exactly what the inline hook pays inside the
triggering batch. Writes COMPACT_STALL_r13.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

WORK = "/tmp/compact_stall_probe"


def main() -> None:
    from inputlayer_spark.session import get_spark
    from inputlayer_spark.streaming import StreamingCorpusDeduper

    spark = get_spark("compact-stall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(f"{WORK}/ckpt/commits")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    docs.write.parquet(f"{WORK}/corpus")

    DOC = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    d = StreamingCorpusDeduper(
        spark, "doc_id", "text", f"{WORK}/corpus", f"{WORK}/in", DOC,
        f"{WORK}/ckpt", f"{WORK}/surv", num_perm=64, bands=16, shingle_n=2,
    )

    def batch(i: int):
        return (
            docs.filter(f"doc_id % 1000 = {i}")
            .select(
                (F.col("doc_id") + 1_000_000_000 * (i + 1)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" probe{i}tok")).alias("text"),
            )
            .localCheckpoint(eager=True)
        )

    t0 = time.perf_counter()
    d._ensure_index()
    t_build = time.perf_counter() - t0

    timings = {}
    for i in range(3):
        b = batch(i)
        t0 = time.perf_counter()
        d._on_batch(b, i)
        timings[f"batch_{i}"] = round(time.perf_counter() - t0, 3)
        if i < 2:  # batches 0 and 1 commit; batch 2 stays uncommitted
            with open(f"{WORK}/ckpt/commits/{i}", "w") as fh:
                fh.write("v1")

    t0 = time.perf_counter()
    folded_idx = d.compact_index()
    t_idx = time.perf_counter() - t0
    t0 = time.perf_counter()
    folded_surv = d.compact_survivors()
    t_surv = time.perf_counter() - t0

    payload = {
        "metric": "compact_stall",
        "unit": "sec",
        "corpus": "sf0.1 documents (~60k docs, ~8M-row band artifact)",
        "index_build_create_time": round(t_build, 3),
        "per_batch": timings,
        "inline_stall": {
            "compact_index": round(t_idx, 3),
            "compact_survivors": round(t_surv, 3),
            "total": round(t_idx + t_surv, 3),
            "folded_index_partitions": folded_idx,
            "folded_survivor_partitions": folded_surv,
        },
        "note": (
            "the inline auto_compact hook pays inline_stall.total INSIDE "
            "the triggering batch's foreachBatch critical section; "
            "compact_async=True moves it to a between-batch daemon thread "
            "holding the same lock"
        ),
    }
    out = os.environ.get("SPARK_GRAFT_STALL_OUT", "COMPACT_STALL_r13.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["inline_stall"]))


if __name__ == "__main__":
    main()
