"""End-to-end training-data curation pipeline over the operator library.

Composes the pipeline a pretraining data team actually runs — every
stage is an operator from `inputlayer_spark.operators` / `functions`,
each individually oracle-checked; this script shows they compose into
one lazy DataFrame program Catalyst optimizes end-to-end:

    raw documents
      → exact dedup (md5 hash-aggregate)
      → boilerplate line removal (corpus-level line dedup)
      → quality scoring + per-language percentile gate
      → near-dup clustering (n-gram Jaccard pairs → connected
        components) keeping one doc per cluster
      → source-mixture rebalancing (deterministic hash sampling)
      → token-window chunking
      → concat-and-split sequence packing (distributed prefix sum)
      → deterministic global shuffle (training order)
      → parquet out, partitioned by pack bucket

Run: python examples/curation_pipeline.py [sf_dir] [out_dir]
(defaults: /root/testdata/sf0.001, /tmp/curated)

At 100 TB every stage keeps its documented shuffle budget: the only
all-pairs work (Jaccard) is shingle-banded, the blocklist and mixture
thresholds broadcast, packing/shuffle use the two-phase scan instead
of a single-partition window.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def curate(spark, sf_dir: str, pack_budget: int = 2048):
    from inputlayer_spark.functions import text as TX
    from inputlayer_spark.operators.dedup import (
        dedup_clusters,
        dedup_lines,
        exact_dedup_by_hash,
        ngram_jaccard_pairs,
    )
    from inputlayer_spark.operators.sampling import (
        chunk_documents,
        filter_above_group_percentile,
        global_shuffle,
        pack_sequences,
        rebalance_to_mixture,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. exact dedup — one md5 hash-aggregate
    docs = exact_dedup_by_hash(docs, "text", "doc_id")

    # 2. corpus-level boilerplate removal (surrogate separator: the
    #    synthetic corpus is single-line; real corpora use "\n")
    cleaned = dedup_lines(docs, "doc_id", "text", sep=" the ", max_doc_freq=50)
    docs = docs.drop("text").join(cleaned, "doc_id")

    # 3. quality gate — keep docs at or above their language's median
    scored = docs.withColumn("quality", TX.quality_score(F.col("text")))
    docs = filter_above_group_percentile(scored, "lang", "quality", 0.5)

    # 4. near-dup clustering — keep the canonical doc per cluster
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
    clusters = dedup_clusters(pairs, docs.select("doc_id"), id_col="doc_id")
    docs = docs.join(
        clusters.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )

    # 5. source-mixture rebalancing toward an even 5-language mix
    docs = rebalance_to_mixture(
        docs, "doc_id", "lang",
        {"en": 0.4, "de": 0.15, "fr": 0.15, "es": 0.15, "zh": 0.15},
        seed=42,
    )

    # 6-8. chunk → pack → deterministic training order
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=128, overlap=0)
    packed = pack_sequences(chunks, "n_tokens", ["doc_id", "chunk_id"], pack_budget)
    return global_shuffle(packed, "chunk", seed=7)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated"
    from inputlayer_spark.session import get_spark

    spark = get_spark("curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out = curate(spark, sf_dir)
    # partition the written corpus by a bounded pack bucket so a
    # trainer can read shards independently
    (
        out.withColumn("pack_bucket", F.col("pack_id") % 16)
        .write.mode("overwrite")
        .partitionBy("pack_bucket")
        .parquet(out_dir)
    )
    n = spark.read.parquet(out_dir).count()
    print(f"curated corpus written: {out_dir} ({n} packed chunks)")


if __name__ == "__main__":
    main()
