"""Similarity search over embedding columns.

Brute-force exact top-k is the correctness baseline (what the reference
does for non-indexed relations, src/lib.rs:1374 resolve path); the
LSH-bucketed and IVF variants are the scale paths: both turn "compare
against everything" into "compare within a bucket/cluster", so the
shuffle is keyed on short bucket ids and the per-task working set is a
partition of the corpus, not the corpus.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inputlayer_spark.functions import vector as V


def _dist(metric: str, a, b):
    return {
        "cosine": V.cosine,
        "euclidean": V.euclidean,
        "l2": V.euclidean,
        "manhattan": V.manhattan,
        "dot": lambda x, y: -V.dot(x, y),  # max dot == min negative dot
    }[metric](a, b)


def knn_bruteforce(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k nearest neighbors to a literal query vector.

    Single scan + TakeOrderedAndProject (Spark turns orderBy+limit into a
    per-partition top-k then a driver merge — no full sort at scale).
    Output: id, dist.
    """
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<float>")
    return (
        df.select(
            F.col(id_col).alias("id"),
            _dist(metric, F.col(vec_col), q).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(k)
    )


def knn_join_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int = 10,
    metric: str = "cosine",
) -> DataFrame:
    """Exact k-NN join: for every query row, its k nearest corpus rows.

    Broadcast the smaller side (queries) so the corpus scan stays
    partition-local; rank with a window per query id.
    Output: qid, id, dist, rank.
    """
    q = queries.select(F.col(query_id).alias("qid"), F.col(query_vec).alias("qv"))
    c = corpus.select(F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("cv"))
    joined = c.crossJoin(F.broadcast(q)).withColumn(
        "dist", _dist(metric, F.col("cv"), F.col("qv"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "id", "dist", "rank")
    )


def knn_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "cosine",
    num_bits: int = 12,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k via multi-table sign-hash LSH with exact rerank.

    Candidates = rows sharing the query's bucket in ANY table (union of
    per-table bucket filters — a partition-prunable predicate when the
    corpus is written bucketed/partitioned by bucket id); then exact
    distance on candidates only. Falls back to fewer than k results when
    recall misses — callers wanting guarantees use knn_bruteforce.
    Output: id, dist.
    """
    import numpy as np

    qarr = [float(x) for x in query]
    qcol = F.array(*[F.lit(x) for x in qarr]).cast("array<float>")

    # query-side bucket per table, computed once driver-side with the same
    # deterministic plane family as functions.vector.lsh_bucket
    cand_filter = None
    for t in range(num_tables):
        bucket_col = V.lsh_bucket(F.col(vec_col), t, num_bits)
        qdf_val = _query_bucket(qarr, t, num_bits)
        cond = bucket_col == F.lit(qdf_val)
        cand_filter = cond if cand_filter is None else (cand_filter | cond)

    return (
        df.filter(cand_filter)
        .select(F.col(id_col).alias("id"), _dist(metric, F.col(vec_col), qcol).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(k)
    )


def _query_bucket(vec, table: int, num_bits: int) -> int:
    """Driver-side replica of functions.vector.lsh_bucket for a literal
    query vector: same xxhash64-derived hyperplane coefficients."""
    import pandas as pd  # noqa: F401  (ensures pandas present for consistency)

    # xxhash64(seed=42 default in Spark) of (table, bit, j) — reproduce via
    # a tiny Spark-free implementation is error-prone; instead compute with
    # Spark itself lazily: callers pass literal vectors rarely (per query),
    # so one tiny local job is fine.
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    row = (
        spark.range(1)
        .select(
            V.lsh_bucket(
                F.array(*[F.lit(float(x)) for x in vec]).cast("array<float>"), table, num_bits
            ).alias("b")
        )
        .collect()[0]
    )
    return int(row["b"])


def ivf_knn(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "cosine",
    partition_col: str = None,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: restrict the scan to the n_probe coarse cells
    nearest to the query, then exact-rank within them.

    Cells come from `partition_col` (a precomputed cluster/label column —
    at scale the corpus is *written* partitioned by it, so the probe is
    partition pruning, not a filter). Centroids are computed as cell
    means on the fly; production would precompute them.
    Output: id, dist.
    """
    q = F.array(*[F.lit(float(x)) for x in query]).cast("array<float>")
    cents = (
        centroids(df, partition_col, vec_col)
        .withColumn("cdist", _dist(metric, F.col("centroid"), q))
        .orderBy(F.col("cdist").asc())
        .limit(n_probe)
        .select("cell")
    )
    probed = df.join(
        F.broadcast(cents), on=df[partition_col] == cents["cell"], how="inner"
    )
    return (
        probed.select(F.col(id_col).alias("id"), _dist(metric, F.col(vec_col), q).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(k)
    )


def centroids(df: DataFrame, cell_col: str, vec_col: str) -> DataFrame:
    """Per-cell element-wise mean vector. Shuffles (cell, pos, val) —
    proportional to data, aggregated map-side first."""
    exploded = df.select(F.col(cell_col).alias("cell"), F.posexplode(F.col(vec_col)))
    agg = exploded.groupBy("cell", "pos").agg(F.avg("col").alias("m"))
    return (
        agg.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"].cast("float")).alias("centroid"))
    )
