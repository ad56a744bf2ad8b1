"""Deterministic k-means topic clustering over embedding columns.

A large-scale curation pipeline clusters its corpus to balance topics
(downsample over-represented clusters, surface under-represented
ones) — the clustering twin of `rebalance_to_mixture`. This is
Lloyd's algorithm made fully deterministic so an independent engine
can reproduce it bit-for-bit:

- init: the vectors of the `k` smallest ids (no RNG),
- assignment: argmin SQUARED euclidean distance, ties to the lowest
  centroid index,
- update: per-dimension mean over each cluster; an emptied cluster
  keeps its previous centroid,
- a FIXED number of assignment rounds (no convergence test — the
  round count is part of the contract).

Scale shape: each round is one narrow map over the corpus (distances
against k broadcast-literal centroids — k*dim doubles, no join) plus
one aggregation whose output is k*dim rows collected to the driver
(k=8, dim=64 → 512 rows; independent of corpus size). At 100 TB the
corpus is never shuffled — only scanned once per round — and the
centroid state that crosses the driver is kilobytes.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dists_expr(vec_col: str, centroids: List[List[float]]):
    """array of squared euclidean distances between an array<float>
    column and each literal centroid, accumulated in double (same
    promotion the SQL oracle applies with ::DOUBLE) — built as ONE
    F.expr (r13): the per-centroid zip_with/aggregate lambda form cost
    ~3 higher-order py4j constructions × k centroids × assign rounds
    (~120 for semantic_dedup's k≈20 — seconds of build time per query).
    repr(float) literals round-trip exactly, so the arithmetic is
    bit-identical to the F.lit form.

    (a-b)*(a-b), NOT power(a-b, 2): POWER lowers to Math.pow (1-ulp
    guarantee only) while the SQL oracle multiplies — self-multiply
    keeps the arithmetic bit-identical across engines.
    NOTE: a positionally-unrolled getItem sum was measured here and
    REVERTED — 512-term expression trees per centroid push analyzer/
    optimizer time far past what the interpreted fold costs
    (kmeans k=8 sf0.1: 3.5 s fold vs 12.4 s unrolled)."""
    per_c = []
    for c in centroids:
        lit = "cast(array(" + ",".join(repr(float(x)) for x in c) + ") as array<double>)"
        per_c.append(
            f"aggregate(zip_with(`{vec_col}`, {lit},"
            f" (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),"
            f" 0.0D, (acc, x) -> acc + x)"
        )
    return F.expr("array(" + ",".join(per_c) + ")")


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Assign every row to one of `k` clusters after `iters`
    deterministic Lloyd rounds. Returns (id_col, cluster).

    Dirty vectors (NULL, NULL elements, or a length different from the
    corpus dim — the dim of the null-free vector with the smallest id)
    cannot participate: their zip_with distance would be NULL, which
    silently skews array_min assignment, and a NULL element reaching
    the centroid average used to raise TypeError on the next round's
    F.lit(None). They are excluded from seeding and centroid updates
    and come back with a NULL `cluster` so no input row is lost.

    Reference analog: the reference curates corpora with vector
    bucketing (src/vector/ ops + IVF centroid artifacts); this is the
    batch clustering operator a topic-balancing pipeline runs before
    `rebalance_to_mixture`.
    """
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    clean = ~F.exists(F.col(vec_col), lambda x: x.isNull())
    # ONE TakeOrdered action fetches dim AND (in the common
    # homogeneous-corpus case) the seed vectors (r13, guide §1.2): the
    # old shape ran a `.first()` for the corpus dim and a second
    # `.limit(k).collect()` for the seeds — two full TakeOrdered scans.
    # dim = size of the null-free vector with the smallest id = the
    # first collected row; if the first k clean rows all share that
    # dim, they ARE the k smallest valid ids (any clean row with a
    # smaller id is in the prefix), so the seeds come for free. A
    # wrong-dim row inside the prefix is the rare dirty-corpus case —
    # only then does the old dedicated seed scan run.
    head_rows = (
        df.filter(F.col(vec_col).isNotNull() & clean)
        .select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    if not head_rows:
        return df.select(
            F.col(id_col), F.lit(None).cast("int").alias("cluster")
        )
    dim = len(head_rows[0][vec_col])
    valid_pred = (
        F.col(vec_col).isNotNull() & clean & (F.size(F.col(vec_col)) == dim)
    )
    invalid = df.filter(~valid_pred | F.col(vec_col).isNull()).select(
        F.col(id_col), F.lit(None).cast("int").alias("cluster")
    )
    df = df.filter(valid_pred)

    # deterministic init: vectors of the k smallest VALID ids
    if len(head_rows) == k and all(
        len(r[vec_col]) == dim for r in head_rows
    ):
        seed_rows = head_rows
    else:
        seed_rows = (
            df.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(k)
            .collect()
        )
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]

    def assign(frame: DataFrame) -> DataFrame:
        dists = _sq_dists_expr(vec_col, centroids)
        # array_position returns the FIRST index of the min → ties break
        # to the lowest centroid index (the SQL oracle orders by
        # (dist, cid) for the same contract)
        cl = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        return frame.withColumn("cluster", cl)

    for _ in range(iters - 1):
        assigned = assign(df)
        # per-dimension means: k*dim tiny rows cross the driver, the
        # corpus itself is only scanned — posexplode keeps it narrow
        means = (
            assigned.select(
                "cluster", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # emptied cluster keeps old
        by_cluster: dict = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for ci, dims in by_cluster.items():
            # validated input makes every mean non-NULL and every pos
            # present; keep the previous component as a belt-and-braces
            # fallback rather than ever minting F.lit(None)
            new_c[ci] = [
                dims.get(p, centroids[ci][p])
                if dims.get(p) is not None
                else centroids[ci][p]
                for p in range(dim)
            ]
        centroids = new_c

    return assign(df).select(F.col(id_col), F.col("cluster")).unionByName(
        invalid
    )


def cluster_sizes(
    df: DataFrame, id_col: str, vec_col: str, k: int = 4, iters: int = 2
) -> DataFrame:
    """Cluster cardinality histogram — the input a topic-balancing
    policy consumes. Returns (cluster, n)."""
    return (
        kmeans_assign(df, id_col, vec_col, k, iters)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
