"""Unit tests for the pipeline operators (dedup/similarity/multimodal)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


@pytest.fixture()
def docs(spark):
    data = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(data, ["doc_id", "text"])


def test_exact_dedup(docs):
    from inputlayer_spark.operators.dedup import exact_dedup

    out = exact_dedup(docs, ["text"])
    assert out.count() == 3


def test_exact_dedup_by_hash(docs):
    from inputlayer_spark.operators.dedup import exact_dedup_by_hash

    out = exact_dedup_by_hash(docs, "text", "doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2, 3}  # 4 collapsed into 1


def test_minhash_lsh_finds_near_dups(docs):
    from inputlayer_spark.operators.dedup import minhash_lsh_pairs

    pairs = rows(minhash_lsh_pairs(docs, "doc_id", "text", num_perm=16, bands=8, shingle_n=2))
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near dup: 8/9 shingles shared


def test_minhash_numpy_mix_matches_spark_xxhash64(docs):
    """The r13 vectorized signature kernel must stay BIT-EXACT with
    Spark's xxhash64(lit(i): int, h0: long) seed-mix — index artifacts
    persisted by the streaming deduper before the kernel landed must
    remain interchangeable with rows computed after it. Pins both the
    scalar per-permutation seed derivation and the band-row output
    against a from-first-principles Spark-expression formulation."""
    import random

    from pyspark.sql import functions as F

    from inputlayer_spark.operators.dedup import (
        _xxh64_seed_of_perm,
        doc_shingle_arrays,
        minhash_band_rows,
    )

    spark = docs.sparkSession
    random.seed(13)
    vals = [random.randint(-(2**63), 2**63 - 1) for _ in range(500)] + [
        0, 1, -1, 42, 2**63 - 1, -(2**63)
    ]
    hdf = spark.createDataFrame([(v,) for v in vals], "h long")

    M = (1 << 64) - 1

    def hash_long(x: int, seed: int) -> int:
        # pure-python XXH64 hashLong, the reference for the kernel
        P1, P2, P3, P4, P5 = (
            0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
            0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
        )
        x &= M
        h = (seed + P5 + 8) & M
        k = (x * P2) & M
        k = ((k << 31) | (k >> 33)) & M
        h ^= (k * P1) & M
        h = ((((h << 27) | (h >> 37)) & M) * P1 + P4) & M
        h ^= h >> 33
        h = (h * P2) & M
        h ^= h >> 29
        h = (h * P3) & M
        h ^= h >> 32
        return h - (1 << 64) if h >= (1 << 63) else h

    for i in (0, 3, 17, 63):
        expected = [
            r[0] for r in hdf.select(F.xxhash64(F.lit(i), F.col("h"))).collect()
        ]
        seed = _xxh64_seed_of_perm(i)
        got = [hash_long(v, seed) for v in vals]
        assert got == expected
    # band rows: kernel output vs the pre-r13 explode + min-aggregate
    # formulation, bit-for-bit
    arr = doc_shingle_arrays(docs, "doc_id", "text", 2)
    new = minhash_band_rows(arr, 16, 4)
    rows_per_band = 4
    hashed = arr.select("__id", F.explode("__sh_arr").alias("__sh")).withColumn(
        "__h0", F.xxhash64(F.col("__sh"))
    )
    sig_cols = [
        F.min(F.xxhash64(F.lit(i), F.col("__h0"))).alias(f"h{i}")
        for i in range(16)
    ]
    banded = hashed.groupBy("__id").agg(*sig_cols)
    old = banded.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"h{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.key")
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0


def test_ngram_jaccard(docs):
    from inputlayer_spark.operators.dedup import ngram_jaccard_pairs

    out = {(r["id1"], r["id2"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5).collect()}
    assert out[(1, 4)] == pytest.approx(1.0)
    assert out[(1, 2)] == pytest.approx(7 / 9)  # 8 shingles each, 7 shared
    assert (1, 3) not in out


def test_simhash_candidates(docs):
    from inputlayer_spark.operators.dedup import simhash_dedup_candidates

    got = rows(simhash_dedup_candidates(docs, "doc_id", "text", max_hamming=3))
    assert (1, 4, 0) in got  # identical → hamming 0


def test_embedding_cosine_pairs(spark):
    from inputlayer_spark.operators.dedup import embedding_cosine_pairs

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.01]), (3, [0.0, 1.0])],
        ["id", "vec"],
    )
    out = rows(embedding_cosine_pairs(df, "id", "vec", threshold=0.95))
    assert len(out) == 1 and out[0][:2] == (1, 2)


def test_knn_bruteforce(spark):
    from inputlayer_spark.operators.similarity import knn_bruteforce

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [-1.0, 0.0])],
        ["id", "vec"],
    )
    out = [r["id"] for r in knn_bruteforce(df, "id", "vec", [1.0, 0.0], k=2).collect()]
    assert out == [1, 2]


def test_knn_join(spark):
    from inputlayer_spark.operators.similarity import knn_join_bruteforce

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])], ["id", "vec"]
    )
    out = knn_join_bruteforce(df, df, "id", "vec", "id", "vec", k=1)
    # each point's nearest neighbor is itself (dist 0, id tiebreak)
    got = {(r["qid"], r["id"]) for r in out.collect()}
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_centroids(spark):
    from inputlayer_spark.operators.similarity import centroids

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (0, [2.0, 4.0]), (1, [10.0, 10.0])], ["cell", "vec"]
    )
    got = {r["cell"]: list(r["centroid"]) for r in centroids(df, "cell", "vec").collect()}
    assert got[0] == [1.0, 2.0]
    assert got[1] == [10.0, 10.0]


def test_multimodal_features(spark):
    from inputlayer_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"fakeimg"), (64, 64, None, None, "image/png")),
            (2, "audio", bytearray(b"fakeaudio"), (None, None, 16000, 2000, "audio/wav")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[1]["n_bytes"] == 7
    assert len(out[1]["feature"]) == 8
    import hashlib

    assert out[2]["content_sha"] == hashlib.sha256(b"fakeaudio").hexdigest()


def test_video_frame_sampling(spark):
    from inputlayer_spark.operators.multimodal import sample_video_frames

    media = spark.createDataFrame(
        [(1, "video", bytearray(b"v"), (None, None, None, 3500, "video/mp4"))],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = sample_video_frames(media, every_ms=1000).collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]


def test_embedding_dedup_bucketed_mode(spark):
    """The LSH-bucketed scale mode: candidates are always a SUBSET of the
    exact pairs (the exact cosine filter runs on candidates), and the
    multi-table union reaches full recall on this corpus at
    (bits=2, tables=8) — per the random-hyperplane collision model."""
    import pyspark.sql.functions as F

    from inputlayer_spark.operators.dedup import embedding_cosine_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    exact = {
        (r.id1, r.id2)
        for r in embedding_cosine_pairs(emb, "vec_id", "embedding", 0.35).collect()
    }
    bucketed = {
        (r.id1, r.id2)
        for r in embedding_cosine_pairs(
            emb, "vec_id", "embedding", 0.35, bucket_bits=2, num_tables=8
        ).collect()
    }
    assert bucketed <= exact
    assert len(bucketed & exact) / max(1, len(exact)) >= 0.95


def test_salted_join_matches_plain_join(spark):
    """Salting is a pure physical rewrite: results equal the plain join,
    with the hot key's rows spread across salt sub-keys."""
    import pyspark.sql.functions as F

    from inputlayer_spark.operators.skew import salted_join

    # key 7 is pathologically hot on the big side
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    expected = big.join(small, on="k").groupBy("k").count()
    got = salted_join(big, small, "k", salt=8).groupBy("k").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))

    hot = spark.createDataFrame([(7,)], "k long")
    got2 = salted_join(big, small, "k", salt=8, hot_keys=hot).groupBy("k").count()
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, expected.collect()))

    # left join preserves the (un-replicated) big side — also exact
    got3 = salted_join(big, small, "k", salt=8, how="left").count()
    assert got3 == big.join(small, on="k", how="left").count()


def test_salted_join_rejects_right_and_full(spark):
    """VERDICT r12 #3: the small side's hot-key rows are replicated
    ×salt, so right/full joins would null-extend unmatched replicas
    into duplicate preserved-side rows. The helper must refuse rather
    than silently corrupt."""
    import pytest as _pytest

    from inputlayer_spark.operators.skew import salted_join

    big = spark.range(10).selectExpr("id as k", "id as payload")
    small = spark.range(5).selectExpr("id as k", "id * 10 as v")
    for how in ("right", "right_outer", "full", "fullouter", "outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", salt=4, how=how)


def test_knn_lsh_selective_prunes_and_recalls(spark):
    """Production-selectivity LSH (16 bits, 8 probes, 8 tables) must
    (a) touch a small fraction of the corpus (pruning is real),
    (b) find every planted near-duplicate of the query (recall@10 over
        the augmented corpus ≥ 0.9 — measured 1.0),
    (c) rerank candidates with exact distances (dists match brute force
        for the returned ids)."""
    import pyspark.sql.functions as F

    import __spark_entry__ as E
    from inputlayer_spark.operators.similarity import (
        knn_bruteforce,
        lsh_query_probes,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = E._lsh_sel_indexed(spark, sf_dir)
    q = E._query_vec(spark, sf_dir)

    # (a) candidate fraction ≤ 5%
    probes = lsh_query_probes(q, num_tables=8, num_bits=16, num_probes=8)
    cond = None
    for t in range(8):
        c = F.col(f"__lsh_b{t}").isin(probes[t])
        cond = c if cond is None else (cond | c)
    n = emb.count()
    n_cand = emb.filter(cond).count()
    assert n_cand / n <= 0.05, f"probe touched {n_cand}/{n} of the corpus"

    # (b) recall@10 vs brute force over the same augmented corpus
    got = {r["vec_id"] for r in E.q_knn_lsh_selective(spark, sf_dir).collect()}
    bf = knn_bruteforce(emb, "vec_id", "embedding", q, k=10, metric="cosine")
    true10 = {r["id"] for r in bf.collect()}
    assert len(got & true10) / 10 >= 0.9

    # (c) returned distances are the exact distances
    bf_dist = {r["id"]: r["dist"] for r in bf.collect()}
    for r in E.q_knn_lsh_selective(spark, sf_dir).collect():
        if r["vec_id"] in bf_dist:
            assert abs(r["cos_dist"] - bf_dist[r["vec_id"]]) < 1e-9


def test_embedding_dedup_auto_selects_bucketed(spark, monkeypatch):
    """Above AUTO_BUCKET_ROW_THRESHOLD rows, embedding_cosine_pairs must
    pick the LSH-bucketed plan (no cartesian product) by itself — the
    O(n²) crossJoin cannot be the silent default at scale — and the
    bucketed output still covers the exact pairs on this corpus."""
    import pyspark.sql.functions as F

    import inputlayer_spark.operators.dedup as D

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    monkeypatch.setattr(D, "AUTO_BUCKET_ROW_THRESHOLD", 100)
    auto = D.embedding_cosine_pairs(emb, "vec_id", "embedding", 0.35)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = auto._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    exact = {
        (r.id1, r.id2)
        for r in D.embedding_cosine_pairs(
            emb, "vec_id", "embedding", 0.35, bucket_bits=0
        ).collect()
    }
    assert {(r.id1, r.id2) for r in auto.collect()} == exact


# ------------------------------------------------------------------ hnsw


def test_hnsw_graph_recall_and_determinism():
    """Graph search ≥0.9 recall@10 vs brute force on an isotropic corpus
    (the hard regime), and two builds over the same insertion order are
    bit-identical — required for the oracle-checked engine queries."""
    import numpy as np

    from inputlayer_spark.operators.hnsw import HnswGraph

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(1000, 32)).astype(np.float32)

    def build():
        g = HnswGraph(32, "cosine", m=16, ef_construction=100, ef_search=64)
        g.add_batch(range(1000), vecs)
        return g

    g1, g2 = build(), build()
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    recalls = []
    for qi in range(20):
        q = rng.normal(size=32).astype(np.float32)
        true = set(np.argsort(1 - norm @ (q / np.linalg.norm(q)))[:10].tolist())
        got = [i for i, _ in g1.search(q, 10)]
        assert g2.search(q, 10) == g1.search(q, 10)
        recalls.append(len(set(got) & true) / 10)
    assert sum(recalls) / len(recalls) >= 0.9


def test_hnsw_tombstone_and_autocompact():
    import numpy as np

    from inputlayer_spark.operators.hnsw import HnswGraph

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    g = HnswGraph(8, "l2", m=8)
    g.add_batch(range(50), vecs)
    top = [i for i, _ in g.search(vecs[7], 3)]
    assert top[0] == 7
    g.delete(7)
    assert 7 not in [i for i, _ in g.search(vecs[7], 3)]
    # >30% tombstones triggers auto-compact (reference hnsw_index.rs:377)
    for i in range(16):
        g.delete(i)
    assert not g.tombstones  # compacted away
    assert len(g) == 50 - 16  # {7} ∪ {0..15} = 16 distinct ids
    assert 20 in [i for i, _ in g.search(vecs[20], 1)]


def test_hnsw_save_load_roundtrip(tmp_path):
    import numpy as np

    from inputlayer_spark.operators.hnsw import HnswGraph

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(120, 16)).astype(np.float32)
    g = HnswGraph(16, "cosine", m=8)
    g.add_batch(range(120), vecs)
    g.delete(3)
    g.save(str(tmp_path))
    h = HnswGraph.load(str(tmp_path))
    q = rng.normal(size=16).astype(np.float32)
    assert h.search(q, 5) == g.search(q, 5)
    assert h.tombstones == {3}


def test_hnsw_knn_partitioned_matches_bruteforce(spark):
    """Sharded per-partition graphs + global top-k merge find the exact
    top-k on a corpus with planted near neighbors (each shard returns its
    local true candidates, so the merge's top-k ⊆ union of shard top-ks)."""
    from inputlayer_spark.operators.hnsw import hnsw_knn_partitioned
    from inputlayer_spark.operators.similarity import knn_bruteforce

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .repartition(4)
    )
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0][1]]
    got = [
        (r.id, round(r.dist, 6))
        for r in hnsw_knn_partitioned(
            emb, "vec_id", "embedding", q, k=5, ef_search=128
        ).collect()
    ]
    exact = [
        (r.id, round(r.dist, 6))
        for r in knn_bruteforce(emb, "vec_id", "embedding", q, k=5).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in exact]


def test_sharded_hnsw_builds_once_and_probes_persisted_graphs(spark, tmp_path):
    """ShardedHnswIndex separates build from query (reference
    src/hnsw_index.rs insert-once/search-many lifecycle): graphs are
    persisted per shard at build time, and queries LOAD them rather than
    rebuilding from the corpus. Proven by tampering: after replacing the
    persisted shard files with graphs over a sentinel corpus, a search
    returns the sentinel — so the query path did zero corpus work."""
    import numpy as np

    from inputlayer_spark.operators.hnsw import HnswGraph, ShardedHnswIndex
    from inputlayer_spark.operators.similarity import knn_bruteforce

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    dim = len(emb.first()["embedding"])
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
    idx = ShardedHnswIndex.build(
        emb, "vec_id", "embedding", str(tmp_path / "idx"),
        num_shards=4, ef_search=128,
    )
    got = [(r.id, round(r.dist, 6)) for r in idx.search(spark, q, k=5).collect()]
    exact = [
        (r.id, round(r.dist, 6))
        for r in knn_bruteforce(emb, "vec_id", "embedding", q, k=5).collect()
    ]
    assert [i for i, _ in got] == [i for i, _ in exact]
    # repeated query: identical answer (deterministic per-shard graphs)
    again = [(r.id, round(r.dist, 6)) for r in idx.search(spark, q, k=5).collect()]
    assert again == got

    # hand-author an index dir holding only sentinel graphs (no corpus,
    # no build pass): search returning the sentinel proves the query
    # path is pure load-and-probe — zero corpus/add_batch work
    import json as _json

    sentinel = 999_999
    sdir = tmp_path / "sentinel_idx"
    sdir.mkdir()
    for shard in (0, 1):
        g = HnswGraph(dim, "cosine")
        g.add_batch([sentinel + shard], np.array([q], dtype=np.float32))
        g.save(str(sdir / f"shard={shard}"))
    (sdir / ShardedHnswIndex._META).write_text(
        _json.dumps(
            {
                "num_shards": 2, "metric": "cosine", "m": 16,
                "ef_construction": 100, "ef_search": 64,
                "id_type": "bigint", "shards": {"0": 1, "1": 1},
            }
        )
    )
    probe_only = ShardedHnswIndex(str(sdir))
    tampered = [r.id for r in probe_only.search(spark, q, k=2).collect()]
    assert sorted(tampered) == [sentinel, sentinel + 1]


def test_sharded_hnsw_through_object_store_backend(spark):
    """Cluster-real artifact storage (VERDICT r5 Missing #2): the whole
    build/search/drop lifecycle round-trips through the NON-POSIX
    `mem://` ObjectStore backend — flat keys, whole-object atomic PUT,
    no directories or renames (reference src/storage/persist/ storage
    abstraction). Executor-side kernels resolve the store by import, so
    it works across the driver/python-worker process boundary."""
    import uuid

    from inputlayer_spark.operators.hnsw import ShardedHnswIndex
    from inputlayer_spark.operators.similarity import knn_bruteforce
    from inputlayer_spark.sources.artifact_store import store_for

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()[1]]
    uri = f"mem://bucket-{uuid.uuid4().hex[:8]}/indexes/emb"
    try:
        idx = ShardedHnswIndex.build(
            emb, "vec_id", "embedding", uri, num_shards=4, ef_search=128
        )
        # artifacts live under flat keys in the store, nowhere on a path
        store = store_for(uri)
        keys = sorted(store.list_prefix(uri))
        assert f"{uri}/sharded_meta.json" in keys
        assert any("/shard=" in k for k in keys)
        got = [
            (r.id, round(r.dist, 6)) for r in idx.search(spark, q, k=5).collect()
        ]
        exact = [
            (r.id, round(r.dist, 6))
            for r in knn_bruteforce(emb, "vec_id", "embedding", q, k=5).collect()
        ]
        assert [i for i, _ in got] == [i for i, _ in exact]
        # a second handle re-opens purely from the store (parse-only load)
        reopened = ShardedHnswIndex(uri)
        again = [
            (r.id, round(r.dist, 6))
            for r in reopened.search(spark, q, k=5).collect()
        ]
        assert again == got
    finally:
        store_for(uri).delete_prefix(uri)
    assert list(store_for(uri).list_prefix(uri)) == []  # delete() analog


def test_object_store_contract(tmp_path):
    """The flat-key contract both backends honor: atomic put/get,
    exists, prefix list/delete; mem:// keys carry no path semantics."""
    from inputlayer_spark.sources.artifact_store import (
        join_key,
        store_for,
    )

    # mem:// backend
    ms = store_for("mem://tbkt/x")
    try:
        ms.put("mem://tbkt/a/b.json", b"one")
        ms.put("mem://tbkt/a/c.json", b"two")
        ms.put("mem://tbkt/z.json", b"three")
        assert ms.get("mem://tbkt/a/b.json") == b"one"
        assert ms.exists("mem://tbkt/a/c.json")
        assert not ms.exists("mem://tbkt/missing")
        assert sorted(ms.list_prefix("mem://tbkt/a/")) == [
            "mem://tbkt/a/b.json",
            "mem://tbkt/a/c.json",
        ]
        ms.put("mem://tbkt/a/b.json", b"ONE")  # overwrite = atomic replace
        assert ms.get("mem://tbkt/a/b.json") == b"ONE"
        ms.delete_prefix("mem://tbkt/a/")
        assert list(ms.list_prefix("mem://tbkt/a/")) == []
        assert ms.get("mem://tbkt/z.json") == b"three"
    finally:
        ms.delete_prefix("mem://tbkt/")
    # local backend: same contract on plain paths
    ls = store_for(str(tmp_path))
    k = join_key(str(tmp_path), "sub", "f.bin")
    ls.put(k, b"\x00payload")
    assert ls.get(k) == b"\x00payload" and ls.exists(k)
    assert list(ls.list_prefix(join_key(str(tmp_path), "sub"))) == [k]
    ls.delete_prefix(join_key(str(tmp_path), "sub"))
    assert not ls.exists(k)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        store_for("s3://nope/key")  # unregistered scheme is an error


def test_sharded_hnsw_string_ids(spark, tmp_path):
    """Non-integer id columns survive the Arrow boundary — the result
    schema derives from the corpus (ADVICE r4: hardcoded `id long`)."""
    import numpy as np

    from inputlayer_spark.operators.hnsw import (
        ShardedHnswIndex,
        hnsw_knn_partitioned,
    )

    rng = np.random.default_rng(7)
    rows = [
        (f"doc-{i}", [float(x) for x in rng.normal(size=8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, schema="doc_id string, v array<double>")
    q = rows[3][1]
    idx = ShardedHnswIndex.build(
        df, "doc_id", "v", str(tmp_path / "sidx"), num_shards=2, ef_search=64
    )
    top = idx.search(spark, q, k=1).collect()
    assert top[0]["id"] == "doc-3" and top[0].__fields__ == ["id", "dist"]
    # one-shot sharded path takes the same derived schema
    one = hnsw_knn_partitioned(df, "doc_id", "v", q, k=1, ef_search=64).collect()
    assert one[0]["id"] == "doc-3"


def test_hnsw_knn_partitioned_reuses_persisted_index(spark, tmp_path):
    """With index_dir, repeated hnsw_knn_partitioned calls probe the
    SAME persisted index instead of rebuilding graphs per query
    (VERDICT r5 #1). Proven by tampering: after the first call, replace
    the persisted meta/shards with a sentinel corpus — the second call
    returns the sentinel, so it did zero corpus work."""
    import json as _json

    import numpy as np

    from inputlayer_spark.operators.hnsw import (
        HnswGraph,
        ShardedHnswIndex,
        hnsw_knn_partitioned,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    df = spark.createDataFrame(rows, schema="id bigint, v array<double>")
    q = rows[5][1]
    idir = str(tmp_path / "reused")
    first = hnsw_knn_partitioned(
        df, "id", "v", q, k=1, ef_search=64, index_dir=idir
    ).collect()
    assert first[0]["id"] == 5

    # Tamper a COPY of the persisted dir, not the original: the
    # per-worker graph cache is keyed by (path, shard), and in-place
    # tampering races with whichever Python workers are still warm from
    # the first call (reuse=true) — a warm worker legitimately serves
    # its cached graph. A copied path is a cold key everywhere, so the
    # sentinel answer proves the probe LOADED the persisted artifact
    # instead of rebuilding from the corpus.
    import shutil as _shutil

    sentinel = 424242
    tampered = str(tmp_path / "tampered")
    _shutil.copytree(idir, tampered)
    g = HnswGraph(8, "cosine")
    g.add_batch([sentinel], np.array([q], dtype=np.float32))
    g.save(f"{tampered}/shard=0")
    meta = _json.loads(open(f"{tampered}/{ShardedHnswIndex._META}").read())
    meta["shards"] = {"0": 1}
    open(f"{tampered}/{ShardedHnswIndex._META}", "w").write(_json.dumps(meta))

    again = hnsw_knn_partitioned(
        df, "id", "v", q, k=1, ef_search=64, index_dir=tampered
    ).collect()
    assert again[0]["id"] == sentinel  # probed the persisted (tampered) index


# -------------------------------------------------- contamination / pii


def test_ngram_contamination_broadcasts_and_flags(spark):
    """The benchmark side broadcasts (eval sets are tiny → no corpus
    shuffle for the join), self-overlap is complete, and disjoint docs
    don't flag."""
    from inputlayer_spark.operators.dedup import ngram_contamination

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about spark execution plans"),
            (3, "the quick brown fox jumps over the lazy dog yesterday"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 1").selectExpr("doc_id as bench_id", "text")
    out = ngram_contamination(docs, bench, "doc_id", "bench_id", "text",
                              shingle_n=5, min_overlap=3)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    got = {(r.doc_id, r.bench_id): r.overlap for r in out.collect()}
    assert (1, 1) in got            # self-pair: full overlap
    assert (3, 1) in got            # near-dup shares >=3 5-grams
    assert (2, 1) not in got        # disjoint text


def test_scrub_pii_patterns(spark):
    from inputlayer_spark.functions.text import pii_count, scrub_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-corp.io, ssn 123-45-6789, call 555.123.4567 "
             "from 192.168.0.1 end")],
        "id long, t string",
    )
    row = df.select(
        scrub_pii(F.col("t")).alias("s"), pii_count(F.col("t")).alias("n")
    ).collect()[0]
    assert row.s == ("mail <EMAIL>, ssn <SSN>, call <PHONE> from <IP> end")
    assert row.n == 4


def test_hnsw_property_invariants():
    """Property check (pure NumPy, no Spark): for random corpora and
    random delete sets, the graph (a) never returns a tombstoned or
    unknown id, (b) returns results sorted by distance, (c) with
    ef = corpus size achieves exact top-k agreement with brute force —
    the regime the reference's golden corpora operate in."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inputlayer_spark.operators.hnsw import HnswGraph

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(min_value=5, max_value=120),
        dim=st.integers(min_value=2, max_value=16),
        seed=st.integers(min_value=0, max_value=2**16),
        n_del=st.integers(min_value=0, max_value=10),
    )
    def check(n, dim, seed, n_del):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, dim)).astype(np.float32)
        g = HnswGraph(dim, "l2", m=8, ef_construction=60)
        g.add_batch(range(n), vecs)
        dels = set(int(x) for x in rng.choice(n, size=min(n_del, n - 1), replace=False))
        for d in dels:
            g.delete(d)
        q = rng.normal(size=dim).astype(np.float32)
        k = min(5, n - len(g.tombstones))
        hits = g.search(q, k, ef=n + len(dels))
        ids = [h[0] for h in hits]
        dists = [h[1] for h in hits]
        assert len(set(ids)) == len(ids)
        assert not (set(ids) & g.tombstones)
        assert all(0 <= i < n for i in ids)
        assert dists == sorted(dists)
        # exact agreement at full beam width (compact may have rebuilt
        # the graph — live set = everything not deleted)
        live = [i for i in range(n) if i not in dels]
        d_all = np.linalg.norm(vecs[live] - q, axis=1)
        order = sorted(range(len(live)), key=lambda j: (float(d_all[j]), live[j]))
        expect = [live[j] for j in order[: len(ids)]]
        assert ids == expect

    check()


def test_repetition_signals(spark):
    from pyspark.sql import functions as F

    from inputlayer_spark.functions.text import (
        dup_line_fraction,
        top_bigram_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\na\n\nc"),      # 5 non-empty lines, 2 dup 'a's
            (2, "x\ny"),                 # no dups
            (3, "buy now buy now buy now entirely"),  # dominant bigram
        ],
        "id long, t string",
    )
    got = {
        r.id: (round(r.d, 4), round(r.b, 4))
        for r in df.select(
            "id",
            dup_line_fraction(F.col("t")).alias("d"),
            top_bigram_fraction(F.col("t")).alias("b"),
        ).collect()
    }
    assert got[1][0] == round(2 / 5, 4)
    assert got[2][0] == 0.0
    # "buy now" occurs 3 times of 6 bigrams
    assert got[3][1] == 0.5


def test_sharded_hnsw_recall_on_natural_corpus(spark):
    """Operating-curve gate (VERDICT r5 #6): recall@10 >= 0.95 at the
    DEFAULT ef on the natural (unplanted) embeddings corpus — planted
    near-dups are an easy oracle; this checks the graph search finds
    true neighbors of an isotropic corpus. Full curves (ef / num_tables
    / n_probe sweeps for HNSW/LSH/IVF): ann_recall.py →
    ANN_RECALL_r{N}.json."""
    import ann_recall as AR

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .localCheckpoint()
    )
    n = emb.count()
    queries = AR.query_set(emb, every=max(n // 10, 1))
    truth = AR.exact_topk(emb, queries)
    curve = AR.sharded_hnsw_curve(spark, emb, queries, truth, efs=(64,))
    assert curve["64"] >= 0.95, curve


def test_object_store_property_roundtrip(tmp_path):
    """Property: arbitrary bytes round-trip through both backends under
    arbitrary (printable, slash-bearing) key suffixes; list_prefix
    returns exactly the live keys; overwrite always serves the newest
    bytes (atomic PUT)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inputlayer_spark.sources.artifact_store import store_for

    key_part = st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="-_./ %"
        ),
        min_size=1,
        max_size=24,
    ).filter(lambda s: s.strip() and ".." not in s and not s.startswith("/"))

    @settings(max_examples=40, deadline=None)
    @given(suffix=key_part, data=st.binary(max_size=512), data2=st.binary(max_size=64))
    def check(suffix, data, data2):
        ms = store_for("mem://propbkt/x")
        key = f"mem://propbkt/{suffix}"
        try:
            ms.put(key, data)
            assert ms.get(key) == data
            assert ms.exists(key)
            assert key in set(ms.list_prefix("mem://propbkt/"))
            ms.put(key, data2)  # overwrite: newest bytes win
            assert ms.get(key) == data2
        finally:
            ms.delete_prefix("mem://propbkt/")
        assert not ms.exists(key)

    check()


def test_hash_sample_deterministic_and_seed_sensitive(spark):
    from inputlayer_spark.operators.sampling import hash_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed=0).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed=0).collect()}
    assert a == b  # pure function of the data
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20% within hash tolerance
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed=7).collect()}
    assert c != a  # different seed → different sample
    # nesting: a 50% sample of a 20% sample ⊆ the 20% sample
    half = {
        r["doc_id"]
        for r in hash_sample(
            hash_sample(docs, "doc_id", 0.2, seed=0), "doc_id", 0.5, seed=9
        ).collect()
    }
    assert half <= a


def test_cap_per_group_caps_and_is_stable(spark):
    from inputlayer_spark.operators.sampling import cap_per_group

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    capped = cap_per_group(docs, "doc_id", "lang", 5, seed=1)
    counts = {r["lang"]: r["n"] for r in capped.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(full[lang], 5)
    again = cap_per_group(docs, "doc_id", "lang", 5, seed=1)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_chunk_documents_windows_and_overlap(spark):
    from inputlayer_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),
            (2, "only three words"),
            (3, ""),  # zero tokens → zero chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): (r["chunk"], r["n_tokens"])
            for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 → 5 chunks; consecutive chunks share 2 tokens
    assert [k for k in sorted(rows) if k[0] == 1] == [(1, i) for i in range(5)]
    assert rows[(1, 0)][0] == "w0 w1 w2 w3"
    assert rows[(1, 1)][0] == "w2 w3 w4 w5"
    assert rows[(1, 4)] == ("w8 w9", 2)  # short tail window
    assert rows[(2, 0)] == ("only three words", 3)
    assert not any(k[0] == 3 for k in rows)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_dedup_clusters_connected_components(spark):
    """Min-label propagation with pointer doubling: multi-hop chains
    collapse to one cluster labeled by the minimum id; disconnected
    docs are their own singletons."""
    from inputlayer_spark.operators.dedup import dedup_clusters

    nodes = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # chain 5-3-1-7 (min 1), pair (2,6), singletons 0 and 4
    pairs = spark.createDataFrame(
        [(5, 3), (3, 1), (1, 7), (2, 6)], "id1 long, id2 long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in
           dedup_clusters(pairs, nodes, id_col="id").collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 1, 4: 4, 5: 1, 6: 2, 7: 1}


def test_compression_ratio_signal(spark):
    """zlib compression-ratio quality signal (functions/text.py): pure
    repetition compresses to near-zero, natural prose lands mid-range,
    empty text is defined as 1.0, and the kernel is deterministic
    (pure function of bytes — safe under task retries)."""
    from pyspark.sql import functions as F

    from inputlayer_spark.functions.text import compression_ratio

    df = spark.createDataFrame(
        [
            ("spam", "ab" * 2000),
            ("prose", "The quick brown fox jumps over the lazy dog; " * 4),
            ("empty", ""),
            ("null", None),
        ],
        "id string, text string",
    )
    out = {
        r["id"]: r["z"]
        for r in df.select(
            "id", compression_ratio(F.col("text")).alias("z")
        ).collect()
    }
    assert out["spam"] < 0.05
    assert 0.2 < out["prose"] < 1.0
    assert out["empty"] == 1.0 and out["null"] == 1.0
    # deterministic across evaluations
    out2 = {
        r["id"]: r["z"]
        for r in df.select(
            "id", compression_ratio(F.col("text")).alias("z")
        ).collect()
    }
    assert out == out2
    # plan stays Arrow-batched: ArrowEvalPython, not row-at-a-time
    plan = (
        df.select(compression_ratio(F.col("text")).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_weighted_sample_deterministic_and_calibrated(spark):
    """weighted_sample: decision is a pure function of (key, seed) —
    two evaluations agree row-for-row; the kept fraction tracks the
    weight (a 0.8-weight population keeps ~4x more than a 0.2-weight
    one); weight 0 keeps nothing, weight 1 keeps everything; and the
    filter is a plain pushdown-friendly expression (no shuffle, no
    Python)."""
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.sampling import weighted_sample

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, 0.0)
        .when(F.col("id") % 4 == 1, 0.2)
        .when(F.col("id") % 4 == 2, 0.8)
        .otherwise(1.0)
        .alias("w"),
    )
    kept = weighted_sample(df, "id", "w", seed=3)
    rows = {r["id"] for r in kept.collect()}
    rows2 = {r["id"] for r in weighted_sample(df, "id", "w", seed=3).collect()}
    assert rows == rows2  # deterministic
    by_w = {
        w: sum(1 for i in rows if i % 4 == m)
        for m, w in ((0, 0.0), (1, 0.2), (2, 0.8), (3, 1.0))
    }
    assert by_w[0.0] == 0
    assert by_w[1.0] == 1000
    assert 100 <= by_w[0.2] <= 300   # ~200 expected
    assert 700 <= by_w[0.8] <= 900   # ~800 expected
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # partition-local, no shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_null_and_nan_weights_drop(spark):
    """NULL/NaN weights mean no keep probability — such rows must be
    DROPPED, not kept at 100% (Spark's least/greatest skip nulls and
    rank NaN above every number, so a bare clamp silently keeps them)."""
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, float("nan")), (4, 1.0)],
        "id long, w double",
    )
    kept = {r["id"] for r in weighted_sample(df, "id", "w", seed=0).collect()}
    assert kept == {1, 4}


def _wav_bytes(sr=8000, freq=440.0, secs=0.25, channels=1):
    import io
    import wave

    import numpy as np

    t = np.arange(int(sr * secs)) / sr
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    if channels == 2:
        x = np.column_stack([x, x]).ravel()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_decode_wav_features_real_stdlib_decode(spark):
    """decode_wav_features is a REAL decoder: a synthesized 440Hz sine
    WAV comes back with its exact sample rate, duration, the analytic
    RMS of a half-amplitude sine (0.5/sqrt(2) ~ 0.3536), and a
    zero-crossing rate of ~2*freq/sr."""
    import math

    from inputlayer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_wav_features,
    )

    rows = [
        (1, "audio", _wav_bytes(sr=8000, freq=440.0, secs=0.25), None),
        (2, "audio", _wav_bytes(sr=16000, freq=100.0, secs=0.5, channels=2), None),
        (3, "audio", b"not a wav at all", None),
        (4, "image", _wav_bytes(), None),  # wrong kind: filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r.asDict() for r in decode_wav_features(media).collect()}
    assert set(out) == {1, 2, 3}
    a = out[1]
    assert a["sample_rate"] == 8000 and a["channels"] == 1
    assert a["duration_ms"] == 250
    assert abs(a["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(a["zero_crossing_rate"] - 2 * 440.0 / 8000) < 0.01
    b = out[2]
    assert b["sample_rate"] == 16000 and b["channels"] == 2
    assert b["duration_ms"] == 500
    assert out[3]["sample_rate"] is None  # undecodable -> null row


def test_probe_image_meta_parses_real_headers(spark):
    """probe_image_meta parses real container headers: PNG IHDR, GIF
    screen descriptor, BMP info header, and a JPEG SOF walk — no pixel
    decode, no codec libs."""
    import struct
    import zlib

    from inputlayer_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        probe_image_meta,
    )

    ihdr = struct.pack(">II", 640, 480) + b"\x08\x02\x00\x00\x00"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 8
    # JPEG: SOI, APP0 (length 16 = 2 length bytes + 14 payload), SOF0
    # with height=33 width=44
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 33, 44) + b"\x01\x00\x00\x00"
    )
    rows = [
        (1, "image", png, None),
        (2, "image", gif, None),
        (3, "image", bmp, None),
        (4, "image", jpeg, None),
        (5, "image", b"????????????", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: (r["format"], r["width"], r["height"])
           for r in probe_image_meta(media).collect()}
    assert out[1] == ("png", 640, 480)
    assert out[2] == ("gif", 320, 200)
    assert out[3] == ("bmp", 100, 50)  # negative height = top-down BMP
    assert out[4] == ("jpeg", 44, 33)
    assert out[5] == (None, None, None)


def test_pack_sequences_concat_and_split(spark):
    """Packing = concat-and-split: start offsets are the exclusive
    prefix sum in (doc_id, chunk_id) order; pack_id/pack_offset derive
    from the 100-token budget. Verified against a driver-side oracle."""
    from inputlayer_spark.operators.sampling import pack_sequences

    data = [(d, c, 10 + (d * 7 + c) % 40) for d in range(20) for c in range(5)]
    df = spark.createDataFrame(data, ["doc_id", "chunk_id", "n_tokens"])
    out = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, "n_tokens", ["doc_id", "chunk_id"], 100).collect()
    }
    acc = 0
    for d, c, n in sorted(data):
        assert out[(d, c)] == (acc // 100, acc % 100)
        acc += n
    # deterministic across a rerun (range partitioning is re-sampled)
    out2 = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, "n_tokens", ["doc_id", "chunk_id"], 100).collect()
    }
    assert out == out2


def test_global_shuffle_is_deterministic_permutation(spark):
    from inputlayer_spark.operators.sampling import global_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = {r["doc_id"]: r["shuffle_rank"] for r in global_shuffle(df, "doc_id", seed=5).collect()}
    assert sorted(a.values()) == list(range(200))  # a permutation
    b = {r["doc_id"]: r["shuffle_rank"] for r in global_shuffle(df, "doc_id", seed=5).collect()}
    assert a == b  # pure function of (data, seed)
    c = {r["doc_id"]: r["shuffle_rank"] for r in global_shuffle(df, "doc_id", seed=6).collect()}
    assert a != c  # seed changes the permutation
    # rank order == (hash, key) order
    assert a != {r["doc_id"]: r["doc_id"] for r in df.collect()}


def test_rebalance_to_mixture_hits_targets(spark):
    from inputlayer_spark.operators.sampling import rebalance_to_mixture

    data = [(i, "web") for i in range(600)] + \
           [(i + 1000, "code") for i in range(300)] + \
           [(i + 2000, "books") for i in range(40)] + \
           [(i + 3000, "junk") for i in range(50)]
    df = spark.createDataFrame(data, ["doc_id", "domain"])
    out = rebalance_to_mixture(
        df, "doc_id", "domain", {"web": 0.6, "code": 0.3, "books": 0.1}, seed=2
    )
    got = {r["domain"]: r["cnt"] for r in out.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    assert "junk" not in got            # untargeted groups dropped
    # books is the limiting group: T = 40/0.1 = 400 → expect ~240/120/40
    assert got["books"] == pytest.approx(40, abs=8)
    assert got["web"] == pytest.approx(240, abs=40)
    assert got["code"] == pytest.approx(120, abs=30)
    # proportions approximate the target mixture
    tot = sum(got.values())
    assert got["web"] / tot == pytest.approx(0.6, abs=0.08)


def test_dedup_lines_removes_boilerplate(spark):
    from inputlayer_spark.operators.dedup import dedup_lines

    boiler = "accept cookies to continue"
    data = [
        (1, f"{boiler}\nunique one\nshared tail"),
        (2, f"{boiler}\nunique two\nshared tail"),
        (3, f"{boiler}\nunique three"),
        (4, boiler),                      # only boilerplate -> empty
        (5, "untouched document"),
    ]
    df = spark.createDataFrame(data, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"] for r in dedup_lines(df, "doc_id", "text", max_doc_freq=2).collect()}
    # boiler appears in 4 docs (>2) -> removed; 'shared tail' in 2 (<=2) -> kept
    assert out[1] == "unique one\nshared tail"
    assert out[2] == "unique two\nshared tail"
    assert out[3] == "unique three"
    assert out[4] == ""                   # fully-boilerplate doc kept, emptied
    assert out[5] == "untouched document"
    # order of surviving lines is preserved
    df2 = spark.createDataFrame([(1, "a\nb\na\nc"), (2, "b")], ["doc_id", "text"])
    out2 = {r["doc_id"]: r["text"] for r in dedup_lines(df2, "doc_id", "text", max_doc_freq=1).collect()}
    assert out2[1] == "a\na\nc"           # within-doc repeats survive doc-freq


def test_asof_join_point_in_time(spark):
    """For each left row, the right row with the greatest ts <= left
    ts per key; nulls when none (or older than tolerance)."""
    import datetime as dt

    from inputlayer_spark.operators.events import asof_join

    t0 = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [(1, 10, t0 + dt.timedelta(hours=h)) for h in (0, 2, 5, 9)]
        + [(2, 20, t0 + dt.timedelta(hours=1))],
        ["event_id", "user_id", "ts"],
    ).withColumn("event_id", (F.col("user_id") * 100 + F.hour("ts")).cast("long"))
    R = spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(hours=1), 5.0),
            (10, t0 + dt.timedelta(hours=5), 7.0),   # ties with left @5h
            (30, t0, 9.0),
        ],
        ["user_id", "ts", "price"],
    )
    out = {
        r["event_id"]: (r["price"], r["matched_ts"])
        for r in asof_join(L, R, "user_id", "ts", ["price"]).collect()
    }
    assert out[1000][0] is None                      # before any right row
    assert out[1002][0] == 5.0                       # 2h -> right @1h
    assert out[1005][0] == 7.0                       # equal ts matches ("at or before")
    assert out[1009][0] == 7.0                       # carries forward
    assert out[2001][0] is None                      # user 20 has no right rows
    # tolerance: the 9h left row is 4h after the 5h right row
    out2 = {
        r["event_id"]: r["price"]
        for r in asof_join(
            L, R, "user_id", "ts", ["price"], tolerance_s=3 * 3600
        ).collect()
    }
    assert out2[1009] is None and out2[1005] == 7.0


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from inputlayer_spark.operators.events import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows_in = [
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=10)),      # same session
        (3, 1, t0 + dt.timedelta(minutes=80)),      # 70min gap -> new
        (4, 1, t0 + dt.timedelta(minutes=85)),
        (5, 2, t0),                                  # other user independent
    ]
    df = spark.createDataFrame(rows_in, ["event_id", "user_id", "ts"])
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, "user_id", "ts", 3600.0, "event_id").collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_group_percentile_filter(spark):
    from inputlayer_spark.operators.sampling import (
        filter_above_group_percentile,
        group_percentile_thresholds,
    )

    data = [("a", float(i)) for i in range(1, 101)] + [("b", float(i)) for i in range(1, 11)]
    df = spark.createDataFrame(data, ["grp", "score"])
    th = {r["grp"]: r["p50"] for r in group_percentile_thresholds(df, "grp", "score", (0.5,)).collect()}
    assert th["a"] == pytest.approx(50.5) and th["b"] == pytest.approx(5.5)
    kept = filter_above_group_percentile(df, "grp", "score", 0.5)
    got = {r["grp"]: r["n"] for r in kept.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 50, "b": 5}                  # half of each group, per-group bar


def test_curation_pipeline_example_end_to_end(spark, tmp_path):
    """The composed curation pipeline (examples/curation_pipeline.py)
    runs end-to-end and produces a packed, shuffled corpus: every
    chunk has a pack slot and a unique shuffle rank, and only kept
    documents survive the gates."""
    import sys

    sys.path.insert(0, "examples")
    try:
        from curation_pipeline import curate
    finally:
        sys.path.pop(0)

    out = curate(spark, "/root/testdata/sf0.001", pack_budget=256).cache()
    rows_out = out.select("doc_id", "chunk_id", "pack_id", "pack_offset", "shuffle_rank").collect()
    assert len(rows_out) > 0
    ranks = sorted(r["shuffle_rank"] for r in rows_out)
    assert ranks == list(range(len(rows_out)))          # a permutation
    assert all(0 <= r["pack_offset"] < 256 for r in rows_out)
    out.unpersist()


def test_asof_join_matches_pandas_merge_asof_randomized(spark):
    """Randomized differential check: asof_join == pandas.merge_asof
    (backward direction, per-key) over 60 keys x irregular timestamps."""
    import random

    import pandas as pd

    rng = random.Random(17)
    base = 1_700_000_000
    lrows = [
        (i, rng.randrange(60), base + rng.randrange(0, 500_000))
        for i in range(800)
    ]
    rrows_raw = {
        (rng.randrange(60), base + rng.randrange(0, 500_000)): float(i)
        for i in range(600)
    }
    rrows = [(k, t, v) for (k, t), v in rrows_raw.items()]
    L = spark.createDataFrame(
        [(i, k, t) for i, k, t in lrows], ["event_id", "k", "ts_s"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    R = spark.createDataFrame(rrows, ["k", "ts_s", "val"]).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    ).drop("ts_s")

    from inputlayer_spark.operators.events import asof_join

    got = {
        r["event_id"]: r["val"]
        for r in asof_join(L, R, "k", "ts", ["val"]).collect()
    }

    lp = pd.DataFrame(lrows, columns=["event_id", "k", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["k", "t", "val"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    for _, row in exp.iterrows():
        want = None if pd.isna(row["val"]) else row["val"]
        assert got[row["event_id"]] == want


def test_dedup_lines_idempotent(spark):
    """Applying line dedup twice changes nothing: the first pass
    removed every over-frequent line, so the second pass's blocklist
    is empty for the same threshold."""
    from inputlayer_spark.operators.dedup import dedup_lines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    once = dedup_lines(docs, "doc_id", "text", sep=" the ", max_doc_freq=3)
    twice = dedup_lines(once, "doc_id", "text", sep=" the ", max_doc_freq=3)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


def test_pack_sequences_offsets_consistent_property(spark):
    """Structural invariants at any budget: offsets in [0, budget),
    pack ids non-decreasing along the order, and the start offsets
    (pack_id*budget + pack_offset) reconstruct the exclusive cumsum."""
    from inputlayer_spark.operators.sampling import pack_sequences

    import random

    rng = random.Random(3)
    data = [(i, rng.randrange(1, 300)) for i in range(500)]
    df = spark.createDataFrame(data, ["item_id", "n"])
    for budget in (64, 1024):
        rows_out = sorted(
            (r["item_id"], r["pack_id"], r["pack_offset"])
            for r in pack_sequences(df, "n", ["item_id"], budget).collect()
        )
        acc = 0
        for (item, pid, off), (_, n) in zip(rows_out, sorted(data)):
            assert 0 <= off < budget
            assert pid * budget + off == acc
            acc += n


def test_keep_canonical_survivor_selection(spark):
    """Per-cluster argmax: highest quality survives, ties break to the
    smallest id; singletons always survive."""
    from inputlayer_spark.operators.dedup import keep_canonical

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaaaaaa"), (3, "bb"), (4, "cc"), (5, "dd")],
        ["doc_id", "text"],
    )
    clusters = spark.createDataFrame(
        # {1,2} one cluster (2 longer -> wins); {3,4} tie on length
        # (3 wins by id); {5} singleton
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
        ["doc_id", "cluster_id"],
    )
    out = keep_canonical(docs, clusters)
    got = sorted((r["doc_id"], r["cluster_id"]) for r in out.collect())
    assert got == [(2, 1), (3, 3), (5, 5)]
    # custom quality column: invert the preference
    out2 = keep_canonical(docs, clusters, quality=-F.length("text"))
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 3, 5]


def test_assign_splits_deterministic_partition(spark):
    """assign_splits: covers every row exactly once, is a pure function
    of (key, seed) — stable across repartitioning — and rejects ratio
    sets that don't sum to 1 (operators/sampling.py)."""
    import pytest

    from inputlayer_spark.operators.sampling import assign_splits

    df = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    ratios = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, "k", ratios, seed=3)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total cover, no drops/dupes
    assert set(counts) == {"train", "val", "test"}
    assert 1400 < counts["train"] < 1800  # hash-uniform, not exact
    # purity: same assignment regardless of physical layout
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {
        r["k"]: r["split"]
        for r in assign_splits(df.repartition(13), "k", ratios, seed=3).collect()
    }
    assert a == b
    # a different seed reshuffles membership
    c = {
        r["k"]: r["split"]
        for r in assign_splits(df, "k", ratios, seed=4).collect()
    }
    assert a != c
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, "k", {"train": 0.5, "val": 0.1})


def test_png_pixel_decode_roundtrip():
    """REAL PNG decode (VERDICT r7 #4): stdlib inflate + unfilter must
    reproduce exact pixels through an encode→decode round trip, and the
    unfilter must handle Sub/Up/Paeth scanlines."""
    import struct
    import zlib

    from inputlayer_spark.operators.multimodal import (
        _png_pixels,
        _png_real_features,
        encode_png,
    )

    w, h = 10, 4
    px = bytes([64, 128, 255] * (w * h))
    assert _png_pixels(encode_png(w, h, px, channels=3)) == (w, h, 3, px)
    feat = _png_real_features(encode_png(w, h, px, channels=3))
    assert abs(feat[0] - 64 / 255) < 1e-6
    assert abs(feat[1] - 128 / 255) < 1e-6
    assert abs(feat[2] - 1.0) < 1e-6
    assert feat[3] == 0.0  # no 4th channel
    assert feat[4] == feat[5] == feat[6] == 0.0  # constant => std 0

    # hand-filtered scanlines: Sub(1), Up(2), Paeth(4)
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    rows = [bytes([10, 20, 30]), bytes([15, 25, 35]), bytes([20, 30, 45])]

    def paeth_pred(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    sub = bytes([rows[0][0]]) + bytes(
        (rows[0][i] - rows[0][i - 1]) & 0xFF for i in range(1, 3)
    )
    up = bytes((rows[1][i] - rows[0][i]) & 0xFF for i in range(3))
    pae = bytes(
        (rows[2][i] - paeth_pred(rows[2][i - 1] if i else 0, rows[1][i],
                                 rows[1][i - 1] if i else 0)) & 0xFF
        for i in range(3)
    )
    raw = b"\x01" + sub + b"\x02" + up + b"\x04" + pae
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert _png_pixels(png) == (3, 3, 1, b"".join(rows))
    # non-PNG / header-only payloads signal fallback, not garbage
    assert _png_pixels(b"not a png") is None
    assert _png_real_features(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None


def test_extract_features_real_png_stats(spark):
    """media_features end-to-end: decodable PNG content yields REAL
    per-channel mean/std (not the hash fake); non-PNG falls back."""
    import hashlib

    from inputlayer_spark.operators.multimodal import (
        _fake_decode_features,
        encode_png,
        extract_features,
    )

    png = encode_png(4, 4, bytes([200, 100, 50] * 16), channels=3)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(png), (4, 4, None, None, "image/png")),
            (2, "image", bytearray(b"fakeimg"), (4, 4, None, None, "image/png")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    f = out[1]["feature"]
    assert abs(f[0] - 200 / 255) < 1e-5 and abs(f[1] - 100 / 255) < 1e-5
    assert abs(f[2] - 50 / 255) < 1e-5 and f[4] == 0.0
    assert out[1]["content_sha"] == hashlib.sha256(png).hexdigest()
    assert list(out[2]["feature"]) == pytest.approx(
        _fake_decode_features(b"fakeimg"), abs=1e-6
    )


def test_asof_join_matches_duckdb_randomized(spark):
    """Randomized differential vs DuckDB's native ASOF LEFT JOIN
    (VERDICT r7 #6): NULL keys, NULL timestamps, duplicate/tied
    timestamps (coarse integer-second grid), exact tolerance
    boundaries, and an empty right side. Tolerance is emulated in the
    oracle with an epoch-difference post-filter (inclusive, matching
    asof_join's `delta <= tolerance_s`)."""
    import datetime as dt
    import random

    import duckdb
    import pandas as pd

    from inputlayer_spark.operators.events import asof_join

    base = 1_700_000_000

    def to_dt(t):
        return (
            None
            if t is None
            else dt.datetime.fromtimestamp(t, dt.timezone.utc).replace(
                tzinfo=None
            )
        )

    for seed, nl, nr, tol in [
        (1, 300, 200, None),   # dense ties, no tolerance
        (2, 250, 150, 7.0),    # tolerance with exact boundary hits
        (3, 120, 0, None),     # empty right side
        (4, 200, 180, 0.0),    # zero tolerance: only exact-ts matches
        (5, 400, 40, 3.0),     # sparse right side
    ]:
        rng = random.Random(seed)
        lrows = []
        for i in range(nl):
            k = rng.choice([None, 0, 1, 2, 3, 4, 5, 6, 7])
            t = None if rng.random() < 0.05 else base + rng.randrange(0, 50)
            lrows.append((i, k, t))
        rmap = {}
        for i in range(nr):
            k = rng.choice([None, 0, 1, 2, 3, 4, 5, 6, 7])
            rmap[(k, base + rng.randrange(0, 50))] = float(i)
        rrows = [(k, t, v) for (k, t), v in rmap.items()]

        L = spark.createDataFrame(
            [(i, k, to_dt(t)) for i, k, t in lrows],
            "event_id long, k int, ts timestamp",
        )
        R = spark.createDataFrame(
            [(k, to_dt(t), v) for k, t, v in rrows] or [],
            "k int, ts timestamp, val double",
        )
        out = asof_join(L, R, "k", "ts", ["val"], tolerance_s=tol)
        got = {
            r["event_id"]: (
                None if r["matched_ts"] is None else r["matched_ts"].timestamp(),
                r["val"],
            )
            for r in out.withColumn(
                "matched_ts", F.col("matched_ts")
            ).collect()
        }
        assert len(got) == nl  # every left row survives exactly once

        con = duckdb.connect()
        lp = pd.DataFrame(
            [(i, k, pd.Timestamp(to_dt(t))) for i, k, t in lrows],
            columns=["event_id", "k", "ts"],
        )
        rp = pd.DataFrame(
            [(k, pd.Timestamp(to_dt(t)), v) for k, t, v in rrows],
            columns=["k", "ts", "val"],
        )
        con.register("lp", lp)
        con.register("rp", rp)
        # l.ts IS NOT NULL guard: DuckDB 1.0's ASOF quirk matches a NULL
        # left ts to the GREATEST right ts, contradicting its own plain
        # `l.ts >= r.ts` join (which yields no match) and pandas
        # merge_asof (NaT -> no match). asof_join pins the SQL
        # comparison semantics, so mask the quirk in the oracle.
        fresh = (
            "l.ts IS NOT NULL AND r.ts IS NOT NULL"
            if tol is None
            else "l.ts IS NOT NULL AND r.ts IS NOT NULL "
            f"AND epoch(l.ts) - epoch(r.ts) <= {tol}"
        )
        if len(rp):
            q = (
                f"SELECT l.event_id, "
                f"CASE WHEN {fresh} THEN epoch(r.ts) END AS mts, "
                f"CASE WHEN {fresh} THEN r.val END AS val "
                "FROM lp l ASOF LEFT JOIN rp r "
                "ON l.k = r.k AND l.ts >= r.ts"
            )
        else:
            q = "SELECT event_id, NULL AS mts, NULL AS val FROM lp"
        exp = {
            int(eid): (mts, val)
            for eid, mts, val in con.execute(q).fetchall()
        }
        for eid, (mts, val) in exp.items():
            g_mts, g_val = got[eid]
            assert g_val == val, (seed, eid, got[eid], (mts, val))
            if mts is None:
                assert g_mts is None, (seed, eid, g_mts)
            else:
                assert g_mts is not None and abs(g_mts - mts) < 1e-6


def test_sessionize_matches_python_oracle_randomized(spark):
    """Randomized differential for gap sessionization: tied timestamps
    (with the deterministic tiebreak), gaps exactly AT the threshold
    (same session: <= gap_s), singleton keys, and bursty clusters —
    against a direct per-key Python scan."""
    import random

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        base = 1_700_000_000
        rows = []
        eid = 0
        for k in range(25):
            t = base + rng.randrange(0, 100)
            for _ in range(rng.randrange(1, 40)):
                # mix: zero gaps (ties), exact-threshold gaps (30s),
                # sub- and super-threshold jumps
                t += rng.choice([0, 1, 5, 30, 31, 120])
                rows.append((eid, k, t))
                eid += 1
        rng.shuffle(rows)  # input order must not matter

        df = spark.createDataFrame(rows, "event_id long, k int, ts_s long")
        df = df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        from inputlayer_spark.operators.events import sessionize

        got = {
            r["event_id"]: r["session_seq"]
            for r in sessionize(
                df, "k", "ts", 30.0, order_tiebreak="event_id"
            ).collect()
        }

        # oracle: sort per key by (ts, event_id), break when gap > 30
        bykey = {}
        for e, k, t in rows:
            bykey.setdefault(k, []).append((t, e))
        expected = {}
        for k, evs in bykey.items():
            evs.sort()
            seq, prev = 0, None
            for t, e in evs:
                if prev is not None and t - prev > 30:
                    seq += 1
                expected[e] = seq
                prev = t
        assert got == expected, f"seed {seed}"


def test_kmeans_deterministic_and_converging(spark):
    """kmeans_assign: separable blobs land in distinct clusters, the
    assignment is identical across runs (no RNG), an emptied cluster
    keeps its previous centroid, and iters=1 means init-only
    assignment."""
    from inputlayer_spark.operators.clustering import (
        cluster_sizes,
        kmeans_assign,
    )

    # two tight blobs far apart; ids interleaved so init picks one
    # point of each blob (ids 0 and 1)
    rows = []
    for i in range(40):
        blob = i % 2
        base = 0.0 if blob == 0 else 10.0
        rows.append((i, [base + (i % 5) * 0.01, base - (i % 3) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    a1 = {r["vec_id"]: r["cluster"] for r in
          kmeans_assign(df, "vec_id", "embedding", k=2, iters=3).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in
          kmeans_assign(df, "vec_id", "embedding", k=2, iters=3).collect()}
    assert a1 == a2  # deterministic
    for i, cl in a1.items():
        assert cl == i % 2  # blob structure recovered exactly

    sizes = {r["cluster"]: r["n"] for r in
             cluster_sizes(df, "vec_id", "embedding", k=2, iters=3).collect()}
    assert sizes == {0: 20, 1: 20}

    # k=3 on the 2-blob data: one centroid empties and must persist
    # (no crash, all rows still assigned)
    a3 = kmeans_assign(df, "vec_id", "embedding", k=3, iters=3)
    assert a3.count() == 40
    assert set(r["cluster"] for r in a3.collect()) <= {0, 1, 2}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmeans_assign(df, "vec_id", "embedding", k=0)


def test_kmeans_assignment_plan_no_join(spark):
    """The per-round assignment is a NARROW map (centroids are literal
    arrays, no join with a centroid table) — at 100 TB the corpus is
    scanned, never shuffled, per round."""
    from inputlayer_spark.operators.clustering import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = kmeans_assign(emb, "vec_id", "embedding", k=4, iters=1)._jdf \
        .queryExecution().executedPlan().toString()
    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop",
                "Exchange"):
        assert bad not in plan, f"{bad} in assignment plan:\n{plan[:600]}"


def test_top_keywords_deterministic_ranking(spark):
    from inputlayer_spark.functions.text import top_keywords

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark datalog datalog engine"),
            (2, "engine engine engine engine common common"),
            (3, "common words only here"),
        ],
        "doc_id long, text string",
    )
    out = top_keywords(docs, "doc_id", "text", k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r["token"])
    # doc 1: 'spark' (tf=3, df=1) dominates; 'datalog' (tf=2, df=1) next
    assert by_doc[1] == ["spark", "datalog"]
    # every doc gets at most k keywords, deterministic across runs
    assert all(len(v) <= 2 for v in by_doc.values())
    again = {}
    for r in top_keywords(docs, "doc_id", "text", k=2).collect():
        again.setdefault(r["doc_id"], []).append(r["token"])
    assert again == by_doc


def test_asof_join_null_key_left_rows_bypass_window(spark):
    """A NULL-key left row can never match (SQL equality), so it must
    NOT enter the key-partitioned window — on dirty data at scale all
    such rows hash to the single NULL partition, a skew bomb whose
    answer is known. Behavior: majority-NULL-key corpus keeps every
    left row, NULL payloads on the NULL-key ones. Plan: the window
    input filters isnotnull(key) and the NULL branch unions back."""
    import datetime as dt

    from inputlayer_spark.operators.events import asof_join

    t0 = dt.datetime(2024, 1, 1)
    L = spark.createDataFrame(
        [(i, None if i % 10 else 10, t0 + dt.timedelta(hours=i)) for i in range(40)],
        "event_id long, user_id int, ts timestamp",
    )
    R = spark.createDataFrame(
        [(10, t0, 5.0)], "user_id int, ts timestamp, price double"
    )
    out = asof_join(L, R, "user_id", "ts", ["price"])
    rows = {r["event_id"]: r["price"] for r in out.collect()}
    assert len(rows) == 40                       # no left row lost
    assert rows[0] == 5.0 and rows[10] == 5.0    # the non-NULL keys match
    assert all(rows[i] is None for i in range(40) if i % 10)
    # plan: every Window input is guarded by isnotnull on the key, and
    # the NULL-key branch comes back via a Union
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in logical
    assert "isnotnull(user_id" in logical


def test_kmeans_dirty_vectors_excluded_not_crashing(spark):
    """ADVICE r8: a NULL element in any embedding made F.avg feed
    F.lit(float(None)) next round (TypeError), and short vectors
    silently skewed distances via zip_with NULL padding. Dirty vectors
    (NULL, NULL element, wrong length) must come back with a NULL
    cluster, never seed or shift a centroid, and clean rows must
    cluster exactly as they would without the dirty ones present."""
    from inputlayer_spark.operators.clustering import kmeans_assign

    clean_rows = []
    for i in range(20):
        blob = i % 2
        base = 0.0 if blob == 0 else 10.0
        clean_rows.append((i, [base + (i % 5) * 0.01, base]))
    dirty_rows = [
        (100, None),                  # NULL vector
        (101, [None, 5.0]),           # NULL element
        (102, [1.0]),                 # too short
        (103, [1.0, 2.0, 3.0]),       # too long
    ]
    schema = "vec_id long, embedding array<double>"
    clean = spark.createDataFrame(clean_rows, schema)
    both = spark.createDataFrame(clean_rows + dirty_rows, schema)

    want = {r["vec_id"]: r["cluster"] for r in
            kmeans_assign(clean, "vec_id", "embedding", k=2, iters=3).collect()}
    got = {r["vec_id"]: r["cluster"] for r in
           kmeans_assign(both, "vec_id", "embedding", k=2, iters=3).collect()}
    assert len(got) == 24                       # every input row kept
    assert all(got[i] is None for i in (100, 101, 102, 103))
    assert {i: got[i] for i in want} == want    # clean rows unaffected

    # corpus with NO clean majority: the dim anchor is the null-free
    # vector with the smallest id (102, [1.0]) — it clusters, the rest
    # are NULL; and an all-invalid corpus yields all-NULL, no crash
    only_dirty = spark.createDataFrame(dirty_rows, schema)
    res = {r["vec_id"]: r["cluster"] for r in
           kmeans_assign(only_dirty, "vec_id", "embedding", k=2, iters=2).collect()}
    assert res == {100: None, 101: None, 102: 0, 103: None}
    all_null = spark.createDataFrame(
        [(1, None), (2, [None, None])], schema
    )
    res2 = kmeans_assign(all_null, "vec_id", "embedding", k=2, iters=2)
    assert [r["cluster"] for r in res2.collect()] == [None, None]


def test_bmp_pixels_roundtrip_and_edge_cases():
    """_bmp_pixels: exact decode of crafted 24-bit BMPs — stride
    padding (width 3 -> 9-byte rows pad to 12), BGR->RGB swizzle,
    bottom-up AND top-down row order — mirroring the PNG harness."""
    from inputlayer_spark.operators.multimodal import (
        _bmp_pixels,
        encode_bmp,
    )

    # width 3 => 9 bytes/row, padded to 12: exercises the stride walk
    px = bytes(range(3 * 3 * 3))  # 3x3 RGB, all distinct values
    for td in (False, True):
        bmp = encode_bmp(3, 3, px, top_down=td)
        assert _bmp_pixels(bmp) == (3, 3, 3, px), f"top_down={td}"
    # width 4: zero padding branch
    px4 = bytes((i * 7) % 256 for i in range(4 * 2 * 3))
    assert _bmp_pixels(encode_bmp(4, 2, px4)) == (4, 2, 3, px4)
    # non-BMP / truncated / unsupported payloads fall back (None)
    assert _bmp_pixels(b"not a bmp") is None
    assert _bmp_pixels(encode_bmp(3, 3, px)[:30]) is None
    import struct
    bad_bpp = bytearray(encode_bmp(3, 3, px))
    bad_bpp[28:30] = struct.pack("<H", 8)  # 8-bit palette: unsupported
    assert _bmp_pixels(bytes(bad_bpp)) is None
    bad_comp = bytearray(encode_bmp(3, 3, px))
    bad_comp[30:34] = struct.pack("<I", 1)  # BI_RLE8: unsupported
    assert _bmp_pixels(bytes(bad_comp)) is None


def test_extract_features_real_bmp_stats(spark):
    """media_features end-to-end with a crafted BMP: known per-channel
    means/stds come out of the REAL decoder (not the hash fake), and a
    non-decodable payload still falls back."""
    import hashlib

    from inputlayer_spark.operators.multimodal import (
        _fake_decode_features,
        encode_bmp,
        extract_features,
    )

    bmp = encode_bmp(4, 4, bytes([200, 100, 50] * 16))
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp), (4, 4, None, None, "image/bmp")),
            (2, "image", bytearray(b"fakeimg"), (4, 4, None, None, "image/bmp")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    f = out[1]["feature"]
    assert abs(f[0] - 200 / 255) < 1e-5 and abs(f[1] - 100 / 255) < 1e-5
    assert abs(f[2] - 50 / 255) < 1e-5 and f[4] == 0.0  # constant image: std 0
    assert out[1]["content_sha"] == hashlib.sha256(bmp).hexdigest()
    assert list(out[2]["feature"]) == pytest.approx(
        _fake_decode_features(b"fakeimg"), abs=1e-6
    )


def test_gif_pixels_roundtrip_and_edge_cases():
    """_gif_pixels: exact decode of crafted GIFs — LZW with clears,
    global color table lookup, interlace de-weave — mirroring the
    PNG/BMP harnesses."""
    from inputlayer_spark.operators.multimodal import (
        _gif_pixels,
        encode_gif,
    )

    # 4 distinct palette colors, 3x3 frame using all of them
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([0, 1, 2, 3, 0, 1, 2, 3, 0])
    rgb = b"".join(palette[i * 3 : i * 3 + 3] for i in idx)
    for il in (False, True):
        gif = encode_gif(3, 3, idx, palette, interlaced=il)
        assert _gif_pixels(gif) == (3, 3, 3, rgb), f"interlaced={il}"
    # tall interlaced image exercises all four passes
    h = 11
    idx2 = bytes((y % 4) for y in range(h) for _ in range(2))
    rgb2 = b"".join(palette[i * 3 : i * 3 + 3] for i in idx2)
    assert _gif_pixels(encode_gif(2, h, idx2, palette, interlaced=True)) == (
        2, h, 3, rgb2
    )
    # payload long enough to force a mid-stream CLEAR re-emit
    big = bytes((i * 7) % 4 for i in range(40 * 30))
    dec = _gif_pixels(encode_gif(40, 30, big, palette))
    assert dec is not None and dec[:3] == (40, 30, 3)
    assert dec[3] == b"".join(palette[i * 3 : i * 3 + 3] for i in big)
    # non-GIF / truncated / trailer-only payloads fall back (None)
    assert _gif_pixels(b"not a gif") is None
    assert _gif_pixels(encode_gif(3, 3, idx, palette)[:20]) is None
    assert _gif_pixels(b"GIF89a" + b"\x00" * 7 + b"\x3b") is None


def test_extract_features_real_gif_stats(spark):
    """media_features end-to-end with a crafted GIF: known per-channel
    means come from the REAL decoder; non-decodable falls back."""
    import hashlib

    from inputlayer_spark.operators.multimodal import (
        _fake_decode_features,
        encode_gif,
        extract_features,
    )

    palette = bytes([200, 100, 50])
    gif = encode_gif(4, 4, bytes(16), palette)  # constant color
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(gif), (4, 4, None, None, "image/gif")),
            (2, "image", bytearray(b"fakegif"), (4, 4, None, None, "image/gif")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    f = out[1]["feature"]
    assert abs(f[0] - 200 / 255) < 1e-5 and abs(f[1] - 100 / 255) < 1e-5
    assert abs(f[2] - 50 / 255) < 1e-5 and f[4] == 0.0
    assert out[1]["content_sha"] == hashlib.sha256(gif).hexdigest()
    assert list(out[2]["feature"]) == pytest.approx(
        _fake_decode_features(b"fakegif"), abs=1e-6
    )


def test_gif_pixels_real_lzw_compression_path():
    """Drive _gif_pixels through a REAL LZW compressor (dictionary
    growth, variable code width, the KwKwK code==len(table) case) —
    the literal-only harness never grows the table, so this pins the
    decoder's compressed path against an independent encoder."""
    import struct

    from inputlayer_spark.operators.multimodal import _gif_pixels

    def lzw_compress(indices, mcs):
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        dict_ = {bytes((c,)): c for c in range(clear)}
        next_code = eoi + 1
        width = mcs + 1
        bits = []

        def emit(code):
            nonlocal width
            for k in range(width):
                bits.append((code >> k) & 1)

        emit(clear)
        wbuf = b""
        for idx in indices:
            nxt = wbuf + bytes((idx,))
            if nxt in dict_:
                wbuf = nxt
                continue
            emit(dict_[wbuf])
            dict_[nxt] = next_code
            next_code += 1
            # GIF: width grows when the NEXT code would not fit
            if next_code > (1 << width) and width < 12:
                width += 1
            wbuf = bytes((idx,))
        if wbuf:
            emit(dict_[wbuf])
        emit(eoi)
        by = bytearray()
        for k in range(0, len(bits), 8):
            v = 0
            for j, bit in enumerate(bits[k : k + 8]):
                v |= bit << j
            by.append(v)
        return bytes(by)

    # repetitive data → long dictionary entries, immediate KwKwK hits
    w, h = 16, 16
    indices = bytes(([0, 0, 1, 1] * (w // 4))[:w]) * h
    palette = bytes([255, 0, 0, 0, 255, 0])
    depth = 2  # min table 4 even with 2 colors (GIF min code size >= 2)
    gct = palette + b"\x00" * (3 * (1 << depth) - len(palette))
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0) + gct
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    comp = lzw_compress(indices, depth)
    blocks = bytearray([depth])
    for k in range(0, len(comp), 255):
        chunk = comp[k : k + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    gif = hdr + desc + bytes(blocks) + b"\x3b"

    want = b"".join(palette[i * 3 : i * 3 + 3] for i in indices)
    assert _gif_pixels(gif) == (w, h, 3, want)


def test_jpeg_pixels_roundtrip_all_modes():
    """_jpeg_pixels vs the encode_jpeg harness (all-ones quant tables,
    so DCT rounding is the only loss): grayscale within ±1, RGB 4:4:4
    within ±3, constant-color 4:2:0 exact, restart markers honored,
    non-multiple-of-8 dims padded/cropped correctly."""
    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)

    def roundtrip(w, h, ch=3, tol=3, **kw):
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        dec = _jpeg_pixels(encode_jpeg(w, h, px.tobytes(), channels=ch, **kw))
        assert dec is not None and dec[:3] == (w, h, ch)
        got = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, ch)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= tol

    roundtrip(16, 16, ch=1, tol=1)
    roundtrip(17, 13, ch=1, tol=1)     # pad/crop path
    roundtrip(16, 16, ch=3, tol=3)     # YCbCr round-trip
    roundtrip(24, 8, ch=3, tol=3, restart_interval=1)  # RSTn every MCU
    # constant color survives 4:2:0 chroma subsampling exactly
    px = np.tile(np.array([200, 100, 50], dtype=np.uint8), (20, 18, 1))
    dec = _jpeg_pixels(encode_jpeg(18, 20, px.tobytes(), subsample=True))
    assert dec[:3] == (18, 20, 3)
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(20, 18, 3)
    assert np.array_equal(got, px)
    # non-JPEG / truncated fall back (None); progressive would too
    assert _jpeg_pixels(b"not a jpeg") is None
    assert _jpeg_pixels(b"\xff\xd8\xff\xd9") is None


def test_jpeg_pixels_decodes_real_libjpeg_output():
    """Differential vs REAL encoder output: any libjpeg-produced JPEG
    shipped with the Python install must decode to its probed
    dimensions with in-range pixels (gated on the asset existing)."""
    import os

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        _probe_dims,
    )

    # discover CPython's own bundled test JPEGs portably — works on any
    # install, no machine-specific paths
    import glob
    import sysconfig

    stdlib = sysconfig.get_paths()["stdlib"]
    found = sorted(
        glob.glob(os.path.join(stdlib, "test", "imghdrdata", "*.jpg"))
        + glob.glob(os.path.join(stdlib, "test", "test_email", "data", "*.jpg"))
    )
    if not found:
        pytest.skip("no real JPEG asset on this box")
    for path in found:
        b = open(path, "rb").read()
        kind, w, h = _probe_dims(b)
        assert kind == "jpeg"
        dec = _jpeg_pixels(b)
        assert dec is not None and dec[0] == w and dec[1] == h
        a = np.frombuffer(dec[3], dtype=np.uint8)
        assert a.size == w * h * dec[2]
        assert 0 < a.mean() < 255  # real content, not all-black/white


def test_extract_features_real_jpeg_stats(spark):
    """media_features end-to-end with a crafted JPEG: known per-channel
    means come from the REAL decoder (constant color is DC-only, so it
    survives exactly); non-decodable payloads still fall back."""
    import hashlib

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _fake_decode_features,
        encode_jpeg,
        extract_features,
    )

    px = np.tile(np.array([200, 100, 50], dtype=np.uint8), (8, 8, 1))
    jpg = encode_jpeg(8, 8, px.tobytes())
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(jpg), (8, 8, None, None, "image/jpeg")),
            (2, "image", bytearray(b"fakejpg"), (8, 8, None, None, "image/jpeg")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    f = out[1]["feature"]
    assert abs(f[0] - 200 / 255) < 0.02 and abs(f[1] - 100 / 255) < 0.02
    assert abs(f[2] - 50 / 255) < 0.02 and f[4] < 0.02
    assert out[1]["content_sha"] == hashlib.sha256(jpg).hexdigest()
    assert list(out[2]["feature"]) == pytest.approx(
        _fake_decode_features(b"fakejpg"), abs=1e-6
    )


def test_resize_images_real_box_downsample(spark):
    """resize_images is now REAL for stdlib-decodable formats: an 8x8
    PNG with four 4x4 quadrant colors box-averages to the exact 2x2
    quadrant means at 4x4 (integer ratio = exact block means), output
    re-encoded as PNG; a GIF input also resizes (and becomes PNG); a
    non-decodable payload keeps the passthrough contract."""
    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _png_pixels,
        encode_gif,
        encode_png,
        resize_images,
    )

    quad = np.zeros((8, 8, 3), dtype=np.uint8)
    quad[:4, :4] = [200, 0, 0]
    quad[:4, 4:] = [0, 100, 0]
    quad[4:, :4] = [0, 0, 60]
    quad[4:, 4:] = [40, 40, 40]
    png = encode_png(8, 8, quad.tobytes())
    gif = encode_gif(4, 4, bytes(16), bytes([10, 20, 30]))
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(png), (8, 8, None, None, "image/png")),
            (2, "image", bytearray(gif), (4, 4, None, None, "image/gif")),
            (3, "image", bytearray(b"opaque"), (9, 9, None, None, "application/x")),
            (4, "audio", bytearray(b"wav?"), (None, None, 44100, None, "audio/wav")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    assert set(out) == {1, 2, 3}           # audio filtered out
    # quadrant image: each 4x4 output quadrant is the pure source color
    w, h, nch, px = _png_pixels(bytes(out[1]["content"]))
    assert (w, h, nch) == (4, 4, 3)
    a = np.frombuffer(px, dtype=np.uint8).reshape(4, 4, 3)
    assert (a[:2, :2] == [200, 0, 0]).all() and (a[:2, 2:] == [0, 100, 0]).all()
    assert (a[2:, :2] == [0, 0, 60]).all() and (a[2:, 2:] == [40, 40, 40]).all()
    assert out[1]["meta"]["width"] == 4 and out[1]["meta"]["mime"] == "image/png"
    # GIF input: decoded, (up)sized 4x4 -> 4x4, re-encoded PNG, constant color
    w2, h2, nch2, px2 = _png_pixels(bytes(out[2]["content"]))
    assert (w2, h2) == (4, 4)
    assert np.frombuffer(px2, dtype=np.uint8).reshape(-1, nch2)[0].tolist() == [10, 20, 30]
    # non-decodable: content AND meta untouched — a passthrough row
    # must not claim the target dimensions its bytes don't have
    # (honesty contract, r10); downstream tells resized rows apart by
    # meta.width == target + mime == image/png
    assert bytes(out[3]["content"]) == b"opaque"
    assert out[3]["meta"]["width"] == 9 and out[3]["meta"]["height"] == 9
    assert out[3]["meta"]["mime"] == "application/x"


def test_sample_video_frames_real_mjpeg_avi(spark):
    """sample_video_frames is REAL for MJPEG-AVI: the RIFF walk finds
    the per-frame JPEG chunks, each sampled row hashes the ACTUAL frame
    at that timestamp (and that frame decodes with _jpeg_pixels);
    non-AVI payloads keep the honest stub contract."""
    import hashlib

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_avi_mjpeg,
        encode_jpeg,
        sample_video_frames,
    )

    # three distinguishable frames at 2 fps -> 500 ms per frame
    colors = [(250, 0, 0), (0, 250, 0), (0, 0, 250)]
    frames = [
        encode_jpeg(8, 8, np.tile(np.array(c, dtype=np.uint8), (8, 8, 1)).tobytes())
        for c in colors
    ]
    avi = encode_avi_mjpeg(frames, fps=2)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(avi), (None, None, None, None, "video/avi")),
            (2, "video", bytearray(b"notavi"), (None, None, None, 2500, "video/mp4")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = sample_video_frames(media, every_ms=500).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(
            (r["frame_ts_ms"], r["content_sha"])
        )
    # real path: 1500 ms of video at 500 ms sampling -> ts 0/500/1000,
    # each hashing its OWN frame
    got = sorted(by_media[1])
    assert [t for t, _ in got] == [0, 500, 1000]
    want = [hashlib.sha256(f).hexdigest() for f in frames]
    assert [s for _, s in got] == want
    # and the sampled frame really is a decodable JPEG of that color
    w, h, nch, px = _jpeg_pixels(frames[1])
    assert (w, h, nch) == (8, 8, 3) and abs(px[1] - 250) <= 3
    # stub path: duration from meta, whole-payload hash on every row
    stub = sorted(by_media[2])
    assert [t for t, _ in stub] == [0, 500, 1000, 1500, 2000]
    assert len({s for _, s in stub}) == 1


def test_jpeg_progressive_roundtrip_all_modes():
    """encode_jpeg_progressive -> _jpeg_pixels: SOF2 with the full
    annex-G scan script (interleaved DC first + refine, two spectral
    AC bands, two successive-approximation refinement passes with
    EOB-run accumulation and correction bits). All-ones quant makes
    DCT rounding the only loss."""
    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)

    def roundtrip(w, h, ch, tol, **kw):
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        b = encode_jpeg_progressive(w, h, px.tobytes(), channels=ch, **kw)
        assert b"\xff\xc2" in b[:128]  # really SOF2
        dec = _jpeg_pixels(b)
        assert dec is not None and dec[:3] == (w, h, ch), (w, h, ch, kw)
        got = np.frombuffer(dec[3], dtype=np.uint8).reshape(h, w, ch)
        assert np.abs(got.astype(int) - px.astype(int)).max() <= tol

    roundtrip(8, 8, 1, 1)
    roundtrip(17, 13, 1, 1)            # pad/crop path
    roundtrip(16, 16, 3, 3)            # YCbCr round-trip
    roundtrip(24, 8, 3, 3, restart_interval=2)   # RSTn resets eobrun+pred
    # 4:2:0 on noise loses chroma by design -> compare against the
    # BASELINE encoder's decode of the same content, not the original
    px = rng.integers(0, 256, size=(24, 20, 3), dtype=np.uint8)
    for kw in ({}, {"restart_interval": 1}):
        d0 = np.frombuffer(
            _jpeg_pixels(encode_jpeg(20, 24, px.tobytes(), subsample=True))[3],
            dtype=np.uint8,
        ).astype(int)
        d2 = np.frombuffer(
            _jpeg_pixels(
                encode_jpeg_progressive(20, 24, px.tobytes(), subsample=True, **kw)
            )[3],
            dtype=np.uint8,
        ).astype(int)
        assert np.abs(d0 - d2).max() <= 2, kw

    # constant color survives 4:2:0 exactly (DC-only blocks)
    px = np.tile(np.array([200, 100, 50], dtype=np.uint8), (20, 18, 1))
    dec = _jpeg_pixels(
        encode_jpeg_progressive(18, 20, px.tobytes(), subsample=True)
    )
    got = np.frombuffer(dec[3], dtype=np.uint8).reshape(20, 18, 3)
    assert np.array_equal(got, px)

    # mostly-flat image: long EOB runs + ZRL-in-refine paths
    px = np.full((32, 32, 1), 128, dtype=np.uint8)
    px[5, 7] = 250
    px[20, 25] = 3
    b = encode_jpeg_progressive(32, 32, px.tobytes(), channels=1)
    got = np.frombuffer(_jpeg_pixels(b)[3], dtype=np.uint8).reshape(32, 32, 1)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 1



_JPEGTOOL_C = r"""
/* differential harness: jpegtool enc <w> <h> <ch> <q> reads raw pixels
   on stdin, writes a PROGRESSIVE (jpeg_simple_progression) JPEG to
   stdout; jpegtool dec reads a JPEG, writes "w h ch\n" + raw pixels
   (plain upsampling + float IDCT so differences are codec-level). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>
static unsigned char *read_all(FILE *f, size_t *n) {
    size_t cap = 1 << 20, len = 0, r;
    unsigned char *buf = malloc(cap);
    while ((r = fread(buf + len, 1, cap - len, f)) > 0) {
        len += r;
        if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
    }
    *n = len;
    return buf;
}
int main(int argc, char **argv) {
    if (argc >= 2 && !strcmp(argv[1], "enc")) {
        int w = atoi(argv[2]), h = atoi(argv[3]), ch = atoi(argv[4]);
        int q = argc > 5 ? atoi(argv[5]) : 90;
        size_t n; unsigned char *px = read_all(stdin, &n);
        if ((int)n < w * h * ch) return 2;
        struct jpeg_compress_struct c; struct jpeg_error_mgr e;
        c.err = jpeg_std_error(&e);
        jpeg_create_compress(&c);
        unsigned char *out = NULL; unsigned long outn = 0;
        jpeg_mem_dest(&c, &out, &outn);
        c.image_width = w; c.image_height = h;
        c.input_components = ch;
        c.in_color_space = ch == 3 ? JCS_RGB : JCS_GRAYSCALE;
        jpeg_set_defaults(&c);
        jpeg_set_quality(&c, q, TRUE);
        jpeg_simple_progression(&c);
        jpeg_start_compress(&c, TRUE);
        while (c.next_scanline < c.image_height) {
            JSAMPROW row = px + (size_t)c.next_scanline * w * ch;
            jpeg_write_scanlines(&c, &row, 1);
        }
        jpeg_finish_compress(&c);
        fwrite(out, 1, outn, stdout);
        return 0;
    }
    if (argc >= 2 && !strcmp(argv[1], "dec")) {
        size_t n; unsigned char *buf = read_all(stdin, &n);
        struct jpeg_decompress_struct d; struct jpeg_error_mgr e;
        d.err = jpeg_std_error(&e);
        jpeg_create_decompress(&d);
        jpeg_mem_src(&d, buf, n);
        if (jpeg_read_header(&d, TRUE) != JPEG_HEADER_OK) return 3;
        d.do_fancy_upsampling = FALSE;
        d.dct_method = JDCT_FLOAT;
        jpeg_start_decompress(&d);
        int w = d.output_width, h = d.output_height, ch = d.output_components;
        printf("%d %d %d\n", w, h, ch);
        unsigned char *row = malloc((size_t)w * ch);
        while ((int)d.output_scanline < h) {
            JSAMPROW rp = row;
            jpeg_read_scanlines(&d, &rp, 1);
            fwrite(row, 1, (size_t)w * ch, stdout);
        }
        jpeg_finish_decompress(&d);
        return 0;
    }
    return 1;
}
"""


def test_jpeg_progressive_real_libjpeg_differential(tmp_path):
    """BOTH-DIRECTION differential against the system's REAL libjpeg
    (compiled on the fly; skips when gcc or jpeglib is absent):
    (1) libjpeg's own jpeg_simple_progression output must decode with
    `_jpeg_pixels` to within +-2 of libjpeg's reference decode (the
    residue is fixed-point vs float YCbCr conversion), across quality
    levels down to q=30 (coarse quant exercises the T.81 A.3.1 plane
    range-limit); (2) `encode_jpeg_progressive` output must be accepted
    and decoded by real libjpeg."""
    import os
    import shutil
    import subprocess

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_jpeg_progressive,
    )

    gcc = shutil.which("gcc") or shutil.which("cc")
    if not gcc or not os.path.exists("/usr/include/jpeglib.h"):
        pytest.skip("no gcc/jpeglib on this box")
    src = tmp_path / "jpegtool.c"
    src.write_text(_JPEGTOOL_C)
    tool = str(tmp_path / "jpegtool")
    try:
        subprocess.run(
            [gcc, "-O2", "-o", tool, str(src), "-ljpeg"],
            capture_output=True, check=True,
        )
    except subprocess.CalledProcessError:
        pytest.skip("libjpeg not linkable on this box")

    rng = np.random.default_rng(3)
    # direction 1: real encoder -> my decoder
    for (w, h, ch, q) in [
        (64, 48, 3, 95), (33, 17, 3, 85), (128, 96, 3, 75),
        (40, 40, 1, 92), (96, 128, 3, 30),
    ]:
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        base = np.stack([(xx * 5 + yy * 2) % 256] * ch, axis=-1)
        px = ((base + rng.integers(0, 30, size=(h, w, ch))) % 256).astype(
            np.uint8
        )
        enc = subprocess.run(
            [tool, "enc", str(w), str(h), str(ch), str(q)],
            input=px.tobytes(), capture_output=True, check=True,
        ).stdout
        assert b"\xff\xc2" in enc[:256]  # SOF2: really progressive
        mine = _jpeg_pixels(enc)
        assert mine is not None and mine[:3] == (w, h, ch)
        ref = subprocess.run(
            [tool, "dec"], input=enc, capture_output=True, check=True
        ).stdout
        hdr, raw = ref.split(b"\n", 1)
        assert tuple(map(int, hdr.split())) == (w, h, ch)
        a = np.frombuffer(mine[3], dtype=np.uint8).astype(int)
        b = np.frombuffer(raw[: w * h * ch], dtype=np.uint8).astype(int)
        assert np.abs(a - b).max() <= 2, (w, h, ch, q)
    # direction 2: my encoder -> real libjpeg decoder
    for (w, h, ch) in [(24, 16, 3), (17, 13, 1)]:
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        enc = encode_jpeg_progressive(w, h, px.tobytes(), channels=ch)
        ref = subprocess.run(
            [tool, "dec"], input=enc, capture_output=True, check=True
        ).stdout
        hdr, raw = ref.split(b"\n", 1)
        assert tuple(map(int, hdr.split())) == (w, h, ch)
        got = np.frombuffer(raw[: w * h * ch], dtype=np.uint8).astype(int)
        assert np.abs(got - px.astype(int).ravel()).max() <= 3


def test_extract_features_decoded_flag(spark):
    """The honesty contract (VERDICT r9): every extract_features row
    carries `decoded` + `codec` so downstream curation can tell real
    pixel statistics from the deterministic fake. One payload per real
    decoder, one opaque blob."""
    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_png,
        extract_features,
    )

    px = np.full((8, 8, 3), 100, dtype=np.uint8)
    gray = np.full((8, 8), 7, dtype=np.uint8)
    payloads = {
        1: (encode_png(8, 8, px.tobytes()), True, "png"),
        2: (encode_bmp(8, 8, px.tobytes()), True, "bmp"),
        3: (
            encode_gif(8, 8, gray.tobytes(), bytes(range(256)) * 3),
            True,
            "gif",
        ),
        4: (encode_jpeg(8, 8, px.tobytes()), True, "jpeg"),
        5: (encode_jpeg_progressive(8, 8, px.tobytes()), True, "jpeg"),
        6: (b"opaque video-ish payload", False, "fake"),
    }
    media = spark.createDataFrame(
        [
            (i, "image", bytearray(b), (8, 8, None, None, "application/x"))
            for i, (b, _, _) in payloads.items()
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    for i, (_, want_decoded, want_codec) in payloads.items():
        assert out[i]["decoded"] == want_decoded, i
        assert out[i]["codec"] == want_codec, i
    # progressive JPEG of constant color: real per-channel means
    feat = out[5]["feature"]
    assert abs(feat[0] - 100 / 255) < 0.02 and abs(feat[4]) < 0.02
    # fake features are hash-derived, not pixel stats
    assert out[6]["feature"] != out[4]["feature"]


def test_mp4_samples_container_walk():
    """_mp4_samples round-trips encode_mp4 exactly: stts timestamps,
    stss keyframes, stsc/stco/stsz sample byte extents, mdhd duration;
    non-MP4 payloads are rejected."""
    from inputlayer_spark.operators.multimodal import (
        _mp4_samples,
        encode_mp4,
    )

    frames = [bytes([k]) * (10 + k) for k in range(7)]
    b = encode_mp4(
        frames,
        timescale=1000,
        deltas=[100, 100, 200, 200, 100, 100, 100],
        keyframes=[1, 4],
        chunk_size=3,
    )
    codec, dur, samples = _mp4_samples(b)
    assert codec == "avc1"
    assert dur == 900  # sum of deltas at timescale 1000
    assert [s[0] for s in samples] == [0, 100, 200, 400, 600, 700, 800]
    assert [s[3] for s in samples] == [
        True, False, False, True, False, False, False,
    ]
    for k, (_, off, size, _) in enumerate(samples):
        assert b[off : off + size] == frames[k]
    # no stss box => every sample is a sync sample; single chunk
    b2 = encode_mp4(frames, keyframes=[])
    codec2, _, s2 = _mp4_samples(b2)
    assert all(s[3] for s in s2)
    assert [s[0] for s in s2] == [0, 100, 200, 300, 400, 500, 600]
    for k, (_, off, size, _) in enumerate(s2):
        assert b2[off : off + size] == frames[k]
    # rejects: AVI, PNG, junk, truncation
    assert _mp4_samples(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert _mp4_samples(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) is None
    assert _mp4_samples(b"") is None
    assert _mp4_samples(b[: len(b) // 2]) is None  # moov truncated away


def test_sample_video_frames_mp4_and_honesty_flags(spark):
    """sample_video_frames over an MP4: REAL container timing (stts),
    codec fourcc, per-sample byte hashes and keyframe flags — but
    decoded=false (no AVC pixel decode); MJPEG-AVI rows decoded=true;
    opaque payloads codec='fake'."""
    import hashlib

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        encode_avi_mjpeg,
        encode_jpeg,
        encode_mp4,
        sample_video_frames,
    )

    frames = [bytes([40 + k]) * 32 for k in range(4)]
    mp4 = encode_mp4(frames, timescale=1000, deltas=[250] * 4, keyframes=[1, 3])
    jpg = encode_jpeg(
        8, 8, np.full((8, 8, 3), 200, dtype=np.uint8).tobytes()
    )
    avi = encode_avi_mjpeg([jpg, jpg], fps=2)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(mp4), (None, None, None, None, "video/mp4")),
            (2, "video", bytearray(avi), (None, None, None, None, "video/avi")),
            (3, "video", bytearray(b"opaque"), (None, None, None, 1000, "video/x")),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:long,mime:string>",
    )
    rows = sample_video_frames(media, every_ms=250).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    mp4_rows = sorted(by_media[1], key=lambda r: r["frame_ts_ms"])
    assert [r["frame_ts_ms"] for r in mp4_rows] == [0, 250, 500, 750]
    assert all(r["decoded"] is False for r in mp4_rows)
    assert all(r["codec"] == "avc1" for r in mp4_rows)
    assert [r["keyframe"] for r in mp4_rows] == [True, False, True, False]
    assert [r["content_sha"] for r in mp4_rows] == [
        hashlib.sha256(f).hexdigest() for f in frames
    ]
    avi_rows = by_media[2]
    assert all(r["decoded"] and r["codec"] == "mjpeg" and r["keyframe"]
               for r in avi_rows)
    stub_rows = by_media[3]
    assert all(
        r["decoded"] is False and r["codec"] == "fake" for r in stub_rows
    )


def test_decoder_bomb_guards():
    """Decode-bomb hardening for untrusted corpora: crafted headers
    declaring huge dimensions (PNG/GIF/JPEG) or sample counts (MP4
    stts), and inflate bombs whose output dwarfs the declared dims,
    must be REJECTED in O(header) time — they fall back to the fake
    kernel with decoded=false instead of OOM-ing the executor. Good
    payloads keep decoding."""
    import struct
    import time
    import zlib

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _gif_pixels,
        _jpeg_pixels,
        _mp4_samples,
        _png_pixels,
        encode_gif,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_mp4,
        encode_png,
    )

    def png_chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(c[4:]))

    t0 = time.perf_counter()
    bomb = zlib.compress(b"\x00" * (10 * 1024 * 1024), 9)  # 10MB -> ~10KB
    # PNG declaring 20000x20000
    ihdr = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0))
    png_bomb = (b"\x89PNG\r\n\x1a\n" + ihdr + png_chunk(b"IDAT", bomb)
                + png_chunk(b"IEND", b""))
    assert _png_pixels(png_bomb) is None
    # PNG with sane dims but a 10MB inflate bomb: bounded decompressobj
    # reads only the needed bytes and decodes the real prefix
    ihdr2 = png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
    png_bomb2 = (b"\x89PNG\r\n\x1a\n" + ihdr2 + png_chunk(b"IDAT", bomb)
                 + png_chunk(b"IEND", b""))
    assert _png_pixels(png_bomb2)[:3] == (4, 4, 3)
    # GIF declaring 65535x65535
    gif_bomb = (b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x80, 0, 0)
                + b"\x00\x00\x00" * 2
                + b"\x2c" + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
                + b"\x02" + b"\x01\x00" + b"\x00" + b"\x3b")
    assert _gif_pixels(gif_bomb) is None
    # JPEG SOF0/SOF2 rewritten to declare 65500x65500
    good = encode_jpeg(8, 8, np.zeros((8, 8, 3), np.uint8).tobytes())
    goodp = encode_jpeg_progressive(8, 8, np.zeros((8, 8, 3), np.uint8).tobytes())
    for payload, marker in ((good, b"\xff\xc0"), (goodp, b"\xff\xc2")):
        hacked = bytearray(payload)
        sof = hacked.find(marker)
        hacked[sof + 5 : sof + 9] = struct.pack(">HH", 65500, 65500)
        assert _jpeg_pixels(bytes(hacked)) is None
    # MP4 stts run declaring ~4 billion samples
    mp4 = encode_mp4([b"x" * 8] * 3)
    hacked4 = bytearray(mp4)
    i = hacked4.find(b"stts")
    hacked4[i + 8 : i + 12] = struct.pack(">I", 1)
    hacked4[i + 12 : i + 16] = struct.pack(">I", 0xFFFFFFF0)
    assert _mp4_samples(bytes(hacked4)) is None
    # every rejection above must be near-instant (header-time, no alloc)
    assert time.perf_counter() - t0 < 5.0
    # good payloads still decode after hardening
    assert _png_pixels(encode_png(8, 8, bytes(192)))[:3] == (8, 8, 3)
    assert _gif_pixels(encode_gif(4, 4, bytes(16), bytes([1, 2, 3])))[:3] == (4, 4, 3)
    assert _jpeg_pixels(good)[:3] == (8, 8, 3)
    assert _jpeg_pixels(goodp)[:3] == (8, 8, 3)
    assert _mp4_samples(mp4) is not None


def test_wav_features_truncated_payload():
    """A WAV truncated mid-frame (common in a crawled corpus) must not
    crash the kernel: frombuffer/reshape only ever see whole frames;
    header-only payloads report container metadata with NULL signal
    stats."""
    import io
    import wave

    import numpy as np

    from inputlayer_spark.operators.multimodal import _wav_features

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    sig = (np.sin(np.arange(800) / 10) * 20000).astype("<i2")
    w.writeframes(np.repeat(sig, 2).tobytes())
    w.close()
    good = buf.getvalue()
    full = _wav_features(good)
    assert full[3] is not None and full[0] == 8000
    # ends mid-frame: stats computed over the whole frames present
    trunc = _wav_features(good[:-3])
    assert trunc is not None and abs(trunc[3] - full[3]) < 0.01
    # header only: metadata row, NULL rms/zcr
    hdr = _wav_features(good[:44])
    assert hdr == (8000, 2, 100, None, None)


def test_jpeg_undefined_table_falls_back():
    """A scan referencing an undefined Huffman table id (malformed
    stream) must return None — a KeyError escaping the decoder would
    fail the whole executor task on one bad web image."""
    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for enc in (encode_jpeg, encode_jpeg_progressive):
        payload = bytearray(enc(8, 8, np.zeros((8, 8, 3), np.uint8).tobytes()))
        i = payload.find(b"\xff\xda")
        payload[i + 6] = 0x33  # DC/AC table 3: never defined
        assert _jpeg_pixels(bytes(payload)) is None


def test_decoder_corruption_fuzz():
    """Seeded corruption fuzz over every binary decoder: random byte
    flips / deletions / insertions on valid payloads must yield a
    decode or None — never an exception (one bad crawled file must not
    fail an executor task). 150 mutants per format."""
    import io
    import wave

    import numpy as np

    from inputlayer_spark.operators.multimodal import (
        _avi_mjpeg_frames,
        _bmp_pixels,
        _gif_pixels,
        _jpeg_pixels,
        _mp4_samples,
        _png_pixels,
        _wav_features,
        encode_avi_mjpeg,
        encode_bmp,
        encode_gif,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_mp4,
        encode_png,
    )

    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    jb = encode_jpeg(16, 16, px.tobytes())
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(bytes(1600))
    w.close()
    payloads = [
        (encode_png(16, 16, px.tobytes()), _png_pixels),
        (encode_bmp(16, 16, px.tobytes()), _bmp_pixels),
        (encode_gif(8, 8, bytes(range(64)), bytes(range(256)) * 3), _gif_pixels),
        (jb, _jpeg_pixels),
        (encode_jpeg_progressive(16, 16, px.tobytes()), _jpeg_pixels),
        (encode_mp4([b"x" * 9] * 4, deltas=[100] * 4), _mp4_samples),
        (encode_avi_mjpeg([jb, jb], fps=4), _avi_mjpeg_frames),
        (buf.getvalue(), _wav_features),
    ]
    for base, dec in payloads:
        base = bytearray(base)
        for _ in range(150):
            m = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                kind = rng.integers(0, 3)
                pos = int(rng.integers(0, len(m)))
                if kind == 0:
                    m[pos] = int(rng.integers(0, 256))
                elif kind == 1:
                    del m[pos : pos + int(rng.integers(1, 9))]
                else:
                    m[pos:pos] = bytes(
                        rng.integers(0, 256, int(rng.integers(1, 9)), dtype=np.uint8)
                    )
            dec(bytes(m))  # decode-or-None; an exception fails the test


def test_lm_score_hand_computed(spark):
    """lm_score equals the hand-computed add-alpha bigram model on a
    tiny corpus; one-token and empty docs produce no rows."""
    import math

    from inputlayer_spark.functions.text import lm_score

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, "zx qw zx qw"),
            (4, "single"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 3
    cb = {("the", "cat"): 2, ("cat", "sat"): 2, ("sat", "on"): 1,
          ("on", "the"): 1, ("the", "mat"): 1, ("zx", "qw"): 2, ("qw", "zx"): 1}
    cu: dict = {}
    for (w1, _), c in cb.items():
        cu[w1] = cu.get(w1, 0) + c
    V, a = 8.0, 0.5  # distinct tokens incl. 'single'

    def lp(w1, w2):
        return math.log((cb[(w1, w2)] + a) / (cu[w1] + a * V))

    doc1 = [("the", "cat"), ("cat", "sat"), ("sat", "on"),
            ("on", "the"), ("the", "mat")]
    assert out[1]["avg_logprob"] == round(sum(lp(*p) for p in doc1) / 5, 6)
    # gibberish doc 3 scores lower than natural doc 2 ordering holds on
    # this corpus by construction of the counts
    assert out[2]["avg_logprob"] > out[1]["avg_logprob"]


def test_source_quality_filter(spark):
    """Source-level curation: stats aggregate correctly (incl. the
    exact-dup fraction) and filter_by_source_quality drops entire
    failing sources via the broadcast semi-join."""
    from inputlayer_spark.operators.sampling import (
        filter_by_source_quality,
        source_quality_stats,
    )

    rows = [
        # good source: varied, natural text
        (1, "the cat sat on the mat and it was a good day for everyone", "good"),
        (2, "a fine meal is worth the wait and the effort of cooking it", "good"),
        # boilerplate farm: one text duplicated
        (3, "click here to subscribe", "farm"),
        (4, "click here to subscribe", "farm"),
        (5, "click here to subscribe", "farm"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    stats = {r["source"]: r for r in source_quality_stats(df).collect()}
    assert stats["good"]["n_docs"] == 2 and stats["good"]["dup_fraction"] == 0.0
    assert stats["farm"]["n_docs"] == 3
    assert abs(stats["farm"]["dup_fraction"] - (1 - 1 / 3)) < 1e-9
    kept = filter_by_source_quality(df, max_dup_fraction=0.5).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]
    # min_docs gate drops small sources wholesale
    kept2 = filter_by_source_quality(df, min_docs=3).collect()
    assert sorted(r["doc_id"] for r in kept2) == [3, 4, 5]


# ---------------------------------------------------------------------------
# dedup_spans — exact-substring (token-window) dedup, Lee et al. 2022
# ---------------------------------------------------------------------------


def test_dedup_spans_removes_repeated_window_everywhere(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    boiler = "alpha bravo charlie delta"  # 4-token span
    rows = [
        (1, f"one two {boiler} three"),
        (2, f"{boiler} four five six"),
        (3, "unique text with no duplicated span at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_spans(df, "doc_id", "text", window=4, max_freq=1).collect()
    }
    # the span occurs twice corpus-wide -> removed from BOTH docs
    assert out[1] == "one two three"
    assert out[2] == "four five six"
    assert out[3] == "unique text with no duplicated span at all"


def test_dedup_spans_catches_within_document_repeats(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    # the same 3-token window twice INSIDE one doc counts as duplicated
    df = spark.createDataFrame(
        [(1, "x y z pad1 pad2 x y z tail"), (2, "totally different words here")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_spans(df, "doc_id", "text", window=3, max_freq=1).collect()
    }
    assert out[1] == "pad1 pad2 tail"
    assert out[2] == "totally different words here"


def test_dedup_spans_overlapping_windows_merge_into_one_span(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    # a 5-token duplicated run with window=3 -> three overlapping dup
    # windows whose covered positions union to the full 5-token span
    run = "a b c d e"
    df = spark.createDataFrame(
        [(1, f"keep1 {run} keep2"), (2, f"pre {run} post")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_spans(df, "doc_id", "text", window=3, max_freq=1).collect()
    }
    assert out[1] == "keep1 keep2"
    assert out[2] == "pre post"


def test_dedup_spans_fully_duplicated_doc_comes_back_empty(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(1, "same four tokens here"), (2, "same four tokens here")],
        ["doc_id", "text"],
    )
    out = dedup_spans(df, "doc_id", "text", window=4, max_freq=1)
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows == {1: "", 2: ""}  # rows kept, text emptied


def test_dedup_spans_short_docs_have_no_windows(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    # both docs are shorter than the window -> nothing can be removed,
    # even though they are identical (document-level dedup's job, not
    # span dedup's)
    df = spark.createDataFrame([(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r["text"]
        for r in dedup_spans(df, "doc_id", "text", window=8).collect()
    }
    assert rows == {1: "tiny doc", 2: "tiny doc"}


def test_dedup_spans_max_freq_tolerates_allowed_repeats(spark):
    from inputlayer_spark.operators.dedup import dedup_spans

    boiler = "p q r s"
    rows = [(i, f"doc{i} {boiler} end{i}") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # max_freq=3 allows up to 3 occurrences -> kept everywhere
    kept = dedup_spans(df, "doc_id", "text", window=4, max_freq=3).collect()
    assert all(boiler in r["text"] for r in kept)
    # max_freq=2 -> 3 occurrences exceed it -> removed everywhere
    cut = dedup_spans(df, "doc_id", "text", window=4, max_freq=2).collect()
    assert all(boiler not in r["text"] for r in cut)


# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup (cluster-confined cosine pruning)
# ---------------------------------------------------------------------------


def _unit(i, dim=8, bump=0.0):
    v = [0.0] * dim
    v[i % dim] = 1.0
    if bump:
        v[(i + 1) % dim] = bump
    return [float(x) for x in v]


def test_semantic_dedup_drops_higher_id_near_duplicate(spark):
    from inputlayer_spark.operators.dedup import semantic_dedup

    rows = [
        (0, _unit(0)),
        (1, _unit(1)),
        (2, _unit(0, bump=0.05)),  # near-dup of vec 0 -> same cluster, dropped
        (3, _unit(1, bump=0.05)),  # near-dup of vec 1 -> same cluster, dropped
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(df, "vec_id", "embedding", k=2, iters=2, threshold=0.95)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1]


def test_semantic_dedup_different_clusters_never_compared(spark):
    from inputlayer_spark.operators.dedup import semantic_dedup

    # orthogonal vectors -> k=4 puts them in distinct clusters; even a
    # threshold of 0 cannot dedup across clusters
    rows = [(i, _unit(i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = semantic_dedup(df, "vec_id", "embedding", k=4, iters=2, threshold=0.0)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 2, 3]


def test_semantic_dedup_invalid_vectors_kept_with_null_cluster(spark):
    from pyspark.sql import types as T

    from inputlayer_spark.operators.dedup import semantic_dedup

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(0, _unit(0)), (1, _unit(1)), (2, None), (3, _unit(0, bump=0.01))]
    df = spark.createDataFrame(rows, schema)
    out = {r["vec_id"]: r["cluster"] for r in
           semantic_dedup(df, "vec_id", "embedding", k=2, iters=2,
                          threshold=0.9).collect()}
    assert 2 in out and out[2] is None  # NULL vector kept, cluster NULL
    assert 3 not in out  # near-dup of 0 dropped
    assert out[0] is not None and out[1] is not None


def test_semantic_dedup_default_k_scales_with_corpus(spark):
    """VERDICT r10 #4: the SemDeDup k ∝ n design point lives IN the
    operator — with k=None (the default) a 1500-row corpus derives
    k = ceil(1500/250) = 6, NOT the old fixed k=4, so per-cluster
    populations (and the within-cluster pair join) stay bounded by
    target_cluster_size instead of going quadratic in n."""
    from inputlayer_spark.operators.dedup import semantic_dedup

    # 6 orthogonal directions, 250 rows each; ids 0..5 hit all six
    # directions so the deterministic smallest-id k-means init seeds one
    # centroid per direction and populations land exactly on the target
    rows = [(i, _unit(i % 6)) for i in range(1500)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # threshold > 1 keeps every row: the assertion is about clustering
    # shape, not survivor choice
    out = semantic_dedup(df, "vec_id", "embedding", threshold=1.01).collect()
    assert len(out) == 1500
    pops: dict = {}
    for r in out:
        pops[r["cluster"]] = pops.get(r["cluster"], 0) + 1
    assert len(pops) == 6  # derived k, not the legacy default of 4
    assert max(pops.values()) <= 250  # bounded by target_cluster_size
    # the pair join's work is sum-over-clusters C(c,2) — two orders of
    # magnitude under the corpus-quadratic C(1500,2)
    pair_work = sum(c * (c - 1) // 2 for c in pops.values())
    assert pair_work <= 6 * (250 * 249 // 2)


def test_semantic_dedup_oversized_cluster_block_split_matches(spark):
    """r14 (VERDICT r13 #3): clusters above max_cluster_rows split into
    id-ordered block-PAIR kernel tasks. The block enumeration must be
    result-identical to the one-task-per-cluster kernel, incl. the
    zero-vector rule across blocks."""
    from inputlayer_spark.operators.dedup import semantic_dedup

    # mixed corpus: 3 directions x 20 rows with per-row bumps (some
    # pairs land under the threshold), plus two zero vectors in the
    # middle of the id range
    rows = []
    for i in range(60):
        rows.append((i, _unit(i % 3, bump=0.02 * ((i // 3) % 7))))
    rows.append((60, [0.0] * 8))
    rows.append((61, [0.0] * 8))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    whole = semantic_dedup(df, "vec_id", "embedding", k=3, iters=2,
                           threshold=0.95)
    split = semantic_dedup(df, "vec_id", "embedding", k=3, iters=2,
                           threshold=0.95, max_cluster_rows=7)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, split.collect())
    )


def test_semantic_dedup_degenerate_single_cluster_bounded(spark):
    """A degenerate corpus (identical embeddings -> giant k-means
    clusters regardless of k) must not hand one Python task the whole
    corpus: with max_cluster_rows=8 every kernel task sees at most two
    8-row blocks, and the survivor set is identical to the one-task
    kernel's (greedy-by-id: one survivor per cluster)."""
    from inputlayer_spark.operators.dedup import semantic_dedup

    rows = [(i, _unit(0)) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    whole = sorted(
        map(tuple, semantic_dedup(df, "vec_id", "embedding", k=4, iters=2,
                                  threshold=0.95).collect())
    )
    split = sorted(
        map(tuple, semantic_dedup(df, "vec_id", "embedding", k=4, iters=2,
                                  threshold=0.95,
                                  max_cluster_rows=8).collect())
    )
    assert whole == split
    # identical vectors: everything above the threshold, so exactly one
    # survivor per populated cluster
    assert len(split) < 8


# ---------------------------------------------------------------------------
# dsir_weights — hashed n-gram importance weights
# ---------------------------------------------------------------------------


def test_dsir_weights_favor_target_like_documents(spark):
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.sampling import dsir_weights

    target_text = "protein binding enzyme substrate kinase pathway"
    rows = (
        [(i, target_text, True) for i in range(5)]
        + [(10 + i, "football match goal referee stadium crowd", False) for i in range(5)]
        + [(20, target_text, False)]  # raw doc that LOOKS like target
        + [(21, "football match goal referee stadium crowd", False)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_tgt"])
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(df, "doc_id", "text", F.col("is_tgt"), buckets=64).collect()
    }
    # the target-like raw doc must outscore the football doc
    assert w[20] > w[21]


def test_dsir_weights_empty_text_gets_zero(spark):
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame(
        [(1, "some words here", True), (2, "", False)], ["doc_id", "text", "t"]
    )
    out = {r["doc_id"]: (r["n_grams"], r["weight"]) for r in
           dsir_weights(df, "doc_id", "text", F.col("t"), buckets=16).collect()}
    # empty text still yields the degenerate empty shingle (parity with
    # the SQL oracle's _SHINGLES semantics) but never NULL/NaN
    assert out[2][1] is not None and out[1][1] is not None


def test_dsir_weights_rejects_bad_buckets(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from inputlayer_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame([(1, "x", True)], ["doc_id", "text", "t"])
    with _pytest.raises(ValueError):
        dsir_weights(df, "doc_id", "text", F.col("t"), buckets=0)


# ---------------------------------------------------------------------------
# bm25_search
# ---------------------------------------------------------------------------


def test_bm25_ranks_matching_docs_first(spark):
    from inputlayer_spark.functions.text import bm25_search

    rows = [
        (1, "spark shuffle partition spark shuffle"),
        (2, "spark appears once here"),
        (3, "completely unrelated words only"),
        (4, "shuffle shuffle shuffle but no s-word"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_search(df, "doc_id", "text", "spark shuffle", k=4).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1  # both terms, repeated
    assert 3 not in ids  # no query term -> no posting -> absent
    assert all(out[i]["score"] >= out[i + 1]["score"] for i in range(len(out) - 1))


def test_bm25_idf_downweights_common_terms(spark):
    from inputlayer_spark.functions.text import bm25_search

    # 'the' occurs in every doc, 'zebra' in one: the zebra doc must beat
    # docs matching only the ubiquitous term
    rows = [(i, "the filler text") for i in range(9)] + [(9, "the zebra")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_search(df, "doc_id", "text", "the zebra", k=3).collect()
    assert out[0]["doc_id"] == 9


def test_bm25_empty_query_returns_empty(spark):
    from inputlayer_spark.functions.text import bm25_search

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert bm25_search(df, "doc_id", "text", "   ", k=5).count() == 0
    assert bm25_search(df, "doc_id", "text", "a", k=0).count() == 0


# ---------------------------------------------------------------------------
# gopher_quality_flags — Gopher/MassiveText rule battery
# ---------------------------------------------------------------------------


def test_gopher_gates_fire_individually(spark):
    from inputlayer_spark.functions.text import gopher_quality_flags

    good = "the quick brown fox jumps over the lazy dog and runs " * 5
    rows = [
        (1, good),                                   # passes everything
        (2, "too short for the gate"),               # word count
        (3, "a " * 60),                              # mean word length < 3
        (4, good + " ###### ##### ####"),            # symbol ratio
        (5, ("12345 " * 60)),                        # no alphabetic words
        (6, "zebra giraffe lion tiger elephant " * 12),  # no stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           gopher_quality_flags(df, "doc_id", "text", min_words=30).collect()}
    assert out[1]["passes"]
    assert not out[2]["ok_words"] and not out[2]["passes"]
    assert not out[3]["ok_mean_len"]
    assert not out[4]["ok_symbols"]
    assert not out[5]["ok_alpha"]
    assert not out[6]["ok_stopwords"]
    # every failing doc fails ONLY through its target gate conjunction
    assert all(not out[i]["passes"] for i in (2, 3, 4, 5, 6))


def test_gopher_empty_text_fails_closed(spark):
    from inputlayer_spark.functions.text import gopher_quality_flags

    df = spark.createDataFrame([(1, ""), (2, None)], ["doc_id", "text"])
    rows = gopher_quality_flags(df, "doc_id", "text", min_words=1).collect()
    assert all(not r["passes"] for r in rows)
    assert all(r["n_words"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# gopher_repetition_flags — Gopher/MassiveText repetition battery (§A.1.2)
# ---------------------------------------------------------------------------


def test_gopher_repetition_segment_metrics(spark):
    from inputlayer_spark.functions.text import gopher_repetition_flags

    rows = [
        (1, "alpha beta\nalpha beta\ngamma delta"),           # dup line
        (5, "p1 aa bb\n\np1 aa bb\n\nzz yy"),                 # dup paragraph
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           gopher_repetition_flags(df, "doc_id", "text").collect()}
    # doc 1: 3 lines, 1 repeat occurrence; repeat carries 10 of 31 chars
    assert out[1]["dup_line_frac"] == 0.333333
    assert out[1]["dup_line_char_frac"] == 0.322581
    assert out[1]["dup_para_frac"] == 0.0
    # doc 5: dup line AND dup paragraph (paragraphs split on blank line)
    assert out[5]["dup_para_frac"] == 0.333333
    assert out[5]["dup_para_char_frac"] == 0.380952


def test_gopher_repetition_top_ngram_product_definition(spark):
    from inputlayer_spark.functions.text import gopher_repetition_flags

    df = spark.createDataFrame(
        [(1, "alpha beta\nalpha beta\ngamma delta"),
         (3, " ".join(["spam"] * 10)),
         (7, "one two")],                       # shorter than n=3,4
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           gopher_repetition_flags(df, "doc_id", "text").collect()}
    # doc 1: "alpha beta" occurs twice, 9 n-gram chars, 28 token chars
    assert out[1]["top_2gram_char_frac"] == 0.642857  # 2*9/28
    # doc 3: overlapping occurrences legitimately exceed 1.0
    # ("spam spam" x9 * 8 chars / 40 token chars)
    assert out[3]["top_2gram_char_frac"] == 1.8
    assert not out[3]["passes"]
    # fewer tokens than n -> 0.0, not a degenerate whole-doc gram
    assert out[7]["top_3gram_char_frac"] == 0.0
    assert out[7]["top_4gram_char_frac"] == 0.0


def test_gopher_repetition_coverage_no_double_count(spark):
    from inputlayer_spark.functions.text import gopher_repetition_flags

    # one duplicated 5-gram covering tokens 1-5 and 6-10 of 15: exactly
    # 10 of 15 single-char tokens covered (position counting — the
    # overlap-safe definition), never 2*5*len/15
    text = "a b c d e a b c d e f g h i j"
    df = spark.createDataFrame([(1, text), (2, " ".join(["x"] * 10))],
                               ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           gopher_repetition_flags(df, "doc_id", "text").collect()}
    assert out[1]["dup_5gram_char_frac"] == 0.666667  # 10/15
    # all-identical doc: every token covered for n<=9, but the single
    # 10-gram of a 10-token doc has no duplicate
    assert out[2]["dup_5gram_char_frac"] == 1.0
    assert out[2]["dup_10gram_char_frac"] == 0.0


def test_gopher_repetition_null_and_clean_docs(spark):
    from inputlayer_spark.functions.text import gopher_repetition_flags

    # all-distinct doc long enough that even the singleton top n-gram
    # fraction sits under the thresholds (like Gopher, these gates run
    # after the A.1.1 min-word gate — VERY short docs fail top_ngram
    # through their singleton gram, by design)
    clean = " ".join(f"w{i:02d}" for i in range(40))
    df = spark.createDataFrame([(1, None), (2, clean)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           gopher_repetition_flags(df, "doc_id", "text").collect()}
    # NULL text = empty document: every fraction 0, passes (the A.1.1
    # battery is what rejects empty docs, via min_words)
    assert all(out[1][c] == 0.0 for c in out[1].asDict()
               if c.endswith("_frac"))
    assert out[1]["passes"]
    # distinct-token doc passes every repetition gate
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["passes"]


# c4_clean's whitespace contract: the explicit ASCII class shared by all
# three implementations (Spark Java regex, DuckDB RE2 oracle, this
# reference) — ADVICE r11: Python's .strip()/\s are Unicode (NBSP,
# U+2028), RE2's \s excludes \x0B, Java's \s is exactly this set.
_C4_WS = " \t\n\x0b\f\r"


def _py_c4_clean(text, min_words_per_line=3, min_sentences=5, badwords=()):
    """Pure-Python third implementation of the C4 battery."""
    import re as _re

    raw = text or ""
    lines = [s.strip(_C4_WS) for s in raw.split("\n") if s.strip(_C4_WS)]

    def line_ok(s):
        if not _re.search(r'[.!?]"?$', s):
            return False
        if len([w for w in _re.split(f"[{_C4_WS}]+", s) if w]) < min_words_per_line:
            return False
        if _re.search(r"(^|[^a-z0-9])javascript([^a-z0-9]|$)", s.lower()):
            return False
        return True

    kept = [s for s in lines if line_ok(s)]
    clean = "\n".join(kept)
    n_sent = len([s for s in _re.split(r"[.!?]", clean) if s.strip(_C4_WS)])
    toks = [t for t in _re.split(r"[^a-z0-9']+", clean.strip().lower()) if t]
    has_bad = bool(set(toks) & {w.lower() for w in badwords})
    has_lorem = "lorem ipsum" in raw.lower()
    has_brace = "{" in raw or "}" in raw
    return {
        "clean_text": clean,
        "n_lines_kept": len(kept),
        "n_sentences": n_sent,
        "has_badword": has_bad,
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "keep": n_sent >= min_sentences
        and not has_bad and not has_lorem and not has_brace,
    }


def test_c4_clean_random_differential(spark):
    """Seeded random-text differential vs the pure-Python reference:
    punctuation-ended and bare lines, quotes after punctuation,
    javascript mentions, braces, lorem ipsum, short lines — mixed
    freely, including whitespace-only lines, None, and tab/CR-edged
    lines (ADVICE r10: the edge-trim must strip FULL ASCII whitespace,
    not just spaces — '.\\t' and '.\\r' endings exercise exactly that
    divergence). ADVICE r11 fixtures: '.\\x0b' (vertical tab — in Java's
    \\s but NOT RE2's; the explicit shared class must treat it as
    whitespace everywhere) and '.\\xa0' (NBSP — Unicode whitespace to
    Python's bare .strip() but NOT in the ASCII contract: an NBSP-edged
    line keeps its NBSP, so the terminal-punct gate must FAIL it
    identically in all three implementations)."""
    import random

    from inputlayer_spark.functions.text import c4_clean

    rng = random.Random(4041)
    frag = ["the quick fox", "x", "see the docs", "enable javascript now",
            "one two three four", "ok fine", "lorem ipsum dolor", "code { y }",
            "\ttabbed lead here"]
    tail = [".", "!", "?", '."', "", " ", "", ".\t", ".\r", "\t",
            ".\x0b", ".\xa0", "\xa0here.", ".\x0b\xa0"]
    rows = []
    for i in range(60):
        n_lines = rng.randint(0, 7)
        lines = [rng.choice(frag) + rng.choice(tail) for _ in range(n_lines)]
        if rng.random() < 0.2:
            lines.append("   ")
        txt = "\n".join(lines) if lines else (None if rng.random() < 0.5 else "")
        rows.append((i, txt))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in
           c4_clean(df, "doc_id", "text", min_sentences=2,
                    badwords=("fox",)).collect()}
    for i, txt in rows:
        want = _py_c4_clean(txt, min_sentences=2, badwords=("fox",))
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, repr(txt))


# ---------------------------------------------------------------------------
# web_pipeline — cleaning-trilogy composition (driver row)
# ---------------------------------------------------------------------------


def test_carry_passthrough_keeps_metadata(spark):
    """The carry API on normalize_text / c4_clean /
    gopher_quality_flags passes metadata columns through unchanged —
    the composition primitive that keeps pipelines straight-line."""
    from inputlayer_spark.functions.text import (
        c4_clean,
        gopher_quality_flags,
        normalize_text,
    )

    df = spark.createDataFrame(
        [(1, "good solid line one here. and a second sentence too. "
             "and the third is for it.", "web")],
        "doc_id int, text string, src string",
    )
    n = normalize_text(df, "doc_id", "text", carry=("src",))
    assert n.columns == ["doc_id", "src", "norm_text", "changed"]
    assert n.collect()[0]["src"] == "web"
    c = c4_clean(df, "doc_id", "text", min_sentences=1, carry=("src",))
    assert c.columns[:2] == ["doc_id", "src"]
    assert c.collect()[0]["src"] == "web"
    g = gopher_quality_flags(df, "doc_id", "text", min_words=1,
                             carry=("src", "text"))
    assert g.columns[:3] == ["doc_id", "src", "text"]
    assert g.collect()[0]["src"] == "web"


def test_web_pipeline_funnel_is_active(spark):
    """The composition row must actually FILTER at every stage: the
    per-source rollup covers some-but-not-all documents (c4 keeps a
    strict subset, gopher passes a strict subset of those), and token
    counts are positive — an all-pass or all-fail pipeline would make
    the oracle row a trivial hash match."""
    import __spark_entry__ as entry

    out = entry.queries()["web_pipeline"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows, "pipeline must keep survivors"
    total = sum(r["n_docs"] for r in rows)
    assert 0 < total < 500
    assert all(r["n_tokens"] > 0 for r in rows)
    assert sorted(out.columns) == ["n_docs", "n_tokens", "source"]


def test_normalize_text_is_idempotent(spark):
    """A canonicalizer must be a fixpoint: normalize(normalize(x)) ==
    normalize(x), and changed==False on the second pass — over random
    unicode soup (combining marks, NFC singletons, C0 controls, CRLF,
    whitespace runs, newline stacks)."""
    import random

    from inputlayer_spark.functions.text import normalize_text

    rng = random.Random(99)
    atoms = ["a", "e", chr(0x301), chr(0x212B), chr(0x2126), " ", "  ",
             "\t", "\r\n", "\n", "\n\n\n", chr(1), chr(0x0B), "word",
             chr(0xFB01), "."]
    rows = [(i, "".join(rng.choice(atoms) for _ in range(rng.randint(0, 30))))
            for i in range(50)]
    # explicit edge fixtures (ADVICE r10): a C0 control between base and
    # combining mark blocks NFC composition unless the strip runs FIRST
    # — pinned here so the property never depends on seed luck
    rows.append((100, "e" + chr(1) + chr(0x301)))
    rows.append((101, "e" + chr(0x0B) + chr(0x301) + " x\r\n" + chr(2) + chr(0x301)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    once = normalize_text(df, "doc_id", "text")
    twice = normalize_text(
        once.withColumnRenamed("norm_text", "text").select("doc_id", "text"),
        "doc_id",
        "text",
    )
    a = {r["doc_id"]: r["norm_text"] for r in once.collect()}
    b = {r["doc_id"]: r for r in twice.collect()}
    for i in a:
        assert b[i]["norm_text"] == a[i], (i, repr(a[i]), repr(b[i]["norm_text"]))
        assert not b[i]["changed"], (i, repr(a[i]))
    # and the fixture's output must be the COMPOSED form: stripping the
    # control first exposes the base+mark adjacency to NFC
    assert a[100] == chr(0xE9), repr(a[100])  # U+00E9, not 'e'+U+0301


# ---------------------------------------------------------------------------
# c4_clean — C4 line/page cleaning battery (Raffel et al. 2020 §2.2)
# ---------------------------------------------------------------------------


def test_c4_line_filters(spark):
    from inputlayer_spark.functions.text import c4_clean

    text = ("Good line one here.\n"
            "short.\n"                        # < 3 words
            "No punct line at all\n"          # no terminal punct
            "Another good line stays!\n"
            'Ends with quote."\n'              # punct + closing quote
            "Has javascript enabled today.\n"  # javascript word
            "Fifth good sentence here. Sixth one too. Seventh also.")
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = c4_clean(df, "doc_id", "text").collect()[0]
    kept = r["clean_text"].split("\n")
    assert r["n_lines_kept"] == 4
    assert "short." not in kept
    assert all("javascript" not in l for l in kept)
    assert all(not l.endswith("all") for l in kept)
    assert r["n_sentences"] == 6 and r["keep"]


def test_c4_page_gates(spark):
    from inputlayer_spark.functions.text import c4_clean

    rows = [
        (1, "This page mentions lorem ipsum dolor. Enough words here. One two three. Four five six. Seven eight nine."),
        (2, "Code page { x } here. Sentence two here. Three four five. Six seven eight. Nine ten eleven."),
        (3, "badword page here now. it repeats fine. one more two. two more three. three more sentences."),
        (4, "Too few sentences here. Only two appear."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in
           c4_clean(df, "doc_id", "text", badwords=("badword",)).collect()}
    assert out[1]["has_lorem_ipsum"] and not out[1]["keep"]
    assert out[2]["has_brace"] and not out[2]["keep"]
    assert out[3]["has_badword"] and not out[3]["keep"]
    assert out[4]["n_sentences"] == 2 and not out[4]["keep"]
    # NULL fails closed: empty page, keep false, no gate NULL-poisoned
    assert out[5]["clean_text"] == "" and not out[5]["keep"]
    assert out[5]["has_badword"] is False


def _py_gopher_repetition(text):
    """Pure-Python third implementation of the repetition battery —
    independent of both the Spark expressions and the DuckDB oracle."""
    import re as _re

    text = text or ""

    def frac6(num, den):
        # HALF_UP on the exact binary value of the double — what Spark's
        # round() and DuckDB's round() both do; Python's round() is
        # half-to-even and diverges on exact halves like 25/128
        import decimal

        if den == 0:
            return 0.0
        return float(
            decimal.Decimal(num / den).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def seg_stats(sep):
        segs = [_re.sub(r"^\s+|\s+$", "", s) for s in _re.split(sep, text)]
        segs = [s for s in segs if s]
        n = len(segs)
        seen, dup_occ, dup_chars = set(), 0, 0
        for s in segs:
            if s in seen:
                dup_occ += 1
                dup_chars += len(s)
            seen.add(s)
        total = sum(len(s) for s in segs)
        return frac6(dup_occ, n), frac6(dup_chars, total)

    toks = [t for t in _re.split(r"[^a-z0-9']+", text.strip().lower()) if t]
    tok_chars = sum(len(t) for t in toks)
    out = {}
    out["dup_line_frac"], out["dup_line_char_frac"] = seg_stats(r"\n")
    out["dup_para_frac"], out["dup_para_char_frac"] = seg_stats(r"\n\n")
    for n in (2, 3, 4):
        if len(toks) < n:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        best = max(c * (len(g) - (n - 1)) for g, c in counts.items())
        out[f"top_{n}gram_char_frac"] = frac6(best, tok_chars)
    for n in (5, 6, 7, 8, 9, 10):
        if len(toks) < n:
            out[f"dup_{n}gram_char_frac"] = 0.0
            continue
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        dup_positions = [i for i, g in enumerate(grams) if counts[g] >= 2]
        covered = set()
        for i in dup_positions:
            covered.update(range(i, i + n))
        out[f"dup_{n}gram_char_frac"] = frac6(
            sum(len(toks[j]) for j in covered), tok_chars
        )
    return out


def test_gopher_repetition_random_differential(spark):
    """Seeded random-text differential against the pure-Python
    reference above — a THIRD implementation, independent of the Spark
    expressions and the DuckDB oracle, over texts with apostrophes,
    punctuation, blank lines, and planted line/paragraph/n-gram
    repeats (shapes the synthetic corpus never produces)."""
    import random

    from inputlayer_spark.functions.text import gopher_repetition_flags

    rng = random.Random(20260816)
    vocab = ["ab", "cd'e", "fgh", "ij", "klmno", "p", "q-r", "s.t", "uv"]
    rows = []
    for i in range(60):
        n_lines = rng.randint(0, 6)
        lines = []
        for _ in range(n_lines):
            k = rng.randint(0, 12)
            lines.append(" ".join(rng.choice(vocab) for _ in range(k)))
        # plant repeats: duplicate a line, a paragraph, and a token run
        if lines and rng.random() < 0.5:
            lines.append(rng.choice(lines))
        txt = "\n".join(lines)
        if rng.random() < 0.4 and lines:
            txt += "\n\n" + lines[0] + "\n\n" + lines[0]
        if rng.random() < 0.5:
            run = " ".join(rng.choice(vocab[:3]) for _ in range(rng.randint(3, 7)))
            txt += " " + run + " " + run
        rows.append((i, txt if txt else None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in
           gopher_repetition_flags(df, "doc_id", "text").collect()}
    for i, txt in rows:
        want = _py_gopher_repetition(txt)
        for k, v in want.items():
            assert got[i][k] == v, (i, k, got[i][k], v, repr(txt))


# ---------------------------------------------------------------------------
# normalize_text — NFC + control/whitespace canonicalization
# ---------------------------------------------------------------------------


def test_normalize_text_nfc_and_whitespace(spark):
    from inputlayer_spark.functions.text import normalize_text

    mess = " cafe" + chr(0x301) + "  " + chr(0x212B) + "\tx" + chr(1) + "\n\n\n\nend  "
    rows = [(0, "hello world" + mess),
            (1, "a" + chr(0x0B) + "b \r\n c"),
            (2, None),
            (3, "clean text")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in
           normalize_text(df, "doc_id", "text").collect()}
    # combining acute composes, ANGSTROM singleton maps to A-ring, the
    # C0 control vanishes, tab+space runs collapse, 4 newlines -> 2,
    # outer whitespace trimmed
    assert out[0]["norm_text"] == "hello world caf\u00e9 \u00c5 x\n\nend"
    assert out[0]["changed"]
    # vertical-tab stripped, CRLF -> LF, line-edge spaces trimmed
    assert out[1]["norm_text"] == "ab\nc"
    # NULL fails closed to '' and reports changed
    assert out[2]["norm_text"] == "" and out[2]["changed"]
    # already-canonical text round-trips unchanged
    assert out[3]["norm_text"] == "clean text" and not out[3]["changed"]


def test_normalize_text_makes_exact_dedup_honest(spark):
    from inputlayer_spark.functions.text import normalize_text
    from inputlayer_spark.operators.dedup import exact_dedup_by_hash

    # same logical text in NFD vs NFC spelling: exact dedup misses the
    # pair on raw bytes, catches it after normalization — the reason
    # the pass runs before dedup in every real pipeline
    nfd = "cafe" + chr(0x301) + " menu"
    nfc = "caf\u00e9 menu"
    df = spark.createDataFrame([(1, nfd), (2, nfc)], "doc_id int, text string")
    assert exact_dedup_by_hash(df, "text", "doc_id").count() == 2
    normed = normalize_text(df, "doc_id", "text").withColumnRenamed(
        "norm_text", "text")
    assert exact_dedup_by_hash(normed, "text", "doc_id").count() == 1


# ---------------------------------------------------------------------------
# bpe_merges / bpe_encode — distributed BPE training
# ---------------------------------------------------------------------------


def _py_bpe(word_counts, n_merges, min_pair=2):
    """Pure-Python reference: Sennrich-style merge loop with the
    engine's deterministic (count desc, a, b) tie-break."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair:
            break
        merges.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_merges_match_python_reference(spark):
    import re

    from inputlayer_spark.operators.bpe import bpe_merges

    texts = [
        "low lower lowest newer newest wider widest",
        "the newer reader reads the wider paper",
        "low low low newer newer widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    wc = {}
    for t in texts:
        for w in re.split(r"[^a-z0-9']+", t.lower()):
            if w:
                wc[w] = wc.get(w, 0) + 1
    expected = _py_bpe(wc, n_merges=8, min_pair=2)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_merges(df, "text", n_merges=8, min_pair_count=2)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected


def test_bpe_merge_handles_chained_occurrences(spark):
    from inputlayer_spark.operators.bpe import bpe_merges

    # 'aaa' with pair (a,a): left-to-right non-overlap -> [aa, a],
    # so (a,a) count is 2 per 'aaa' (overlapping count at tally time,
    # the Sennrich counting), and one merge consumes only the first
    df = spark.createDataFrame([("aaa aaa aaa aaa",)], ["text"])
    out = bpe_merges(df, "text", n_merges=1, min_pair_count=2).collect()
    assert len(out) == 1 and out[0]["lhs"] == "a" and out[0]["rhs"] == "a"
    assert out[0]["pair_count"] == 8  # 2 overlapping pairs x 4 words


def test_bpe_encode_applies_merges_in_order(spark):
    from inputlayer_spark.operators.bpe import bpe_encode, bpe_merges

    df = spark.createDataFrame(
        [(1, "lower lower lowest night night nights")], ["doc_id", "text"]
    )
    merges = bpe_merges(df, "text", n_merges=6, min_pair_count=2)
    enc = bpe_encode(df, "doc_id", "text", merges)
    pieces = {r["token"]: r["pieces"] for r in enc.collect()}
    # every token's pieces re-concatenate to the token
    assert all("".join(p) == t for t, p in pieces.items())
    # with 6 merges on this corpus, frequent words compress below chars
    assert len(pieces["lower"]) < len("lower")


def test_bpe_empty_corpus_returns_empty_table(spark):
    from inputlayer_spark.operators.bpe import bpe_merges

    df = spark.createDataFrame([("",)], ["text"])
    out = bpe_merges(df, "text", n_merges=4)
    assert out.count() == 0
    assert out.columns == ["merge_rank", "lhs", "rhs", "merged", "pair_count"]


# ---------------------------------------------------------------------------
# incremental_dedup — cross-snapshot (daily-crawl) dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_exact_and_near_stages(spark):
    from inputlayer_spark.operators.dedup import incremental_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "an entirely different corpus document about spark plans")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, base),                                   # exact corpus dup
            (11, base + " extra"),                        # near corpus dup
            (12, "a brand new document with fresh words only here"),
            (13, "a brand new document with fresh words only here"),  # exact batch dup of 12
        ],
        ["doc_id", "text"],
    )
    out = incremental_dedup(
        batch, corpus, "doc_id", "text", num_perm=64, bands=16, shingle_n=2
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [12]


def test_incremental_dedup_batch_near_dups_keep_smallest_id(spark):
    from inputlayer_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [(1, "unrelated corpus text about completely other things entirely")],
        ["doc_id", "text"],
    )
    t = "one two three four five six seven eight nine ten eleven twelve"
    batch = spark.createDataFrame(
        [(20, t), (21, t + " thirteen"), (22, t + " fourteen")],
        ["doc_id", "text"],
    )
    out = incremental_dedup(
        batch, corpus, "doc_id", "text", num_perm=64, bands=16, shingle_n=2
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [20]


def test_incremental_dedup_mixed_pair_kills_new_side_regardless_of_id(spark):
    from inputlayer_spark.operators.dedup import incremental_dedup

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # corpus id LARGER than batch id: the batch doc must still lose
    corpus = spark.createDataFrame([(100, t)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(5, t + " lambda"), (6, "fresh independent content with no overlap at all")],
        ["doc_id", "text"],
    )
    out = incremental_dedup(
        batch, corpus, "doc_id", "text", num_perm=64, bands=16, shingle_n=2
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [6]


def test_incremental_dedup_indexed_matches_direct(spark):
    """The persisted-index path (build_dedup_index +
    incremental_dedup_indexed) must produce EXACTLY the survivors of
    the direct incremental_dedup on the same split — corpus-corpus
    candidate pairs are skipped by construction, and they can never
    dominate a batch row, so the two formulations are equivalent.
    Delta artifacts must cover exactly the surviving ids."""
    from inputlayer_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    batch = docs.filter("doc_id % 5 = 0")
    corpus = docs.filter("doc_id % 5 != 0")
    direct = incremental_dedup(
        batch, corpus, "doc_id", "text", num_perm=64, bands=16, shingle_n=2
    )
    h, b, a = build_dedup_index(corpus, "doc_id", "text", 64, 16, 2)
    surv, dh, db, da = incremental_dedup_indexed(
        batch, h, b, a, "doc_id", "text", num_perm=64, bands=16, shingle_n=2
    )
    sids = sorted(r["doc_id"] for r in surv.collect())
    assert sids == sorted(r["doc_id"] for r in direct.collect())
    assert sids  # non-trivial: some rows survive at this SF
    assert sorted(r["__id"] for r in dh.collect()) == sids
    assert sorted(r["__id"] for r in da.collect()) == sids
    band_ids = sorted(set(r["__id"] for r in db.collect()))
    assert set(band_ids) <= set(sids)  # docs w/o shingles emit no bands
    # the key-pushdown narrowed artifact scan (r12) filters only rows
    # that can never equi-join a batch band row — survivors identical
    # with the pushdown forced on and forced off
    for mode in (True, False):
        s2, _, _, _ = incremental_dedup_indexed(
            batch, h, b, a, "doc_id", "text",
            num_perm=64, bands=16, shingle_n=2, key_pushdown=mode,
            pushdown_cap=100_000,
        )
        assert sorted(r["doc_id"] for r in s2.collect()) == sids, mode
    # the hash pushdown (r13, VERDICT r12 #5) is an EXACT filter on the
    # anti-join's artifact side — survivors identical forced on/off
    s3, _, _, _ = incremental_dedup_indexed(
        batch, h, b, a, "doc_id", "text",
        num_perm=64, bands=16, shingle_n=2, hash_pushdown=True,
        pushdown_cap=100_000,
    )
    assert sorted(r["doc_id"] for r in s3.collect()) == sids
    # forcing either pushdown past the literal cap is a loud error,
    # never a silent mega-literal plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        incremental_dedup_indexed(
            batch, h, b, a, "doc_id", "text",
            num_perm=64, bands=16, shingle_n=2,
            key_pushdown=True, pushdown_cap=8,
        )
    with _pytest.raises(ValueError):
        incremental_dedup_indexed(
            batch, h, b, a, "doc_id", "text",
            num_perm=64, bands=16, shingle_n=2,
            hash_pushdown=True, pushdown_cap=8,
        )


def test_lm_score_and_tfidf_hot_key_salting_is_result_identical(spark):
    """VERDICT r11 #3: the hot_keys= salted-join option on
    lm_score/tfidf (operators/skew.salted_join wired into the w1 /
    token join) must be RESULT-identical to the unsalted path — the
    salt only re-shards the hot key's shuffle rows. Verified on a
    planted 'zq' hot token carrying ~25% of token mass."""
    from pyspark.sql import functions as F

    from inputlayer_spark.functions.text import lm_score, tfidf
    from inputlayer_spark.functions.text import tokens as _tokens

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    txt = F.coalesce(F.col("text"), F.lit(""))
    n_hot = F.floor(F.size(_tokens(txt)) / F.lit(3)).cast("int")
    hot = F.array_join(F.array_repeat(F.lit("zq"), n_hot), " ")
    skewed = docs.select("doc_id", F.concat_ws(" ", txt, hot).alias("text"))

    plain = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
             for r in lm_score(skewed, "doc_id", "text").collect()}
    salted = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
              for r in lm_score(skewed, "doc_id", "text",
                                hot_keys=["zq"], salt=8).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-9, k

    t_plain = {(r["doc_id"], r["token"]): (r["tf"], r["score"])
               for r in tfidf(skewed, "doc_id", "text", min_tf=2).collect()}
    t_salt = {(r["doc_id"], r["token"]): (r["tf"], r["score"])
              for r in tfidf(skewed, "doc_id", "text", min_tf=2,
                             hot_keys=["zq"], salt=8).collect()}
    assert t_plain.keys() == t_salt.keys()
    for k in t_plain:
        assert t_plain[k][0] == t_salt[k][0]
        assert abs(t_plain[k][1] - t_salt[k][1]) < 1e-9, k
