"""Incremental view maintenance: streaming appends + cascade invalidation."""

import pytest
from pyspark.sql import types as T

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.streaming import IncrementalMaintainer


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
    ]
)


def test_streaming_incremental_maintenance(spark, tmp_path):
    src_dir = tmp_path / "edges_in"
    ckpt = tmp_path / "ckpt"
    src_dir.mkdir()

    eng = IQLEngine(spark)
    eng.execute("+edge(src: int, dst: int)")
    eng.execute("+reach(A, B) <- edge(A, B)\n+reach(A, C) <- edge(A, B), reach(B, C)")

    m = IncrementalMaintainer(
        eng, "edge", str(src_dir), EDGE_SCHEMA, str(ckpt), refresh=False
    )

    spark.createDataFrame([(1, 2), (2, 3)], EDGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir))
    m.process_available()
    assert m.batches_seen == 1
    assert _rows(eng.query("?reach(1, Y)")) == [(1, 2), (1, 3)]

    # second delta batch arrives → derived relations see it after drain
    spark.createDataFrame([(3, 4)], EDGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src_dir))
    m.process_available()
    assert m.batches_seen == 2
    assert _rows(eng.query("?reach(1, Y)")) == [(1, 2), (1, 3), (1, 4)]


def test_selective_invalidation(spark):
    eng = IQLEngine(spark)
    eng.execute("+a[(1)]\n+b[(10)]")
    eng.execute("+da(X) <- a(X)\n+db(X) <- b(X)\n+dd(X) <- da(X)")
    eng.query("?da(X)")
    eng.query("?db(X)")
    eng.query("?dd(X)")
    assert {"da", "db", "dd"} <= set(eng._derived_cache)
    # write to a → da and dd (transitive) invalidated, db untouched
    eng.execute("+a[(2)]")
    assert "db" in eng._derived_cache
    assert "da" not in eng._derived_cache
    assert "dd" not in eng._derived_cache
    assert _rows(eng.query("?dd(X)")) == [(1,), (2,)]
