"""Server façade + sources + subscriptions + index meta commands."""

import json
import urllib.request

import pytest
from pyspark.sql import types as T

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.server import QueryServer
from inputlayer_spark.sources import read_relation, stream_relation, write_relation


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_server_query_and_sessions(spark):
    srv = QueryServer(spark).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"

        out = _post(srv.port, {"query": "+t[(1, 2), (3, 4)]\n?t(X, Y)"})
        res = out["results"][0]
        assert [c["name"] for c in res["columns"]] == ["X", "Y"]
        assert sorted(map(tuple, res["rows"])) == [(1, 2), (3, 4)]

        # session overlay: ephemeral fact visible only in that session
        _post(srv.port, {"query": "+t(s: int, y: int)", "session": "A"})
        a = _post(srv.port, {"query": "?t(X, Y)", "session": "A"})
        shared = _post(srv.port, {"query": "?t(X, Y)"})
        assert sorted(map(tuple, shared["results"][0]["rows"])) == [(1, 2), (3, 4)]
        assert sorted(map(tuple, a["results"][0]["rows"])) == [(1, 2), (3, 4)]

        # errors come back as 400 + message, not a dropped connection
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": "?missing(X)"}).encode(),
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
    finally:
        srv.stop()


def test_sources_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    for fmt in ("parquet", "csv", "json"):
        path = str(tmp_path / fmt)
        write_relation(df, path, fmt=fmt)
        back = read_relation(spark, path, fmt=fmt, schema=df.schema if fmt == "json" else None)
        assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_stream_relation(spark, tmp_path):
    sch = T.StructType([T.StructField("x", T.LongType())])
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame([(1,)], sch).coalesce(1).write.mode("append").parquet(str(src))
    stream = stream_relation(spark, str(src), sch)
    assert stream.isStreaming


def test_subscriptions(spark):
    eng = IQLEngine(spark)
    eng.execute("+base[(1)]")
    eng.execute("+derived(X) <- base(X)")
    fired = []
    eng.subscribe("derived", lambda rel: fired.append(rel))
    eng.execute("+base[(2)]")  # write to base cascades to derived
    assert fired == ["derived"]


def test_index_meta(spark):
    eng = IQLEngine(spark)
    eng.execute("+vecs(id: int, v: vector)")
    eng.execute(".index create vidx on vecs(v) metric cosine")
    lst = eng.execute(".index list")[0].collect()
    assert [(r["name"], r["relation"], r["column"], r["metric"]) for r in lst] == [
        ("vidx", "vecs", "v", "cosine")
    ]
    stats = {r["key"]: r["value"] for r in eng.execute(".index stats vidx")[0].collect()}
    assert stats["metric"] == "cosine" and stats["rows"] == "0"
    eng.execute(".index rebuild vidx")
    eng.execute(".index drop vidx")
    assert not eng.execute(".index list")[0].collect()
