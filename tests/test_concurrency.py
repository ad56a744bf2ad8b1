"""Concurrency stress parity (reference tests/concurrency_tests.rs):
concurrent sessions doing writes + recursive queries + index rebuilds.

Concurrency model under test (the one the repo documents):

* READ concurrency is lock-free — any number of session engines sharing
  one KG may evaluate (including recursive fixpoints, whose loop-scoped
  persist cache in recursion.py:244-250 must not leak frames across
  concurrently-running evaluations).
* WRITE serialization happens at the server (QueryServer._lock
  serializes execute, mirroring the reference's single-writer storage
  engine with reader snapshots) — so the mixed-workload tests drive the
  real server with concurrent HTTP clients on distinct sessions.
* Session overlays are engine-local: a session's facts/rules must never
  become visible to other sessions, no matter the interleaving.

Each test loops its workload (green-under-repetition gate).
"""

import json

import pytest
import threading
import urllib.request

from pyspark.sql import functions as F

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.server import QueryServer


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _run_threads(workers):
    errors = []

    def wrap(fn):
        def run():
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 — surfaced after join
                import traceback

                errors.append(f"{fn.__name__}: {exc}\n{traceback.format_exc()}")

        return run

    threads = [threading.Thread(target=wrap(fn)) for fn in workers]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, "\n---\n".join(errors)


# ------------------------------------------------- lock-free read side


def test_concurrent_recursive_queries_across_sessions(spark):
    """≥3 session engines over one shared KG run recursive fixpoints
    CONCURRENTLY (no lock), interleaved with session-overlay writes.
    Every evaluation must return the exact closure of the shared edges
    (plus only its OWN overlay) — a cached-frame race between the
    concurrently-running fixpoint loops would corrupt one of them."""
    shared = IQLEngine(spark)
    edges = [(i, i + 1) for i in range(12)] + [(3, 9), (0, 6)]
    shared.execute("+edge[" + ", ".join(f"({a}, {b})" for a, b in edges) + "]")
    shared.execute(
        "+path(X, Y) <- edge(X, Y)\n+path(X, Z) <- edge(X, Y), path(Y, Z)"
    )
    want = set()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    for s in adj:
        stack, seen = [s], set()
        while stack:
            x = stack.pop()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        want |= {(s, y) for y in seen}

    def session_engine():
        eng = IQLEngine(spark)
        eng.kgs = shared.kgs
        eng.current = shared.current
        return eng

    def reader(tag):
        def work():
            eng = session_engine()
            for _ in range(4):
                got = {tuple(r) for r in eng.query("?path(X, Y)").collect()}
                assert got == want, f"{tag}: wrong closure"

        work.__name__ = f"reader_{tag}"
        return work

    def overlay(tag, node):
        def work():
            eng = session_engine()
            for i in range(3):
                # session-local edge: visible HERE, never to the others
                eng.add_session_fact("edge", node, 1000 + i)
                got = {tuple(r) for r in eng.query("?path(X, Y)").collect()}
                assert (node, 1000 + i) in got, f"{tag}: own overlay missing"
                assert got - want, f"{tag}: overlay had no effect"

        work.__name__ = f"overlay_{tag}"
        return work

    for _ in range(2):  # repetition gate
        _run_threads(
            [reader("a"), reader("b"), overlay("c", 5), overlay("d", 7)]
        )
        # overlays never leaked into the shared KG
        clean = {tuple(r) for r in shared.query("?path(X, Y)").collect()}
        assert clean == want


# ------------------------------------------- server-mediated mixed load


@pytest.mark.slow  # ~50 s three-client wire-level mixed load
def test_server_concurrent_sessions_writes_recursion_and_index(spark):
    """The reference's concurrency_tests.rs shape over the wire: ≥3
    concurrent clients on DISTINCT sessions interleave (a) persistent
    fact writes, (b) recursive queries, (c) index create/rebuild +
    vector probes, (d) session-overlay facts. Invariants: no request
    errors, every write lands exactly once, vector probes always see a
    consistent (pre- or post-rebuild) index — never a stale/corrupt
    frame — and overlays stay session-local."""
    srv = QueryServer(spark).start()
    port = srv.port
    try:
        _post(port, {"query": "+edge[(0, 1), (1, 2), (2, 3)]"})
        _post(
            port,
            {
                "query": "+reach(X, Y) <- edge(X, Y)\n"
                "+reach(X, Z) <- edge(X, Y), reach(Y, Z)"
            },
        )
        _post(port, {"query": "+emb(id: int, v: vector)"})
        _post(
            port,
            {
                "query": "+emb[(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),"
                " (3, [0.9, 0.1, 0.0]), (4, [0.0, 0.0, 1.0])]"
            },
        )
        _post(port, {"query": ".index create vidx on emb(v) metric cosine"})

        def writer():
            # each iteration appends a fresh chain edge; totals checked
            # after join
            for i in range(8):
                _post(port, {"query": f"+edge[({3 + i}, {4 + i})]", "session": "w"})

        def _col(res, name):
            names = [c["name"] for c in res["columns"]]
            i = names.index(name)
            return [r[i] for r in res["rows"]]

        def recursive_reader():
            for _ in range(8):
                out = _post(port, {"query": "?reach(0, Y)", "session": "r"})
                ys = sorted(_col(out["results"][0], "Y"))
                # chain grows monotonically: 0 always reaches 1..3, and
                # whatever prefix of the appended edges has landed
                assert ys[:3] == [1, 2, 3]
                assert ys == list(range(1, len(ys) + 1)), "gap in closure"

        def index_churn():
            for _ in range(4):
                _post(port, {"query": ".index rebuild vidx", "session": "x"})

        def vector_prober():
            for _ in range(8):
                out = _post(
                    port,
                    {
                        "query": '?nn(Id, D), hnsw_nearest("vidx",'
                        " [1.0, 0.0, 0.0], 2, Id, D)",
                        "session": "v",
                    },
                )
                ids = [r[0] for r in out["results"][0]["rows"]]
                assert ids == [1, 3], f"stale/corrupt index answer: {ids}"

        def overlay_writer():
            _post(port, {"query": ".session clear", "session": "s"})
            for i in range(6):
                # bare ground tuple = session-scoped fact (reference
                # examples/iql/04_session/02_session_facts.iql)
                _post(
                    port,
                    {"query": f"edge(90, {91 + i})", "session": "s"},
                )
                out = _post(port, {"query": "?reach(90, Y)", "session": "s"})
                got = sorted(_col(out["results"][0], "Y"))
                assert got == [91 + j for j in range(i + 1)]

        for _ in range(2):  # repetition gate
            _run_threads(
                [
                    writer,
                    recursive_reader,
                    index_churn,
                    vector_prober,
                    overlay_writer,
                ]
            )
            # every write landed exactly once; overlay never leaked
            out = _post(port, {"query": "?edge(X, Y)"})
            rows = sorted(map(tuple, out["results"][0]["rows"]))
            assert not any(x == 90 for x, _ in rows), "overlay leaked"
            chain = [(i, i + 1) for i in range(0, max(x for x, _ in rows) + 1)]
            assert rows == sorted(set(chain)), rows
            out = _post(port, {"query": "?reach(0, Y)"})
            assert len(out["results"][0]["rows"]) == len(rows)
    finally:
        srv.stop()


def test_server_concurrent_same_relation_writes_all_land(spark):
    """Write-write contention on ONE relation from 3 sessions: the
    server's serialization must make every insert land exactly once
    (lost-update check on the engine's read-union-write append)."""
    srv = QueryServer(spark).start()
    port = srv.port
    try:
        _post(port, {"query": "+acc(src: int, n: int)"})

        def writer(base):
            def work():
                for i in range(6):
                    _post(
                        port,
                        {"query": f"+acc[({base}, {i})]", "session": f"s{base}"},
                    )

            work.__name__ = f"writer_{base}"
            return work

        for round_no in range(2):  # repetition gate
            _run_threads([writer(1), writer(2), writer(3)])
            out = _post(port, {"query": "?acc(S, N)"})
            rows = sorted(map(tuple, out["results"][0]["rows"]))
            assert rows == sorted(
                (s, i) for s in (1, 2, 3) for i in range(6)
            ), f"lost update in round {round_no}: {rows}"
            _post(port, {"query": "-acc(S, N) <- acc(S, N)"})
    finally:
        srv.stop()


# --------------------------------------- cross-session cache coherence


def test_cross_session_write_invalidates_other_sessions_caches(spark):
    """Session engines share one KnowledgeGraph but hold PRIVATE
    materialization caches; before the KG-level invalidation epochs a
    write through session A left session B serving a STALE materialized
    view forever. Now B's next read observes the epoch bump and
    recomputes (the reference's consistent-snapshot-read contract)."""
    a = IQLEngine(spark)
    a.execute("+s[(1, 10.0), (2, 20.0)]")
    a.execute("+tot(K, sum<V>) <- s(K, V)")
    a.execute(
        "+edge[(1, 2), (2, 3)]\n"
        "+path(X, Y) <- edge(X, Y)\n+path(X, Z) <- edge(X, Y), path(Y, Z)"
    )
    b = IQLEngine(spark)
    b.kgs = a.kgs
    b.current = a.current

    # B materializes and caches both views
    assert sorted(tuple(r) for r in b.query("?tot(K, V)").collect()) == [
        (1, 10),
        (2, 20),
    ]
    assert (1, 3) in {tuple(r) for r in b.query("?path(X, Y)").collect()}
    assert "tot" in b._derived_cache and "path" in b._derived_cache

    # A writes (insert + delete) through ITS engine
    a.execute("+s[(1, 5.0)]")
    a.execute("-edge(2, 3)")

    # B must see the new state, not its cached frames
    assert sorted(tuple(r) for r in b.query("?tot(K, V)").collect()) == [
        (1, 15),
        (2, 20),
    ]
    assert {tuple(r) for r in b.query("?path(X, Y)").collect()} == {(1, 2)}

    # and B's fresh recomputation is itself cached + valid until the
    # next foreign write
    assert b._cached_view_get("tot") is not None
    a.execute('+s[(3, 7.0)]')
    assert b._cached_view_get("tot") is None  # stale again


def test_cross_session_write_invalidates_index_artifacts(spark):
    """Index artifacts (LSH frames / HNSW graphs) are engine-local too:
    after a foreign write to the corpus, another session's next
    hnsw_nearest must rebuild instead of probing the stale artifact."""
    a = IQLEngine(spark)
    a.execute("+emb(id: int, v: vector)")
    a.execute('+emb[(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])]')
    a.execute(".index create vidx on emb(v) metric cosine")
    b = IQLEngine(spark)
    b.kgs = a.kgs
    b.current = a.current

    got = [
        tuple(r)[0]
        for r in b.query(
            '?nn(Id, D), hnsw_nearest("vidx", [0.9, 0.1, 0.0], 1, Id, D)'
        ).collect()
    ]
    assert got == [1]
    # foreign write: a NEW vector that is the true nearest neighbor
    a.execute("+emb[(3, [0.9, 0.1, 0.0])]")
    got2 = [
        tuple(r)[0]
        for r in b.query(
            '?nn(Id, D), hnsw_nearest("vidx", [0.9, 0.1, 0.0], 1, Id, D)'
        ).collect()
    ]
    assert got2 == [3], f"stale index artifact served: {got2}"


def test_engine_level_concurrent_writes_no_lost_updates(spark):
    """Direct-library concurrency (no server): 3 engines sharing one KG
    insert into the SAME relation concurrently. The per-KG write lock
    (KnowledgeGraph.write_lock) serializes the read-union-write append,
    so every batch lands — before it, interleaved writers could clobber
    each other's unions."""
    a = IQLEngine(spark)
    a.execute("+acc(src: int, n: int)")

    def writer(base):
        def work():
            eng = IQLEngine(spark)
            eng.kgs = a.kgs
            eng.current = a.current
            for i in range(8):
                eng.execute(f"+acc[({base}, {i})]")

        work.__name__ = f"writer_{base}"
        return work

    for round_no in range(2):
        _run_threads([writer(1), writer(2), writer(3)])
        rows = sorted(tuple(r) for r in a.query("?acc(S, N)").collect())
        assert rows == sorted(
            (s, i) for s in (1, 2, 3) for i in range(8)
        ), f"lost update in round {round_no}"
        a.execute("-acc(S, N) <- acc(S, N)")


def test_cache_stamp_snapshots_epoch_before_materialization(spark, monkeypatch):
    """ADVICE r6: reads are lock-free, so a write can land between a
    reader resolving base frames and stamping its cache. The stamp must
    be the PRE-read epoch — a racing write then leaves the fresh entry
    immediately stale instead of permanently 'valid' over pre-write
    frames."""
    import inputlayer_spark.engine as eng_mod

    a = IQLEngine(spark)
    a.execute("+s[(1, 10.0)]")
    a.execute("+tot(K, sum<V>) <- s(K, V)")
    b = IQLEngine(spark)
    b.kgs = a.kgs
    b.current = a.current

    real = eng_mod.evaluate_scc
    fired = []

    def racy(scc, rules, resolver, hnsw_resolver, base_of=None):
        out = real(scc, rules, resolver, hnsw_resolver, base_of=base_of)
        if "tot" in scc and not fired:
            fired.append(True)
            # foreign write lands AFTER B resolved frames, BEFORE B
            # stamps its cache — the exact interleaving of the race
            a.execute("+s[(2, 20.0)]")
        return out

    monkeypatch.setattr(eng_mod, "evaluate_scc", racy)
    first = sorted(tuple(r) for r in b.query("?tot(K, V)").collect())
    monkeypatch.undo()
    assert fired, "race hook never fired"
    # the evaluation itself is a consistent pre-write snapshot
    assert first == [(1, 10.0)]
    # but the cache entry must be stale, not permanently valid
    assert b._cached_view_get("tot") is None, (
        "cache stamped with post-write epoch: stale view would be "
        "served forever"
    )
    assert sorted(tuple(r) for r in b.query("?tot(K, V)").collect()) == [
        (1, 10.0),
        (2, 20.0),
    ]


def test_artifact_stamp_snapshots_epoch_before_build(spark, monkeypatch):
    """Same race as the view-cache test, for INDEX artifacts: a foreign
    write landing while another session builds an LSH artifact must
    leave the artifact stale (pre-read epoch stamp), not silently
    current over the pre-write corpus."""
    a = IQLEngine(spark)
    a.execute("+emb(id: int, v: vector)")
    a.execute("+emb[(1, [1.0, 0.0]), (2, [0.0, 1.0])]")
    a.execute(".index create vidx on emb(v) metric cosine")
    b = IQLEngine(spark)
    b.kgs = a.kgs
    b.current = a.current

    import inputlayer_spark.operators.similarity as sim

    real = sim.lsh_index
    fired = []

    def racy(*args, **kw):
        if not fired:
            fired.append(True)
            a.execute("+emb[(3, [0.7, 0.7])]")  # foreign write mid-build
        return real(*args, **kw)

    monkeypatch.setattr(sim, "lsh_index", racy)
    idx = b._index_frame("vidx")
    monkeypatch.undo()
    assert fired and idx is not None
    assert b._artifact_stale(("default", "vidx")), (
        "artifact stamped with post-write epoch: stale index would "
        "serve the pre-write corpus forever"
    )
