"""Fluent IQL builder: rendering + end-to-end through the engine."""

from inputlayer_spark.fluent import V, _, agg, fn, query, rel, rule


def test_rendering():
    edge, path = rel("edge"), rel("path")
    X, Y, Z = V.X, V.Y, V.Z
    assert (rule(path(X, Y)) << [edge(X, Y)]).iql() == "+path(X, Y) <- edge(X, Y)"
    assert (
        rule(path(X, Z)) << [edge(X, Y), path(Y, Z)]
    ).iql() == "+path(X, Z) <- edge(X, Y), path(Y, Z)"
    assert query(path(X, Y), X > 3).iql() == "?path(X, Y), X > 3"
    assert query(path(X, Y), limit=10, offset=2).iql() == "?path(X, Y), limit(10, 2)"
    assert (~edge(X, Y)).iql() == "!edge(X, Y)"
    r = rule(rel("stats")(V.D, agg.sum(V.S))) << [rel("emp")(_, V.D, V.S)]
    assert r.iql() == "+stats(D, sum<S>) <- emp(_, D, S)"
    c = rule(rel("sim")(V.A, V.B, V.S)) << [
        rel("e")(V.A, V.V1),
        rel("e")(V.B, V.V2),
        V.A < V.B,
        V.S == fn.cosine(V.V1, V.V2),
    ]
    assert (
        c.iql()
        == "+sim(A, B, S) <- e(A, V1), e(B, V2), A < B, S = cosine(V1, V2)"
    )
    assert query(rel("t")(V.X, V.Y.desc())).iql() == "?t(X, Y:desc)"
    assert (
        rule(rel("r")(V.X, V.T)) << [rel("s")(V.X, V.P, V.Q), V.T == V.P * V.Q]
    ).iql() == "+r(X, T) <- s(X, P, Q), T = (P * Q)"


def test_end_to_end_through_engine(engine):
    from tests.conftest import rows

    edge, path = rel("edge"), rel("path")
    X, Y, Z = V.X, V.Y, V.Z
    engine.execute('+edge[(1, 2), (2, 3), (3, 4)]')
    engine.execute((rule(path(X, Y)) << [edge(X, Y)]).iql())
    engine.execute((rule(path(X, Z)) << [edge(X, Y), path(Y, Z)]).iql())
    got = rows(engine.query(query(path(V.X, V.Y), V.X == 1).iql()))
    assert got == [(1, 2), (1, 3), (1, 4)]


def test_hnsw_index_declaration(engine):
    """Fluent HnswIndex compiles to the reference's parameterized
    index command, and the engine honors m/ef parameters in the graph
    it builds (reference SDK index.py)."""
    from inputlayer_spark.fluent import HnswIndex

    decl = HnswIndex("vidx", "emb", "v", metric="cosine", m=8,
                     ef_construction=40, ef_search=24)
    assert decl.iql() == (
        ".index create vidx on emb(v) type hnsw metric cosine "
        "m 8 ef_construction 40 ef_search 24"
    )
    engine.execute("+emb(id: int, v: vector)")
    engine.execute("+emb[(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1])]")
    engine.execute(decl.iql())
    got = sorted(
        tuple(r)[0]
        for r in engine.query(
            '?n(Id, D), hnsw_nearest("vidx", [1.0, 0.0], 2, Id, D)'
        ).collect()
    )
    assert got == [1, 3]
    g = engine._hnsw_graphs[("default", "vidx")]
    assert (g.m, g.ef_construction, g.ef_search) == (8, 40, 24)
