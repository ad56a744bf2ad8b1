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
