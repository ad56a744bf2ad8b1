"""Differential pins for the r14 compiler SQL fast path.

compile_body/compile_head render terms to SQL strings (one F.expr /
selectExpr / filter(str) round-trip) instead of building Column towers;
the Column path remains as the fallback for terms with no exact SQL
rendering. These tests run the same statements through BOTH paths (the
fallback is forced by stubbing term_to_sql to None) and require
identical schema and rows — so the fast path can never silently change
what a query computes.
"""

from __future__ import annotations

import pytest

from inputlayer_spark import compiler
from tests.conftest import rows


# Statement battery: literals of every type (quoting/escaping edge
# cases), arithmetic incl. / and %, null semantics, every standard
# aggregate incl. the saturating sum battery, ranking aggregates,
# repeated vars / constants in atoms, negation.
CASES = [
    # scans, constants, repeated vars
    (
        "+r(1, 2.5, \"a'b\\\\c\", true)\n+r(2, -0.75, \"x\\ny\", false)\n"
        "+r(3, 1e-07, \"\", true)\n+r(1, 2.5, \"a'b\\\\c\", true)\n"
        "+q(X, S) <- r(X, _, S, true)\n?q(X, S)"
    ),
    ("+r(1, 1)\n+r(1, 2)\n+r(3, 3)\n+same(X) <- r(X, X)\n?same(X)"),
    ("+r(1, \"k\")\n+r(2, \"m\")\n+pick(X) <- r(X, \"k\")\n?pick(X)"),
    # comparisons: every op, null equality, string ordering quirks
    (
        "+v(1, 10)\n+v(2, null)\n+v(3, 0)\n"
        "+keep(X) <- v(X, N), N != 0\n?keep(X)"
    ),
    (
        "+v(1, 10)\n+v(2, 20)\n+w(X, Y) <- v(X, A), v(Y, B), A < B\n?w(X, Y)"
    ),
    (
        "+s(\"apple\")\n+s(\"pear\")\n+lt(X) <- s(X), X < \"m\"\n?lt(X)"
    ),
    # bindings & arithmetic: nesting, %, /, int/float mix
    (
        "+n(7)\n+n(10)\n+m(X, Y, Z, W) <- n(X), Y = X % 3, Z = X / 4,"
        " W = (X + 1) * (X - 2)\n?m(X, Y, Z, W)"
    ),
    (
        "+n(5)\n+big(X, Y) <- n(X), Y = X + 9000000000\n?big(X, Y)"
    ),
    # aggregates: all standard ones, grouped and global
    (
        "+o(1, 10)\n+o(1, 20)\n+o(2, 5)\n"
        "+agg(K, count<V>, sum<V>, min<V>, max<V>, avg<V>, count_distinct<V>)"
        " <- o(K, V)\n?agg(K, C, S, MN, MX, A, CD)"
    ),
    # saturating sum: i64 overflow clamps, float truncation, strings
    (
        "+h(1, 9223372036854775807)\n+h(2, 9223372036854775807)\n"
        "+t(sum<V>) <- h(_, V)\n?t(S)"
    ),
    (
        "+h(1, -9223372036854775807)\n+h(2, -9223372036854775807)\n"
        "+t(sum<V>) <- h(_, V)\n?t(S)"
    ),
    ("+f(1, 0.1)\n+f(2, 0.2)\n+f(3, 0.3)\n+t(sum<V>) <- f(_, V)\n?t(S)"),
    ("+g(1, \"aa\")\n+g(2, \"bb\")\n+t(sum<V>) <- g(_, V)\n?t(S)"),
    # ranking aggregates: top_k both arities, threshold, within_radius
    (
        "+sc(\"a\", 1, 10)\n+sc(\"a\", 2, 30)\n+sc(\"a\", 3, 20)\n"
        "+sc(\"b\", 4, 5)\n"
        "+top(G, top_k<2, P, S:desc>) <- sc(G, P, S)\n?top(G, P, S)"
    ),
    (
        "+sc(1, 10)\n+sc(2, 30)\n+sc(3, 20)\n"
        "+top(top_k<2, S:asc>) <- sc(_, S)\n?top(S)"
    ),
    (
        "+sc(1, 10)\n+sc(2, 30)\n+sc(3, 20)\n"
        "+top(top_k_threshold<2, 15, P, S:desc>) <- sc(P, S)\n?top(P, S)"
    ),
    (
        "+sc(1, 10)\n+sc(2, 30)\n+sc(3, 20)\n"
        "+near(within_radius<15, P, S:asc>) <- sc(P, S)\n?near(P, S)"
    ),
    # negation over shared keys
    (
        "+a(1)\n+a(2)\n+a(3)\n+b(2)\n+only(X) <- a(X), !b(X)\n?only(X)"
    ),
]


def _run(engine_factory, stmts: str):
    eng = engine_factory()
    df = eng.query(stmts)
    return [f.dataType.simpleString() for f in df.schema.fields], rows(df)


@pytest.mark.parametrize("stmts", CASES)
def test_sql_fastpath_matches_column_path(spark, stmts, monkeypatch):
    from inputlayer_spark.engine import IQLEngine

    fast_schema, fast_rows = _run(lambda: IQLEngine(spark), stmts)
    # force the Column fallback everywhere
    monkeypatch.setattr(compiler, "term_to_sql", lambda *a, **k: None)
    slow_schema, slow_rows = _run(lambda: IQLEngine(spark), stmts)
    assert fast_schema == slow_schema
    assert fast_rows == slow_rows


def test_sql_const_rendering_types(spark):
    """sql_of_const produces literals with F.lit's exact type and value."""
    from pyspark.sql import functions as F

    vals = [
        None,
        True,
        False,
        0,
        -1,
        2147483647,
        -2147483648,
        2147483648,
        -2147483649,
        9223372036854775807,
        -9223372036854775808,
        0.0,
        -0.0,
        2.5,
        1e-07,
        1.7976931348623157e308,
        5e-324,
        "",
        "a'b",
        'a"b',
        "a\\b",
        "line1\nline2",
        "cr\rhere",
        "tab\there",
    ]
    sqls = [compiler.sql_of_const(v) for v in vals]
    assert all(s is not None for s in sqls)
    a = spark.range(1).select(
        *[F.lit(v).alias(f"c{i}") for i, v in enumerate(vals)]
    )
    b = spark.range(1).selectExpr(
        *[f"{s} AS c{i}" for i, s in enumerate(sqls)]
    )
    assert [f.dataType for f in a.schema.fields] == [
        f.dataType for f in b.schema.fields
    ]
    assert a.collect() == b.collect()
    # out-of-range ints and non-finite floats have no SQL rendering
    assert compiler.sql_of_const(1 << 63) is None
    assert compiler.sql_of_const(float("inf")) is None
    assert compiler.sql_of_const(float("nan")) is None
