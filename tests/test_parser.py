"""Parser unit tests — statement shapes from the reference grammar
(`/root/reference/src/statement/mod.rs:30-53`, examples/iql/)."""

from inputlayer_spark.ast_nodes import (
    Agg,
    Arith,
    Atom,
    Call,
    Comparison,
    Const,
    Delete,
    Fact,
    Query,
    Rule,
    SchemaDecl,
    Var,
    VecLit,
)
from inputlayer_spark.parser import parse_program


def parse1(src):
    stmts = parse_program(src).statements
    assert len(stmts) == 1, stmts
    return stmts[0]


def test_fact():
    f = parse1('+user(1, "alice", true)')
    assert isinstance(f, Fact)
    assert f.relation == "user"
    assert f.values == (Const(1), Const("alice"), Const(True))


def test_batch_facts():
    stmts = parse_program("+edge[(1, 2), (2, 3), (3, 4)]").statements
    assert len(stmts) == 3
    assert all(isinstance(s, Fact) for s in stmts)
    assert stmts[1].values == (Const(2), Const(3))


def test_negative_number_fact():
    f = parse1("+t(-5, -2.5)")
    assert f.values == (Const(-5), Const(-2.5))


def test_vector_fact():
    f = parse1("+emb(1, [1.0, 0.0, 2.5])")
    assert f.values[1] == VecLit((1.0, 0.0, 2.5))


def test_schema_decl():
    s = parse1("+user(id: int, name: string, emb: vector(4))")
    assert isinstance(s, SchemaDecl)
    assert s.columns == (("id", "int"), ("name", "string"), ("emb", "vector(4)"))


def test_persistent_rule():
    r = parse1("+adult(Name) <- person(Name, Age), Age >= 18")
    assert isinstance(r, Rule) and r.persistent
    assert r.head == Atom("adult", (Var("Name"),))
    assert r.body[0] == Atom("person", (Var("Name"), Var("Age")))
    assert r.body[1] == Comparison(">=", Var("Age"), Const(18))


def test_session_rule():
    r = parse1("tmp(X) <- base(X)")
    assert isinstance(r, Rule) and not r.persistent


def test_negation():
    r = parse1("+ok(X) <- person(X), !blocked(X)")
    assert r.body[1] == Atom("blocked", (Var("X"),), negated=True)


def test_aggregate_head():
    r = parse1("+total(Region, sum<Amount>) <- sales(Region, Amount)")
    assert r.head.terms[1] == Agg("sum", (Var("Amount"),), "desc")


def test_top_k_head():
    r = parse1("+top(top_k<3, P, S:desc>) <- score(P, S)")
    agg = r.head.terms[0]
    assert agg == Agg("top_k", (Const(3), Var("P"), Var("S")), "desc")


def test_query_order_limit():
    q = parse1("?scores(Name, Score:desc), limit(3, 2)")
    assert isinstance(q, Query)
    assert q.order_by == ((1, "desc"),)
    assert q.limit == 3 and q.offset == 2


def test_query_with_body():
    q = parse1("?result(X, D), D = cosine([1.0, 0.0], [0.0, 1.0]), X > 2")
    assert len(q.body) == 2
    assert isinstance(q.body[0], Comparison)
    assert isinstance(q.body[0].right, Call)


def test_arith_precedence():
    r = parse1("+r(X, Y) <- t(X), Y = X + 2 * 3")
    comp = r.body[1]
    assert comp.right == Arith("+", Var("X"), Arith("*", Const(2), Const(3)))


def test_delete_pattern():
    d = parse1('-user(1, _)')
    assert isinstance(d, Delete)
    assert d.terms == (Const(1), Var("_"))


def test_drop():
    d = parse1("-user")
    assert d.drop


def test_comments_and_meta():
    stmts = parse_program(
        """
        // comment
        .kg create test
        /* block
           comment */
        +t(1)
        """
    ).statements
    assert len(stmts) == 2


def test_builtin_predicate():
    # a bare builtin call in predicate position is an ATOM over a
    # (nonexistent) relation — the reference grammar only treats builtins
    # as functions inside comparisons (29_temporal/06..09,11,20 pin that
    # such rules match nothing)
    r = parse1("+recent(X) <- event(X, T), within_last(T, 1000, 100)")
    atom = r.body[1]
    assert isinstance(atom, Atom)
    assert atom.relation == "within_last" and not atom.negated
    assert atom.terms == (Var("T"), Const(1000), Const(100))


def test_hnsw_nearest():
    r = parse1('+near(Id, D) <- hnsw_nearest("idx", [1.0, 0.0], 5, Id, D)')
    h = r.body[0]
    assert h.index == "idx" and h.k == 5
    assert h.id_var == Var("Id") and h.dist_var == Var("D")
