"""Magic-sets rewrite: unit tests for the AST transformation and
end-to-end parity between the demand-driven path and full evaluation."""

import pytest

from inputlayer_spark.ast_nodes import Atom, Const, Rule, Var
from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.magic_sets import magic_rewrite


def _tc_rules():
    A, B, C = Var("A"), Var("B"), Var("C")
    return [
        Rule(Atom("reach", (A, B)), (Atom("edge", (A, B)),)),
        Rule(Atom("reach", (A, C)), (Atom("edge", (A, B)), Atom("reach", (B, C)))),
    ]


def test_rewrite_shape_right_linear():
    """Right-linear TC with a bf goal gets linearity-flipped to the
    seeded-BFS form: the magic relation is seed-only (tautological magic
    rules dropped) and the adorned relation does the frontier expansion
    (reference bound-TC fast path, code_generator/mod.rs:834)."""
    rw = magic_rewrite(Atom("reach", (Const(0), Var("Y"))), _tc_rules(), ["reach"])
    assert rw is not None
    assert rw.goal_relation == "__reach__bf"
    assert rw.seed_relation == "__magic_reach__bf"
    assert rw.seed_row == (0,)
    heads = {r.head.relation for r in rw.rules}
    assert heads == {"__reach__bf"}
    # flipped rec rule: __reach_bf(A,C) <- magic(A), __reach_bf(A,B), edge(B,C)
    rec = [
        r
        for r in rw.rules
        if any(isinstance(l, Atom) and l.relation == "__reach__bf" for l in r.body)
    ]
    assert len(rec) == 1
    rels = [l.relation for l in rec[0].body if isinstance(l, Atom)]
    assert rels == ["__magic_reach__bf", "__reach__bf", "edge"]


def test_rewrite_all_free_goal_bails():
    assert magic_rewrite(Atom("reach", (Var("X"), Var("Y"))), _tc_rules(), ["reach"]) is None


def test_rewrite_point_query_allowed():
    rw = magic_rewrite(Atom("reach", (Const(0), Const(7))), _tc_rules(), ["reach"])
    assert rw is not None
    assert rw.goal_relation == "__reach__bb"
    assert rw.seed_row == (0, 7)


@pytest.fixture(scope="module")
def graph_engine(spark):
    eng = IQLEngine(spark)
    # two disconnected components: 0-1-2-3 chain and 10-11-12 chain
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12)]
    eng.execute("+edge[" + ", ".join(f"({a}, {b})" for a, b in edges) + "]")
    eng.execute("+reach(A, B) <- edge(A, B)\n+reach(A, C) <- edge(A, B), reach(B, C)")
    return eng


def test_bound_reach_matches_full(graph_engine):
    rows = sorted(tuple(r) for r in graph_engine.query("?reach(0, Y)").collect())
    assert rows == [(0, 1), (0, 2), (0, 3)]


def test_point_query(graph_engine):
    assert graph_engine.query("?reach(0, 3)").count() == 1
    assert graph_engine.query("?reach(0, 11)").count() == 0


def test_full_query_unaffected(graph_engine):
    assert graph_engine.query("?reach(X, Y)").count() == 6 + 3  # 3+2+1 and 2+1


def test_left_linear_variant(spark):
    eng = IQLEngine(spark)
    eng.execute("+edge[(0, 1), (1, 2), (2, 3), (5, 6)]")
    eng.execute("+lreach(A, B) <- edge(A, B)\n+lreach(A, C) <- lreach(A, B), edge(B, C)")
    rows = sorted(tuple(r) for r in eng.query("?lreach(0, Y)").collect())
    assert rows == [(0, 1), (0, 2), (0, 3)]


def test_magic_with_filter_rule(spark):
    eng = IQLEngine(spark)
    eng.execute("+edge[(0, 1), (1, 2), (2, 3)]")
    eng.execute(
        "+bigreach(A, C) <- edge(A, B), bigreach(B, C)\n"
        "+bigreach(A, B) <- edge(A, B), B > 1"
    )
    rows = sorted(tuple(r) for r in eng.query("?bigreach(0, Y)").collect())
    assert rows == [(0, 2), (0, 3)]


def test_second_arg_bound(graph_engine):
    rows = sorted(tuple(r) for r in graph_engine.query("?reach(X, 3)").collect())
    assert rows == [(0, 3), (1, 3), (2, 3)]


def test_base_facts_of_recursive_predicate_visible_in_bound_query(spark):
    """A recursive predicate can also have explicit base facts; the
    magic-sets fast path must not lose them (reference unions
    input_tuples with derivations, src/lib.rs:507-512)."""
    eng = IQLEngine(spark)
    eng.execute("+edge[(1, 2), (2, 3)]")
    eng.execute("+reach(7, 99)")
    eng.execute("+reach(X, Y) <- edge(X, Y)\n+reach(X, Z) <- reach(X, Y), edge(Y, Z)")
    rows = sorted(tuple(r) for r in eng.query("?reach(7, Y)").collect())
    assert rows == [(7, 99)]
    # and the unbound query still sees everything
    allrows = sorted(tuple(r) for r in eng.query("?reach(X, Y)").collect())
    assert (7, 99) in allrows and (1, 3) in allrows


def test_session_facts_of_recursive_predicate_visible_in_bound_query(spark):
    eng = IQLEngine(spark)
    eng.execute("+edge[(1, 2), (2, 3)]")
    eng.execute("+reach(X, Y) <- edge(X, Y)\n+reach(X, Z) <- reach(X, Y), edge(Y, Z)")
    eng.add_session_fact("reach", 8, 77)
    rows = sorted(tuple(r) for r in eng.query("?reach(8, Y)").collect())
    assert rows == [(8, 77)]


def test_nonlinear_same_generation_rewrite_and_demand_pruning(spark):
    """The generalized rewrite handles the canonical NON-LINEAR shape
    (same-generation: demand flows through two recursive positions via
    the bb-adorned variant). Checks (a) the rewrite produces adorned +
    magic rules, (b) the engine's bound query answers exactly, and
    (c) demand pruning is real: the magic program evaluates a closure
    restricted to the demand cone, far smaller than the full sg extent."""
    from inputlayer_spark.ast_nodes import Atom, Const, Var
    from inputlayer_spark.engine import IQLEngine
    from inputlayer_spark.parser import parse_program

    prog = parse_program(
        "+sg(X, Y) <- edge(P, X), edge(P, Y)\n"
        "+sg(X, Y) <- edge(A, X), edge(B, Y), sg(A, B)"
    )
    rw = magic_rewrite(
        Atom("sg", (Const(5), Var("Y"))), list(prog.statements), ["sg"]
    )
    assert rw is not None
    heads = {r.head.relation for r in rw.rules}
    assert any(h.startswith("__magic_sg") for h in heads)  # demand preds
    assert "__sg__bb" in heads  # the two-bound adorned variant

    # balanced binary tree of 63 nodes: node i's parent is (i-1)//2
    eng = IQLEngine(spark)
    edges = ", ".join(f"({(i - 1) // 2}, {i})" for i in range(1, 63))
    eng.execute(f"+edge[{edges}]")
    eng.execute(
        "+sg(X, Y) <- edge(P, X), edge(P, Y)\n"
        "+sg(X, Y) <- edge(A, X), edge(B, Y), sg(A, B)"
    )
    # the ENGINE must take the rewrite path (not full-eval + filter):
    # spy on the demand evaluation entry point
    taken = []
    orig = IQLEngine._try_magic

    def spy(self, goal):
        out = orig(self, goal)
        taken.append((goal.relation, out is not None))
        return out

    IQLEngine._try_magic = spy
    try:
        got = sorted(r[-1] for r in eng.query("?sg(5, Y)").collect())
    finally:
        IQLEngine._try_magic = orig
    # node 5 sits at depth 2 (4 nodes): its generation is {3, 4, 5, 6}
    assert got == [3, 4, 5, 6]
    assert ("sg", True) in taken  # demand rewrite engaged
    # full extent for contrast: every same-depth pair
    full = eng.query("?sg(X, Y)").count()
    assert full == sum(4**k for k in range(1, 6))  # 1364 pairs


@pytest.mark.slow  # ~80 s randomized differential over random graphs
def test_nonlinear_magic_randomized_differential(spark):
    """Random graphs × random bound goals for the two canonical
    non-linear shapes (same-generation, symmetric closure): the engine's
    bound answer (demand-rewritten path) must equal the full fixpoint
    filtered to the binding. Catches under-seeding of magic predicates
    and wrong SIP propagation through the second recursive position."""
    import random

    from inputlayer_spark.engine import IQLEngine

    rng = random.Random(41)
    for trial in range(3):
        n = 9
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(12)})
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        vals = ", ".join(f"({a}, {b})" for a, b in edges)

        # same-generation
        eng = IQLEngine(spark)
        eng.execute(f"+edge[{vals}]")
        eng.execute(
            "+sg(X, Y) <- edge(P, X), edge(P, Y)\n"
            "+sg(X, Y) <- edge(A, X), edge(B, Y), sg(A, B)"
        )
        full = {tuple(r) for r in eng.query("?sg(X, Y)").collect()}
        for _ in range(2):
            c = rng.randrange(n)
            bound = sorted(r[-1] for r in eng.query(f"?sg({c}, Y)").collect())
            want = sorted(y for (x, y) in full if x == c)
            assert bound == want, f"sg trial {trial} c={c}"

        # symmetric closure (magic mutually recursive with the answer)
        eng2 = IQLEngine(spark)
        eng2.execute(f"+e[{vals}]")
        eng2.execute("+sc(X, Z) <- e(X, Z)\n+sc(X, Z) <- sc(X, Y), sc(Y, Z)")
        full2 = {tuple(r) for r in eng2.query("?sc(X, Y)").collect()}
        for _ in range(2):
            c = rng.randrange(n)
            bound = sorted(r[-1] for r in eng2.query(f"?sc({c}, Y)").collect())
            want = sorted(y for (x, y) in full2 if x == c)
            assert bound == want, f"sc trial {trial} c={c}"
        # second-argument binding exercises the fb adornment
        c = rng.randrange(n)
        bound = sorted(r[0] for r in eng2.query(f"?sc(X, {c})").collect())
        want = sorted(x for (x, y) in full2 if y == c)
        assert bound == want, f"sc fb trial {trial} c={c}"
