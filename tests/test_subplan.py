"""Subplan sharing (CSE) and the max_query_cost guard.

Reference anchors: src/subplan_sharing/mod.rs (canonicalize → hash →
shared views, executed first per src/lib.rs:1148) and the cost check #47
(src/lib.rs:1604-1625, src/ir/mod.rs estimate_cost)."""

import pytest

from inputlayer_spark.ast_nodes import Agg, Atom, Const, Query, Rule, Var
from inputlayer_spark.cost import check_query_cost, estimate_query_cost
from inputlayer_spark.subplan import SHARED_PREFIX, share_subplans
from tests.conftest import rows


def _rule(head_rel, head_vars, body):
    return Rule(
        head=Atom(head_rel, tuple(Var(v) for v in head_vars)),
        body=tuple(body),
        persistent=True,
    )


def _atom(rel, *vs):
    return Atom(rel, tuple(Var(v) if v[0].isupper() else Const(v) for v in vs))


# --------------------------------------------------- pure rewrite pass


def test_detects_pair_across_two_rules():
    r1 = _rule("a", ["X", "Z"], [_atom("r", "X", "Y"), _atom("s", "Y", "Z")])
    r2 = _rule(
        "b",
        ["P", "W"],
        [_atom("r", "P", "Q"), _atom("s", "Q", "W"), _atom("t", "W")],
    )
    views, rewritten = share_subplans([r1, r2], recursive_heads=set())
    assert len(views) == 1
    v = views[0]
    assert v.name.startswith(SHARED_PREFIX)
    assert v.base_deps == ("r", "s")
    # both rules now reference the view instead of the pair
    for rw in rewritten:
        rels = [l.relation for l in rw.body if isinstance(l, Atom)]
        assert v.name in rels
        assert "r" not in rels and "s" not in rels
    # variable mapping preserved AND pruned: the join var Y is observed
    # by neither consumer, so the view exports only (X, Z)
    va = next(l for l in rewritten[0].body if l.relation == v.name)
    assert [t.name for t in va.terms] == ["X", "Z"]
    vb = next(l for l in rewritten[1].body if l.relation == v.name)
    assert [t.name for t in vb.terms] == ["P", "W"]


def test_commuted_pair_shares_one_view():
    # S⋈R in one rule, R⋈S in the other — same canonical view
    r1 = _rule("a", ["X"], [_atom("r", "X", "Y"), _atom("s", "Y", "X")])
    r2 = _rule("b", ["P"], [_atom("s", "Q", "P"), _atom("r", "P", "Q")])
    views, _ = share_subplans([r1, r2], recursive_heads=set())
    assert len(views) == 1


def test_no_share_without_common_variable():
    r1 = _rule("a", ["X", "P"], [_atom("r", "X", "Y"), _atom("s", "P", "Q")])
    r2 = _rule("b", ["X", "P"], [_atom("r", "X", "Y"), _atom("s", "P", "Q")])
    views, rewritten = share_subplans([r1, r2], recursive_heads=set())
    assert views == [] and rewritten == [r1, r2]


def test_no_share_with_wildcards_or_bools_or_derived():
    w = Atom("r", (Var("X"), Var("_")))
    r1 = _rule("a", ["X"], [w, _atom("s", "X", "Y")])
    r2 = _rule("b", ["X"], [w, _atom("s", "X", "Y")])
    assert share_subplans([r1, r2], recursive_heads=set())[0] == []

    b = Atom("r", (Var("X"), Const(True)))
    r3 = _rule("a", ["X"], [b, _atom("s", "X", "Y")])
    r4 = _rule("b", ["X"], [b, _atom("s", "X", "Y")])
    assert share_subplans([r3, r4], recursive_heads=set())[0] == []

    # pairs touching a derived head are never hoisted
    r5 = _rule("a", ["X"], [_atom("d", "X", "Y"), _atom("s", "Y", "X")])
    r6 = _rule("b", ["X"], [_atom("d", "X", "Y"), _atom("s", "Y", "X")])
    r7 = _rule("d", ["X", "Y"], [_atom("t", "X", "Y")])
    assert share_subplans([r5, r6, r7], recursive_heads=set())[0] == []


def test_recursive_rules_left_untouched():
    r1 = _rule("p", ["X", "Y"], [_atom("e", "X", "Y")])
    r2 = _rule("p", ["X", "Z"], [_atom("e", "X", "Y"), _atom("p", "Y", "Z")])
    r3 = _rule("q", ["X", "Z"], [_atom("e", "X", "Y"), _atom("e", "Y", "Z")])
    views, rewritten = share_subplans([r1, r2, r3], recursive_heads={"p"})
    # the e⋈e pair occurs once in q (and p's rules are off-limits) → no view
    assert views == []
    assert rewritten[:2] == [r1, r2]


def test_within_rule_repetition_counts():
    # the same canonical pair twice in ONE body is still CSE-able
    body = [
        _atom("e", "A", "B"),
        _atom("f", "B", "C"),
        _atom("e", "X", "Y"),
        _atom("f", "Y", "Z"),
    ]
    r1 = _rule("quad", ["A", "C", "X", "Z"], body)
    views, rewritten = share_subplans([r1], recursive_heads=set())
    assert len(views) == 1
    view_atoms = [
        l
        for l in rewritten[0].body
        if isinstance(l, Atom) and l.relation == views[0].name
    ]
    assert len(view_atoms) == 2
    # B / Y are pure join vars nobody observes — pruned from the export
    assert [t.name for t in view_atoms[0].terms] == ["A", "C"]
    assert [t.name for t in view_atoms[1].terms] == ["X", "Z"]


def test_aggregate_consumer_forces_full_export():
    # count<N> ranges over distinct full-body bindings, so every pair
    # variable carries multiplicity and must be exported
    r1 = _rule("a", ["X"], [_atom("r", "X", "Y"), _atom("s", "Y", "Z")])
    r2 = Rule(
        head=Atom("b", (Agg("count", (Var("X"),)),)),
        body=(_atom("r", "X", "Y"), _atom("s", "Y", "Z")),
        persistent=True,
    )
    views, rewritten = share_subplans([r1, r2], recursive_heads=set())
    assert len(views) == 1
    assert len(views[0].rule.head.terms) == 3  # X, Y, Z all exported


def test_triple_join_shares_nested_views():
    # an r⋈s⋈t chain common to two rules collapses into nested views:
    # round 1 hoists one pair, round 2 pairs the view with the third atom
    chain = lambda a, b, c, d: [  # noqa: E731
        _atom("r", a, b), _atom("s", b, c), _atom("t", c, d)
    ]
    r1 = _rule("x", ["A", "D"], chain("A", "B", "C", "D"))
    r2 = _rule("y", ["P", "W"], chain("P", "Q", "V", "W"))
    views, rewritten = share_subplans([r1, r2], recursive_heads=set())
    assert len(views) == 2
    inner, outer = views
    # the outer view's body references the inner one; its epoch stamp
    # covers the TRANSITIVE base relations
    outer_body_rels = {a.relation for a in outer.rule.body}
    assert inner.name in outer_body_rels
    assert set(outer.base_deps) == {"r", "s", "t"}
    # both rules end up with a single body atom over the outer view
    for rw in rewritten:
        atoms = [l for l in rw.body if isinstance(l, Atom)]
        assert [a.relation for a in atoms] == [outer.name]


def test_nested_shared_views_engine_end_to_end(engine):
    engine.execute(
        """
        +r[(1, 2), (2, 3)]
        +s[(2, 20), (3, 30)]
        +t[(20, 200), (30, 300)]
        +x(A, D) <- r(A, B), s(B, C), t(C, D)
        +y(A, D) <- r(A, B), s(B, C), t(C, D), D > 250
        """
    )
    assert rows(engine.query("?x(A, D)")) == [(1, 200), (2, 300)]
    assert rows(engine.query("?y(A, D)")) == [(2, 300)]
    # both levels materialized and stamped
    assert len(engine._shared_frames) == 2
    # a base write on the DEEPEST relation invalidates the whole tree
    engine.execute("+r(0, 2)")
    assert rows(engine.query("?x(A, D)")) == [(0, 200), (1, 200), (2, 300)]


def test_wide_export_not_shared():
    # a pair whose observed binding set exceeds MAX_EXPORT_WIDTH stays
    # inline, where Catalyst column-prunes each consumer independently
    wide_a = _atom("w1", *[f"A{i}" for i in range(6)])
    wide_b = Atom("w2", (Var("A0"), *(Var(f"B{i}") for i in range(5))))
    r1 = _rule("a", [f"A{i}" for i in range(6)] + [f"B{i}" for i in range(5)], [wide_a, wide_b])
    r2 = _rule("b", [f"A{i}" for i in range(6)] + [f"B{i}" for i in range(5)], [wide_a, wide_b])
    views, rewritten = share_subplans([r1, r2], recursive_heads=set())
    assert views == [] and rewritten == [r1, r2]


# --------------------------------------------------- engine end-to-end


def _setup_shared(engine):
    engine.execute(
        """
        +edge[(1, 2), (2, 3), (3, 4)]
        +label[(2, "b"), (3, "c")]
        +hop_named(X, Z, N) <- edge(X, Y), label(Y, N), edge(Y, Z)
        +hop_tagged(X, N) <- edge(X, Y), label(Y, N)
        """
    )


def test_shared_view_results_match_unshared(engine):
    _setup_shared(engine)
    on_1 = rows(engine.query("?hop_named(X, Z, N)"))
    on_2 = rows(engine.query("?hop_tagged(X, N)"))
    engine.enable_subplan_sharing = False
    engine._derived_cache.clear()
    assert rows(engine.query("?hop_named(X, Z, N)")) == on_1
    assert rows(engine.query("?hop_tagged(X, N)")) == on_2
    assert on_2 == [(1, "b"), (2, "c")]


def test_shared_view_is_persisted_and_reused(engine):
    _setup_shared(engine)
    engine.query("?hop_named(X, Z, N)")
    shared = {
        k: v for k, v in engine._shared_frames.items() if k[0] == "default"
    }
    assert len(shared) == 1
    (frame, _stamp) = next(iter(shared.values()))
    assert frame.storageLevel.useMemory  # persist() applied
    # both consumers scan the SAME in-memory view
    plan = engine.query("?hop_named(X, Z, N)")._jdf.queryExecution()
    assert "InMemoryTableScan" in plan.executedPlan().toString()


def test_shared_view_invalidated_by_base_write(engine):
    _setup_shared(engine)
    assert rows(engine.query("?hop_tagged(X, N)")) == [(1, "b"), (2, "c")]
    engine.execute('+label(4, "d")\n+edge(4, 5)')
    got = rows(engine.query("?hop_tagged(X, N)"))
    # rebuilt view sees the new rows: edge(3,4) ⋈ label(4,"d") → (3,"d")
    assert got == [(1, "b"), (2, "c"), (3, "d")]


def test_shared_view_aggregate_multiplicity(engine):
    # count<> ranges over distinct full-body bindings — the view exports
    # every named var, so join fan-out through the view stays countable
    engine.execute(
        """
        +e[(1, 10), (1, 11), (2, 10)]
        +g[(10, 100), (10, 101), (11, 100)]
        +pair_count(count<X>) <- e(X, Y), g(Y, Z)
        +pair_list(X, Z) <- e(X, Y), g(Y, Z)
        """
    )
    assert rows(engine.query("?pair_count(N)")) == [(5,)]


def test_kg_drop_clears_shared_frames(engine):
    engine.execute(".kg create scratch\n.kg use scratch")
    _setup_shared(engine)
    engine.query("?hop_tagged(X, N)")
    assert any(k[0] == "scratch" for k in engine._shared_frames)
    engine.execute(".kg use default\n.kg drop scratch")
    assert not any(k[0] == "scratch" for k in engine._shared_frames)


def test_shared_frame_stamp_snapshots_epoch_before_build(spark, monkeypatch):
    """Lock-free reader vs foreign writer, for SHARED-VIEW frames: a
    write landing between base-frame resolution and registry insert must
    leave the persisted frame stale (pre-read epoch stamp), mirroring
    the view-cache and index-artifact races fixed after ADVICE r6."""
    import inputlayer_spark.engine as eng_mod
    from inputlayer_spark.engine import IQLEngine
    from inputlayer_spark.subplan import SHARED_PREFIX

    a = IQLEngine(spark)
    a.execute(
        """
        +e[(1, 10)]
        +g[(10, 100)]
        +u(X, Z) <- e(X, Y), g(Y, Z)
        +w(X, Z) <- e(X, Y), g(Y, Z), Z > 0
        """
    )
    b = IQLEngine(spark)
    b.kgs = a.kgs
    b.current = a.current

    real = eng_mod.evaluate_scc
    fired = []

    def racy(scc, rules, resolver, hnsw_resolver, base_of=None):
        out = real(scc, rules, resolver, hnsw_resolver, base_of=base_of)
        if scc[0].startswith(SHARED_PREFIX) and not fired:
            fired.append(True)
            a.execute("+e(2, 10)")  # foreign write mid-build
        return out

    monkeypatch.setattr(eng_mod, "evaluate_scc", racy)
    first = rows(b.query("?u(X, Z)"))
    monkeypatch.undo()
    assert fired, "race hook never fired"
    assert first == [(1, 100)]  # consistent pre-write snapshot
    # the shared frame must be stamped PRE-write → next query rebuilds
    assert rows(b.query("?u(X, Z)")) == [(1, 100), (2, 100)]


# --------------------------------------------------- max_query_cost


def _q(rel, *vs):
    return Query(goal=Atom(rel, tuple(Var(v) for v in vs)), body=())


def test_cost_grows_with_joins_and_recursion():
    flat = [_rule("a", ["X"], [_atom("r", "X", "Y"), _atom("s", "Y", "Z")])]
    deep = [
        _rule(
            "a",
            ["X"],
            [_atom("r", "X", "Y"), _atom("s", "Y", "Z"), _atom("t", "Z", "W")],
        )
    ]
    rec = [
        _rule("a", ["X", "Y"], [_atom("r", "X", "Y")]),
        _rule("a", ["X", "Z"], [_atom("r", "X", "Y"), _atom("a", "Y", "Z")]),
    ]
    c_flat = estimate_query_cost(flat, _q("a", "X"))
    c_deep = estimate_query_cost(deep, _q("a", "X"))
    c_rec = estimate_query_cost(rec, _q("a", "X", "Y"))
    assert c_flat < c_deep < c_rec  # joins multiply, recursion ×10


def test_check_query_cost_message():
    deep = [
        _rule(
            "a",
            ["X"],
            [_atom("r", "X", "Y"), _atom("s", "Y", "Z"), _atom("t", "Z", "W")],
        )
    ]
    check_query_cost(deep, _q("a", "X"), max_cost=0)  # 0 = unlimited
    check_query_cost(deep, _q("a", "X"), max_cost=10_000_000)
    from inputlayer_spark.compiler import CompileError

    with pytest.raises(CompileError, match="Query too complex: estimated cost"):
        check_query_cost(deep, _q("a", "X"), max_cost=10)


def test_engine_enforces_max_query_cost(engine):
    engine.execute(
        """
        +edge[(1, 2), (2, 3)]
        +path(X, Y) <- edge(X, Y)
        +path(X, Z) <- edge(X, Y), path(Y, Z)
        """
    )
    engine.max_query_cost = 50
    from inputlayer_spark.compiler import CompileError

    with pytest.raises(CompileError, match="Query too complex"):
        engine.query("?path(X, Y)")
    engine.max_query_cost = 0
    assert len(rows(engine.query("?path(X, Y)"))) == 3


# --------------------------------------- session overlays vs shared frames
# ADVICE r7 (high): `.session clear` / `.kg use` / `.session drop` cleared
# session_facts but left _shared_frames epoch-stamps matching, so queries
# kept returning cleared session facts from the persisted view.


def test_session_clear_invalidates_shared_frames(engine):
    _setup_shared(engine)
    baseline = rows(engine.query("?hop_tagged(X, N)"))
    engine.add_session_fact("label", 4, "d")
    assert (3, "d") in rows(engine.query("?hop_tagged(X, N)"))
    engine.execute(".session clear")
    assert rows(engine.query("?hop_tagged(X, N)")) == baseline


def test_clear_command_invalidates_shared_frames(engine):
    _setup_shared(engine)
    baseline = rows(engine.query("?hop_tagged(X, N)"))
    engine.add_session_fact("label", 4, "d")
    engine.query("?hop_tagged(X, N)")  # bake overlay into the shared frame
    engine.execute(".clear")
    assert rows(engine.query("?hop_tagged(X, N)")) == baseline


def test_session_drop_by_name_invalidates_shared_frames(engine):
    _setup_shared(engine)
    baseline = rows(engine.query("?hop_tagged(X, N)"))
    engine.add_session_fact("label", 4, "d")
    engine.query("?hop_tagged(X, N)")
    engine.execute(".session drop label")
    assert rows(engine.query("?hop_tagged(X, N)")) == baseline


def test_kg_use_roundtrip_invalidates_shared_frames(engine):
    # overlay applies to KG A; switch A→B→A must not revive the overlay
    _setup_shared(engine)
    baseline = rows(engine.query("?hop_tagged(X, N)"))
    engine.add_session_fact("label", 4, "d")
    engine.query("?hop_tagged(X, N)")
    engine.execute(".kg create other\n.kg use other\n.kg use default")
    assert rows(engine.query("?hop_tagged(X, N)")) == baseline


def test_session_rule_feeding_shared_view_clears(engine):
    # session RULE head consumed by two persistent rules → shared view
    # scans it; dropping the session rule must rebuild the view
    engine.execute(
        """
        +edge[(1, 2), (2, 3)]
        +via_a(X, Z) <- edge(X, Y), extra(Y, Z)
        +via_b(X, Z) <- edge(X, Y), extra(Y, Z)
        """
    )
    engine.execute("extra(Y, Z) <- edge(Y, Z)")  # session rule (no `+`)
    assert rows(engine.query("?via_a(X, Z)")) == [(1, 3)]
    engine.execute(".session clear")
    assert rows(engine.query("?via_a(X, Z)")) == []
