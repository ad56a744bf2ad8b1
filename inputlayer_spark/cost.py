"""Structural query-cost estimation and the max_query_cost guard.

Mirrors the reference's cost check (#47): IRNode::estimate_cost
(src/ir/mod.rs:455-480 — Scan 10, Filter/Map/Compute +1, Distinct +5,
Join = product of child costs capped below by their sum, Antijoin = sum
+ overhead, Aggregate = 2× child) summed over the program, multiplied by
10 × the number of recursive predicates, rejected against the configured
budget with the reference's error text (src/lib.rs:1604-1625). The
estimate is intentionally structural — it prices plan SHAPE (join count,
recursion, aggregation), not data, exactly like the reference; Catalyst
does the data-aware costing underneath."""

from __future__ import annotations

from typing import Iterable, Sequence

from inputlayer_spark.ast_nodes import Agg, Atom, Comparison, Query, Rule

_SCAN = 10
_STEP = 1
_DISTINCT = 5
_ANTI_OVERHEAD = 5


def body_cost(body: Iterable) -> int:
    """Cost of one conjunctive body: positive atoms fold into a left-deep
    join (product, floored at the sum — the reference's cartesian-risk
    pricing), negated atoms become antijoins, comparisons add filter/
    compute steps."""
    cost = 0
    for lit in body:
        if isinstance(lit, Atom) and not lit.negated:
            cost = max(cost * _SCAN, cost + _SCAN) if cost else _SCAN
        elif isinstance(lit, Atom):
            cost = cost + _SCAN + _ANTI_OVERHEAD
        elif isinstance(lit, Comparison):
            cost += _STEP
        else:  # HnswNearest: fixed probe cost like the reference's HnswScan
            cost += _SCAN
    return cost


def rule_cost(rule: Rule) -> int:
    c = body_cost(rule.body) + _DISTINCT  # head projection is distinct
    if any(isinstance(t, Agg) for t in rule.head.terms):
        c *= 2  # hash grouping (reference: Aggregate = 2× child)
    return c


def estimate_query_cost(rules: Sequence[Rule], q: Query) -> int:
    """Total structural cost of answering `q`: every rule the goal (and
    inline body atoms) transitively depends on, plus the query's own
    body, times the reference's 10× recursion multiplier per recursive
    predicate involved."""
    targets = {q.goal.relation}
    for lit in q.body:
        if isinstance(lit, Atom):
            targets.add(lit.relation)

    heads = {r.head.relation for r in rules}
    deps: dict = {}
    for r in rules:
        s = deps.setdefault(r.head.relation, set())
        for lit in r.body:
            if isinstance(lit, Atom):
                s.add(lit.relation)
    needed: set = set()
    frontier = [t for t in targets if t in heads]
    while frontier:
        h = frontier.pop()
        if h in needed:
            continue
        needed.add(h)
        frontier.extend(x for x in deps.get(h, ()) if x in heads)

    total = _SCAN  # the goal scan itself
    total += body_cost(q.body)
    recursive = 0
    for r in rules:
        if r.head.relation not in needed:
            continue
        total += rule_cost(r)
        # a rule is recursive when its own head is reachable from any of
        # its body atoms through the dependency graph (covers direct AND
        # mutual recursion — the reference's recursive_info per rule)
        body_heads = {
            lit.relation
            for lit in r.body
            if isinstance(lit, Atom) and lit.relation in heads
        }
        if any(
            r.head.relation in _closure(deps, b, heads) for b in body_heads
        ):
            recursive += 1
    if recursive:
        total *= 10 * recursive
    return total


def _closure(deps: dict, start: str, heads: set) -> set:
    """start plus every head transitively reachable from it via deps."""
    seen: set = set()
    frontier = [start]
    while frontier:
        h = frontier.pop()
        if h in seen:
            continue
        seen.add(h)
        frontier.extend(x for x in deps.get(h, ()) if x in heads)
    return seen


def check_query_cost(rules: Sequence[Rule], q: Query, max_cost: int) -> None:
    """Raise the reference's 'Query too complex' error when the estimate
    exceeds the configured budget (0 = unlimited)."""
    if max_cost <= 0:
        return
    est = estimate_query_cost(rules, q)
    if est > max_cost:
        from inputlayer_spark.compiler import CompileError

        raise CompileError(
            f"Query too complex: estimated cost {est} exceeds maximum "
            f"{max_cost} (reduce joins, recursion, or aggregations)"
        )
