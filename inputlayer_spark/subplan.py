"""Subplan sharing (CSE) across rules — shared views computed once.

Mirrors the reference's subplan-sharing optimizer
(src/subplan_sharing/mod.rs:1-15: canonicalize variable names →
structural hash → detect duplicates → extract shared views → rewrite
rules to reference them; executed first, src/lib.rs:1148 "Execute shared
views first"). Re-expressed for Spark: a shared view becomes a synthetic
rule evaluated in its own (earlier) SCC whose frame the engine
``persist()``s, so every consumer scans one InMemoryRelation instead of
re-running the join — within a single action AND across the many actions
one IQL program issues.

Scope (deliberately conservative — each exclusion is a semantics guard):

* only **pairs of positive base-relation atoms** that share at least one
  variable are extracted (the reference's own example shape:
  ``R(x,y) JOIN S(y,z)`` appearing in two rules);
* atoms must be **wildcard-free**: wildcards bind anonymous variables
  that stay in the binding set (aggregates range over distinct full-body
  bindings — compiler.py scan_atom), so hoisting them into a view would
  change ``count<>`` multiplicities;
* atoms must carry **no boolean constants**: persistent rules ignore
  boolean constant constraints while session rules filter them
  (compiler.py bool_consts_nop), so a view shared across the two kinds
  would pick one semantics;
* rules inside a **recursive SCC** are left untouched — their bodies are
  re-planned by the fixpoint machinery (path doubling / magic sets) and
  must keep their original atoms.

**Column pruning** (the 100 TB guard): the view exports only the
variables its consumers observe — vars used by the rest of each
consuming rule (head, other body literals) — because persisting a WIDE
join intermediate defeats the parquet column pruning each consumer's
inline plan would get (measured: a 17-column orders⋈lineitem view costs
3× the two pruned aggregate plans it replaces). A consumer whose head
contains ANY aggregate forces ALL pair variables into the export:
aggregates range over distinct full-body bindings, so an unobserved var
still carries multiplicity. Pairs whose pruned export is still wider
than ``MAX_EXPORT_WIDTH`` are left inline, where Catalyst prunes per
consumer. Dropping a variable NO consumer observes is safe for
non-aggregate heads — their projection is distinct-ed, which erases
binding multiplicity.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from inputlayer_spark.ast_nodes import (
    Agg,
    Arith,
    Atom,
    Call,
    Comparison,
    Const,
    HnswNearest,
    Rule,
    Var,
    VecLit,
)

SHARED_PREFIX = "__shared_"
# widest binding set worth persisting: beyond this the InMemoryRelation
# costs more than the per-consumer column-pruned scans it replaces
MAX_EXPORT_WIDTH = 8


def _term_vars(t, out: set) -> None:
    if isinstance(t, Var):
        if not t.is_wildcard:
            out.add(t.name)
    elif isinstance(t, Arith):
        _term_vars(t.left, out)
        _term_vars(t.right, out)
    elif isinstance(t, (Call, Agg)):
        for a in t.args:
            _term_vars(a, out)


def _literal_vars(lit, out: set) -> None:
    if isinstance(lit, Atom):
        for t in lit.terms:
            _term_vars(t, out)
    elif isinstance(lit, Comparison):
        _term_vars(lit.left, out)
        _term_vars(lit.right, out)
    elif isinstance(lit, HnswNearest):
        _term_vars(lit.query, out)
        _term_vars(lit.id_var, out)
        _term_vars(lit.dist_var, out)


def _atom_shareable(atom, derived_heads, view_deps) -> bool:
    if not isinstance(atom, Atom) or atom.negated:
        return False
    if atom.relation.startswith(SHARED_PREFIX):
        # views from an earlier sharing round are themselves shareable —
        # iterating the pair rewrite shares arbitrary-depth join trees
        # (the reference canonicalizes whole subtrees, min depth 2)
        return atom.relation in view_deps
    if atom.relation in derived_heads:
        return False
    for t in atom.terms:
        if isinstance(t, Var):
            if t.is_wildcard:
                return False
        elif isinstance(t, Const):
            if isinstance(t.value, bool):
                return False
        elif not isinstance(t, VecLit):
            return False  # Arith/Call/Agg never appear in body atoms anyway
    return True


def _named_vars(atom) -> set:
    return {t.name for t in atom.terms if isinstance(t, Var)}


def _encode(a: Atom, b: Atom):
    """Canonical encoding of the ordered pair (a, b): variables numbered
    by first occurrence, constants kept verbatim. Returns (key, canon_vars)
    where canon_vars maps canonical index → actual variable name."""
    idx: Dict[str, int] = {}
    enc = []
    for atom in (a, b):
        terms = []
        for t in atom.terms:
            if isinstance(t, Var):
                if t.name not in idx:
                    idx[t.name] = len(idx)
                terms.append(("v", idx[t.name]))
            elif isinstance(t, VecLit):
                terms.append(("vec", t.values))
            else:
                terms.append(("c", type(t.value).__name__, t.value))
        enc.append((atom.relation, tuple(terms)))
    canon_vars = [None] * len(idx)
    for name, i in idx.items():
        canon_vars[i] = name
    return tuple(enc), canon_vars


def _pair_canonical(a: Atom, b: Atom):
    """Order-insensitive canonical form: encode both orders, keep the
    lexicographically smaller key so R⋈S and S⋈R in different rules hash
    to the same shared view."""
    k1, v1 = _encode(a, b)
    k2, v2 = _encode(b, a)
    return (k1, v1) if repr(k1) <= repr(k2) else (k2, v2)


@dataclass
class SharedView:
    name: str
    rule: Rule          # the synthetic view rule
    base_deps: Tuple[str, ...]  # base relations the view scans


def share_subplans(
    rules: Sequence[Rule], recursive_heads: set, max_rounds: int = 3
) -> Tuple[List[SharedView], List[Rule]]:
    """Detect shared join subtrees and hoist each into a synthetic view
    rule; returns (shared_views, rewritten_rules). No candidates →
    ([], original list).

    Runs the pair rewrite to a (bounded) fixpoint: after round 1 replaces
    a shared pair with a view atom, round 2 can pair that view atom with
    a further shared atom — so an r⋈s⋈t chain common to two rules
    collapses into nested views, the arbitrary-depth subtree sharing the
    reference's canonicalizer performs in one pass."""
    all_views: List[SharedView] = []
    view_deps: Dict[str, tuple] = {}
    cur = list(rules)
    for _ in range(max_rounds):
        views, cur = _share_once(cur, recursive_heads, view_deps)
        if not views:
            break
        all_views.extend(views)
        for v in views:
            view_deps[v.name] = v.base_deps
    return all_views, cur


def _share_once(
    rules: Sequence[Rule], recursive_heads: set, view_deps: Dict[str, tuple]
) -> Tuple[List[SharedView], List[Rule]]:
    derived_heads = {r.head.relation for r in rules}
    # occurrences[key] = list of (rule_idx, atom_pos_a, atom_pos_b, canon_vars)
    occurrences: Dict[tuple, list] = {}
    for ri, rule in enumerate(rules):
        if rule.head.relation in recursive_heads:
            continue
        body = list(rule.body)
        cand = [
            i
            for i, lit in enumerate(body)
            if _atom_shareable(lit, derived_heads, view_deps)
        ]
        for x in range(len(cand)):
            for y in range(x + 1, len(cand)):
                a, b = body[cand[x]], body[cand[y]]
                if not (_named_vars(a) & _named_vars(b)):
                    continue  # cartesian pair — never worth sharing
                key, canon = _pair_canonical(a, b)
                occurrences.setdefault(key, []).append(
                    (ri, cand[x], cand[y], canon)
                )

    shared = [(k, v) for k, v in occurrences.items() if len(v) >= 2]
    if not shared:
        return [], list(rules)
    # deterministic greedy: most occurrences first, then stable key order
    shared.sort(key=lambda kv: (-len(kv[1]), repr(kv[0])))

    consumed: set = set()  # (rule_idx, atom_pos)
    views: List[SharedView] = []
    # replacements[rule_idx] = list of (pos_a, pos_b, view_name, canon_vars)
    replacements: Dict[int, list] = {}
    for key, occs in shared:
        live = [
            o
            for o in occs
            if (o[0], o[1]) not in consumed and (o[0], o[2]) not in consumed
        ]
        if len(live) < 2:
            continue
        # exported variables: union over consumers of what each observes
        # elsewhere in its rule (head + literals other than the pair);
        # an aggregate head observes EVERYTHING (binding multiplicity)
        exported: set = set()
        for ri, pa, pb, canon in live:
            rule = rules[ri]
            if any(isinstance(t, Agg) for t in rule.head.terms):
                exported.update(range(len(canon)))
                continue
            observed: set = set()
            for t in rule.head.terms:
                _term_vars(t, observed)
            for i, lit in enumerate(rule.body):
                if i not in (pa, pb):
                    _literal_vars(lit, observed)
            exported.update(i for i, v in enumerate(canon) if v in observed)
        if not exported or len(exported) > MAX_EXPORT_WIDTH:
            continue  # nothing observable, or too wide to persist
        exp = sorted(exported)
        digest = hashlib.sha1(repr((key, tuple(exp))).encode()).hexdigest()[:10]
        name = f"{SHARED_PREFIX}{digest}"
        # synthetic rule from the canonical form: body atoms with V{i}
        # variable names, head exporting the observed variables in order
        body_atoms = []
        for rel, terms in key:
            ts = []
            for t in terms:
                if t[0] == "v":
                    ts.append(Var(f"V{t[1]}"))
                elif t[0] == "vec":
                    ts.append(VecLit(t[1]))
                else:
                    ts.append(Const(t[2]))
            body_atoms.append(Atom(rel, tuple(ts)))
        head = Atom(name, tuple(Var(f"V{i}") for i in exp))
        deps: set = set()
        for rel, _ in key:
            # nested views stamp with their TRANSITIVE base relations, so
            # a base write invalidates the whole shared tree
            deps.update(view_deps.get(rel, (rel,)))
        views.append(
            SharedView(
                name=name,
                rule=Rule(head=head, body=tuple(body_atoms), persistent=False),
                base_deps=tuple(sorted(deps)),
            )
        )
        for ri, pa, pb, canon in live:
            consumed.add((ri, pa))
            consumed.add((ri, pb))
            replacements.setdefault(ri, []).append((pa, pb, name, canon, exp))

    if not views:
        return [], list(rules)

    out: List[Rule] = []
    for ri, rule in enumerate(rules):
        reps = replacements.get(ri)
        if not reps:
            out.append(rule)
            continue
        drop = set()
        insert_at: Dict[int, list] = {}
        for pa, pb, name, canon, exp in reps:
            drop.update((pa, pb))
            insert_at.setdefault(pa, []).append(
                Atom(name, tuple(Var(canon[i]) for i in exp))
            )
        body: list = []
        for i, lit in enumerate(rule.body):
            body.extend(insert_at.get(i, ()))
            if i not in drop:
                body.append(lit)
        out.append(Rule(head=rule.head, body=tuple(body), persistent=rule.persistent))
    return views, out
