"""IQL abstract syntax tree.

Semantics follow the reference AST (`/root/reference/src/ast/mod.rs`):
Program → Rules/Facts/Queries; rule bodies are conjunctions of atoms
(possibly negated), comparisons, and builtin calls; head terms may be
aggregates (`src/ast/mod.rs:22-54`). This is a clean-room dataclass model,
not a translation — only the *language shape* is shared.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# ---------------------------------------------------------------- terms


@dataclass(frozen=True)
class Var:
    """A logic variable (identifier starting with uppercase or `_`)."""

    name: str

    @property
    def is_wildcard(self) -> bool:
        return self.name == "_"


@dataclass(frozen=True)
class Const:
    """A literal: int, float, str, bool, or None (null)."""

    value: object


@dataclass(frozen=True)
class VecLit:
    """A vector literal `[1.0, 2.0, ...]` → ArrayType(FloatType)."""

    values: tuple


@dataclass(frozen=True)
class Arith:
    """Binary arithmetic `l op r` with op in + - * / %."""

    op: str
    left: "Term"
    right: "Term"


@dataclass(frozen=True)
class Call:
    """Builtin function call, e.g. cosine(V1, V2). Closed set — no UDFs
    (reference: BuiltinFunc::parse, src/ast/mod.rs:199-267)."""

    func: str
    args: tuple


@dataclass(frozen=True)
class Agg:
    """Head aggregate term, e.g. sum<X>, count<>, top_k<3, Name, Score:desc>.

    Reference: AggregateFunction (src/ast/mod.rs:22-54). For ranking
    aggregates (top_k / top_k_threshold / within_radius) `args` carries the
    parameters in reference order and `order` the :asc/:desc of the score.
    """

    func: str
    args: tuple = ()
    order: str = "desc"

    RANKING = ("top_k", "top_k_threshold", "within_radius")

    @property
    def is_ranking(self) -> bool:
        return self.func in self.RANKING


Term = Union[Var, Const, VecLit, Arith, Call, Agg]

# ---------------------------------------------------------------- body literals


@dataclass(frozen=True)
class Atom:
    """`rel(t1, ..., tn)` — positive or negated (`!rel(...)`)."""

    relation: str
    terms: tuple
    negated: bool = False


@dataclass(frozen=True)
class Comparison:
    """Body predicate `l op r`, op in = != < <= > >=.

    `X = expr` with X unbound acts as a binding (reference builds a
    Compute IR node, src/ir/mod.rs:342); otherwise it is a filter.
    """

    op: str
    left: Term
    right: Term


@dataclass(frozen=True)
class HnswNearest:
    """`hnsw_nearest("index", Query, k, IdVar, DistVar [, ef_search])`
    (reference: src/ast/mod.rs:966-979). Resolved at plan time into a
    (id, distance) DataFrame joined into the body."""

    index: str
    query: Term
    k: int
    id_var: Var
    dist_var: Var
    ef_search: Optional[int] = None


BodyLiteral = Union[Atom, Comparison, HnswNearest]

# ---------------------------------------------------------------- statements


@dataclass
class Rule:
    """`head <- body`. Persistent (`+`-prefixed) rules are materialized;
    session rules are ephemeral (reference: src/statement/mod.rs:42-50)."""

    head: Atom
    body: tuple
    persistent: bool = False


@dataclass
class Fact:
    """Ground fact `+rel(c1, ..., cn)`; without the `+` prefix it is a
    session fact — transient, cleared on `.session clear` / KG switch
    (reference: Statement::Fact vs Insert, src/statement/mod.rs:42-46)."""

    relation: str
    values: tuple  # of Const / VecLit
    session: bool = False


@dataclass
class EmptyBatch:
    """`+rel[]` — declares an (arity-unknown) empty relation
    (examples/iql/06_joins/36_empty_left_join.iql)."""

    relation: str


@dataclass
class Delete:
    """`-rel(pattern...)` — delete by tuple or pattern (wildcards allowed);
    optional body makes it a conditional delete (src/statement/data.rs:24)."""

    relation: str
    terms: tuple = ()
    body: tuple = ()
    drop: bool = False  # bare `-name` drops relation or rule


@dataclass
class Update:
    """Atomic update `-rel(old...), +rel(new...) <- cond`: for every
    binding of cond, retract the old tuple and assert the new one in one
    step (reference: UpdateOp, src/statement/data.rs:49)."""

    delete: Atom
    insert: Atom
    body: tuple = ()


@dataclass
class SchemaDecl:
    """`+rel(col: type, ...)` (reference: src/statement/schema.rs)."""

    relation: str
    columns: tuple  # of (name, type_name)


@dataclass
class TypeDecl:
    """`type Name: TypeExpr` (reference: src/statement/types.rs:12-35).
    Records/lists resolve to 'any' like the reference's to_schema_type
    (statement/types.rs:48-49 — documentation-level today)."""

    name: str
    base: str  # resolved base type name ('int', 'string', ..., 'any')
    definition: str = ""  # original surface text for .rule-style listing


@dataclass
class Query:
    """`?goal(...) [, body...] [, limit(n[, offset])]` with inline
    `:asc`/`:desc` order annotations (src/statement/parser.rs:15-26)."""

    goal: Atom
    body: tuple = ()
    order_by: tuple = ()  # of (position, "asc"|"desc")
    limit: Optional[int] = None
    offset: Optional[int] = None


@dataclass
class MetaCommand:
    """Dot command, e.g. `.rel list` (src/statement/meta.rs:7-110)."""

    command: str
    args: tuple = ()


Statement = Union[Rule, Fact, Delete, Update, SchemaDecl, Query, MetaCommand]


@dataclass
class Program:
    statements: list = field(default_factory=list)


# ---------------------------------------------------------------- helpers


def term_vars(term: Term) -> set:
    """All variable names appearing in a term."""
    if isinstance(term, Var):
        return set() if term.is_wildcard else {term.name}
    if isinstance(term, Arith):
        return term_vars(term.left) | term_vars(term.right)
    if isinstance(term, (Call, Agg)):
        out: set = set()
        for a in term.args:
            out |= term_vars(a)
        return out
    return set()


def literal_vars(lit: BodyLiteral) -> set:
    if isinstance(lit, Atom):
        out: set = set()
        for t in lit.terms:
            out |= term_vars(t)
        return out
    if isinstance(lit, Comparison):
        return term_vars(lit.left) | term_vars(lit.right)
    if isinstance(lit, HnswNearest):
        out = term_vars(lit.query)
        out |= {lit.id_var.name, lit.dist_var.name}
        return out
    return set()
