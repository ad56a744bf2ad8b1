"""Fluent IQL builder — the reference SDK's proxy layer as thin sugar.

The reference Python SDK exposes column proxies whose operators build
IQL under the hood (packages/inputlayer-py/src/inputlayer/_proxy.py:72-170
— API shape only; this is an original implementation that renders IQL
text for our engine/client). PySpark itself is this engine's primary
API; the fluent layer exists so reference-SDK users have a familiar
shape:

    from inputlayer_spark.fluent import V, rel, agg, fn, rule, query

    edge, path = rel("edge"), rel("path")
    X, Y, Z = V.X, V.Y, V.Z

    rule(path(X, Y)) << [edge(X, Y)]                      # base clause
    iql = (rule(path(X, Z)) << [edge(X, Y), path(Y, Z)]).iql()
    #  -> "+path(X, Z) <- edge(X, Y), path(Y, Z)"

    query(path(X, Y), X > 3, limit=10).iql()
    #  -> "?path(X, Y), X > 3, limit(10)"

    query(rel("stats")(V.Dept, agg.sum(V.S))).iql()
    #  -> "?stats(Dept, sum<S>)"  (head aggregates via rule())

Every object renders with `.iql()`; `Engine.run` / `Client.execute`
accept the rendered text directly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Sequence, Union


def _render(v) -> str:
    if isinstance(v, _Expr):
        return v.iql()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace('"', '\\"')
        return f'"{escaped}"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_render(x) for x in v) + "]"
    return repr(v)


class _Expr:
    """Base: anything renderable to an IQL fragment with operators."""

    def iql(self) -> str:  # pragma: no cover — abstract
        raise NotImplementedError

    # comparisons → body predicates
    def __eq__(self, other):  # type: ignore[override]
        return Cmp("=", self, other)

    def __ne__(self, other):  # type: ignore[override]
        return Cmp("!=", self, other)

    def __lt__(self, other):
        return Cmp("<", self, other)

    def __le__(self, other):
        return Cmp("<=", self, other)

    def __gt__(self, other):
        return Cmp(">", self, other)

    def __ge__(self, other):
        return Cmp(">=", self, other)

    # arithmetic → IQL expressions
    def __add__(self, other):
        return Arith("+", self, other)

    def __sub__(self, other):
        return Arith("-", self, other)

    def __mul__(self, other):
        return Arith("*", self, other)

    def __truediv__(self, other):
        return Arith("/", self, other)

    def __mod__(self, other):
        return Arith("%", self, other)

    def __radd__(self, other):
        return Arith("+", _Lit(other), self)

    def __rsub__(self, other):
        return Arith("-", _Lit(other), self)

    def __rmul__(self, other):
        return Arith("*", _Lit(other), self)

    def __hash__(self):
        return hash(self.iql())

    # ordering hints for query projections
    def asc(self) -> "Ordered":
        return Ordered(self, "asc")

    def desc(self) -> "Ordered":
        return Ordered(self, "desc")


@dataclass(frozen=True, eq=False)
class _Lit(_Expr):
    value: object

    def iql(self) -> str:
        return _render(self.value)


@dataclass(frozen=True, eq=False)
class Var(_Expr):
    name: str

    def iql(self) -> str:
        return self.name


@dataclass(frozen=True, eq=False)
class Ordered(_Expr):
    inner: _Expr
    direction: str

    def iql(self) -> str:
        return f"{self.inner.iql()}:{self.direction}"


@dataclass(frozen=True, eq=False)
class Cmp(_Expr):
    op: str
    left: object
    right: object

    def iql(self) -> str:
        return f"{_to_expr(self.left).iql()} {self.op} {_to_expr(self.right).iql()}"


@dataclass(frozen=True, eq=False)
class Arith(_Expr):
    op: str
    left: object
    right: object

    def iql(self) -> str:
        return f"({_to_expr(self.left).iql()} {self.op} {_to_expr(self.right).iql()})"


@dataclass(frozen=True, eq=False)
class Call(_Expr):
    func: str
    args: tuple

    def iql(self) -> str:
        return f"{self.func}({', '.join(_to_expr(a).iql() for a in self.args)})"


@dataclass(frozen=True, eq=False)
class Agg(_Expr):
    func: str
    args: tuple

    def iql(self) -> str:
        return f"{self.func}<{', '.join(_to_expr(a).iql() for a in self.args)}>"


def _to_expr(v) -> _Expr:
    return v if isinstance(v, _Expr) else _Lit(v)


@dataclass(frozen=True, eq=False)
class Atom(_Expr):
    relation: str
    terms: tuple
    negated: bool = False

    def iql(self) -> str:
        body = f"{self.relation}({', '.join(_to_expr(t).iql() for t in self.terms)})"
        return f"!{body}" if self.negated else body

    def __invert__(self) -> "Atom":
        return Atom(self.relation, self.terms, negated=not self.negated)


class Relation:
    """`rel("edge")` — calling it with terms yields an atom."""

    def __init__(self, name: str):
        self.name = name

    def __call__(self, *terms) -> Atom:
        return Atom(self.name, terms)


def rel(name: str) -> Relation:
    return Relation(name)


class _VarFactory:
    """`V.X` → Var("X"); `V["Long Name"]` unsupported by the grammar."""

    def __getattr__(self, name: str) -> Var:
        return Var(name)


V = _VarFactory()
_ = Var("_")  # wildcard


class _AggFactory:
    def __getattr__(self, func: str):
        return lambda *args: Agg(func, args)


class _FnFactory:
    def __getattr__(self, func: str):
        return lambda *args: Call(func, args)


agg = _AggFactory()
fn = _FnFactory()


class Rule:
    """`rule(head) << [body literals]` renders `+head <- body`."""

    def __init__(self, head: Atom, persistent: bool = True):
        self.head = head
        self.body: List[_Expr] = []
        self.persistent = persistent

    def __lshift__(self, body: Iterable[_Expr]) -> "Rule":
        self.body = list(body)
        return self

    def where(self, *body: _Expr) -> "Rule":
        self.body = list(body)
        return self

    def iql(self) -> str:
        prefix = "+" if self.persistent else ""
        body = ", ".join(b.iql() for b in self.body)
        return f"{prefix}{self.head.iql()} <- {body}"


def rule(head: Atom, persistent: bool = True) -> Rule:
    return Rule(head, persistent)


class Query:
    def __init__(self, goal: Atom, *body: _Expr, limit=None, offset=None):
        self.goal = goal
        self.body = list(body)
        self.limit = limit
        self.offset = offset

    def iql(self) -> str:
        parts = [f"?{self.goal.iql()}"]
        for b in self.body:
            parts.append(b.iql())
        text = ", ".join(parts)
        if self.limit is not None:
            text += (
                f", limit({self.limit}, {self.offset})"
                if self.offset
                else f", limit({self.limit})"
            )
        return text


def query(goal: Atom, *body: _Expr, limit=None, offset=None) -> Query:
    return Query(goal, *body, limit=limit, offset=offset)


@dataclass(frozen=True)
class HnswIndex:
    """Fluent HNSW index declaration (reference SDK index.py):
    compiles to the `.index create ... type hnsw metric <m> m <M>
    ef_construction <C> ef_search <S>` meta command the engine parses
    into a parameterized graph build."""

    name: str
    relation: str
    column: str
    metric: str = "cosine"
    m: int = 16
    ef_construction: int = 100
    ef_search: int = 50

    def iql(self) -> str:
        return (
            f".index create {self.name} on {self.relation}({self.column}) "
            f"type hnsw metric {self.metric} "
            f"m {self.m} ef_construction {self.ef_construction} "
            f"ef_search {self.ef_search}"
        )
