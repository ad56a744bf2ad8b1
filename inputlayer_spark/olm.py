"""Typed object-logic mapping (OLM): class-based relation declarations.

Re-expresses the reference SDK's model-class layer — `Relation`
subclasses with typed fields and class-attribute column access
(packages/inputlayer-py/src/inputlayer/relation.py:45-102), `Vector[N]`
dimension-checked vector types (types.py:14-66), and `Derived` relations
carrying their defining rules (derived.py:16-33) — as a small original
layer over this repo's fluent builder:

* no pydantic: columns come from plain ``__annotations__``, values are
  validated in ``__init__``;
* class attribute access yields fluent ``Var``s named for the column
  (``Employee.salary`` → ``Var("Salary")``), so model classes plug
  straight into ``rule()`` / ``query()`` datalog building instead of the
  reference's lambda-AST ``where`` chains;
* every rendering goes through ``.iql()`` strings accepted verbatim by
  `IQLEngine.execute` and the wire `Client`.

    from inputlayer_spark.olm import Model, Vector

    class Employee(Model):
        id: int
        name: str
        salary: float

    Employee.create_iql()      # '+employee(id: int, name: string, salary: float)'
    e = Employee(id=1, name="ada", salary=120.0)
    Employee.insert_iql([e])   # '+employee[(1, "ada", 120.0)]'
    Employee.atom(name=Employee.name)   # employee(_, Name, _)
"""

from __future__ import annotations

import re
from typing import ClassVar, Dict, List, Optional, Sequence, Tuple

from inputlayer_spark.fluent import Atom, Rule, Var, _render

__all__ = ["Model", "Derived", "Vector", "camel_to_snake"]


def camel_to_snake(name: str) -> str:
    """CamelCase class name → snake_case relation name (the reference's
    default naming, _naming.py)."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower()


def _var_name(column: str) -> str:
    """Column → IQL variable: snake_case to CamelCase (vars must start
    uppercase in the grammar)."""
    return "".join(p.capitalize() or "_" for p in column.split("_"))


# ------------------------------------------------------------------ types


class _VectorMeta(type):
    """``Vector[N]`` produces a dimension-pinned subclass (types.py
    Vector semantics: a float list, optionally fixed-length)."""

    _dim: Optional[int] = None
    _cache: ClassVar[Dict[int, type]] = {}

    def __getitem__(cls, dim: int) -> type:
        if not isinstance(dim, int) or dim <= 0:
            raise TypeError(f"Vector dimension must be a positive int, got {dim!r}")
        if dim not in _VectorMeta._cache:
            _VectorMeta._cache[dim] = _VectorMeta(
                f"Vector[{dim}]", (Vector,), {"_dim": dim}
            )
        return _VectorMeta._cache[dim]

    def validate(cls, value) -> list:
        if not isinstance(value, (list, tuple)):
            raise TypeError(f"expected a list for Vector, got {type(value).__name__}")
        if cls._dim is not None and len(value) != cls._dim:
            raise ValueError(
                f"expected vector of dimension {cls._dim}, got {len(value)}"
            )
        return [float(x) for x in value]


class Vector(list, metaclass=_VectorMeta):
    """Float vector field type; ``Vector[64]`` pins the dimensionality."""


_IQL_TYPES = {int: "int", str: "string", float: "float", bool: "bool"}


def _iql_type(py_type) -> str:
    if isinstance(py_type, type) and issubclass(py_type, Vector):
        return "vector"
    t = _IQL_TYPES.get(py_type)
    if t is None:
        raise TypeError(f"unsupported OLM field type {py_type!r}")
    return t


def _validate(column: str, py_type, value):
    if isinstance(py_type, type) and issubclass(py_type, Vector):
        return py_type.validate(value)
    if py_type is float and isinstance(value, int) and not isinstance(value, bool):
        return float(value)
    if py_type is bool:
        if not isinstance(value, bool):
            raise TypeError(f"{column}: expected bool, got {type(value).__name__}")
        return value
    if not isinstance(value, py_type) or isinstance(value, bool) and py_type is int:
        raise TypeError(
            f"{column}: expected {py_type.__name__}, got {type(value).__name__}"
        )
    return value


# ------------------------------------------------------------------ model


class _ModelMeta(type):
    """Class-attribute access on a Model subclass returns the column's
    fluent Var (the reference's ColumnProxy idea, relation.py:14-34,
    retargeted at datalog variables)."""

    def __getattr__(cls, name: str):
        cols = cls.__dict__.get("_columns") or getattr(cls, "_columns", ())
        for col, _py, _iql in cols:
            if col == name:
                return Var(_var_name(col))
        raise AttributeError(
            f"type object {cls.__name__!r} has no attribute {name!r}"
        )


class Model(metaclass=_ModelMeta):
    """Base class for typed relations. Subclass with annotated fields::

        class Employee(Model):
            id: int
            name: str
            salary: float

    Relation name defaults to ``camel_to_snake(cls.__name__)``; override
    with ``__relation_name__``.
    """

    __relation_name__: ClassVar[Optional[str]] = None
    _columns: ClassVar[Tuple[Tuple[str, type, str], ...]] = ()

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        cols: List[Tuple[str, type, str]] = list(
            getattr(cls, "_columns", ())
        )
        own = cls.__dict__.get("__annotations__", {})
        for col, py_type in own.items():
            if col.startswith("_") or col == "rules":
                continue
            cols.append((col, py_type, _iql_type(py_type)))
        cls._columns = tuple(cols)

    def __init__(self, **values):
        cols = type(self)._columns
        unknown = set(values) - {c for c, _, _ in cols}
        if unknown:
            raise TypeError(f"unknown column(s) {sorted(unknown)}")
        for col, py_type, _ in cols:
            if col not in values:
                raise TypeError(f"missing column {col!r}")
            object.__setattr__(self, col, _validate(col, py_type, values[col]))

    def __repr__(self) -> str:
        vals = ", ".join(f"{c}={getattr(self, c)!r}" for c, _, _ in self._columns)
        return f"{type(self).__name__}({vals})"

    def __eq__(self, other) -> bool:
        return type(other) is type(self) and self.values() == other.values()

    def __hash__(self) -> int:
        return hash((type(self).__name__,) + tuple(map(str, self.values())))

    def values(self) -> tuple:
        return tuple(getattr(self, c) for c, _, _ in self._columns)

    # ---------------------------------------------------- class surface

    @classmethod
    def relation_name(cls) -> str:
        return cls.__relation_name__ or camel_to_snake(cls.__name__)

    @classmethod
    def columns(cls) -> List[str]:
        return [c for c, _, _ in cls._columns]

    @classmethod
    def atom(cls, *terms, **bindings) -> Atom:
        """Fluent body atom. Positional terms must cover every column;
        keyword form binds named columns and wildcards the rest::

            Employee.atom(name=V.N, salary=V.S)  # employee(_, N, S)
            Employee.atom()                       # employee(Id, Name, Salary)
                                                  # (all columns as vars)
        """
        if terms:
            if bindings:
                raise TypeError("positional and keyword terms are exclusive")
            if len(terms) != len(cls._columns):
                raise TypeError(
                    f"{cls.relation_name()} has {len(cls._columns)} columns, "
                    f"got {len(terms)} terms"
                )
            return Atom(cls.relation_name(), tuple(terms))
        unknown = set(bindings) - set(cls.columns())
        if unknown:
            raise TypeError(f"unknown column(s) {sorted(unknown)}")
        if not bindings:
            # bare atom: every column as its default variable
            return Atom(
                cls.relation_name(),
                tuple(Var(_var_name(c)) for c in cls.columns()),
            )
        return Atom(
            cls.relation_name(),
            tuple(bindings.get(c, Var("_")) for c in cls.columns()),
        )

    # ------------------------------------------------------ IQL renders

    @classmethod
    def create_iql(cls) -> str:
        cols = ", ".join(f"{c}: {t}" for c, _, t in cls._columns)
        return f"+{cls.relation_name()}({cols})"

    @classmethod
    def insert_iql(cls, instances: Sequence["Model"]) -> str:
        tuples = ", ".join(
            "(" + ", ".join(_render(v) for v in inst.values()) + ")"
            for inst in instances
        )
        return f"+{cls.relation_name()}[{tuples}]"

    def delete_iql(self) -> str:
        return (
            f"-{self.relation_name()}("
            + ", ".join(_render(v) for v in self.values())
            + ")"
        )

    # ----------------------------------------------- executor conveniences

    @classmethod
    def declare(cls, executor) -> None:
        """Register the schema on anything with ``execute(iql)`` — an
        IQLEngine, the wire Client, or a session engine."""
        executor.execute(cls.create_iql())

    @classmethod
    def insert(cls, executor, *instances: "Model") -> None:
        if instances:
            executor.execute(cls.insert_iql(instances))

    @classmethod
    def query_all(cls, executor):
        """`?rel(Col1, Col2, ...)` over all columns; returns whatever the
        executor's query surface returns (DataFrame / ResultSet)."""
        goal = cls.atom()
        q = f"?{goal.iql()}"
        if hasattr(executor, "query"):
            return executor.query(q)
        return executor.execute(q)


class Derived(Model):
    """Typed derived relation: annotate the head columns and attach the
    defining rules (reference derived.py Derived + ClassVar rules).
    Rules are assigned after the class statement so they can reference
    the class itself::

        class Reachable(Derived):
            src: int
            dst: int

        Reachable.rules = [
            rule(Reachable.atom()) << [Edge.atom()],
            rule(Reachable.atom(src=V.X, dst=V.Z))
                << [Edge.atom(V.X, V.Y), Reachable.atom(src=V.Y, dst=V.Z)],
        ]
    """

    rules: ClassVar[List[Rule]] = []

    @classmethod
    def define(cls, executor) -> None:
        """Install every defining rule (no schema insert — derived
        relations exist through their rules)."""
        for r in cls.rules:
            executor.execute(r.iql() if hasattr(r, "iql") else str(r))
