"""Django-style schema migrations for knowledge graphs.

Re-expresses the reference SDK's migration system
(`packages/inputlayer-py/src/inputlayer/migrations/`: operations with
forward/backward IQL, a ModelState snapshot for diffing, an
autodetector producing ordered operations, an executor that records
applied migrations in the internal `__inputlayer_migrations__` relation,
and a loader/writer for numbered migration files) against this engine:

* operations render the SAME IQL the reference renders (the wire
  contract), so migration files are portable between engines;
* `ModelState.from_engine` snapshots a LIVE IQLEngine (schemas, rules
  grouped by head, indexes) instead of introspecting Python model
  classes — the OLM layer here is `fluent.py`, and diffing the engine
  itself also captures hand-written IQL;
* migration files are JSON (`NNNN_name.json` with serialized
  operations + the post-state), not executable Python — same
  information, nothing to exec;
* the executor drives anything with an `execute(iql)` method: an
  `IQLEngine`, the wire `Client`, or a per-session engine.

Reference anchors: operations.py:1-298 (the operation set and their
IQL), recorder.py:1-44 (tracking relation + applied/reverted records),
autodetector.py:18-100 (diff ordering: create relations → drop rules →
replace → create rules → drop relations → indexes), executor.py:13-93
(apply/revert/migrate/rollback), loader.py / writer.py (numbered files
with dependencies).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Dict, List, Optional, Sequence, Tuple

MIGRATION_RELATION = "__inputlayer_migrations__"

# ----------------------------------------------------------- operations


@dataclass(frozen=True)
class CreateRelation:
    name: str
    columns: Tuple[Tuple[str, str], ...]  # ((col, iql_type), ...)

    def forward_commands(self) -> List[str]:
        cols = ", ".join(f"{c}: {t}" for c, t in self.columns)
        return [f"+{self.name}({cols})"]

    def backward_commands(self) -> List[str]:
        return [f".rel drop {self.name}"]

    def describe(self) -> str:
        return f"Create relation {self.name}"


@dataclass(frozen=True)
class DropRelation:
    """Stores the dropped columns so the operation is reversible."""

    name: str
    columns: Tuple[Tuple[str, str], ...]

    def forward_commands(self) -> List[str]:
        return [f".rel drop {self.name}"]

    def backward_commands(self) -> List[str]:
        cols = ", ".join(f"{c}: {t}" for c, t in self.columns)
        return [f"+{self.name}({cols})"]

    def describe(self) -> str:
        return f"Drop relation {self.name}"


@dataclass(frozen=True)
class CreateRule:
    name: str  # head relation
    clauses: Tuple[str, ...]  # IQL rule texts

    def forward_commands(self) -> List[str]:
        return list(self.clauses)

    def backward_commands(self) -> List[str]:
        return [f".rule drop {self.name}"]

    def describe(self) -> str:
        return f"Create rule {self.name} ({len(self.clauses)} clauses)"


@dataclass(frozen=True)
class DropRule:
    name: str
    clauses: Tuple[str, ...]  # for reversibility

    def forward_commands(self) -> List[str]:
        return [f".rule drop {self.name}"]

    def backward_commands(self) -> List[str]:
        return list(self.clauses)

    def describe(self) -> str:
        return f"Drop rule {self.name}"


@dataclass(frozen=True)
class ReplaceRule:
    name: str
    old_clauses: Tuple[str, ...]
    new_clauses: Tuple[str, ...]

    def forward_commands(self) -> List[str]:
        return [f".rule drop {self.name}"] + list(self.new_clauses)

    def backward_commands(self) -> List[str]:
        return [f".rule drop {self.name}"] + list(self.old_clauses)

    def describe(self) -> str:
        return f"Replace rule {self.name}"


def _render_index_create(name, relation, column, kind, metric, params) -> str:
    """The `.index create` IQL an index op renders — params (m /
    ef_construction / ef_search) appended in the engine's accepted
    key-value syntax so parameterized indexes survive a
    migrate/rollback round-trip."""
    cmd = (
        f".index create {name} on {relation} ( {column} ) "
        f"type {kind} metric {metric}"
    )
    for k, v in dict(params or ()).items():
        cmd += f" {k} {v}"
    return cmd


@dataclass(frozen=True)
class CreateIndex:
    name: str
    relation: str
    column: str
    metric: str = "cosine"
    # engine default (engine.py `.index create` parse): the distributed
    # LSH artifact, NOT hnsw
    kind: str = "lsh"
    params: Tuple[Tuple[str, int], ...] = ()

    def forward_commands(self) -> List[str]:
        return [
            _render_index_create(
                self.name, self.relation, self.column, self.kind,
                self.metric, self.params,
            )
        ]

    def backward_commands(self) -> List[str]:
        return [f".index drop {self.name}"]

    def describe(self) -> str:
        return f"Create index {self.name} on {self.relation}({self.column})"


@dataclass(frozen=True)
class DropIndex:
    name: str
    relation: str
    column: str
    metric: str = "cosine"
    kind: str = "lsh"
    params: Tuple[Tuple[str, int], ...] = ()

    def forward_commands(self) -> List[str]:
        return [f".index drop {self.name}"]

    def backward_commands(self) -> List[str]:
        return [
            _render_index_create(
                self.name, self.relation, self.column, self.kind,
                self.metric, self.params,
            )
        ]

    def describe(self) -> str:
        return f"Drop index {self.name}"


@dataclass(frozen=True)
class RunIQL:
    """Escape hatch: arbitrary forward/backward programs (data
    backfills, renames built from drop+create, ...)."""

    forward: Tuple[str, ...]
    backward: Tuple[str, ...] = ()

    def forward_commands(self) -> List[str]:
        return list(self.forward)

    def backward_commands(self) -> List[str]:
        if not self.backward:
            raise MigrationError("RunIQL operation is irreversible")
        return list(self.backward)

    def describe(self) -> str:
        return f"Run IQL ({len(self.forward)} statements)"


_OP_TYPES = {
    c.__name__: c
    for c in (
        CreateRelation, DropRelation, CreateRule, DropRule, ReplaceRule,
        CreateIndex, DropIndex, RunIQL,
    )
}


def _op_to_dict(op) -> Dict[str, Any]:
    d = {"type": type(op).__name__}
    for k, v in op.__dict__.items():
        d[k] = list(list(x) if isinstance(x, tuple) else x for x in v) if isinstance(
            v, tuple
        ) else v
    return d


def operation_from_dict(d: Dict[str, Any]):
    cls = _OP_TYPES.get(d.get("type"))
    if cls is None:
        raise MigrationError(f"unknown operation type {d.get('type')!r}")
    kwargs = {}
    for f_ in cls.__dataclass_fields__.values():
        if f_.name not in d:
            # absent keys fall through to the dataclass default (a
            # migration file omitting optional metric/kind/params must
            # not deserialize to None and render `type None`)
            continue
        v = d[f_.name]
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[f_.name] = v
    return cls(**kwargs)


class MigrationError(Exception):
    pass


# ---------------------------------------------------------------- state


@dataclass
class ModelState:
    """Snapshot of relations, rules, and indexes at a point in time."""

    relations: Dict[str, List[Tuple[str, str]]] = field(default_factory=dict)
    rules: Dict[str, List[str]] = field(default_factory=dict)
    indexes: Dict[str, Dict[str, Any]] = field(default_factory=dict)

    @classmethod
    def from_engine(cls, engine) -> "ModelState":
        """Snapshot a live IQLEngine's current knowledge graph."""
        from inputlayer_spark.printer import rule_to_iql

        st = cls()
        for name, schema in engine.current.schemas.items():
            if name == MIGRATION_RELATION:
                continue
            st.relations[name] = [
                (f.name, _iql_type_name(f.dataType)) for f in schema.fields
            ]
        for r in engine.current.rules:
            st.rules.setdefault(r.head.relation, []).append(rule_to_iql(r))
        for name, meta in engine.current.indexes.items():
            rel, col, metric = meta[:3]
            kind = meta[3] if len(meta) > 3 else "lsh"
            params = meta[4] if len(meta) > 4 and meta[4] else {}
            st.indexes[name] = {
                "relation": rel, "column": col, "metric": metric, "kind": kind,
                "params": tuple(sorted(params.items())),
            }
        return st

    def to_dict(self) -> Dict[str, Any]:
        return {
            "relations": {k: [list(c) for c in v] for k, v in self.relations.items()},
            "rules": dict(self.rules),
            "indexes": dict(self.indexes),
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "ModelState":
        return cls(
            relations={
                k: [tuple(c) for c in v] for k, v in d.get("relations", {}).items()
            },
            rules={k: list(v) for k, v in d.get("rules", {}).items()},
            indexes={
                k: {
                    **dict(v),
                    # JSON round-trips params as list-of-lists; normalize
                    # back to the tuple-pair shape the index ops take
                    "params": tuple(
                        tuple(p) for p in v.get("params", ())
                    ),
                }
                for k, v in d.get("indexes", {}).items()
            },
        )


def _iql_type_name(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return "vector"
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    return "string"


# ---------------------------------------------------------- autodetector


def detect_changes(old: ModelState, new: ModelState) -> List[Any]:
    """Ordered operations turning `old` into `new` (reference
    autodetector ordering: relations created before the rules that
    reference them; rules dropped before the relations they read;
    column changes are drop+recreate — there is no ALTER)."""
    ops: List[Any] = []
    for name in sorted(set(new.relations) - set(old.relations)):
        ops.append(CreateRelation(name, tuple(map(tuple, new.relations[name]))))
    for name in sorted(set(old.relations) & set(new.relations)):
        if old.relations[name] != new.relations[name]:
            ops.append(DropRelation(name, tuple(map(tuple, old.relations[name]))))
            ops.append(CreateRelation(name, tuple(map(tuple, new.relations[name]))))
    for name in sorted(set(old.rules) - set(new.rules)):
        ops.append(DropRule(name, tuple(old.rules[name])))
    for name in sorted(set(old.rules) & set(new.rules)):
        if old.rules[name] != new.rules[name]:
            ops.append(
                ReplaceRule(name, tuple(old.rules[name]), tuple(new.rules[name]))
            )
    for name in sorted(set(new.rules) - set(old.rules)):
        ops.append(CreateRule(name, tuple(new.rules[name])))
    for name in sorted(set(old.relations) - set(new.relations)):
        ops.append(DropRelation(name, tuple(map(tuple, old.relations[name]))))
    for name in sorted(set(old.indexes) - set(new.indexes)):
        ops.append(DropIndex(name=name, **old.indexes[name]))
    for name in sorted(set(new.indexes) - set(old.indexes)):
        ops.append(CreateIndex(name=name, **new.indexes[name]))
    return ops


# ------------------------------------------------------------- recorder


def _result_rows(result) -> List[tuple]:
    """Rows from whatever `execute` returned: a list of DataFrames
    (IQLEngine), a list of ResultSets (wire Client), or a single
    frame/result."""
    if isinstance(result, list):
        result = result[-1] if result else None
    if result is None:
        return []
    rows = getattr(result, "rows", None)
    if rows is not None:
        return [tuple(r) for r in rows]
    try:
        return [tuple(r) for r in result.collect()]
    except Exception:
        return []


class MigrationRecorder:
    """Applied-migration bookkeeping in the KG itself
    (reference recorder.py: the `__inputlayer_migrations__` relation)."""

    def __init__(self, executor) -> None:
        self._ex = executor

    def ensure_schema(self) -> None:
        self._ex.execute(f"+{MIGRATION_RELATION}(name: string, applied_at: string)")

    def get_applied(self) -> List[str]:
        try:
            res = self._ex.execute(f"?{MIGRATION_RELATION}(Name, At)")
        except Exception:
            return []
        return sorted(str(r[0]) for r in _result_rows(res))

    def record_applied(self, name: str) -> None:
        now = datetime.now(timezone.utc).isoformat()
        self._ex.execute(f'+{MIGRATION_RELATION}[("{name}", "{now}")]')

    def record_reverted(self, name: str) -> None:
        self._ex.execute(f'-{MIGRATION_RELATION}("{name}", _)')


# --------------------------------------------------------- files / loader


@dataclass
class Migration:
    name: str  # "0002_add_scores"
    dependencies: List[str]
    operations: List[Any]
    state: ModelState  # post-migration state (diff base for the next one)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "dependencies": list(self.dependencies),
            "operations": [_op_to_dict(op) for op in self.operations],
            "state": self.state.to_dict(),
        }

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Migration":
        return cls(
            name=d["name"],
            dependencies=list(d.get("dependencies", [])),
            operations=[operation_from_dict(o) for o in d.get("operations", [])],
            state=ModelState.from_dict(d.get("state", {})),
        )


_FILE_RE = re.compile(r"^(\d{4})_[A-Za-z0-9_]+\.json$")


def load_migrations(directory: str) -> List[Migration]:
    """Numbered migration files in order, dependency-checked: each
    migration's dependencies must appear earlier in the sequence."""
    if not os.path.isdir(directory):
        return []
    names = sorted(f for f in os.listdir(directory) if _FILE_RE.match(f))
    out: List[Migration] = []
    seen: set = set()
    for fn in names:
        with open(os.path.join(directory, fn)) as fh:
            m = Migration.from_dict(json.load(fh))
        for dep in m.dependencies:
            if dep not in seen:
                raise MigrationError(
                    f"{m.name} depends on {dep}, which is missing or later"
                )
        out.append(m)
        seen.add(m.name)
    return out


def write_migration(
    directory: str,
    operations: Sequence[Any],
    state: ModelState,
    name: Optional[str] = None,
) -> str:
    """Write the next numbered migration file; returns its path."""
    os.makedirs(directory, exist_ok=True)
    existing = load_migrations(directory)
    number = len(existing) + 1
    slug = name or ("initial" if number == 1 else "auto")
    slug = re.sub(r"[^A-Za-z0-9_]+", "_", slug)
    mig = Migration(
        name=f"{number:04d}_{slug}",
        dependencies=[existing[-1].name] if existing else [],
        operations=list(operations),
        state=state,
    )
    path = os.path.join(directory, f"{mig.name}.json")
    with open(path, "w") as fh:
        json.dump(mig.to_dict(), fh, indent=2)
    return path


# ------------------------------------------------------------- executor


def makemigrations(engine, directory: str, name: Optional[str] = None) -> Optional[str]:
    """Diff the engine's live state against the last migration's
    recorded state and write a new migration file; None when there is
    nothing to migrate."""
    existing = load_migrations(directory)
    old = existing[-1].state if existing else ModelState()
    new = ModelState.from_engine(engine)
    ops = detect_changes(old, new)
    if not ops:
        return None
    return write_migration(directory, ops, new, name=name)


def migrate(executor, directory: str, target: Optional[str] = None) -> List[str]:
    """Apply every unapplied migration (up to and including `target`).
    Returns the names applied, in order."""
    recorder = MigrationRecorder(executor)
    recorder.ensure_schema()
    applied = set(recorder.get_applied())
    done: List[str] = []
    for m in load_migrations(directory):
        if m.name not in applied:
            for op in m.operations:
                for cmd in op.forward_commands():
                    executor.execute(cmd)
            recorder.record_applied(m.name)
            done.append(m.name)
        if target is not None and m.name == target:
            break
    return done


def rollback(executor, directory: str, name: str) -> List[str]:
    """Revert applied migrations back to (and including) `name`, newest
    first — operations within each migration revert in reverse order."""
    recorder = MigrationRecorder(executor)
    applied = set(recorder.get_applied())
    chain = [m for m in load_migrations(directory) if m.name in applied]
    if name not in {m.name for m in chain}:
        raise MigrationError(f"migration {name!r} is not applied")
    reverted: List[str] = []
    for m in reversed(chain):
        for op in reversed(m.operations):
            for cmd in op.backward_commands():
                executor.execute(cmd)
        recorder.record_reverted(m.name)
        reverted.append(m.name)
        if m.name == name:
            break
    return reverted
