"""Schema migrations (model: reference packages/inputlayer-py
migrations/ — operations, autodetector ordering, recorder, executor)."""

import json
import os

import pytest

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.migrations import (
    CreateIndex,
    CreateRelation,
    CreateRule,
    DropRelation,
    MigrationError,
    MigrationRecorder,
    ModelState,
    RunIQL,
    detect_changes,
    load_migrations,
    makemigrations,
    migrate,
    operation_from_dict,
    rollback,
    write_migration,
    _op_to_dict,
)
from tests.conftest import rows


def test_operations_render_reference_iql_and_roundtrip():
    op = CreateRelation("users", (("id", "int"), ("name", "string")))
    assert op.forward_commands() == ["+users(id: int, name: string)"]
    assert op.backward_commands() == [".rel drop users"]
    idx = CreateIndex("vidx", "emb", "v", metric="cosine", kind="hnsw")
    assert idx.forward_commands() == [
        ".index create vidx on emb ( v ) type hnsw metric cosine"
    ]
    # serialization round-trips every operation type
    for o in (
        op, idx, CreateRule("r", ("+r(X) <- users(X, _)",)),
        DropRelation("users", (("id", "int"),)),
        RunIQL(("+users[(1, \"a\")]",), ("-users(1, \"a\")",)),
    ):
        assert operation_from_dict(json.loads(json.dumps(_op_to_dict(o)))) == o


def test_operation_from_dict_missing_keys_use_defaults():
    """A migration file omitting optional keys deserializes to the
    dataclass DEFAULTS, never None (ADVICE r4: kind=None rendered
    `.index create ... type None metric None`); the default kind matches
    the engine's ('lsh')."""
    op = operation_from_dict(
        {"type": "CreateIndex", "name": "vi", "relation": "emb", "column": "v"}
    )
    assert op.kind == "lsh" and op.metric == "cosine" and op.params == ()
    assert op.forward_commands() == [
        ".index create vi on emb ( v ) type lsh metric cosine"
    ]
    assert "None" not in op.forward_commands()[0]


def test_index_params_survive_migrate_rollback_roundtrip(spark, tmp_path):
    """HNSW m/ef parameters ride through ModelState → migration file →
    fresh-engine migrate → rollback (ADVICE r4: ModelState dropped
    them)."""
    eng = IQLEngine(spark)
    eng.execute("+emb(id: int, v: vector)")
    eng.execute(
        ".index create vidx on emb(v) type hnsw metric cosine "
        "m 32 ef_construction 200 ef_search 96"
    )
    mdir = str(tmp_path / "migs")
    path = makemigrations(eng, mdir, name="init")
    assert path is not None
    # the rendered forward IQL carries the params
    (mig,) = load_migrations(mdir)
    create_idx = [o for o in mig.operations if type(o).__name__ == "CreateIndex"]
    assert create_idx and dict(create_idx[0].params) == {
        "m": 32, "ef_construction": 200, "ef_search": 96,
    }
    # apply to a fresh engine: the index exists with the same params
    fresh = IQLEngine(spark)
    migrate(fresh, mdir)
    meta = fresh.current.indexes["vidx"]
    assert meta[3] == "hnsw"
    assert dict(meta[4]) == {"m": 32, "ef_construction": 200, "ef_search": 96}
    # rollback drops it cleanly
    rollback(fresh, mdir, mig.name)
    assert "vidx" not in fresh.current.indexes


def test_autodetector_ordering():
    old = ModelState(
        relations={"a": [("x", "int")], "gone": [("y", "int")]},
        rules={"old_rule": ["+old_rule(X) <- gone(X)"]},
        indexes={},
    )
    new = ModelState(
        relations={"a": [("x", "int"), ("z", "string")], "b": [("w", "int")]},
        rules={"fresh": ["+fresh(X) <- b(X)"]},
        indexes={"vi": {"relation": "b", "column": "w", "metric": "l2", "kind": "lsh"}},
    )
    ops = detect_changes(old, new)
    kinds = [type(o).__name__ for o in ops]
    # creates before rule work, rule drops before relation drops,
    # indexes last (reference autodetector.py ordering)
    assert kinds == [
        "CreateRelation",              # b
        "DropRelation", "CreateRelation",  # a column change = drop+recreate
        "DropRule",                    # old_rule (before `gone` is dropped)
        "CreateRule",                  # fresh
        "DropRelation",                # gone
        "CreateIndex",                 # vi
    ]


def test_migrate_rollback_and_recorder(spark, tmp_path):
    """End-to-end: makemigrations diffs the live engine, migrate applies
    to a FRESH engine and records progress in the KG, a second
    makemigrations captures incremental changes, rollback reverts in
    reverse order."""
    d = str(tmp_path / "migs")

    # author schema on a scratch engine, snapshot it as 0001
    author = IQLEngine(spark)
    author.execute("+person(id: int, name: string)")
    author.execute("+greeting(Id, G) <- person(Id, N), G = concat(\"hi \", N)")
    p1 = makemigrations(author, d, name="initial")
    assert p1 and os.path.basename(p1) == "0001_initial.json"
    assert makemigrations(author, d) is None  # no drift → no file

    # evolve: new relation + index, snapshot as 0002
    author.execute("+emb(id: int, v: vector)")
    author.execute(".index create vidx on emb(v) type hnsw metric cosine")
    p2 = makemigrations(author, d, name="vectors")
    assert p2 and "0002_vectors" in p2
    migs = load_migrations(d)
    assert [m.name for m in migs] == ["0001_initial", "0002_vectors"]
    assert migs[1].dependencies == ["0001_initial"]

    # apply both to a fresh engine
    target = IQLEngine(spark)
    applied = migrate(target, d)
    assert applied == ["0001_initial", "0002_vectors"]
    assert "person" in target.current.schemas
    assert target._index_kind("vidx") == "hnsw"
    target.execute('+person[(1, "ann")]')
    assert rows(target.query("?greeting(Id, G)")) == [(1, "hi ann")]
    # recorder state lives in the KG; re-migrate is a no-op
    assert migrate(target, d) == []
    rec = MigrationRecorder(target)
    assert rec.get_applied() == ["0001_initial", "0002_vectors"]

    # rollback the vector migration only
    reverted = rollback(target, d, "0002_vectors")
    assert reverted == ["0002_vectors"]
    assert "vidx" not in target.current.indexes
    assert "person" in target.current.schemas  # 0001 still applied
    assert rec.get_applied() == ["0001_initial"]
    # and migrate brings it back
    assert migrate(target, d) == ["0002_vectors"]


def test_loader_rejects_missing_dependency(tmp_path):
    d = str(tmp_path / "m")
    os.makedirs(d)
    bad = {
        "name": "0001_x", "dependencies": ["0000_phantom"],
        "operations": [], "state": {},
    }
    with open(os.path.join(d, "0001_x.json"), "w") as fh:
        json.dump(bad, fh)
    with pytest.raises(MigrationError):
        load_migrations(d)


def test_runiql_irreversible_raises():
    op = RunIQL(("+t[(1)]",))
    with pytest.raises(MigrationError):
        op.backward_commands()
