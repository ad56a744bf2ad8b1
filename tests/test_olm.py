"""Typed OLM layer (model: reference SDK relation.py/types.py/derived.py
— class-based schemas, Vector[N], derived relations with rules)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.fluent import V, query, rule
from inputlayer_spark.olm import Derived, Model, Vector, camel_to_snake
from tests.conftest import rows


class Employee(Model):
    id: int
    name: str
    salary: float
    active: bool


class DocEmbedding(Model):
    doc_id: int
    vec: Vector[4]


def test_naming_and_schema_render():
    assert camel_to_snake("DocEmbedding") == "doc_embedding"
    assert Employee.relation_name() == "employee"
    assert Employee.create_iql() == (
        "+employee(id: int, name: string, salary: float, active: bool)"
    )
    assert DocEmbedding.create_iql() == "+doc_embedding(doc_id: int, vec: vector)"


def test_instance_validation_and_render():
    e = Employee(id=1, name="ada", salary=120, active=True)  # int→float ok
    assert e.values() == (1, "ada", 120.0, True)
    assert Employee.insert_iql([e]) == '+employee[(1, "ada", 120.0, true)]'
    with pytest.raises(TypeError):
        Employee(id="x", name="a", salary=1.0, active=True)
    with pytest.raises(TypeError):
        Employee(id=1, name="a", salary=1.0)  # missing column
    with pytest.raises(TypeError):
        Employee(id=1, name="a", salary=1.0, active=True, extra=2)
    with pytest.raises(ValueError):
        DocEmbedding(doc_id=1, vec=[0.1, 0.2])  # wrong dimension
    d = DocEmbedding(doc_id=1, vec=[1, 0, 0, 0])
    assert d.vec == [1.0, 0.0, 0.0, 0.0]


def test_column_vars_and_atoms():
    # class attribute access yields the column's datalog variable
    assert Employee.salary.iql() == "Salary"
    assert Employee.atom().iql() == "employee(Id, Name, Salary, Active)"
    assert Employee.atom(name=V.N, salary=V.S).iql() == "employee(_, N, S, _)"
    assert Employee.atom(V.A, V.B, V.C, V.D).iql() == "employee(A, B, C, D)"
    with pytest.raises(TypeError):
        Employee.atom(V.A)  # arity mismatch
    with pytest.raises(TypeError):
        Employee.atom(bogus=V.X)


_col_names = st.lists(
    st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True),
    min_size=1, max_size=6, unique=True,
)
_scalars = {
    int: st.integers(min_value=-(2**31), max_value=2**31),
    float: st.floats(allow_nan=False, allow_infinity=False, width=32),
    str: st.text(max_size=20),
    bool: st.booleans(),
}


@settings(max_examples=30, deadline=None)
@given(
    cols=_col_names,
    types=st.lists(st.sampled_from([int, float, str, bool]), min_size=6, max_size=6),
    data=st.data(),
)
def test_property_rendered_iql_parses_and_roundtrips(cols, types, data):
    """Any schema the OLM layer renders must be accepted by the real IQL
    parser, and a rendered insert must parse back to the same values —
    the rendering IS the wire contract."""
    from inputlayer_spark.olm import Model
    from inputlayer_spark.parser import parse_program

    ns = {"__annotations__": {c: t for c, t in zip(cols, types)}}
    cls = type("PropRel", (Model,), ns)
    create = cls.create_iql()
    parse_program(create)  # schema declaration must parse
    # instance with drawn values renders an insert the parser accepts
    values = {
        c: data.draw(_scalars[t]) for c, t in zip(cols, types)
    }
    inst = cls(**values)
    (ins,) = parse_program(cls.insert_iql([inst])).statements
    # single-tuple batches normalize to a plain Fact
    (tup,) = getattr(ins, "tuples", None) or [ins.values]
    for got, (c, t) in zip(tup, zip(cols, types)):
        want = inst.values()[cols.index(c)]
        g = getattr(got, "value", got)
        if t is float:
            assert g == pytest.approx(want, rel=1e-6, abs=1e-6)
        else:
            assert g == want
    # delete renders and parses too
    parse_program(inst.delete_iql())


def test_declare_insert_query_live_engine(spark):
    eng = IQLEngine(spark)
    Employee.declare(eng)
    Employee.insert(
        eng,
        Employee(id=1, name="ada", salary=120.0, active=True),
        Employee(id=2, name="bob", salary=80.0, active=False),
        Employee(id=3, name="cyd", salary=95.0, active=True),
    )
    got = rows(Employee.query_all(eng))
    assert got == [
        (1, "ada", 120.0, True),
        (2, "bob", 80.0, False),
        (3, "cyd", 95.0, True),
    ]
    # model vars compose with the fluent query builder
    q = query(
        Employee.atom(name=Employee.name, salary=Employee.salary),
        Employee.salary > 90.0,
    )
    # goal wildcards echo as columns → row shape (_, Name, Salary, _)
    assert {r[1] for r in rows(eng.query(q.iql()))} == {"ada", "cyd"}
    # typed delete removes exactly one tuple
    eng.execute(Employee(id=2, name="bob", salary=80.0, active=False).delete_iql())
    assert len(rows(Employee.query_all(eng))) == 2


def test_derived_model_with_rules(spark):
    class Edge(Model):
        x: int
        y: int

    class Reach(Derived):
        src: int
        dst: int

    Reach.rules = [
        rule(Reach.atom(src=V.X, dst=V.Y)) << [Edge.atom(V.X, V.Y)],
        rule(Reach.atom(src=V.X, dst=V.Z))
        << [Edge.atom(V.X, V.Y), Reach.atom(src=V.Y, dst=V.Z)],
    ]
    eng = IQLEngine(spark)
    Edge.declare(eng)
    Edge.insert(eng, Edge(x=1, y=2), Edge(x=2, y=3), Edge(x=3, y=4))
    Reach.define(eng)
    got = rows(Reach.query_all(eng))
    assert set(got) == {
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    }
