"""Property test for the greedy join-order rewrite in compile_body:
whatever order the compiler picks, a conjunctive body's result must
equal the naive nested-loop conjunction computed host-side.

Strategy: generate small random bodies (3-4 atoms over 2-3 tiny binary
relations, variables drawn from a small pool so repeated/shared/crossing
patterns all occur), evaluate through compile_body on Spark, and compare
the variable-binding set against a pure-Python join oracle. Inner joins
commute, so ANY ordering must produce the identical set — this pins the
reorder (compiler.compile_body; reference join planning
src/join_planning/mod.rs) to semantics, not plans.
"""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from inputlayer_spark.ast_nodes import Atom, Const, Var
from inputlayer_spark.compiler import compile_body

VARS = ["A", "B", "C", "D"]
RELS = ["r0", "r1", "r2"]

term = st.one_of(
    st.sampled_from(VARS).map(Var),
    st.integers(min_value=0, max_value=3).map(Const),
)
atom = st.builds(
    lambda rel, t1, t2: Atom(rel, (t1, t2)),
    st.sampled_from(RELS),
    term,
    term,
)
body = st.lists(atom, min_size=3, max_size=4).filter(
    # at least one variable somewhere, else the body is pure constants
    lambda ats: any(isinstance(t, Var) for a in ats for t in a.terms)
)
# small fixed extents; values overlap the Const range so joins hit
rel_data = st.fixed_dictionaries(
    {
        r: st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=3),
            ),
            min_size=0,
            max_size=6,
            unique=True,
        )
        for r in RELS
    }
)


def _oracle(body_atoms, data):
    """Nested-loop conjunction: the set of variable bindings satisfying
    every atom (bag → set; compile_body output is compared as a set of
    variable tuples)."""
    out = set()
    per_atom = [data[a.relation] for a in body_atoms]
    for combo in itertools.product(*per_atom):
        env = {}
        ok = True
        for a, row in zip(body_atoms, combo):
            for t, v in zip(a.terms, row):
                if isinstance(t, Const):
                    if t.value != v:
                        ok = False
                        break
                elif t.is_wildcard:
                    continue
                elif t.name in env:
                    if env[t.name] != v:
                        ok = False
                        break
                else:
                    env[t.name] = v
            if not ok:
                break
        if ok:
            out.add(tuple(sorted(env.items())))
    return out


@pytest.mark.slow  # ~18 min: 6 hypothesis examples x full conjunction oracle
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(body=body, data=rel_data)
def test_compile_body_equals_nested_loop_conjunction(spark, body, data):
    frames = {
        r: spark.createDataFrame(rows or [(99, 99)], schema="x long, y long")
        # hypothesis may generate an empty extent; keep the schema but
        # drop the sentinel row again so the relation is truly empty
        .filter("x < 99" if not rows else "x < 100")
        for r, rows in data.items()
    }

    def resolve(name):
        return frames[name]

    want = _oracle(body, data)
    try:
        df = compile_body(tuple(body), resolve)
    except Exception:
        # bodies rejectable for reasons orthogonal to ordering (e.g.
        # no positive atoms after filters) are out of scope
        pytest.skip("body rejected by compiler")
    var_cols = sorted(c for c in df.columns if not c.startswith("_"))
    got = {
        tuple((c, row[c]) for c in var_cols)
        for row in (r.asDict() for r in df.select(*var_cols).distinct().collect())
    }
    assert got == want
