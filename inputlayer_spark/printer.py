"""AST → IQL text (used by `.rule list/def`, KG persistence, provenance).

Inverse of parser.py; round-trips through parse_program for every
construct the parser accepts.
"""

from __future__ import annotations

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


def term_to_iql(t) -> str:
    if isinstance(t, Var):
        return t.name
    if isinstance(t, Const):
        v = t.value
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, str):
            escaped = v.replace("\\", "\\\\").replace('"', '\\"')
            return f'"{escaped}"'
        return repr(v)
    if isinstance(t, VecLit):
        return "[" + ", ".join(repr(float(v)) for v in t.values) + "]"
    if isinstance(t, Arith):
        return f"({term_to_iql(t.left)} {t.op} {term_to_iql(t.right)})"
    if isinstance(t, Call):
        return f"{t.func}({', '.join(term_to_iql(a) for a in t.args)})"
    if isinstance(t, Agg):
        inner = ", ".join(term_to_iql(a) for a in t.args)
        if t.is_ranking and t.order:
            inner += f":{t.order}"
        return f"{t.func}<{inner}>"
    raise ValueError(f"cannot print term {t!r}")


def literal_to_iql(lit) -> str:
    if isinstance(lit, Atom):
        body = f"{lit.relation}({', '.join(term_to_iql(t) for t in lit.terms)})"
        return f"!{body}" if lit.negated else body
    if isinstance(lit, Comparison):
        return f"{term_to_iql(lit.left)} {lit.op} {term_to_iql(lit.right)}"
    if isinstance(lit, HnswNearest):
        parts = [
            f'"{lit.index}"',
            term_to_iql(lit.query),
            str(lit.k),
            lit.id_var.name,
            lit.dist_var.name,
        ]
        if lit.ef_search is not None:
            parts.append(str(lit.ef_search))
        return f"hnsw_nearest({', '.join(parts)})"
    raise ValueError(f"cannot print literal {lit!r}")


def rule_to_iql(r: Rule) -> str:
    head = literal_to_iql(r.head)
    body = ", ".join(literal_to_iql(l) for l in r.body)
    prefix = "+" if r.persistent else ""
    return f"{prefix}{head} <- {body}"
