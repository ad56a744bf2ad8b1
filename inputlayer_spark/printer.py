"""AST → IQL text (used by `.rule list/def`, KG persistence, provenance).

Inverse of parser.py; round-trips through parse_program for every
construct the parser accepts.
"""

from __future__ import annotations

import re

from inputlayer_spark.ast_nodes import (
    Agg,
    Arith,
    Atom,
    Call,
    Comparison,
    Const,
    Delete,
    EmptyBatch,
    Fact,
    HnswNearest,
    MetaCommand,
    Rule,
    SchemaDecl,
    TypeDecl,
    Update,
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


_BARE_META_ARG = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*|[-+]?\d+(\.\d+)?|[(),:]")

# meta commands whose args were captured as raw line text by the parser
# (parser.py _RAW_META + `.rule edit`): re-emit verbatim, never quoted
_RAW_META = frozenset({"debug", "why", "why_not", "load"})


def _meta_arg_to_iql(a: str) -> str:
    if _BARE_META_ARG.fullmatch(a):
        return a
    escaped = a.replace("\\", "\\\\").replace('"', '\\"')
    return f'"{escaped}"'


def statement_to_iql(st) -> str:
    """Render a single parsed statement back to IQL source. Used by the
    WAL to log persistent mutations per-statement (so `.compact` and
    `.load` internals never land in the log) and round-trips through
    parse_program for every mutating construct."""
    if isinstance(st, Fact):
        vals = ", ".join(term_to_iql(v) for v in st.values)
        return f"{st.relation}({vals})" if st.session else f"+{st.relation}({vals})"
    if isinstance(st, Rule):
        return rule_to_iql(st)
    if isinstance(st, EmptyBatch):
        return f"+{st.relation}[]"
    if isinstance(st, SchemaDecl):
        cols = ", ".join(f"{c}: {t}" for c, t in st.columns)
        return f"+{st.relation}({cols})"
    if isinstance(st, TypeDecl):
        return f"type {st.name}: {st.definition or st.base}"
    if isinstance(st, Delete):
        if st.drop:
            return f"-{st.relation}"
        out = f"-{st.relation}({', '.join(term_to_iql(t) for t in st.terms)})"
        if st.body:
            out += " <- " + ", ".join(literal_to_iql(l) for l in st.body)
        return out
    if isinstance(st, Update):
        d = f"-{st.delete.relation}({', '.join(term_to_iql(t) for t in st.delete.terms)})"
        i = f"+{st.insert.relation}({', '.join(term_to_iql(t) for t in st.insert.terms)})"
        cond = ", ".join(literal_to_iql(l) for l in st.body)
        return f"{d}, {i} <- {cond}"
    if isinstance(st, MetaCommand):
        if st.command in _RAW_META or (
            st.command == "rule" and st.args and st.args[0] == "edit"
        ):
            tail = " ".join(st.args)
        else:
            tail = " ".join(_meta_arg_to_iql(a) for a in st.args)
        return f".{st.command} {tail}".rstrip()
    raise ValueError(f"cannot print statement {st!r}")


def fact_batch_to_iql(relation: str, rows) -> str:
    """Render a batch insert `+rel[(…), (…)]` from already-coerced python
    rows (the WAL logs one record per flushed relation batch)."""

    def cell(v) -> str:
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(repr(float(x)) for x in v) + "]"
        return term_to_iql(Const(v))

    body = ", ".join("(" + ", ".join(cell(v) for v in row) + ")" for row in rows)
    return f"+{relation}[{body}]"
