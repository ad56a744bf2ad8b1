"""Rule compiler: IQL rule bodies → Spark DataFrame logical plans.

Re-implements the semantics of the reference IR builder
(`/root/reference/src/ir_builder/mod.rs`: build_scans :185, build_join
:333, build_antijoins :370, build_computed_columns :487,
build_comparison_filters :782, build_projection :1275, build_aggregation
:1562) declaratively: each positive atom becomes a scan whose columns are
renamed to variable names, shared variables become equi-join keys,
repeated variables / constants become filters, negation becomes a
left-anti join, `V = expr` comparisons become computed columns, and head
aggregates become groupBy/Window aggregations. Catalyst then does the
algebraic optimization the reference does by hand (pushdown, fusion,
reordering — SURVEY.md §4.1).

Internal column naming: a compiled body DataFrame has one column per
bound variable, named exactly the variable name. Materialized relations
use positional names c0..cn.
"""

from __future__ import annotations

import itertools
from functools import reduce
from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from inputlayer_spark.ast_nodes import (
    Agg,
    Arith,
    Atom,
    Call,
    Comparison,
    Const,
    HnswNearest,
    Var,
    VecLit,
)
from inputlayer_spark.functions import BUILTINS

Resolver = Callable[[str], DataFrame]


class CompileError(ValueError):
    pass


class EmptyAritylessRelation(CompileError):
    """Raised by resolvers for `+rel[]`-declared relations whose arity is
    unknown; scan_atom synthesizes an empty frame at the atom's arity."""


def positional_names(n: int) -> List[str]:
    return [f"c{i}" for i in range(n)]


# ------------------------------------------------------------ terms


def lit_of(term) -> Column:
    if isinstance(term, Const):
        if term.value is None:
            return F.lit(None)
        return F.lit(term.value)
    if isinstance(term, VecLit):
        return F.array(*[F.lit(float(v)) for v in term.values]).cast("array<float>")
    raise CompileError(f"not a literal: {term!r}")


_INT_PARAM_FUNCS = {"lsh_bucket", "lsh_probes", "lsh_multi_probe"}


def term_to_column(term, bound: Set[str]) -> Column:
    """Evaluate a term to a Column; every Var must be bound."""
    if isinstance(term, Var):
        if term.is_wildcard:
            raise CompileError("wildcard not allowed in expressions")
        if term.name not in bound:
            raise CompileError(f"unbound variable {term.name} in expression")
        return F.col(term.name)
    if isinstance(term, (Const, VecLit)):
        return lit_of(term)
    if isinstance(term, Arith):
        left = term_to_column(term.left, bound)
        right = term_to_column(term.right, bound)
        op = term.op
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            # IQL: int/int is integer division with int→float coercion when
            # either side is float (docs/spec/types.md:179-193). Spark's `/`
            # always yields double; match reference by keeping double — the
            # reference coerces to float on division too.
            return left / right
        if op == "%":
            return left % right
        raise CompileError(f"unknown arithmetic op {op}")
    if isinstance(term, Call):
        # builtin names are case-insensitive (reference lowercases in
        # BuiltinFunc::parse, src/ast/mod.rs:200)
        fname = term.func.lower()
        fn = BUILTINS.get(fname)
        if fn is None:
            raise CompileError(f"unknown builtin {term.func}")
        if fname in _INT_PARAM_FUNCS:
            first = term_to_column(term.args[0], bound)
            rest = []
            for a in term.args[1:]:
                if not isinstance(a, Const) or not isinstance(a.value, int):
                    raise CompileError(f"{term.func}: table/bits must be int literals")
                rest.append(a.value)
            return fn(first, *rest)
        return fn(*[term_to_column(a, bound) for a in term.args])
    raise CompileError(f"cannot evaluate term {term!r}")


def term_is_computable(term, bound: Set[str]) -> bool:
    from inputlayer_spark.ast_nodes import term_vars

    return term_vars(term) <= bound


# ------------------------------------------------ SQL fast path (r14)
#
# Query CONSTRUCTION cost is driver-side py4j chatter (guide §5 "the
# driver should do almost no data work", §7.3 planning time): every
# F.col / F.lit / Column-operator call is one JVM round-trip, and a
# compiled body used to build hundreds of them (threeway_join_arith:
# ~1,000 round-trips ≈ 0.3 s before any job ran). Rendering a term to
# ONE SQL string and parsing it with a single F.expr / selectExpr /
# filter(str) call yields the identical expression tree in one
# round-trip. Terms with no exact SQL rendering (builtin Calls,
# non-finite floats, ints beyond int64) return None and the caller
# falls back to the Column path — behavior, typing, and error messages
# are unchanged.

_I32_MIN, _I32_MAX = -(1 << 31), (1 << 31) - 1


def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _sql_float(v: float) -> Optional[str]:
    if v != v or v == float("inf") or v == float("-inf"):
        return None  # no plain SQL literal; F.lit handles these
    # repr() is the shortest exact round-trip decimal; the D suffix
    # makes the literal DOUBLE (bare decimals parse as DECIMAL),
    # matching F.lit(float) bit-for-bit
    return repr(v) + "D"


def sql_of_const(v) -> Optional[str]:
    """SQL literal producing the same Spark type/value as F.lit(v)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return "true" if v else "false"
    if isinstance(v, int):
        if _I32_MIN <= v <= _I32_MAX:
            return str(v)  # INT, like py4j's int conversion
        if _I64_MIN <= v <= _I64_MAX:
            return f"{v}L"  # BIGINT
        return None
    if isinstance(v, float):
        return _sql_float(v)
    if isinstance(v, str):
        # the default parser (escapedStringLiterals=false) processes
        # backslash escapes inside string literals
        return (
            "'"
            + v.replace("\\", "\\\\")
            .replace("'", "\\'")
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\x00", "\\0")
            + "'"
        )
    return None


def term_to_sql(term, bound: Set[str]) -> Optional[str]:
    """SQL text for a term, or None when it has no exact rendering.
    Raises the same CompileErrors as term_to_column for wildcard /
    unbound variables so callers can try SQL first and fall back."""
    if isinstance(term, Var):
        if term.is_wildcard:
            raise CompileError("wildcard not allowed in expressions")
        if term.name not in bound:
            raise CompileError(f"unbound variable {term.name} in expression")
        return _sql_ident(term.name)
    if isinstance(term, Const):
        return sql_of_const(term.value)
    if isinstance(term, VecLit):
        parts = [_sql_float(float(x)) for x in term.values]
        if any(p is None for p in parts):
            return None
        return f"CAST(ARRAY({','.join(parts)}) AS ARRAY<FLOAT>)"
    if isinstance(term, Arith):
        if term.op not in ("+", "-", "*", "/", "%"):
            return None
        left = term_to_sql(term.left, bound)
        right = term_to_sql(term.right, bound)
        if left is None or right is None:
            return None
        return f"({left} {term.op} {right})"
    return None  # Call and anything else: Column path


# ------------------------------------------------------------ atom scan

_ANON_SEQ = itertools.count()


def scan_atom(atom: Atom, resolve: Resolver, bool_consts_nop: bool = False) -> DataFrame:
    """Atom → DataFrame with columns named by first-occurrence variables.

    Mirrors build_scans (ir_builder/mod.rs:185): constants become filters,
    a variable repeated within the atom becomes a self-equality filter,
    wildcards bind anonymous variables.
    """
    try:
        df = resolve(atom.relation)
    except EmptyAritylessRelation:
        from pyspark.sql import SparkSession
        from pyspark.sql import types as T

        spark = SparkSession.getActiveSession()
        # NullType columns: union/join type-coercion promotes them to the
        # other side's type, so an unknown relation in one clause doesn't
        # force sibling clauses' ints to strings (golden
        # 22_set_operations/05_empty_set_operations.iql)
        schema = T.StructType(
            [T.StructField(f"c{i}", T.NullType(), True) for i in range(len(atom.terms))]
        )
        df = spark.createDataFrame([], schema=schema)
    cols = df.columns
    if len(cols) != len(atom.terms):
        raise CompileError(
            f"arity mismatch: {atom.relation} has {len(cols)} columns, "
            f"atom has {len(atom.terms)} terms"
        )
    filters: List[Tuple[str, str, object]] = []  # ("col", a, b) | ("lit", a, term)
    var_to_col: Dict[str, str] = {}
    for col_name, term in zip(cols, atom.terms):
        if isinstance(term, Var):
            if term.is_wildcard:
                # Wildcards bind anonymous variables that STAY in the
                # binding set: aggregates range over distinct full-body
                # bindings, so `count<X> <- product(X, _)` counts every
                # (X, _) pair — 100, not |distinct X| (golden
                # 10_edge_cases/37_large_result.iql). Unique names keep
                # them out of join keys.
                var_to_col[f"_w{next(_ANON_SEQ)}"] = col_name
                continue
            if term.name in var_to_col:
                filters.append(("col", col_name, var_to_col[term.name]))
            else:
                var_to_col[term.name] = col_name
        elif isinstance(term, Const) and isinstance(term.value, bool) and bool_consts_nop:
            # PERSISTENT-rule materialization in the reference ignores
            # boolean constant constraints (golden 11_types/11_booleans.iql:
            # +active_user(Id, N) <- user(Id, N, true) returns ALL users)
            # while session rules filter them (11_types/27_bool_logic.iql).
            # Replicate the split via this flag.
            continue
        elif isinstance(term, (Const, VecLit)):
            filters.append(("lit", col_name, term))
        else:
            raise CompileError(
                f"unsupported term {term!r} in body atom {atom.relation} "
                "(expressions belong in comparisons)"
            )
    if filters:
        # ONE filter(sql) round-trip for the whole conjunction (r14);
        # Column fallback only for literals with no exact SQL rendering
        parts: Optional[List[str]] = []
        for kind, a, b in filters:
            if kind == "col":
                parts.append(f"({_sql_ident(a)} = {_sql_ident(b)})")
            else:
                s = term_to_sql(b, set())
                if s is None:
                    parts = None
                    break
                parts.append(f"({_sql_ident(a)} = {s})")
        if parts is not None:
            df = df.filter(" AND ".join(parts))
        else:
            conds = [
                F.col(a) == (F.col(b) if kind == "col" else lit_of(b))
                for kind, a, b in filters
            ]
            df = df.filter(reduce(lambda x, y: x & y, conds))
    # ONE selectExpr py4j call instead of per-column F.col().alias()
    # towers (r13): a 16-column scan paid ~50 py4j round-trips here,
    # and every engine query compiles at least one scan. Identical
    # projection; names are engine-generated (c0..cn / _w<N>) or
    # parquet identifiers, backtick-safe.
    return df.selectExpr(
        *[f"`{c}` AS `{v}`" for v, c in var_to_col.items()]
    )


# ------------------------------------------------------------ body

# config [optimization] enable_join_planning: process-wide because
# compile_body is engine-free; disabling keeps literal body order
# (cross products included) for plan debugging
JOIN_PLANNING_ENABLED = True


def compile_body(
    body: Sequence,
    resolve: Resolver,
    hnsw_resolver: Optional[Callable[[HnswNearest], DataFrame]] = None,
    bool_consts_nop: bool = False,
) -> DataFrame:
    """Conjunctive body → DataFrame with one column per bound variable."""
    atoms = [l for l in body if isinstance(l, Atom) and not l.negated]
    negated = [l for l in body if isinstance(l, Atom) and l.negated]
    comps = [l for l in body if isinstance(l, Comparison)]
    hnsws = [l for l in body if isinstance(l, HnswNearest)]

    # Reference quirk: wildcards at the SAME argument position of the SAME
    # relation across different positive atoms denote ONE shared variable
    # (18_advanced_patterns/30_self_comparison.iql: scores(_,N1,S1),
    # scores(_,N2,S2) joins on the hidden id → ties only; 25_running_total:
    # transactions(Id,_),transactions(OtherId,_) joins on amount). Within a
    # single atom, wildcards stay independent.
    wshare: Dict[Tuple[str, int], int] = {}
    for a in atoms:
        for i, t in enumerate(a.terms):
            if isinstance(t, Var) and t.is_wildcard:
                wshare[(a.relation, i)] = wshare.get((a.relation, i), 0) + 1
    if any(n >= 2 for n in wshare.values()):
        atoms = [
            Atom(
                a.relation,
                tuple(
                    Var(f"_ws_{a.relation}_{i}")
                    if isinstance(t, Var)
                    and t.is_wildcard
                    and wshare[(a.relation, i)] >= 2
                    else t
                    for i, t in enumerate(a.terms)
                ),
            )
            for a in atoms
        ]

    # Greedy left-deep join ordering from the shared-variable graph
    # (the reference's join planning, src/join_planning/mod.rs:1-60,970:
    # chain order from variable connectivity). Body order is preserved
    # whenever it is already connected — the next atom is the FIRST
    # remaining one sharing a variable with the bound prefix — so the
    # only bodies that change are ones whose literal order would build
    # an accidental cross product before a connecting atom arrives
    # (e.g. same-generation's `edge(A,X), edge(B,Y), sg(A,B)`: edge ×
    # edge is |E|² rows; reordered it is two equi-joins). Inner joins
    # commute, so results are identical.
    if len(atoms) > 2 and JOIN_PLANNING_ENABLED:

        def _avars(a: Atom) -> set:
            return {
                t.name
                for t in a.terms
                if isinstance(t, Var) and not t.is_wildcard
            }

        remaining = list(atoms)
        ordered = [remaining.pop(0)]
        bound_vars = _avars(ordered[0])
        while remaining:
            nxt_i = next(
                (i for i, a in enumerate(remaining) if _avars(a) & bound_vars),
                0,  # nothing connects: a genuine cross product, body order
            )
            a = remaining.pop(nxt_i)
            ordered.append(a)
            bound_vars |= _avars(a)
        atoms = ordered

    acc: Optional[DataFrame] = None
    for atom in atoms:
        scanned = scan_atom(atom, resolve, bool_consts_nop)
        acc = _conjoin(acc, scanned)

    for h in hnsws:
        if hnsw_resolver is None:
            raise CompileError("hnsw_nearest used but no index manager attached")
        # the resolver sees the body-so-far so a bound query variable can
        # become a k-NN join (per-query top-k), not just a literal lookup
        try:
            knn = hnsw_resolver(h, acc)
        except TypeError:
            knn = hnsw_resolver(h)  # legacy single-arg resolvers
        acc = _conjoin(acc, knn)

    if acc is None:
        raise CompileError("rule body has no positive atoms")

    # bindings (V = expr) and filters, to fixpoint so chained bindings work
    bound = set(acc.columns)
    pending = list(comps)
    while pending:
        progressed = False
        rest: List[Comparison] = []
        for comp in pending:
            made, acc, bound = _apply_comparison(comp, acc, bound)
            if made:
                progressed = True
            else:
                rest.append(comp)
        pending = rest
        if not progressed and pending:
            raise CompileError(
                f"unsafe/unsatisfiable comparisons (unbound variables): {pending}"
            )

    # anti-joins last: all their join keys are now bound
    for natom in negated:
        try:
            resolve(natom.relation)
        except CompileError:
            # negating a relation that doesn't exist = negating the empty
            # relation: everything survives (reference allows this,
            # examples/iql/08_negation/25_negate_empty_relation.iql)
            continue
        pos = Atom(natom.relation, natom.terms)
        right = scan_atom(pos, resolve)
        keys = [c for c in right.columns if c in set(acc.columns)]
        if keys:
            acc = acc.join(right.select(*keys).distinct(), on=keys, how="left_anti")
        else:
            # no shared vars: body survives only if the negated relation
            # (after its internal filters) is empty — expressible as an
            # anti cross join, still fully declarative
            acc = acc.join(right.limit(1), on=F.lit(True), how="left_anti")
    return acc


def _conjoin(acc: Optional[DataFrame], nxt: DataFrame) -> DataFrame:
    if acc is None:
        return nxt
    common = [c for c in nxt.columns if c in set(acc.columns)]
    if common:
        return acc.join(nxt, on=common, how="inner")
    return acc.crossJoin(nxt)


def _apply_comparison(comp: Comparison, acc: DataFrame, bound: Set[str]):
    """Try to apply one comparison; returns (progress, df, bound)."""
    left_ok = term_is_computable(comp.left, bound)
    right_ok = term_is_computable(comp.right, bound)
    if comp.op == "=":
        if left_ok and isinstance(comp.right, Var) and comp.right.name not in bound:
            s = term_to_sql(comp.left, bound)
            col = F.expr(s) if s is not None else term_to_column(comp.left, bound)
            acc = acc.withColumn(comp.right.name, col)
            return True, acc, bound | {comp.right.name}
        if right_ok and isinstance(comp.left, Var) and comp.left.name not in bound:
            s = term_to_sql(comp.right, bound)
            col = F.expr(s) if s is not None else term_to_column(comp.right, bound)
            acc = acc.withColumn(comp.left.name, col)
            return True, acc, bound | {comp.left.name}
    if left_ok and right_ok:
        # Column-vs-COLUMN ordered comparisons are numeric-only in the
        # reference: `A < B` over string vars yields NO rows (golden
        # 11_types/57_string_lexicographic.iql) — the Predicate enum has
        # no col-vs-col string ordering. Column-vs-LITERAL string ordering
        # works lexicographically (golden 07_filters/27_string_comparison).
        if (
            comp.op in ("<", "<=", ">", ">=")
            and not isinstance(comp.left, Const)
            and not isinstance(comp.right, Const)
            and (_is_string_term(comp.left, acc) or _is_string_term(comp.right, acc))
        ):
            return True, acc.filter(F.lit(False)), bound
        # IQL equality is over dynamically-typed values, not SQL
        # three-valued logic: null != 0 is TRUE and the row is kept
        # (golden 11_types/19_null_handling.iql). eqNullSafe (SQL <=>)
        # mirrors the reference's Value::eq on non-null operands exactly.
        ls = term_to_sql(comp.left, bound)
        rs = term_to_sql(comp.right, bound)
        if ls is not None and rs is not None:
            sql_ops = {
                "=": f"({ls} <=> {rs})",
                "!=": f"(NOT ({ls} <=> {rs}))",
                "<": f"({ls} < {rs})",
                "<=": f"({ls} <= {rs})",
                ">": f"({ls} > {rs})",
                ">=": f"({ls} >= {rs})",
            }
            return True, acc.filter(sql_ops[comp.op]), bound
        lc = term_to_column(comp.left, bound)
        rc = term_to_column(comp.right, bound)
        ops = {
            "=": lc.eqNullSafe(rc),
            "!=": ~lc.eqNullSafe(rc),
            "<": lc < rc,
            "<=": lc <= rc,
            ">": lc > rc,
            ">=": lc >= rc,
        }
        return True, acc.filter(ops[comp.op]), bound
    return False, acc, bound


def _is_string_term(term, df: DataFrame) -> bool:
    from pyspark.sql import types as T

    if isinstance(term, Const):
        return isinstance(term.value, str)
    if isinstance(term, Var) and not term.is_wildcard:
        for f in df.schema.fields:
            if f.name == term.name:
                return isinstance(f.dataType, T.StringType)
    return False


# ------------------------------------------------------------ head


_I64_MAX = (1 << 63) - 1
_I64_MIN = -(1 << 63)


def _saturating_sum(c: Column) -> Column:
    """`sum<X>` returns Int64 with saturation in the reference: summing
    floats truncates the total to int (0.1+0.2+0.3 → 0) and overflow
    clamps to i64 bounds (goldens 11_types/31_float_precision.iql,
    42_int64_boundaries.iql, 55_very_large_floats.iql). The double-sum
    sentinel detects overflow; the long sum keeps exact arithmetic in
    range (a double mantissa alone would round large in-range sums)."""
    ds = F.sum(c.cast("double"))
    return (
        F.when(ds >= F.lit(float(1 << 63)), F.lit(_I64_MAX))
        .when(ds <= F.lit(-float(1 << 63)), F.lit(_I64_MIN))
        .otherwise(F.sum(c.cast("long")))
    )


STANDARD_AGGS = {
    "count": lambda c: F.count(c),
    "count_distinct": lambda c: F.count_distinct(c),
    "sum": _saturating_sum,
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "avg": lambda c: F.avg(c),
}

# repr(float(2^63)) round-trips to the exact double F.lit(float(1 << 63))
# produces; the D suffix keeps the SQL literal DOUBLE-typed
_SAT_HI_SQL = repr(float(1 << 63)) + "D"


def _agg_sql(func: str, x: str) -> Optional[str]:
    """SQL rendering of STANDARD_AGGS[func] over rendered operand x —
    the identical expression tree in one parse."""
    if func == "count":
        return f"count({x})"
    if func == "count_distinct":
        return f"count(DISTINCT {x})"
    if func in ("min", "max", "avg"):
        return f"{func}({x})"
    if func == "sum":
        # _saturating_sum verbatim: double-sum sentinel for overflow
        # clamps, exact long sum in range. (-2^63 is rendered via a
        # string cast: the bare literal would overflow the BIGINT
        # lexer token under unary minus.)
        return (
            f"CASE WHEN sum(CAST({x} AS DOUBLE)) >= {_SAT_HI_SQL}"
            f" THEN {_I64_MAX}L"
            f" WHEN sum(CAST({x} AS DOUBLE)) <= -{_SAT_HI_SQL}"
            f" THEN CAST('{_I64_MIN}' AS BIGINT)"
            f" ELSE sum(CAST({x} AS BIGINT)) END"
        )
    return None


def compile_head(body_df: DataFrame, head: Atom, distinct: bool = True) -> DataFrame:
    """Project / aggregate the body DataFrame into the head relation.

    Output columns are positional (c0..cn) — relations are positional in
    IQL, like the reference's Tuple model.
    """
    bound = set(body_df.columns)
    aggs = [(i, t) for i, t in enumerate(head.terms) if isinstance(t, Agg)]
    if not aggs:
        # ONE selectExpr round-trip when every term renders to SQL (r14)
        exprs: Optional[List[str]] = []
        for i, t in enumerate(head.terms):
            s = term_to_sql(t, bound)
            if s is None:
                exprs = None
                break
            exprs.append(f"{s} AS `c{i}`")
        if exprs is not None:
            out = body_df.selectExpr(*exprs)
        else:
            out = body_df.select(
                *[
                    term_to_column(t, bound).alias(f"c{i}")
                    for i, t in enumerate(head.terms)
                ]
            )
        return out.distinct() if distinct else out

    ranking = [(i, t) for i, t in aggs if t.is_ranking]
    if ranking and len(aggs) > 1:
        raise CompileError("ranking aggregates cannot be combined with other aggregates")

    group_idx = [(i, t) for i, t in enumerate(head.terms) if not isinstance(t, Agg)]

    if ranking:
        return _compile_ranking(body_df, head, group_idx, ranking[0], bound)

    # Aggregates range over the SET of body bindings INCLUDING anonymous
    # wildcard positions (DD consolidates to distinct tuples before reduce,
    # code_generator/mod.rs:2414): duplicate base facts collapse (golden
    # 14_aggregations/11_having_filter.iql: four (5,100) orders sum to
    # 100), while distinct tuples sharing the aggregated value all count
    # (10_edge_cases/141_all_same_value.iql: sum over (_, V) → 300).
    deduped = body_df.distinct()
    # SQL fast path: render every aggregate and grouping term; fall back
    # to the Column path wholesale if anything has no SQL form
    agg_sqls: Optional[List[str]] = []
    for i, t in aggs:
        if t.func not in STANDARD_AGGS:
            raise CompileError(f"unknown aggregate {t.func}")
        if len(t.args) != 1:
            raise CompileError(f"{t.func} takes exactly one argument")
        if agg_sqls is None:
            continue  # validation still runs for every term
        if t.func == "sum" and _is_string_term(t.args[0], deduped):
            # Value::to_i64 maps non-numeric values to 0, so summing a
            # string column yields 0, not null
            # (golden 14_aggregations/94_sum_on_strings.iql)
            x = "0"
        else:
            x = term_to_sql(t.args[0], bound)
        s = _agg_sql(t.func, x) if x is not None else None
        agg_sqls = None if s is None else agg_sqls + [f"{s} AS `c{i}`"]
    group_sqls: Optional[List[str]] = []
    for i, t in group_idx:
        s = term_to_sql(t, bound)
        group_sqls = None if s is None else group_sqls + [f"{s} AS `c{i}`"]
        if group_sqls is None:
            break
    if agg_sqls is not None and group_sqls is not None:
        agg_exprs = [F.expr(s) for s in agg_sqls]
        group_cols = [F.expr(s) for s in group_sqls]
    else:
        agg_exprs = []
        for i, t in aggs:
            col = term_to_column(t.args[0], bound)
            if t.func == "sum" and _is_string_term(t.args[0], deduped):
                col = F.lit(0)
            agg_exprs.append(STANDARD_AGGS[t.func](col).alias(f"c{i}"))
        group_cols = [
            term_to_column(t, bound).alias(f"c{i}") for i, t in group_idx
        ]
    if group_cols:
        out = deduped.groupBy(*group_cols).agg(*agg_exprs)
    else:
        # Datalog global aggregates over an empty body yield NO rows, not
        # one null/zero row (golden 10_edge_cases/103_empty_aggregation.iql:
        # count over empty relation → "No results"). Grouping by a literal
        # key gives exactly that: empty input → zero groups.
        out = deduped.groupBy(F.lit(1).alias("_g")).agg(*agg_exprs)
    # restore positional order
    return out.select(*[f"c{i}" for i in range(len(head.terms))])


def _compile_ranking(body_df, head, group_idx, ranking, bound):
    """top_k / top_k_threshold / within_radius via window functions
    (reference: binary-heap impls, vector_ops.rs:1443,1514,1535).

    A ranking aggregate term expands to TWO output columns (value, score):
    `+top(top_k<3, Player, Points:desc>) <- score(Player, Points)` yields a
    2-column relation (golden: examples/iql/14_aggregations/07_top_k.iql).
    """
    i, agg = ranking
    single_col = False
    thresh_t = None
    if agg.func == "top_k":
        if len(agg.args) == 2:
            # 2-arg form `top_k<K, Score:dir>`: value IS the score and the
            # term expands to ONE column (golden
            # 14_aggregations/136_multiple_rule_drops_aggs.iql)
            k = _const_int(agg.args[0], "top_k k")
            val_t = score_t = agg.args[1]
            single_col = True
        elif len(agg.args) == 3:
            k = _const_int(agg.args[0], "top_k k")
            val_t, score_t = agg.args[1], agg.args[2]
        else:
            raise CompileError("top_k<K, [Value,] Score:dir> takes 2 or 3 arguments")
    elif agg.func == "top_k_threshold":
        if len(agg.args) != 4:
            raise CompileError("top_k_threshold<K, T, Value, Score:dir> takes 4 arguments")
        k = _const_int(agg.args[0], "top_k_threshold k")
        thresh_t = agg.args[1]
        val_t, score_t = agg.args[2], agg.args[3]
    elif agg.func == "within_radius":
        if len(agg.args) != 3:
            raise CompileError("within_radius<R, Value, Score:dir> takes 3 arguments")
        k = None
        thresh_t = agg.args[0]
        val_t, score_t = agg.args[1], agg.args[2]
    else:  # pragma: no cover
        raise CompileError(f"unknown ranking aggregate {agg.func}")

    deduped = body_df.distinct()

    # ---- SQL fast path (r14): score/val/window/projection in three
    # round-trips instead of per-column towers; identical operators
    # (row_number window, same order + tiebreak, same filters)
    def _sql_path() -> Optional[DataFrame]:
        score_s = term_to_sql(score_t, bound)
        val_s = term_to_sql(val_t, bound)
        if score_s is None or val_s is None:
            return None
        group_ss = []
        for _, t in group_idx:
            s = term_to_sql(t, bound)
            if s is None:
                return None
            group_ss.append(s)
        thresh_s = None
        if thresh_t is not None:
            thresh_s = term_to_sql(thresh_t, bound)
            if thresh_s is None:
                return None
        head_ss: List[str] = []
        pos = 0
        for j, t in enumerate(head.terms):
            if j == i:
                head_ss.append(f"`__val` AS `c{pos}`")
                pos += 1
                if not single_col:
                    head_ss.append(f"`__score` AS `c{pos}`")
                    pos += 1
            else:
                s = term_to_sql(t, bound)
                if s is None:
                    return None
                head_ss.append(f"{s} AS `c{pos}`")
                pos += 1
        sel0 = ["*", f"{score_s} AS `__score`", f"{val_s} AS `__val`"]
        if agg.func == "within_radius":
            out = deduped.selectExpr(*sel0).filter(f"`__score` <= {thresh_s}")
        else:
            part = ", ".join(group_ss) if group_ss else "1"
            direction = "DESC" if agg.order == "desc" else "ASC"
            rn = (
                f"row_number() OVER (PARTITION BY {part}"
                f" ORDER BY {score_s} {direction}, {val_s} ASC) AS `__rn`"
            )
            out = deduped.selectExpr(*sel0, rn).filter(f"`__rn` <= {k}")
            if agg.func == "top_k_threshold":
                op = ">=" if agg.order == "desc" else "<="
                out = out.filter(f"`__score` {op} {thresh_s}")
        return out.selectExpr(*head_ss).distinct()

    fast = _sql_path()
    if fast is not None:
        return fast

    # ---- Column fallback (terms with no SQL rendering) ----
    thresh = None if thresh_t is None else term_to_column(thresh_t, bound)
    score_col = term_to_column(score_t, bound)
    val_col = term_to_column(val_t, bound)
    order = score_col.desc() if agg.order == "desc" else score_col.asc()
    tiebreak = val_col.asc()

    group_cols = [term_to_column(t, bound) for _, t in group_idx]
    deduped = deduped.withColumn("__score", score_col).withColumn("__val", val_col)

    if agg.func == "within_radius":
        out = deduped.filter(F.col("__score") <= thresh)
    else:
        w = (
            Window.partitionBy(*group_cols).orderBy(order, tiebreak)
            if group_cols
            else Window.partitionBy(F.lit(1)).orderBy(order, tiebreak)
        )
        out = deduped.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
        if agg.func == "top_k_threshold":
            cond = F.col("__score") >= thresh if agg.order == "desc" else F.col("__score") <= thresh
            out = out.filter(cond)

    # positional output: each head term in order; the ranking term expands
    # to (value, score)
    sel: List[Column] = []
    pos = 0
    outer_bound = bound
    for j, t in enumerate(head.terms):
        if j == i:
            sel.append(F.col("__val").alias(f"c{pos}"))
            pos += 1
            if not single_col:
                sel.append(F.col("__score").alias(f"c{pos}"))
                pos += 1
        else:
            sel.append(term_to_column(t, outer_bound).alias(f"c{pos}"))
            pos += 1
    return out.select(*sel).distinct()


def _const_int(term, what: str) -> int:
    if isinstance(term, Const) and isinstance(term.value, int):
        return term.value
    raise CompileError(f"{what} must be an integer literal")
