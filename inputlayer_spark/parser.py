"""IQL parser: tokenizer + recursive descent.

Grammar follows the reference statement layer (`src/statement/mod.rs:30-53`)
and tokenizer (`src/syntax/iql.pest`): `//` and `/* */` comments,
double-quoted strings with escapes, variables start uppercase or `_`,
relations/functions lowercase. Statements:

    +rel(consts)                      fact
    +rel[(..), (..)]                  batch facts
    +rel(col: type, ...)              schema declaration
    [+]head(terms) <- body            rule (+ = persistent)
    ?goal(terms[:asc|:desc]) [, body] [, limit(n[, off])]   query
    -rel[(pattern)] [<- body]         delete / conditional delete / drop
    .cmd args                         meta command
"""

from __future__ import annotations

import re
from typing import Optional

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
    Program,
    Query,
    Rule,
    SchemaDecl,
    TypeDecl,
    Update,
    Var,
    VecLit,
)

AGGREGATES = {
    "count",
    "count_distinct",
    "sum",
    "min",
    "max",
    "avg",
    "top_k",
    "top_k_threshold",
    "within_radius",
}

TYPE_NAMES = {
    "int", "integer", "int64", "float", "double", "string", "text", "varchar",
    "symbol", "bool", "boolean", "vector", "embedding", "timestamp", "time",
    "datetime", "any",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<nl>\n)
  | (?P<ws>[^\S\n]+)
  | (?P<comment>//[^\n]*|/\*(?:[^*]|\*(?!/))*\*/)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<efloat>\d+(?:\.\d+)?[eE][+-]\d+)
  | (?P<dident>\d+[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<arrow><-|:-)
  | (?P<cmp>>=|<=|!=|=|<|>)
  | (?P<meta>\.[a-zA-Z_?][a-zA-Z0-9_]*)
  | (?P<ident>[a-zA-Z_][a-zA-Z0-9_]*)
  | (?P<punct>[()\[\]{},:+\-*/%!<>?.])
    """,
    re.VERBOSE,
)


class ParseError(ValueError):
    pass


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind
        self.text = text
        self.pos = pos

    def __repr__(self):
        return f"Token({self.kind!r}, {self.text!r})"


# a newline after one of these tokens is a continuation, not a break
_CONTINUATION = {",", "<-", "(", "[", "+", "-", "*", "/", "%", "=", "!=", "<", "<=", ">", ">=", ":"}


def tokenize(src: str, legacy: bool = False) -> list:
    """Tokenize; newlines become statement-break tokens ('nl') unless they
    fall inside brackets or directly after a continuation token. This makes
    multi-line rules work while keeping `\n+fact` from being parsed as
    arithmetic `... + fact(...)`."""
    raw = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"unexpected character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "efloat":
            # signed-exponent scientific notation (1e-5, -1.5e-2 after
            # unary minus) — 28_docs_coverage/20_scientific_notation.iql
            kind = "float"
        if kind == "arrow":
            if m.group() == ":-" and not legacy:
                # strict (modern-client) mode: `:-` is not an arrow —
                # re-emit as the two punct tokens it would otherwise be
                raw.append(Token("punct", ":", m.start()))
                raw.append(Token("punct", "-", m.start() + 1))
                continue
            # legacy dialect: `:-` is the older client's rule arrow;
            # normalize so the grammar sees one spelling
            raw.append(Token(kind, "<-", m.start()))
            continue
        if kind == "dident":
            # digit-leading identifiers are legal relation names in the
            # reference (golden 12_errors/37_identifier_validation.iql:
            # `+123invalid(1, 2)` inserts fine) — but reclassify pure
            # exponent floats (2e3) that the dident pattern also matches
            text = m.group()
            kind = "float" if re.fullmatch(r"\d+[eE][+-]?\d+", text) else "ident"
        raw.append(Token(kind, m.group(), m.start()))

    tokens: list = []
    depth = 0
    for tok in raw:
        if tok.kind == "nl":
            if depth > 0:
                continue
            if tokens and tokens[-1].text in _CONTINUATION:
                continue
            if tokens and tokens[-1].kind == "nl":
                continue
            if not tokens:
                continue
            tokens.append(tok)
            continue
        if tok.text in ("(", "["):
            depth += 1
        elif tok.text in (")", "]"):
            depth = max(0, depth - 1)
        tokens.append(tok)
    if legacy:
        # legacy statement terminator: the reference's older client ends
        # statements with `.` (`+f[(1)].`, `r(X) :- b(X).`) — drop a
        # bare `.` at a statement boundary (before a break or at EOF).
        # The modern client REJECTS these (10_edge_cases/13: `+edge(1,
        # 2).` → "Parse error: Expected parentheses"), so stripping only
        # happens in the explicit legacy dialect.
        cleaned: list = []
        for idx, tok in enumerate(tokens):
            if (
                tok.kind == "punct"
                and tok.text == "."
                and (idx + 1 == len(tokens) or tokens[idx + 1].kind == "nl")
            ):
                continue
            cleaned.append(tok)
        tokens = cleaned
    # drop trailing newline
    while tokens and tokens[-1].kind == "nl":
        tokens.pop()
    return tokens


def _unescape(s: str) -> str:
    """Single left-to-right pass so `"path\\\\to"` yields a literal
    backslash rather than double-unescaping into a tab (golden
    35_strings/32_escape_sequences.iql query 4). A scan — not chained
    replace() with a placeholder — because a placeholder byte appearing
    LITERALLY in the data (e.g. NUL) must survive unchanged."""
    body = s[1:-1]
    out = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            nxt = body[i + 1]
            if nxt == "\\":
                out.append("\\")
                i += 2
                continue
            if nxt == '"':
                out.append('"')
                i += 2
                continue
            if nxt == "n":
                out.append("\n")
                i += 2
                continue
            if nxt == "t":
                out.append("\t")
                i += 2
                continue
            # unknown escape: keep verbatim (reference-lenient)
        out.append(c)
        i += 1
    return "".join(out)


class Parser:
    def __init__(self, src: str, legacy: bool = False):
        self.src = src
        self.toks = tokenize(src, legacy=legacy)
        self.i = 0

    # ----- token helpers -----
    def peek(self, offset: int = 0) -> Optional[Token]:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Token:
        if self.i >= len(self.toks):
            raise ParseError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise ParseError(f"expected {text!r} but got {t.text!r} at {t.pos}")
        return t

    def at(self, text: str) -> bool:
        t = self.peek()
        return t is not None and t.text == text

    def eat(self, text: str) -> bool:
        if self.at(text):
            self.i += 1
            return True
        return False

    # ----- entry -----
    def parse_program(self) -> Program:
        prog = Program()
        while self.peek() is not None:
            if self.peek().kind == "nl":
                self.next()
                continue
            prog.statements.append(self.parse_statement())
            # A trailing '.' after a fact/rule/query is a parse error in
            # the reference (10_edge_cases/13_comments_syntax.iql:
            # `+edge(1, 2).` → "Parse error: Expected parentheses";
            # `+path(X,Y) <- edge(X,Y).` → "Invalid term: 'Y).'").
            # Statements are newline-terminated, never '.'-terminated.
            if self.at("."):
                t = self.peek()
                raise ParseError(
                    f"Invalid term: statements are not '.'-terminated "
                    f"(at {t.pos})"
                )
        return prog

    def parse_statement(self):
        t = self.peek()
        if t.kind == "meta":
            return self.parse_meta()
        if t.text == "+":
            return self.parse_plus()
        if t.text == "-":
            return self.parse_delete()
        if t.text == "?":
            return self.parse_query()
        # type alias declaration: type Name: TypeExpr
        if (
            t.kind == "ident"
            and t.text == "type"
            and self.peek(1) is not None
            and self.peek(1).kind == "ident"
            and self.peek(2) is not None
            and self.peek(2).text == ":"
        ):
            return self.parse_typedecl()
        # bare session rule: name(...) <- body
        if t.kind == "ident":
            return self.parse_rule(persistent=False)
        raise ParseError(f"cannot start statement with {t.text!r} at {t.pos}")

    def parse_typedecl(self) -> TypeDecl:
        """`type Email: string` — scalar aliases only. Record (`{...}`) and
        list (`[...]`) bodies are REJECTED like the reference
        (11_types/67_record_type.iql, 24_rel_schemas/02: "Parse error:
        Unknown base type: '{ id: int, ... }.'")."""
        self.next()  # 'type'
        name = self._ident()
        self.expect(":")
        start = self.peek().pos if self.peek() else 0
        if self.at("{") or self.at("["):
            end = self.src.find("\n", start)
            body = (self.src[start:] if end == -1 else self.src[start:end]).strip()
            raise ParseError(
                f"Unknown base type: '{body}'. Use int, string, bool, "
                "float, or a type name."
            )
        base = self._ident()
        end = self.toks[self.i - 1].pos + len(self.toks[self.i - 1].text)
        self.eat(".")  # optional statement-terminating dot
        return TypeDecl(name, base, self.src[start:end])

    # ----- meta -----
    _RAW_META = {"debug", "why", "why_not", "load", "agent"}

    def parse_meta(self) -> MetaCommand:
        meta_tok = self.next()
        cmd = meta_tok.text.lstrip(".")
        # `.rule edit <name> <n> <full statement...>` embeds an entire
        # rule statement — capture it raw so the tail is not parsed as a
        # second statement (17_rule_commands/08_rule_edit.iql).
        if cmd == "rule" and self.peek() is not None and self.peek().text == "edit":
            start = self.peek().pos
            end = self.src.find("\n", start)
            raw = (self.src[start:] if end == -1 else self.src[start:end]).strip()
            while self.peek() is not None and self.peek().kind != "nl":
                self.next()
            return MetaCommand(cmd, ("edit", raw))
        if cmd in ("user", "apikey"):
            # whitespace-split args, not expression tokens: passwords,
            # labels, and usernames may contain characters the lexer
            # would split (`ci-bot`, `p@ss!`) — the reference parses
            # these commands by whitespace (src/statement/meta.rs:747+)
            start = meta_tok.pos + len(meta_tok.text)
            end = self.src.find("\n", start)
            raw = (self.src[start:] if end == -1 else self.src[start:end]).strip()
            while self.peek() is not None and self.peek().kind != "nl":
                self.next()
            return MetaCommand(cmd, tuple(raw.split()))
        if cmd in self._RAW_META:
            # capture the rest of the line verbatim (these commands embed
            # full statements / file paths that tokenized args would mangle)
            start = meta_tok.pos + len(meta_tok.text)
            end = self.src.find("\n", start)
            raw = (self.src[start:] if end == -1 else self.src[start:end]).strip()
            while self.peek() is not None and self.peek().kind != "nl":
                self.next()
            return MetaCommand(cmd, (raw,) if raw else ())
        args = []
        # consume idents/strings/numbers until next statement-start token
        while self.peek() is not None:
            t = self.peek()
            if t.kind in ("ident", "string", "int", "float"):
                tok = self.next()
                args.append(_unescape(tok.text) if tok.kind == "string" else tok.text)
            elif t.text in ("(", ")", ",", ":"):
                args.append(self.next().text)
            else:
                break
        return MetaCommand(cmd, tuple(args))

    # ----- + statements -----
    def parse_plus(self):
        self.expect("+")
        name = self._ident()
        if self.at("["):
            return self.parse_batch(name)
        self.expect("(")
        # schema decl? lookahead: ident ':' type
        if (
            self.peek() is not None
            and self.peek().kind == "ident"
            and self.peek(1) is not None
            and self.peek(1).text == ":"
        ):
            return self.parse_schema(name)
        terms = self._term_list()
        self.expect(")")
        if self.eat("<-"):
            body = self._body()
            return Rule(Atom(name, tuple(terms)), tuple(body), persistent=True)
        # fact — all terms must be ground
        values = tuple(self._require_ground(t) for t in terms)
        return Fact(name, values)

    def parse_batch(self, name: str):
        self.expect("[")
        if self.eat("]"):
            return EmptyBatch(name)
        facts = []
        while True:
            self.expect("(")
            terms = self._term_list()
            self.expect(")")
            facts.append(Fact(name, tuple(self._require_ground(t) for t in terms)))
            if not self.eat(","):
                break
        self.expect("]")
        return facts if len(facts) > 1 else facts[0]

    def parse_schema(self, name: str) -> SchemaDecl:
        cols = []
        while True:
            col = self._ident()
            self.expect(":")
            tname = self._ident()
            dim = None
            if self.eat("("):
                dim = int(self.next().text)
                self.expect(")")
            cols.append((col, tname if dim is None else f"{tname}({dim})"))
            if not self.eat(","):
                break
        self.expect(")")
        return SchemaDecl(name, tuple(cols))

    # ----- rules / bare session statements -----
    def parse_rule(self, persistent: bool):
        name = self._ident()
        self.expect("(")
        # bare typed args = schema decl (Statement::SchemaDecl allows the
        # un-prefixed form, src/statement/mod.rs:48)
        if (
            self.peek() is not None
            and self.peek().kind == "ident"
            and self.peek(1) is not None
            and self.peek(1).text == ":"
        ):
            return self.parse_schema(name)
        terms = self._term_list()
        self.expect(")")
        if not self.at("<-"):
            # bare ground tuple = session fact (transient; reference
            # Statement::Fact, examples/iql/04_session/02_session_facts.iql)
            values = tuple(self._require_ground(t) for t in terms)
            return Fact(name, values, session=True)
        self.expect("<-")
        body = self._body()
        return Rule(Atom(name, tuple(terms)), tuple(body), persistent=persistent)

    # ----- delete / atomic update -----
    def parse_delete(self):
        self.expect("-")
        name = self._ident()
        if self.at("["):
            # batch delete: -rel[(...), (...)] — one Delete per tuple
            self.expect("[")
            deletes = []
            while True:
                self.expect("(")
                terms = self._term_list()
                self.expect(")")
                deletes.append(Delete(name, tuple(terms)))
                if not self.eat(","):
                    break
            self.expect("]")
            return deletes if len(deletes) > 1 else deletes[0]
        if not self.at("("):
            return Delete(name, drop=True)
        self.expect("(")
        terms = self._term_list()
        self.expect(")")
        # atomic update: -rel(old), +rel(new) <- cond
        if self.at(",") and self.peek(1) is not None and self.peek(1).text == "+":
            self.expect(",")
            self.expect("+")
            ins_name = self._ident()
            self.expect("(")
            ins_terms = self._term_list()
            self.expect(")")
            self.expect("<-")
            body = tuple(self._body())
            return Update(
                Atom(name, tuple(terms)), Atom(ins_name, tuple(ins_terms)), body
            )
        body: tuple = ()
        if self.eat("<-"):
            body = tuple(self._body())
        return Delete(name, tuple(terms), body)

    # ----- query -----
    def parse_query(self) -> Query:
        self.expect("?")
        t = self.peek()
        if t is not None and t.kind == "ident" and t.text == "hnsw_nearest":
            # direct-goal form (docs/iql.md):
            #   ?hnsw_nearest(idx, [..], k, Id, Dist) [, body] [, limit(..)]
            # sugar for a query over the builtin's output variables —
            # previously this silently compiled as a scan of a
            # nonexistent relation named hnsw_nearest
            h = self._hnsw()
            body, limit, offset = self._query_suffix()
            # collision-proof internal goal name: a user relation or rule
            # named plain `knn` would otherwise resolve in engine._query
            # and be scanned/joined instead of projecting the builtin's
            # output variables (silently wrong results)
            return Query(
                Atom("__hnsw_knn__", (h.id_var, h.dist_var)),
                (h, *body),
                (),
                limit,
                offset,
            )
        name = self._ident()
        self.expect("(")
        terms = []
        order_by = []
        idx = 0
        if not self.at(")"):
            while True:
                terms.append(self._term())
                if self.eat(":"):
                    d = self._ident()
                    if d not in ("asc", "desc"):
                        raise ParseError(f"bad order direction {d!r}")
                    order_by.append((idx, d))
                idx += 1
                if not self.eat(","):
                    break
        self.expect(")")
        body, limit, offset = self._query_suffix()
        return Query(Atom(name, tuple(terms)), tuple(body), tuple(order_by), limit, offset)

    def _query_suffix(self):
        """The `, body-literal ... , limit(n[, off])` tail of a query."""
        body = []
        limit = offset = None
        while self.eat(","):
            if (
                self.peek() is not None
                and self.peek().text == "limit"
                and self.peek(1) is not None
                and self.peek(1).text == "("
            ):
                self.next()
                self.expect("(")
                limit = int(self.next().text)
                if self.eat(","):
                    offset = int(self.next().text)
                self.expect(")")
            else:
                body.append(self._body_literal())
        return tuple(body), limit, offset

    # ----- body -----
    def _body(self) -> list:
        lits = [self._body_literal()]
        while self.eat(","):
            if self.peek() is None or self.peek().kind == "nl":
                # trailing comma at end of input: the reference client
                # splits statements per line and the server registers the
                # comma-terminated prefix as a complete rule
                # (13_performance/12_long_rule_bodies.iql)
                break
            lits.append(self._body_literal())
        return lits

    def _body_literal(self):
        if self.eat("!"):
            atom = self._atom()
            return Atom(atom.relation, atom.terms, negated=True)
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input in rule body")
        if t.kind == "ident" and t.text == "hnsw_nearest":
            return self._hnsw()
        # atom: ident followed by '(' — ANY case: the reference parses
        # `CONTAINS(S, "x")` as an atom over (nonexistent) relation
        # CONTAINS, yielding no results (golden
        # 35_strings/10_string_contains.iql); there is no contains builtin.
        if (
            t.kind == "ident"
            and t.text not in AGGREGATES
            and self.peek(1) is not None
            and self.peek(1).text == "("
            and t.text not in _BUILTIN_FUNCS
        ):
            return self._atom()
        # otherwise: comparison / binding / bare boolean builtin predicate
        left = self._term()
        nxt = self.peek()
        if nxt is None or nxt.text not in ("=", "!=", "<", "<=", ">", ">="):
            if isinstance(left, Call):
                # A bare builtin call in predicate position — e.g.
                # `within_last(T, Now, Dur)` with no comparison — is an
                # ATOM over a (nonexistent) relation of that name in the
                # reference grammar, so the body matches nothing. The
                # 29_temporal goldens pin this: every bare temporal
                # predicate rule prints "No results"
                # (examples/iql/29_temporal/06..09,11,20). Builtins only
                # act as filters inside comparisons (`X = time_before(..)`).
                return Atom(left.func, tuple(left.args))
            raise ParseError(
                f"expected comparison op after term at "
                f"{nxt.pos if nxt else 'end of input'}"
            )
        op_tok = self.next()
        right = self._term()
        return Comparison(op_tok.text, left, right)

    def _atom(self) -> Atom:
        name = self._ident()
        self.expect("(")
        terms = self._term_list() if not self.at(")") else []
        self.expect(")")
        return Atom(name, tuple(terms))

    def _hnsw(self) -> HnswNearest:
        self.next()  # hnsw_nearest
        self.expect("(")
        index = self._term()
        if isinstance(index, Var) and not index.is_wildcard:
            # bare index name (docs spelling: hnsw_nearest(idx_docs, ..))
            index = Const(index.name)
        if not isinstance(index, Const) or not isinstance(index.value, str):
            raise ParseError("hnsw_nearest: first arg must be an index name string")
        self.expect(",")
        query = self._term()
        self.expect(",")
        k = self._term()
        if not isinstance(k, Const) or not isinstance(k.value, int):
            raise ParseError("hnsw_nearest: k must be an int literal")
        self.expect(",")
        id_var = self._term()
        self.expect(",")
        dist_var = self._term()
        ef = None
        if self.eat(","):
            ef_t = self._term()
            ef = ef_t.value  # type: ignore[union-attr]
        self.expect(")")
        if not isinstance(id_var, Var) or not isinstance(dist_var, Var):
            raise ParseError("hnsw_nearest: id/dist must be variables")
        return HnswNearest(index.value, query, k.value, id_var, dist_var, ef)

    # ----- terms / expressions (precedence: +- over */%) -----
    def _term_list(self) -> list:
        if self.at(")"):
            return []
        terms = [self._term()]
        while self.eat(","):
            if self.at(")"):  # trailing comma: ("a",) — 1-tuple syntax
                break
            terms.append(self._term())
        return terms

    def _term(self):
        return self._additive()

    def _additive(self):
        left = self._multiplicative()
        while self.peek() is not None and self.peek().text in ("+", "-"):
            op = self.next().text
            right = self._multiplicative()
            left = Arith(op, left, right)
        return left

    def _multiplicative(self):
        left = self._primary()
        while self.peek() is not None and self.peek().text in ("*", "/", "%"):
            op = self.next().text
            right = self._primary()
            left = Arith(op, left, right)
        return left

    def _primary(self):
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of input in term")
        if t.text == "(":
            self.next()
            inner = self._term()
            self.expect(")")
            return inner
        if t.text == "-":  # unary minus on numbers
            self.next()
            n = self.next()
            if n.kind == "int":
                return Const(-int(n.text))
            if n.kind == "float":
                return Const(-float(n.text))
            raise ParseError(f"unexpected '-' before {n.text!r}")
        if t.kind == "int":
            self.next()
            return Const(int(t.text))
        if t.kind == "float":
            self.next()
            return Const(float(t.text))
        if t.kind == "string":
            self.next()
            return Const(_unescape(t.text))
        if t.text == "[":
            return self._vector()
        if t.kind == "ident":
            if t.text == "true":
                self.next()
                return Const(True)
            if t.text == "false":
                self.next()
                return Const(False)
            if t.text == "null":
                self.next()
                return Const(None)
            if t.text in AGGREGATES and self.peek(1) is not None and self.peek(1).text == "<":
                return self._aggregate()
            if self.peek(1) is not None and self.peek(1).text == "(":
                return self._call()
            self.next()
            if self._is_var_name(t.text):
                return Var(t.text)
            # bare lowercase identifier → treat as symbol constant
            return Const(t.text)
        raise ParseError(f"unexpected token {t.text!r} at {t.pos}")

    def _vector(self) -> VecLit:
        self.expect("[")
        vals = []
        if not self.at("]"):
            while True:
                v = self._primary()
                if not isinstance(v, Const) or not isinstance(v.value, (int, float)):
                    raise ParseError("vector literals must contain numbers")
                vals.append(float(v.value))
                if not self.eat(","):
                    break
        self.expect("]")
        return VecLit(tuple(vals))

    def _aggregate(self) -> Agg:
        func = self.next().text
        self.expect("<")
        args = []
        order = "desc"
        if not self.at(">"):
            while True:
                args.append(self._term())
                if self.eat(":"):
                    order = self._ident()
                if not self.eat(","):
                    break
        self.expect(">")
        return Agg(func, tuple(args), order)

    def _call(self) -> Call:
        func = self.next().text
        self.expect("(")
        args = self._term_list() if not self.at(")") else []
        self.expect(")")
        # The reference's builtin set is CLOSED but case-INSENSITIVE
        # (BuiltinFunc::parse lowercases, ast/mod.rs:200 — `LEN(S)` works,
        # 35_strings/05): an unknown name in expression position is a
        # parse error (32_math/15: `M = MIN(A, B)` → "Invalid term"),
        # and so is a nested call argument (32_math/23:
        # `max_int64(0, min_int64(X, 10))` → "Invalid term").
        from inputlayer_spark.functions import BUILTINS

        func = func.lower() if func.lower() in BUILTINS else func
        if func not in BUILTINS:
            raise ParseError(f"Invalid term: '{func}(...)' — unknown function")
        if any(isinstance(a, Call) for a in args):
            raise ParseError(
                f"Invalid term: nested function call in '{func}(...)'"
            )
        return Call(func, tuple(args))

    # ----- small helpers -----
    def _ident(self) -> str:
        t = self.next()
        if t.kind != "ident":
            raise ParseError(f"expected identifier, got {t.text!r} at {t.pos}")
        return t.text

    @staticmethod
    def _is_var_name(name: str) -> bool:
        return name[0].isupper() or name[0] == "_"

    @staticmethod
    def _require_ground(term):
        if isinstance(term, (Const, VecLit)):
            return term
        if isinstance(term, Arith):
            # constant folding for ground arithmetic in facts
            folded = _fold(term)
            if folded is not None:
                return Const(folded)
        raise ParseError(f"fact arguments must be constants, got {term!r}")


def _fold(term):
    from operator import add, mod, mul, sub, truediv

    ops = {"+": add, "-": sub, "*": mul, "/": truediv, "%": mod}
    if isinstance(term, Const) and isinstance(term.value, (int, float)):
        return term.value
    if isinstance(term, Arith):
        lv, rv = _fold(term.left), _fold(term.right)
        if lv is not None and rv is not None:
            return ops[term.op](lv, rv)
    return None


# builtins that are function calls, never relations (mirror of the
# reference registry BuiltinFunc::parse, src/ast/mod.rs:199-267)
_BUILTIN_FUNCS = {
    "euclidean", "cosine", "dot", "manhattan", "hamming",
    "euclidean_int8", "cosine_int8", "dot_int8", "manhattan_int8",
    "normalize", "vec_add", "vec_scale", "vec_dim", "vector_norm",
    "quantize_linear", "quantize_symmetric", "dequantize", "dequantize_scaled",
    "lsh_bucket", "lsh_probes", "lsh_multi_probe",
    "time_now", "time_diff", "time_add", "time_sub", "time_decay",
    "time_decay_linear", "time_before", "time_after", "time_between",
    "within_last", "intervals_overlap", "interval_contains",
    "interval_duration", "point_in_interval",
    "abs", "abs_int64", "abs_float64", "sqrt", "pow", "log", "exp",
    "sin", "cos", "tan", "floor", "ceil", "sign",
    "to_float", "to_int", "min_val", "max_val",
    "len", "upper", "lower", "trim", "substr", "replace", "concat",
}


def parse_program(src: str, legacy: bool = False) -> Program:
    """Parse an IQL program; batch facts are flattened into the statement
    list. `legacy=True` enables the reference's OLDER client dialect
    (`:-` rule arrows, `.`-terminated statements) — the modern client
    rejects both, so the default stays strict."""
    prog = Parser(src, legacy=legacy).parse_program()
    flat = []
    for st in prog.statements:
        if isinstance(st, list):
            flat.extend(st)
        else:
            flat.append(st)
    prog.statements = flat
    return prog
