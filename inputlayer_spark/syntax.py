"""IQL syntax highlighting — classified token spans + ANSI rendering
(reference: src/syntax/iql.pest grammar, src/syntax/mod.rs tokenizer +
semanticize passes, src/syntax/highlight.rs REPL integration).

The reference tokenizes with a PEG grammar; here the same ordered-choice
scan is a position-anchored regex chain, which keeps the module
dependency-free and robust to partial input (mid-keystroke REPL lines
degrade to a single Unknown span, never an exception)."""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum
from typing import List, Tuple


class TokenKind(Enum):
    COMMENT = "comment"
    STRING_LITERAL = "string"
    META_COMMAND = "meta"
    QUERY_MARKER = "query"
    RULE_ARROW = "arrow"
    OPERATOR_PREFIX = "op_prefix"
    NEGATION_PREFIX = "negation"
    COMPARISON_OP = "comparison"
    NUMBER = "number"
    AGGREGATE = "aggregate"
    BUILTIN_FN = "builtin"
    KEYWORD = "keyword"
    VARIABLE = "variable"
    IDENTIFIER = "identifier"
    BODY_IDENTIFIER = "body_identifier"
    SCHEMA_COLUMN = "schema_column"
    SORT_ORDER = "sort_order"
    ARITH_OP = "arith"
    PUNCTUATION = "punct"
    WHITESPACE = "ws"
    UNKNOWN = "unknown"


# ANSI palette — same assignments as the reference (mod.rs:46-70).
_ANSI = {
    TokenKind.COMMENT: "\x1b[90m",
    TokenKind.STRING_LITERAL: "\x1b[32m",
    TokenKind.META_COMMAND: "\x1b[1;35m",
    TokenKind.QUERY_MARKER: "\x1b[1;36m",
    TokenKind.RULE_ARROW: "\x1b[1;35m",
    TokenKind.OPERATOR_PREFIX: "\x1b[1;36m",
    TokenKind.NEGATION_PREFIX: "\x1b[1;31m",
    TokenKind.COMPARISON_OP: "\x1b[31m",
    TokenKind.NUMBER: "\x1b[36m",
    TokenKind.AGGREGATE: "\x1b[1;33m",
    TokenKind.BUILTIN_FN: "\x1b[33m",
    TokenKind.KEYWORD: "\x1b[1;34m",
    TokenKind.VARIABLE: "\x1b[94m",
    TokenKind.IDENTIFIER: "\x1b[97m",
    TokenKind.BODY_IDENTIFIER: "\x1b[36m",
    TokenKind.SCHEMA_COLUMN: "\x1b[3;94m",
    TokenKind.SORT_ORDER: "\x1b[1;34m",
    TokenKind.ARITH_OP: "\x1b[31m",
    TokenKind.PUNCTUATION: "\x1b[90m",
    TokenKind.WHITESPACE: "",
    TokenKind.UNKNOWN: "",
}

RESET = "\x1b[0m"
PROMPT_COLOR = "\x1b[1;32m"


def ansi_code(kind: TokenKind) -> str:
    return _ANSI[kind]


@dataclass
class Token:
    kind: TokenKind
    start: int
    end: int


# Aggregates checked before general identifiers (iql.pest aggregate rule).
_AGGREGATES = (
    "count_distinct|count|sum|avg|top_k_threshold|top_k|within_radius|min|max"
)

# Builtins (iql.pest builtin_fn) — longest-first within each family.
_BUILTINS = "|".join(
    (
        "euclidean_int8", "euclidean", "cosine_int8", "cosine", "dot_int8",
        "dot", "manhattan_int8", "manhattan", "normalize", "vec_dim",
        "vec_add", "vec_scale", "quantize_linear", "quantize_symmetric",
        "dequantize_scaled", "dequantize", "lsh_multi_probe", "lsh_bucket",
        "lsh_probes", "hnsw_nearest", "time_decay_linear", "time_decay",
        "time_diff", "time_add", "time_sub", "time_now", "time_before",
        "time_after", "time_between", "within_last", "intervals_overlap",
        "interval_contains", "interval_duration", "point_in_interval",
        "abs_int64", "abs_float64", "abs", "sqrt", "pow", "log", "exp",
        "sin", "cos", "tan", "floor", "ceil", "sign", "to_float", "to_int",
        "min_val", "max_val", "len", "upper", "lower", "trim", "substr",
        "replace", "concat",
    )
)

# Meta commands with fused subcommand (the reference highlights
# `.kg create` as ONE span). The reference grammar lags its own command
# set; ours covers the engine's full surface (.why/.debug/.agent/...).
_META_PARTS = (
    r"\.kg(?: (?:create|list|use|drop|acl))?",
    r"\.rel",
    r"\.rule(?: (?:list|drop|remove|def|clear|edit))?",
    r"\.session(?: (?:clear|drop))?",
    r"\.index(?: (?:list|create|drop|stats|rebuild))?",
    r"\.why_not", r"\.why", r"\.debug", r"\.agent", r"\.load",
    r"\.compact", r"\.status", r"\.clear", r"\.user", r"\.apikey",
    r"\.help", r"\.quit", r"\.exit", r"\.\?", r"\.q",
)
_META = "|".join(_META_PARTS)


def meta_commands() -> List[str]:
    """Concrete meta-command words expanded from the tokenizer patterns
    (single source with highlighting) — feeds the console's completion
    list. `.kg(?: (?:create|...))?` → [".kg", ".kg create", ...]."""
    words: List[str] = []
    for p in _META_PARTS:
        m = re.fullmatch(
            r"\\\.([a-z_?\\]+)(?:\(\?: \(\?:([a-z|]+)\)\)\?)?", p
        )
        if m is None:
            continue
        base = "." + m.group(1).replace("\\", "")
        words.append(base)
        if m.group(2):
            words.extend(f"{base} {sub}" for sub in m.group(2).split("|"))
    return words

# Ordered choice — mirror of iql.pest's `token` rule, most specific
# first. Each pattern is match()-anchored at the scan position.
_RULES: List[Tuple[TokenKind, re.Pattern]] = [
    (TokenKind.COMMENT, re.compile(r"/\*.*?\*/|/\*.*$|//[^\n]*", re.S)),
    (TokenKind.STRING_LITERAL, re.compile(r'"(?:\\.|[^"\n])*"')),
    (TokenKind.META_COMMAND, re.compile(_META)),
    (TokenKind.QUERY_MARKER, re.compile(r"\?(?=[A-Za-z])")),
    (TokenKind.RULE_ARROW, re.compile(r"<-")),
    (TokenKind.NEGATION_PREFIX, re.compile(r"!(?=[A-Za-z])")),
    (TokenKind.COMPARISON_OP, re.compile(r">=|<=|!=|<|>|=")),
    (TokenKind.OPERATOR_PREFIX, re.compile(r'[+-](?=[a-z"\[])')),
    (TokenKind.NUMBER, re.compile(
        r"\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?!\.\d)")),
    (TokenKind.AGGREGATE, re.compile(rf"(?:{_AGGREGATES})(?![A-Za-z0-9_])")),
    (TokenKind.BUILTIN_FN, re.compile(rf"(?:{_BUILTINS})(?![A-Za-z0-9_])")),
    (TokenKind.KEYWORD, re.compile(
        r"(?:type|true|false|int|string|bool|float|list)(?![A-Za-z0-9_])")),
    (TokenKind.VARIABLE, re.compile(r"[A-Z_][A-Za-z0-9_]*")),
    (TokenKind.IDENTIFIER, re.compile(r"[a-z][A-Za-z0-9_]*")),
    (TokenKind.ARITH_OP, re.compile(r"[+\-*/]")),
    (TokenKind.PUNCTUATION, re.compile(r"[()\[\]{},.:<>]")),
    (TokenKind.WHITESPACE, re.compile(r"[ \t\n]+")),
]


def tokenize(line: str) -> List[Token]:
    """Scan a line into classified spans. Never raises: anything no rule
    claims becomes a 1-char Unknown span (iql.pest any_char)."""
    tokens: List[Token] = []
    pos, n = 0, len(line)
    while pos < n:
        for kind, pat in _RULES:
            m = pat.match(line, pos)
            if m and m.end() > pos:
                tokens.append(Token(kind, pos, m.end()))
                pos = m.end()
                break
        else:
            tokens.append(Token(TokenKind.UNKNOWN, pos, pos + 1))
            pos += 1
    return tokens


# `name: type` detection — the type names the reference promotes
# (mod.rs SCHEMA_TYPES).
_SCHEMA_TYPES = {
    "int", "integer", "i32", "i64", "float", "double", "f64", "number",
    "symbol", "string", "str", "text", "bool", "boolean", "timestamp",
    "time", "datetime", "vector", "embedding", "vec", "any", "list",
}


def semanticize(tokens: List[Token], line: str) -> None:
    """Context passes over the flat token stream (mod.rs:160-238):
    1. identifiers after `<-` become BodyIdentifier;
    2. `name: type` promotes name to SchemaColumn (and type to Keyword);
    3. `:asc` / `:desc` become SortOrder."""
    arrow = next(
        (i for i, t in enumerate(tokens) if t.kind == TokenKind.RULE_ARROW), None
    )
    if arrow is not None:
        for t in tokens[arrow + 1:]:
            if t.kind == TokenKind.IDENTIFIER:
                t.kind = TokenKind.BODY_IDENTIFIER

    non_ws = [i for i, t in enumerate(tokens) if t.kind != TokenKind.WHITESPACE]

    for a, b, c in zip(non_ws, non_ws[1:], non_ws[2:]):
        name_t, colon_t, type_t = tokens[a], tokens[b], tokens[c]
        if name_t.kind not in (TokenKind.IDENTIFIER, TokenKind.BODY_IDENTIFIER):
            continue
        if colon_t.kind != TokenKind.PUNCTUATION or line[colon_t.start:colon_t.end] != ":":
            continue
        type_text = line[type_t.start:type_t.end]
        is_type = type_t.kind == TokenKind.KEYWORD or (
            type_t.kind in (TokenKind.IDENTIFIER, TokenKind.BODY_IDENTIFIER)
            and type_text in _SCHEMA_TYPES
        )
        if is_type:
            name_t.kind = TokenKind.SCHEMA_COLUMN
            type_t.kind = TokenKind.KEYWORD

    for a, b in zip(non_ws, non_ws[1:]):
        colon_t, sort_t = tokens[a], tokens[b]
        if colon_t.kind != TokenKind.PUNCTUATION or line[colon_t.start:colon_t.end] != ":":
            continue
        if sort_t.kind in (TokenKind.IDENTIFIER, TokenKind.BODY_IDENTIFIER):
            if line[sort_t.start:sort_t.end] in ("desc", "asc"):
                sort_t.kind = TokenKind.SORT_ORDER


def highlight_line(line: str) -> str:
    """ANSI-colorize one line of IQL (highlight.rs Highlighter::highlight)."""
    if not line:
        return line
    tokens = tokenize(line)
    if len(tokens) == 1 and tokens[0].kind == TokenKind.UNKNOWN:
        return line
    semanticize(tokens, line)
    out: List[str] = []
    last = 0
    for t in tokens:
        if t.start > last:
            out.append(line[last:t.start])
        text = line[t.start:t.end]
        code = _ANSI[t.kind]
        out.append(f"{code}{text}{RESET}" if code else text)
        last = t.end
    out.append(line[last:])
    return "".join(out)


def highlight_prompt(prompt: str) -> str:
    """Color the KG-name portion of `kg> ` (highlight.rs:110-119)."""
    pos = prompt.rfind("> ")
    if pos == -1:
        return prompt
    return f"{PROMPT_COLOR}{prompt[:pos]}{RESET}> "
