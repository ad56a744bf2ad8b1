"""Syntax-highlighter tests — mirrors the reference's unit suite
(src/syntax/mod.rs tests) plus semanticize-pass and renderer checks."""

from inputlayer_spark.syntax import (
    RESET,
    TokenKind,
    highlight_line,
    highlight_prompt,
    semanticize,
    tokenize,
)


def kinds(line, semantic=False):
    toks = tokenize(line)
    if semantic:
        semanticize(toks, line)
    return [
        (t.kind, line[t.start:t.end])
        for t in toks
        if t.kind != TokenKind.WHITESPACE
    ]


def test_query_with_variables():
    toks = kinds("?edge(X, Y)")
    assert toks[0] == (TokenKind.QUERY_MARKER, "?")
    assert toks[1] == (TokenKind.IDENTIFIER, "edge")
    assert toks[2] == (TokenKind.PUNCTUATION, "(")
    assert toks[3] == (TokenKind.VARIABLE, "X")
    assert toks[5] == (TokenKind.VARIABLE, "Y")


def test_insert_with_string_and_number():
    toks = kinds('+person("alice", 30)')
    assert toks[0] == (TokenKind.OPERATOR_PREFIX, "+")
    assert toks[1] == (TokenKind.IDENTIFIER, "person")
    assert toks[3] == (TokenKind.STRING_LITERAL, '"alice"')
    assert toks[5] == (TokenKind.NUMBER, "30")


def test_meta_command_with_subcommand_fused():
    toks = kinds(".kg create test")
    assert toks[0] == (TokenKind.META_COMMAND, ".kg create")
    assert toks[1] == (TokenKind.IDENTIFIER, "test")
    # engine commands missing from the reference grammar are covered
    assert kinds(".why_not edge(1, 2)")[0] == (TokenKind.META_COMMAND, ".why_not")
    assert kinds(".agent examples")[0] == (TokenKind.META_COMMAND, ".agent")


def test_comments():
    toks = kinds("// this is a comment")
    assert toks == [(TokenKind.COMMENT, "// this is a comment")]
    assert kinds("/* block */ ?f(X)")[0][0] == TokenKind.COMMENT


def test_rule_arrow_and_operators():
    toks = kinds("path(X, Z) <- edge(X, Y), edge(Y, Z)")
    ks = [k for k, _ in toks]
    assert TokenKind.RULE_ARROW in ks and TokenKind.VARIABLE in ks
    # != is a comparison, !name is negation
    assert (TokenKind.COMPARISON_OP, "!=") in kinds("X != Y")
    assert (TokenKind.NEGATION_PREFIX, "!") in kinds("!blocked(X)")
    # <- wins over <; bare < in count<X> is a comparison-colored span
    agg = kinds("?r(X, count<Y>)")
    assert (TokenKind.AGGREGATE, "count") in agg


def test_numbers_and_floats():
    assert kinds("3.14")[0] == (TokenKind.NUMBER, "3.14")
    assert kinds("1e5")[0][1] == "1"  # bare int then identifier-ish tail
    assert kinds("2.5e-3")[0] == (TokenKind.NUMBER, "2.5e-3")


def test_builtins_and_aggregates_before_identifiers():
    assert (TokenKind.BUILTIN_FN, "cosine") in kinds("S = cosine(V1, V2)")
    assert (TokenKind.AGGREGATE, "count_distinct") in kinds("count_distinct<X>")
    # prefix-protected: `cosiner` is a plain identifier
    assert kinds("cosiner")[0] == (TokenKind.IDENTIFIER, "cosiner")


def test_semanticize_body_identifiers():
    line = "path(X, Z) <- edge(X, Y), edge(Y, Z)"
    toks = kinds(line, semantic=True)
    assert toks[0] == (TokenKind.IDENTIFIER, "path")
    body = [t for t in toks if t[1] == "edge"]
    assert all(k == TokenKind.BODY_IDENTIFIER for k, _ in body)


def test_semanticize_schema_columns():
    toks = kinds("+city(name: string, population: int)", semantic=True)
    assert (TokenKind.SCHEMA_COLUMN, "name") in toks
    assert (TokenKind.SCHEMA_COLUMN, "population") in toks
    assert (TokenKind.KEYWORD, "string") in toks


def test_semanticize_sort_order():
    toks = kinds("?top(X, S:desc)", semantic=True)
    assert (TokenKind.SORT_ORDER, "desc") in toks


def test_highlight_roundtrip_preserves_text():
    import re

    for line in (
        '+direct_flight("jfk", "lax", 2475)',
        "?can_reach(X, Y:desc)",
        ".kg create demo",
        "weird §§ input",
        "",
    ):
        colored = highlight_line(line)
        assert re.sub(r"\x1b\[[0-9;]*m", "", colored) == line


def test_highlight_prompt():
    assert highlight_prompt("mykg> ").endswith(f"{RESET}> ")
    assert highlight_prompt("noarrow") == "noarrow"
