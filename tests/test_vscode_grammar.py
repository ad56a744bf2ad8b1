"""VSCode extension checks: the committed TextMate grammar must equal a
fresh regeneration from the engine tokenizer (single source of truth),
and its regexes must actually match what they claim (the subset used is
`re`-compatible, so we can drive them directly)."""

import json
import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "packages", "inputlayer-iql-vscode")


def _load_grammar():
    with open(os.path.join(PKG, "syntaxes", "iql.tmLanguage.json")) as fh:
        return json.load(fh)


def test_committed_grammar_matches_regenerated():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_grammar", os.path.join(PKG, "gen_grammar.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.build_grammar() == _load_grammar()


def test_manifest_and_language_configuration_valid():
    with open(os.path.join(PKG, "package.json")) as fh:
        pkg = json.load(fh)
    langs = pkg["contributes"]["languages"]
    assert langs[0]["extensions"] == [".iql"]
    gram = pkg["contributes"]["grammars"][0]
    assert gram["scopeName"] == "source.iql"
    with open(os.path.join(PKG, "language-configuration.json")) as fh:
        cfg = json.load(fh)
    assert cfg["comments"]["lineComment"] == "//"


def test_grammar_regexes_compile_and_classify():
    g = _load_grammar()
    repo = g["repository"]

    def rx(rule):
        return re.compile(repo[rule]["match"])

    # every single-pattern rule's regex must be valid `re`
    for name, rule in repo.items():
        if "match" in rule:
            re.compile(rule["match"])

    assert rx("meta-commands").match(".kg create demo").group(0) == ".kg create"
    assert rx("meta-commands").match(".why_not").group(0) == ".why_not"
    assert rx("query-marker").match("?edge")
    assert not rx("query-marker").match("? edge")
    assert rx("negation").match("!blocked")
    assert not rx("negation").match("!=")
    assert rx("aggregates").search("count_distinct<X>").group(0) == "count_distinct"
    assert rx("builtins").search("cosine(V1, V2)").group(0) == "cosine"
    assert rx("builtins").search("cosiner") is None  # word-boundary guard
    m = rx("schema-column").search("+city(name: string)")
    assert m and m.group(1) == "name" and m.group(3) == "string"
    m = rx("sort-order").search("?top(X, S:desc)")
    assert m and m.group(2) == "desc"
    assert rx("variables").search("edge(X, Y)").group(0) == "X"
    assert rx("numbers").search("2.5e-3").group(0) == "2.5e-3"
