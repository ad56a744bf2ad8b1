#!/usr/bin/env python3
"""Generate syntaxes/iql.tmLanguage.json from the engine's tokenizer.

The TextMate grammar is DERIVED, not hand-maintained: the regex
alternations for meta commands, aggregates, builtins, and keywords come
straight from `inputlayer_spark.syntax`, so the editor extension and the
REPL highlighter can never drift apart
(tests/test_vscode_grammar.py regenerates and diffs the committed file).

Run from the repo root:  python packages/inputlayer-iql-vscode/gen_grammar.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from inputlayer_spark.syntax import _AGGREGATES, _BUILTINS, _META  # noqa: E402

_KEYWORDS = "type|true|false|int|string|bool|float|list"


def build_grammar() -> dict:
    # Ordered like the tokenizer's ordered-choice scan — TextMate tries
    # patterns in array order at each position, the same resolution rule.
    return {
        "name": "InputLayer IQL",
        "scopeName": "source.iql",
        "patterns": [
            {"include": "#comments"},
            {"include": "#strings"},
            {"include": "#meta-commands"},
            {"include": "#query-marker"},
            {"include": "#rule-arrow"},
            {"include": "#negation"},
            {"include": "#comparisons"},
            {"include": "#operator-prefix"},
            {"include": "#numbers"},
            {"include": "#schema-column"},
            {"include": "#sort-order"},
            {"include": "#aggregates"},
            {"include": "#builtins"},
            {"include": "#keywords"},
            {"include": "#variables"},
            {"include": "#identifiers"},
            {"include": "#arithmetic"},
            {"include": "#punctuation"},
        ],
        "repository": {
            "comments": {
                "patterns": [
                    {"name": "comment.line.double-slash.iql", "match": "//.*$"},
                    {
                        "name": "comment.block.iql",
                        "begin": "/\\*",
                        "end": "\\*/",
                        "patterns": [{"include": "#comments"}],
                    },
                ]
            },
            "strings": {
                "name": "string.quoted.double.iql",
                "begin": '"',
                "end": '"',
                "patterns": [
                    {"name": "constant.character.escape.iql", "match": "\\\\."}
                ],
            },
            "meta-commands": {
                "name": "keyword.control.meta.iql",
                "match": _META,
            },
            "query-marker": {
                "name": "keyword.operator.query.iql",
                "match": "\\?(?=[A-Za-z])",
            },
            "rule-arrow": {
                "name": "keyword.operator.rule-arrow.iql",
                "match": "<-",
            },
            "negation": {
                "name": "keyword.operator.negation.iql",
                "match": "!(?=[A-Za-z])",
            },
            "comparisons": {
                "name": "keyword.operator.comparison.iql",
                "match": ">=|<=|!=|=",
            },
            "operator-prefix": {
                "name": "keyword.operator.assert.iql",
                "match": '^\\s*[+-](?=[a-z"\\[])',
            },
            "numbers": {
                "name": "constant.numeric.iql",
                "match": "\\b\\d+\\.\\d+(?:[eE][+-]?\\d+)?\\b|\\b\\d+\\b",
            },
            # `name: type` — scope the column name like a parameter and
            # the type like a storage type (tokenizer semanticize pass 2)
            "schema-column": {
                "match": (
                    "([a-z][A-Za-z0-9_]*)\\s*(:)\\s*"
                    "(int|integer|i32|i64|float|double|f64|number|symbol"
                    "|string|str|text|bool|boolean|timestamp|time|datetime"
                    "|vector|embedding|vec|any|list)\\b"
                ),
                "captures": {
                    "1": {"name": "variable.parameter.schema-column.iql"},
                    "2": {"name": "punctuation.separator.iql"},
                    "3": {"name": "storage.type.iql"},
                },
            },
            # `:asc` / `:desc` (tokenizer semanticize pass 3)
            "sort-order": {
                "match": "(:)\\s*(asc|desc)\\b",
                "captures": {
                    "1": {"name": "punctuation.separator.iql"},
                    "2": {"name": "keyword.other.sort-order.iql"},
                },
            },
            "aggregates": {
                "name": "support.function.aggregate.iql",
                "match": f"\\b(?:{_AGGREGATES})\\b",
            },
            "builtins": {
                "name": "support.function.builtin.iql",
                "match": f"\\b(?:{_BUILTINS})\\b",
            },
            "keywords": {
                "name": "storage.type.iql",
                "match": f"\\b(?:{_KEYWORDS})\\b",
            },
            "variables": {
                "name": "variable.other.iql",
                "match": "\\b[A-Z_][A-Za-z0-9_]*\\b",
            },
            "identifiers": {
                "name": "entity.name.function.relation.iql",
                "match": "\\b[a-z][A-Za-z0-9_]*\\b",
            },
            "arithmetic": {
                "name": "keyword.operator.arithmetic.iql",
                "match": "[+\\-*/%]",
            },
            "punctuation": {
                "name": "punctuation.iql",
                "match": "[()\\[\\]{},.:<>]",
            },
        },
    }


def main() -> None:
    out = os.path.join(os.path.dirname(__file__), "syntaxes", "iql.tmLanguage.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(build_grammar(), fh, indent=2)
        fh.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
