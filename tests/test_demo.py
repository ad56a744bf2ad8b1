"""demo/ sample application (reference demo/src + examples/retail):
seed-file statement parsing and the full wire-protocol walkthrough."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "demo"))

from run_demo import parse_statements  # noqa: E402


def test_seed_parse_statements():
    content = """
// comment only

.kg create x

+edge[(1, 2),
  (2, 3)]

+path(X, Z) <- edge(X, Y),
  path(Y, Z)

?path(X, Y)
"""
    sts = parse_statements(content)
    assert sts[0] == ".kg create x"
    assert sts[1].startswith("+edge[") and "(2, 3)" in sts[1]
    assert sts[2].startswith("+path") and "path(Y, Z)" in sts[2]
    assert sts[3] == "?path(X, Y)"


def test_seed_parse_strips_comments_string_aware():
    """ADVICE r8: a quoted statement with a trailing // comment kept
    the comment text (the `'\"' not in line` heuristic skipped
    stripping). A // inside quotes must survive; a // outside must go,
    even on lines that contain quotes; "" escapes a quote."""
    sts = parse_statements(
        '+page[("https://a.example/x", 1)] // seed url\n'
        '\n'
        '+note[("says ""hi"" // not a comment", 2)] // trailing\n'
        '\n'
        '?page(U, N) // ask\n'
    )
    assert sts[0] == '+page[("https://a.example/x", 1)]'
    assert sts[1] == '+note[("says ""hi"" // not a comment", 2)]'
    assert sts[2] == "?page(U, N)"


def test_demo_walkthrough_end_to_end(spark, capsys):
    from run_demo import main

    assert main([]) == 0
    out = capsys.readouterr().out
    # stock retraction removes the shower screen from the ranked answer
    assert "re-query: shower screen gone" in out
    # the new purchase surfaces the gasket
    assert "moka-gasket-3c" in out.split("re-query: gasket appears")[1]
    # provenance trace ran
    assert "why is the 18g basket pitched" in out
    # 21g basket (0 stock) never pitched
    pitched = out.split("in stock too")[1].split("==")[0]
    assert "e61-basket-18g" in pitched and "e61-basket-21g" not in pitched
