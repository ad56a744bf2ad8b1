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

    assert main(["--scenario", "espresso"]) == 0
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


def test_retail_walkthrough_end_to_end(spark, capsys):
    """Scenario 2 (seeds/retail.iql): recursive delivery closure,
    HNSW-indexed catalogue search, and live maintenance — a new route
    extends the materialized closure mid-session, a restock retracts
    order lines — all through the wire client."""
    from run_demo import main

    assert main(["--scenario", "retail"]) == 0
    out = capsys.readouterr().out
    # the initial plan: grove-dairy reaches s_alder through d_north
    plan = out.split("order plan")[1].split("==")[0]
    assert "grove-dairy" in plan and "oat-milk-1l" in plan
    # ferment-co cannot reach s_birch before the new route exists
    assert "s_birch | kimchi-450g" not in plan.replace("  ", " ")
    # after +route(d_south, s_birch): closure extends, kimchi appears
    extended = out.split("closure extended")[1].split("==")[0]
    assert "kimchi-450g" in extended and "ferment-co" in extended
    # after the restock, oat milk leaves s_alder's plan
    after = out.split("oat milk drops out")[1].split("==")[0]
    assert "oat-milk-1l" not in after
    # index-served ANN search found the plant milks
    ann = out.split("index-served search")[1].split("==")[0]
    assert "oat-milk-1l" in ann or "soy-milk-1l" in ann
    # provenance trace ran
    assert "grove-dairy restock" in out


def test_embedding_walkthrough_end_to_end(spark, capsys):
    """Scenario 3 (docs/embedding.md): library embedding driven through
    the Python API directly — multi-KG isolation, WAL crash-recovery,
    .compact generation recovery, and concurrent lock-free reads (the
    reference's storage_demo.rs + parallel_queries.rs teaching content)."""
    from run_demo import embedding_walkthrough

    embedding_walkthrough(spark)
    out = capsys.readouterr().out
    assert "staging sees 0 edge tuples (isolation)" in out
    assert "recovered from WAL: adults = [2, 3, 4, 5]" in out
    assert ".compact generation recovers identically" in out
    assert "lock-free reads" in out


def test_embedding_doc_served(spark):
    """docs/embedding.md is a real docs page: the /docs index lists it
    and /docs/embedding serves the markdown."""
    from inputlayer_spark.gui import docs_index, docs_page

    assert "embedding" in {p["name"] for p in docs_index()}
    page = docs_page("embedding")
    assert page is not None and "Embedding the engine as a library" in page
    assert "--scenario embedding" in page
