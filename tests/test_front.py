"""Marketing/landing site (`inputlayer_spark/front.py`) — the analog of
the reference's Next.js front/ + content/ corpus. Render-function tests
need no Spark; one integration test serves the pages over the real
HTTP server."""

import re
import urllib.request

from inputlayer_spark import front


def _all_paths():
    paths = ["/front", "/front/blog", "/front/compare", "/front/customers"]
    paths += [f"/front/blog/{s}" for s in front.BLOG_POSTS]
    paths += [f"/front/compare/{s}" for s in front.COMPARE_PAGES]
    paths += [f"/front/use-cases/{s}" for s in front.USE_CASES]
    return paths


def test_every_page_renders():
    for p in _all_paths():
        html = front.route(p)
        assert html is not None, p
        assert html.startswith("<!doctype html>")
        assert "<main>" in html and "InputLayer-Spark" in html


def test_internal_links_all_resolve():
    """No dead links: every /front... href on every page must route."""
    for p in _all_paths():
        html = front.route(p)
        for href in re.findall(r"href=['\"](/front[^'\"]*)['\"]", html):
            assert front.route(href) is not None, f"{p} -> {href}"


def test_information_architecture_matches_reference_front():
    """The reference front ships landing + blog + compare + use-cases +
    customers (front/app/*, content/*); each section must exist and be
    reachable from the shared nav."""
    nav = front.landing_html()
    for section in ("/front/blog", "/front/compare", "/front/use-cases/", "/front/customers"):
        assert section in nav
    assert len(front.BLOG_POSTS) >= 4
    assert len(front.COMPARE_PAGES) >= 3
    assert "agentic-ai" in front.USE_CASES


def test_unknown_and_traversal_paths_404():
    assert front.route("/front/blog/../../etc/passwd") is None
    assert front.route("/front/nope") is None
    assert front.route("/front/blog/does-not-exist") is None
    assert front.route("/front/customers/extra") is None


def test_trailing_slash_and_query_normalized():
    assert front.route("/front/") == front.route("/front")
    assert front.route("/front/blog/?utm=x") == front.route("/front/blog")


def test_front_served_over_http_without_auth(spark):
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark).start()
    try:
        for p in ("/front", "/front/blog/curating-100tb"):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}{p}"
            ) as r:
                assert r.headers["Content-Type"].startswith("text/html")
                assert "InputLayer-Spark" in r.read().decode()
    finally:
        srv.stop()


def test_console_links_to_front():
    from inputlayer_spark.gui import render_console

    assert 'href="/front"' in render_console()
