"""Web console (reference gui/): static shell at /, tokenizer-generated
highlighting, one-time-ticket auth for browser WebSockets."""

import json
import shutil
import subprocess
import urllib.request

import pytest

from inputlayer_spark.gui import _js_rules, render_console


def test_console_page_served(spark):
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as r:
            assert r.headers["Content-Type"].startswith("text/html")
            html = r.read().decode()
        assert "IQL Console" in html
        # token rules injected — the page lexes with the ENGINE's grammar
        assert '"meta"' in html and '"aggregate"' in html
        assert "__TOKEN_RULES__" not in html  # template fully rendered
    finally:
        srv.stop()


def test_console_served_without_auth_but_data_gated(spark, tmp_path):
    """The shell is public (like the reference's static GUI assets);
    every data call it issues goes through the authenticated /query."""
    from inputlayer_spark.auth import AuthStore
    from inputlayer_spark.server import QueryServer

    store = AuthStore(str(tmp_path / "creds.json"))
    store.add_user("root", "pw", role="admin")
    srv = QueryServer(spark, auth=store).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as r:
            assert r.status == 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/query",
            data=json.dumps({"query": ".rel list"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 401
    finally:
        srv.stop()


def test_ws_ticket_auth(spark, tmp_path):
    """Browsers cannot set headers on a WebSocket handshake — the
    console redeems a single-use short-TTL ticket minted via the
    authenticated POST /ws_ticket. The long-lived API key is NOT
    accepted in the URL (ADVICE r7: query strings persist in
    access/proxy logs)."""
    import base64 as b64
    import os
    import socket
    import urllib.error

    from inputlayer_spark.auth import AuthStore
    from inputlayer_spark.server import QueryServer

    store = AuthStore(str(tmp_path / "creds.json"))
    store.add_user("root", "pw", role="admin")
    key = store.issue_api_key("root")
    srv = QueryServer(spark, auth=store).start()

    def handshake(path):
        sock = socket.create_connection(("127.0.0.1", srv.port), timeout=30)
        wk = b64.b64encode(os.urandom(16)).decode()
        sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\nHost: 127.0.0.1:{srv.port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {wk}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        buf = b""
        while b"\r\n" not in buf:
            buf += sock.recv(4096)
        sock.close()
        return buf.split(b"\r\n")[0].decode()

    def mint(headers):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/ws_ticket",
            data=b"",
            headers=headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            return json.loads(r.read())["ticket"]

    try:
        assert "401" in handshake("/ws")  # headerless, keyless → denied
        # the long-lived key is rejected in the URL
        assert "401" in handshake(f"/ws?api_key={key}")
        # minting requires header auth
        with pytest.raises(urllib.error.HTTPError) as e:
            mint({})
        assert e.value.code == 401
        t = mint({"X-API-Key": key})
        assert "101" in handshake(f"/ws?ticket={t}")
        # single-use: the same ticket is dead after one handshake
        assert "401" in handshake(f"/ws?ticket={t}")
        assert "401" in handshake("/ws?ticket=forged")
        # expiry: a ticket past its TTL is rejected
        t2 = mint({"X-API-Key": key})
        with srv._ws_ticket_lock:
            ident, _ = srv._ws_tickets[t2]
            srv._ws_tickets[t2] = (ident, -1.0)
        assert "401" in handshake(f"/ws?ticket={t2}")
    finally:
        srv.stop()


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_js_lexer_matches_engine_tokenizer():
    """The console's JS lexer replays the exact rule list the engine
    tokenizer uses; token-for-token parity on a program covering every
    token class (same regen-parity idea as the VSCode grammar test)."""
    from inputlayer_spark.syntax import tokenize

    sample = (
        '.kg create demo\n'
        '+edge[(1, 2), (2, 3)]\n'
        '+path(X, Z) <- edge(X, Y), path(Y, Z), !blocked(X), '
        'D = cosine(V1, V2) // comment\n'
        '?path(X, Y) /* block\ncomment */ '
        '+agg(Seg, count<O>, sum<T>) <- orders(O, C, Seg, T, D2, P2), '
        'T >= 1.5e3\n'
        '"str \\"esc\\"" top_k<3, Name, Score:desc>\n'
    )
    py = [[t.kind.value, t.start, t.end] for t in tokenize(sample)]
    js_script = """
const RULES = %s.map(([k, src]) => [k, new RegExp(src, "y")]);
const text = %s;
const toks = []; let pos = 0;
outer: while (pos < text.length) {
  for (const [kind, re] of RULES) {
    re.lastIndex = pos;
    const m = re.exec(text);
    if (m && m.index === pos && m[0].length > 0) {
      toks.push([kind, pos, pos + m[0].length]); pos += m[0].length;
      continue outer;
    }
  }
  toks.push(["unknown", pos, pos + 1]); pos += 1;
}
console.log(JSON.stringify(toks));
""" % (json.dumps(_js_rules()), json.dumps(sample))
    out = subprocess.run(
        ["node", "-e", js_script], capture_output=True, text=True, check=True
    )
    assert json.loads(out.stdout) == py


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_completion_function():
    """Extract the page's complete() (marker-delimited) and drive it
    under node: meta-command expansion, builtin/relation prefixes,
    dedupe, the 8-entry cap, and the no-fragment cases."""
    from inputlayer_spark.gui import _completion_words

    html = render_console()
    start = html.index("// __COMPLETE_FN_START__")
    end = html.index("// __COMPLETE_FN_END__")
    fn = html[start:end]
    words = json.dumps(_completion_words())
    script = f"""
{fn}
const WORDS = {words};
const RELS = ["customers", "custom_rules", "orders"];
const out = [];
out.push(complete(".kg ", WORDS, RELS).map(s => s.show));
out.push(complete("?path(X, Y), cos", WORDS, RELS).map(s => s.show));
out.push(complete("cust", WORDS, RELS).map(s => s.insert));
out.push(complete("c", WORDS, RELS).length);        // 1 char: no popup
out.push(complete("?p(X)", WORDS, RELS).length);     // no fragment
out.push(complete("ti", WORDS, RELS).length);        // cap at 8
console.log(JSON.stringify(out));
"""
    out = json.loads(
        subprocess.run(
            ["node", "-e", script], capture_output=True, text=True, check=True
        ).stdout
    )
    assert out[0][:3] == [".kg acl", ".kg create", ".kg drop"] or set(
        [".kg create", ".kg use", ".kg drop", ".kg list", ".kg acl"]
    ) == set(out[0])
    # "cos" itself is a builtin but equal to the fragment → excluded
    assert "cosine" in out[1] and "cosine_int8" in out[1] and "cos" not in out[1]
    assert set(out[2]) == {"omers", "om_rules"}  # relation completions
    assert out[3] == 0 and out[4] == 0
    assert out[5] <= 8


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_graph_layout_function():
    """Extract layoutGraph() and check the force layout's invariants
    under node: all positions inside the canvas, deterministic across
    runs, and adjacent nodes end up closer than non-adjacent ones on a
    chain (the property that makes the picture readable)."""
    html = render_console()
    start = html.index("// __LAYOUT_FN_START__")
    end = html.index("// __LAYOUT_FN_END__")
    fn = html[start:end]
    script = f"""
{fn}
const edges = [[1, 2], [2, 3], [3, 4], [4, 5]];
const a = layoutGraph(edges, 640, 420, 150);
const b = layoutGraph(edges, 640, 420, 150);
const d = (g, u, v) => {{
  const i = g.ids.indexOf(String(u)), j = g.ids.indexOf(String(v));
  return Math.hypot(g.x[i] - g.x[j], g.y[i] - g.y[j]);
}};
console.log(JSON.stringify({{
  n: a.ids.length,
  inBounds: a.x.every(v => v >= 0 && v <= 640) &&
            a.y.every(v => v >= 0 && v <= 420),
  deterministic: JSON.stringify(a) === JSON.stringify(b),
  chainLocal: d(a, 1, 2) < d(a, 1, 4) && d(a, 4, 5) < d(a, 1, 5),
}}));
"""
    out = json.loads(
        subprocess.run(
            ["node", "-e", script], capture_output=True, text=True, check=True
        ).stdout
    )
    assert out == {
        "n": 5, "inBounds": True, "deterministic": True, "chainLocal": True
    }


def test_render_console_is_deterministic():
    assert render_console() == render_console()
    assert len(render_console()) > 5000


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_db_ops_view_model():
    """The database-management panel's view model (extracted dbOps):
    default first, current marked, default not droppable — the console
    twin of the reference's gui/app/database page."""
    html = render_console()
    start = html.index("// __DB_OPS_FN_START__")
    end = html.index("// __DB_OPS_FN_END__")
    fn = html[start:end]
    script = f"""
{fn}
const rows = dbOps([["scratch", false], ["default", true], ["alpha", false]], "scratch");
console.log(JSON.stringify(rows));
"""
    out = json.loads(
        subprocess.run(
            ["node", "-e", script], capture_output=True, text=True, check=True
        ).stdout
    )
    assert [r["name"] for r in out] == ["default", "alpha", "scratch"]
    assert [r["current"] for r in out] == [False, False, True]
    assert [r["canDrop"] for r in out] == [False, True, True]


def test_console_has_database_panel(spark):
    """The page ships the management panel: toggle button, panel div,
    and the kg create/drop/use wiring strings."""
    html = render_console()
    for needle in (
        'id="dbbtn"',
        'id="dbpanel"',
        ".kg create",
        ".kg drop",
        ".kg acl list",
        "Drop knowledge graph",
    ):
        assert needle in html, needle


def test_docs_index_and_pages():
    """GET /docs backing functions: index lists the shipped pages with
    their H1 titles; page lookup sanitizes names (no traversal)."""
    from inputlayer_spark.gui import docs_index, docs_page

    idx = docs_index()
    names = [p["name"] for p in idx]
    assert "iql" in names and "server" in names
    assert any("IQL" in p["title"] for p in idx)
    assert "# IQL language guide" in docs_page("iql")
    assert docs_page("../secrets") is None
    assert docs_page("no_such_page") is None
    assert docs_page("") is None


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_md_renderer_safe_subset():
    """The console's markdown renderer (extracted mdRender): headings,
    fenced code, inline code, tables, lists, paragraph joining — and
    everything escaped (no raw-HTML injection from docs content)."""
    html = render_console()
    fn = html[html.index("// __MD_FN_START__"):html.index("// __MD_FN_END__")]
    md = (
        "# Title\n\npara *one* `code` **bold**\nsame para\n\n"
        "```iql\n+edge(1, 2) <b>raw</b>\n```\n\n"
        "| a | b |\n|---|---|\n| 1 | 2 |\n\n"
        "- item one\n- item two\n  continued\n\n<script>evil()</script>\n"
    )
    script = f"""
{fn}
const esc = s => s.replace(/&/g, "&amp;").replace(/</g, "&lt;");
console.log(JSON.stringify(mdRender({json.dumps(md)}, esc)));
"""
    out = json.loads(
        subprocess.run(
            ["node", "-e", script], capture_output=True, text=True, check=True
        ).stdout
    )
    assert "<h2>Title</h2>" in out
    assert "<code>code</code>" in out and "<b>bold</b>" in out
    assert "para" in out and "same para" in out
    assert "<pre><code>+edge(1, 2) &lt;b>raw&lt;/b></code></pre>" in out
    assert "<th>a</th>" in out and "<td>1</td>" in out
    # a data cell STARTING with '-' (IQL retraction syntax) is data,
    # not a separator row — it must render
    md2 = "| stmt | what |\n|---|---|\n| -edge(1, 2) | retracts |\n"
    out2 = json.loads(
        subprocess.run(
            ["node", "-e",
             fn + f'\nconst esc = s => s.replace(/&/g, "&amp;").replace(/</g, "&lt;");'
                  f"\nconsole.log(JSON.stringify(mdRender({json.dumps(md2)}, esc)));"],
            capture_output=True, text=True, check=True,
        ).stdout
    )
    assert "-edge(1, 2)" in out2 and "retracts" in out2
    # ADVICE r8: classifying by the FIRST cell alone dropped a data row
    # whose first cell is dash-like, and rendered a separator whose
    # first cell is not dash-like as data. EVERY cell must match.
    md3 = (
        "| stmt | what |\n|---|---|\n| --- | all-dash data cell |\n\n"
        "| a | b |\n| x |---|\n| 1 | 2 |\n"
    )
    out3 = json.loads(
        subprocess.run(
            ["node", "-e",
             fn + '\nconst esc = s => s.replace(/&/g, "&amp;").replace(/</g, "&lt;");'
                  f"\nconsole.log(JSON.stringify(mdRender({json.dumps(md3)}, esc)));"],
            capture_output=True, text=True, check=True,
        ).stdout
    )
    assert "all-dash data cell" in out3      # data row kept
    assert "<td>x</td>" in out3              # non-separator row renders as data
    assert "<li>item two continued</li>" in out
    assert "<script>" not in out and "&lt;script>" in out


def test_docs_served_over_http(spark):
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/docs") as r:
            idx = json.loads(r.read())
        assert any(p["name"] == "iql" for p in idx["pages"])
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/docs/server"
        ) as r:
            assert r.headers["Content-Type"].startswith("text/markdown")
            assert b"wire protocol" in r.read().lower()
        import pytest as _pytest

        with _pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/docs/nope")
        assert e.value.code == 404
    finally:
        srv.stop()
