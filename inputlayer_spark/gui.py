"""Web console served by the query server at ``/``.

The reference ships a GUI next to its WebSocket API (gui/ — connection
screen, query page with autocomplete, relations browser; config.toml's
"HTTP Server Configuration (WebSocket API + GUI)" section). This is the
Spark engine's parity surface: a single self-contained HTML page —
no build step, no external assets — that drives the same public
endpoints a client SDK uses (POST /query, GET /status, WS /ws for change
notifications).

Syntax highlighting is generated from the engine tokenizer
(`inputlayer_spark.syntax._RULES`), the same single-source-of-truth
scheme the VSCode extension uses (packages/inputlayer-iql-vscode/
gen_grammar.py): the ordered-choice regexes are translated to JavaScript
and replayed by a ~20-line JS lexer, so the console, the REPL, and the
editor extension can never disagree about what a token is.
"""

from __future__ import annotations

import json

from inputlayer_spark.syntax import _RULES, TokenKind

# TokenKind -> CSS color (dark theme; mirrors the REPL's ANSI palette)
_COLORS = {
    TokenKind.COMMENT: "#6a737d",
    TokenKind.STRING_LITERAL: "#7ec699",
    TokenKind.META_COMMAND: "#d2a8ff",
    TokenKind.QUERY_MARKER: "#56d4dd",
    TokenKind.RULE_ARROW: "#d2a8ff",
    TokenKind.OPERATOR_PREFIX: "#56d4dd",
    TokenKind.NEGATION_PREFIX: "#ff7b72",
    TokenKind.COMPARISON_OP: "#ff7b72",
    TokenKind.NUMBER: "#79c0ff",
    TokenKind.AGGREGATE: "#e3b341",
    TokenKind.BUILTIN_FN: "#e3b341",
    TokenKind.KEYWORD: "#79b8ff",
    TokenKind.VARIABLE: "#a5d6ff",
    TokenKind.IDENTIFIER: "#e6edf3",
    TokenKind.BODY_IDENTIFIER: "#56d4dd",
    TokenKind.SCHEMA_COLUMN: "#a5d6ff",
    TokenKind.SORT_ORDER: "#79b8ff",
    TokenKind.ARITH_OP: "#ff7b72",
    TokenKind.PUNCTUATION: "#8b949e",
    TokenKind.WHITESPACE: "",
    TokenKind.UNKNOWN: "",
}


def _js_rules() -> list:
    """Engine tokenizer rules as [kind, jsSource] pairs. Python's re.S
    dot-matches-newline has no JS inline equivalent — rewrite `.` as
    [\\s\\S] for the one rule that uses it (block comments)."""
    out = []
    for kind, pat in _RULES:
        src = pat.pattern
        if pat.flags & 16:  # re.S
            src = src.replace(".*?", "[\\s\\S]*?").replace(".*$", ".*$")
        out.append([kind.value, src])
    return out


def _docs_dir() -> str:
    import os

    # SPARK_GRAFT_DOCS_DIR lets an installed package (site-packages,
    # container image) point at its docs checkout; the default is the
    # repo layout (package parent / docs)
    env = os.environ.get("SPARK_GRAFT_DOCS_DIR")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )


def docs_index() -> list:
    """Available documentation pages ([{name, title}]) — the console's
    docs panel and GET /docs both read this (reference gui/app/docs
    renders its bundled markdown the same way)."""
    import os

    out = []
    d = _docs_dir()
    if not os.path.isdir(d):
        return out
    for f in sorted(os.listdir(d)):
        if not f.endswith(".md"):
            continue
        title = f[:-3]
        with open(os.path.join(d, f)) as fh:
            first = fh.readline().strip()
            if first.startswith("#"):
                title = first.lstrip("# ").strip()
        out.append({"name": f[:-3], "title": title})
    return out


def docs_page(name: str) -> "str | None":
    """Markdown source of one docs page, or None. The name is
    sanitized to a bare identifier — no path traversal."""
    import os
    import re

    if not re.fullmatch(r"[A-Za-z0-9_-]+", name or ""):
        return None
    p = os.path.join(_docs_dir(), f"{name}.md")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return fh.read()


def _completion_words() -> dict:
    """Completion vocabulary, single-sourced from the tokenizer: meta
    commands expanded from the grammar patterns, builtins + aggregates
    from the same alternation lists the highlighter matches."""
    from inputlayer_spark.syntax import _AGGREGATES, _BUILTINS, meta_commands

    return {
        "meta": meta_commands(),
        "ident": sorted(set(_BUILTINS.split("|")) | set(_AGGREGATES.split("|"))),
    }


def render_console() -> str:
    rules = json.dumps(_js_rules())
    colors = json.dumps({k.value: v for k, v in _COLORS.items() if v})
    words = json.dumps(_completion_words())
    return (
        _PAGE.replace("__TOKEN_RULES__", rules)
        .replace("__TOKEN_COLORS__", colors)
        .replace("__COMPLETION_WORDS__", words)
    )


_PAGE = r"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>IQL Console — inputlayer-spark</title>
<style>
:root {
  --bg: #0d1117; --panel: #161b22; --border: #30363d; --fg: #e6edf3;
  --dim: #8b949e; --accent: #58a6ff; --ok: #3fb950; --err: #f85149;
}
* { box-sizing: border-box; }
body {
  margin: 0; background: var(--bg); color: var(--fg);
  font: 14px/1.45 -apple-system, "Segoe UI", Roboto, sans-serif;
  display: grid; grid-template-rows: auto 1fr;
  grid-template-columns: 230px 1fr; height: 100vh;
}
header {
  grid-column: 1 / 3; display: flex; align-items: center; gap: 12px;
  padding: 8px 14px; background: var(--panel);
  border-bottom: 1px solid var(--border);
}
header h1 { font-size: 15px; margin: 0; font-weight: 600; }
header h1 span { color: var(--dim); font-weight: 400; }
#dot { width: 9px; height: 9px; border-radius: 50%; background: var(--err); }
#dot.ok { background: var(--ok); }
header .spacer { flex: 1; }
select, input[type=password] {
  background: var(--bg); color: var(--fg); border: 1px solid var(--border);
  border-radius: 6px; padding: 4px 8px; font-size: 13px;
}
aside {
  background: var(--panel); border-right: 1px solid var(--border);
  padding: 10px; overflow-y: auto;
}
aside h2 {
  font-size: 11px; text-transform: uppercase; letter-spacing: .08em;
  color: var(--dim); margin: 8px 0 6px;
}
aside ul { list-style: none; margin: 0; padding: 0; }
aside li {
  padding: 3px 6px; border-radius: 5px; cursor: pointer;
  font-family: ui-monospace, monospace; font-size: 12.5px;
  white-space: nowrap; overflow: hidden; text-overflow: ellipsis;
}
aside li:hover { background: #21262d; color: var(--accent); }
main { display: flex; flex-direction: column; overflow: hidden; }
#editor-wrap {
  position: relative; margin: 12px 12px 0;
  border: 1px solid var(--border); border-radius: 8px; background: var(--panel);
}
#hl, #q {
  font: 13.5px/1.5 ui-monospace, SFMono-Regular, Menlo, monospace;
  padding: 10px 12px; margin: 0; border: 0; width: 100%; height: 132px;
  white-space: pre-wrap; word-wrap: break-word; overflow-y: auto;
}
#hl { position: absolute; inset: 0; pointer-events: none; color: var(--fg); }
#q {
  position: relative; background: transparent; color: transparent;
  caret-color: var(--fg); resize: vertical; outline: none; display: block;
}
#suggest { display: flex; gap: 6px; margin: 4px 12px 0; min-height: 22px; flex-wrap: wrap; }
.chip {
  background: #21262d; border: 1px solid var(--border); color: var(--accent);
  border-radius: 10px; padding: 1px 10px; cursor: pointer;
  font: 12px ui-monospace, monospace;
}
.chip:first-child { border-color: var(--accent); }
.chip:hover { background: #30363d; }
#bar { display: flex; gap: 8px; align-items: center; margin: 8px 12px; }
button {
  background: #238636; color: #fff; border: 0; border-radius: 6px;
  padding: 5px 14px; font-size: 13px; cursor: pointer;
}
button.ghost { background: #21262d; color: var(--fg); }
button:hover { filter: brightness(1.1); }
#timing { color: var(--dim); font-size: 12px; }
#out { flex: 1; overflow-y: auto; padding: 0 12px 12px; }
.result { margin-top: 10px; }
.result .meta { color: var(--dim); font-size: 12px; margin-bottom: 4px; }
table {
  border-collapse: collapse; font: 12.5px ui-monospace, monospace;
  background: var(--panel); border-radius: 8px; overflow: hidden;
}
th, td {
  border: 1px solid var(--border); padding: 4px 10px; text-align: left;
  max-width: 420px; overflow: hidden; text-overflow: ellipsis;
  white-space: nowrap;
}
th { background: #21262d; color: var(--accent); font-weight: 600; }
.error {
  background: #3d1d1f; border: 1px solid var(--err); color: #ffa198;
  border-radius: 8px; padding: 8px 12px; margin-top: 10px;
  font-family: ui-monospace, monospace; font-size: 12.5px;
  white-space: pre-wrap;
}
#notif {
  position: fixed; right: 14px; bottom: 14px; display: flex;
  flex-direction: column; gap: 6px; max-width: 340px;
}
.toast {
  background: #1f6feb; color: #fff; border-radius: 8px; padding: 8px 12px;
  font-size: 12.5px; box-shadow: 0 4px 14px rgba(0,0,0,.4);
  animation: fade 6s forwards;
}
@keyframes fade { 0%,80% { opacity: 1 } 100% { opacity: 0 } }
.hist {
  color: var(--dim); cursor: pointer; font-family: ui-monospace, monospace;
  font-size: 12px; padding: 2px 6px; border-radius: 5px;
  white-space: nowrap; overflow: hidden; text-overflow: ellipsis;
}
.hist:hover { background: #21262d; color: var(--fg); }
</style>
</head>
<body>
<header>
  <div id="dot" title="server status"></div>
  <h1>IQL Console <span>— inputlayer-spark</span></h1>
  <a href="/front" class="ghost" style="color:var(--dim);font-size:12px;
     text-decoration:none" title="project site">About</a>
  <div class="spacer"></div>
  <button id="docsbtn" class="ghost" title="language + server docs">🕮 Docs</button>
  <button id="dbbtn" class="ghost" title="knowledge-graph management">⛁ Database</button>
  <label style="color:var(--dim);font-size:12px">KG</label>
  <select id="kg"><option value="default">default</option></select>
  <input id="key" type="password" placeholder="API key (if required)"
         autocomplete="off" style="width:170px">
</header>
<aside>
  <h2>Relations <a id="refresh" style="cursor:pointer;color:var(--accent)">↻</a></h2>
  <ul id="rels"></ul>
  <h2>History</h2>
  <div id="history"></div>
</aside>
<main>
  <div id="editor-wrap">
    <pre id="hl" aria-hidden="true"></pre>
    <textarea id="q" spellcheck="false"
      placeholder="?relation(X, Y)   —   Ctrl/Cmd-Enter runs, Tab completes"></textarea>
  </div>
  <div id="suggest"></div>
  <div id="bar">
    <button id="run">Run ▷</button>
    <button id="clear" class="ghost">Clear</button>
    <span id="timing"></span>
  </div>
  <div id="dbpanel" style="display:none"></div>
  <div id="docspanel" style="display:none"></div>
  <div id="out"></div>
</main>
<div id="notif"></div>
<script>
"use strict";
const RULES = __TOKEN_RULES__.map(([k, src]) => [k, new RegExp(src, "y")]);
const COLORS = __TOKEN_COLORS__;
const $ = id => document.getElementById(id);

/* --- lexer: mirror of inputlayer_spark.syntax.tokenize --- */
function tokenize(text) {
  const toks = []; let pos = 0;
  outer: while (pos < text.length) {
    for (const [kind, re] of RULES) {
      re.lastIndex = pos;
      const m = re.exec(text);
      if (m && m.index === pos && m[0].length > 0) {
        toks.push([kind, pos, pos + m[0].length]);
        pos += m[0].length;
        continue outer;
      }
    }
    toks.push(["unknown", pos, pos + 1]); pos += 1;
  }
  return toks;
}
const esc = s => s.replace(/&/g, "&amp;").replace(/</g, "&lt;");

/* --- completion (reference gui autocomplete-popup) --- */
const WORDS = __COMPLETION_WORDS__;
let RELS = [];
// __COMPLETE_FN_START__ (extracted and node-tested in tests/test_gui.py)
function complete(before, words, relations) {
  const line = before.slice(before.lastIndexOf("\n") + 1);
  if (/^\s*\./.test(line)) {
    const frag = line.trimStart();
    return words.meta
      .filter(w => w.startsWith(frag) && w !== frag)
      .slice(0, 8)
      .map(w => ({show: w, insert: w.slice(frag.length)}));
  }
  const m = /[a-z_][A-Za-z0-9_]*$/.exec(line);
  if (!m || m[0].length < 2) return [];
  const frag = m[0];
  const seen = new Set();
  const out = [];
  for (const w of relations.concat(words.ident)) {
    if (w.startsWith(frag) && w !== frag && !seen.has(w)) {
      seen.add(w);
      out.push({show: w, insert: w.slice(frag.length)});
      if (out.length >= 8) break;
    }
  }
  return out;
}
// __COMPLETE_FN_END__
let suggestions = [];
function accept(i) {
  if (!suggestions[i]) return;
  const q = $("q");
  const pos = q.selectionStart;
  q.value = q.value.slice(0, pos) + suggestions[i].insert + q.value.slice(pos);
  q.selectionStart = q.selectionEnd = pos + suggestions[i].insert.length;
  q.focus(); highlight(); renderSuggest();
}
function renderSuggest() {
  const q = $("q");
  suggestions = complete(q.value.slice(0, q.selectionStart), WORDS, RELS);
  const bar = $("suggest"); bar.innerHTML = "";
  suggestions.forEach((s, i) => {
    const c = document.createElement("span");
    c.className = "chip"; c.textContent = s.show;
    c.onmousedown = ev => { ev.preventDefault(); accept(i); };
    bar.appendChild(c);
  });
}
function highlight() {
  const text = $("q").value;
  let html = "";
  for (const [kind, a, b] of tokenize(text)) {
    const chunk = esc(text.slice(a, b));
    const c = COLORS[kind];
    html += c ? `<span style="color:${c}">${chunk}</span>` : chunk;
  }
  $("hl").innerHTML = html + "\n";
  $("hl").scrollTop = $("q").scrollTop;
}

/* --- transport --- */
function headers() {
  const h = {"Content-Type": "application/json"};
  const k = $("key").value || localStorage.getItem("iql_key") || "";
  if (k) h["X-API-Key"] = k;
  return h;
}
async function query(program) {
  const r = await fetch("/query", {
    method: "POST", headers: headers(),
    body: JSON.stringify({query: program}),
  });
  const body = await r.json();
  if (!r.ok) throw new Error(body.error || r.statusText);
  return body.results || [];
}

/* --- graph view (reference gui/app/graph): 2-column results render
   as a node-link diagram under a deterministic force layout --- */
// __LAYOUT_FN_START__ (extracted and node-tested in tests/test_gui.py)
function layoutGraph(edges, w, h, iters) {
  const ids = [];
  const idx = new Map();
  for (const [a, b] of edges) {
    for (const v of [String(a), String(b)]) {
      if (!idx.has(v)) { idx.set(v, ids.length); ids.push(v); }
    }
  }
  const n = ids.length;
  const px = new Array(n), py = new Array(n);
  for (let i = 0; i < n; i++) {  // deterministic ring init
    const ang = (2 * Math.PI * i) / n;
    px[i] = w / 2 + (w / 3) * Math.cos(ang);
    py[i] = h / 2 + (h / 3) * Math.sin(ang);
  }
  const es = edges.map(([a, b]) => [idx.get(String(a)), idx.get(String(b))]);
  const kRep = (w * h) / Math.max(n, 1) / 50;
  for (let it = 0; it < iters; it++) {
    const fx = new Array(n).fill(0), fy = new Array(n).fill(0);
    for (let i = 0; i < n; i++) {
      for (let j = i + 1; j < n; j++) {
        let dx = px[i] - px[j], dy = py[i] - py[j];
        const d2 = dx * dx + dy * dy + 0.01;
        const f = kRep / d2;
        dx *= f; dy *= f;
        fx[i] += dx; fy[i] += dy; fx[j] -= dx; fy[j] -= dy;
      }
    }
    for (const [a, b] of es) {
      if (a === b) continue;
      const dx = px[b] - px[a], dy = py[b] - py[a];
      fx[a] += dx * 0.1; fy[a] += dy * 0.1;
      fx[b] -= dx * 0.1; fy[b] -= dy * 0.1;
    }
    const damp = 1 - it / iters;
    for (let i = 0; i < n; i++) {
      px[i] += Math.max(-8, Math.min(8, fx[i])) * damp;
      py[i] += Math.max(-8, Math.min(8, fy[i])) * damp;
      px[i] = Math.max(14, Math.min(w - 14, px[i]));
      py[i] = Math.max(14, Math.min(h - 14, py[i]));
    }
  }
  return {ids, x: px, y: py, edges: es};
}
// __LAYOUT_FN_END__
function drawGraph(canvas, edges) {
  const ctx = canvas.getContext("2d");
  const w = canvas.width, h = canvas.height;
  const g = layoutGraph(edges.slice(0, 400), w, h, 150);
  ctx.clearRect(0, 0, w, h);
  ctx.strokeStyle = "#30363d";
  for (const [a, b] of g.edges) {
    ctx.beginPath();
    ctx.moveTo(g.x[a], g.y[a]); ctx.lineTo(g.x[b], g.y[b]); ctx.stroke();
    const dx = g.x[b] - g.x[a], dy = g.y[b] - g.y[a];
    const len = Math.hypot(dx, dy) || 1;
    const tx = g.x[b] - (dx / len) * 12, ty = g.y[b] - (dy / len) * 12;
    ctx.beginPath();  // arrowhead
    ctx.moveTo(tx - dy / len * 3, ty + dx / len * 3);
    ctx.lineTo(g.x[b] - (dx / len) * 6, g.y[b] - (dy / len) * 6);
    ctx.lineTo(tx + dy / len * 3, ty - dx / len * 3);
    ctx.stroke();
  }
  ctx.font = "10px ui-monospace, monospace";
  for (let i = 0; i < g.ids.length; i++) {
    ctx.fillStyle = "#58a6ff";
    ctx.beginPath(); ctx.arc(g.x[i], g.y[i], 5, 0, 7); ctx.fill();
    ctx.fillStyle = "#e6edf3";
    ctx.fillText(g.ids[i].slice(0, 12), g.x[i] + 7, g.y[i] + 3);
  }
}

/* --- results rendering --- */
const MAX_ROWS = 500;
function renderResults(results, secs) {
  const out = $("out"); out.innerHTML = "";
  results.forEach(res => {
    const div = document.createElement("div"); div.className = "result";
    const n = res.rows.length;
    const meta = document.createElement("div"); meta.className = "meta";
    meta.textContent = `${n} row${n === 1 ? "" : "s"}` +
      (n > MAX_ROWS ? ` (showing first ${MAX_ROWS})` : "");
    if (res.columns.length === 2 && n > 0 && n <= 400) {
      const gb = document.createElement("a");
      gb.textContent = " · graph";
      gb.style.cssText = "cursor:pointer;color:var(--accent)";
      gb.onclick = () => {
        let cv = div.querySelector("canvas");
        if (cv) { cv.remove(); return; }
        cv = document.createElement("canvas");
        cv.width = 640; cv.height = 420;
        cv.style.cssText =
          "background:var(--panel);border:1px solid var(--border);" +
          "border-radius:8px;margin-top:6px;display:block";
        div.appendChild(cv);
        drawGraph(cv, res.rows);
      };
      meta.appendChild(gb);
    }
    div.appendChild(meta);
    const t = document.createElement("table");
    const hr = t.insertRow();
    res.columns.forEach(c => {
      const th = document.createElement("th");
      th.textContent = `${c.name}: ${c.type}`; hr.appendChild(th);
    });
    res.rows.slice(0, MAX_ROWS).forEach(row => {
      const tr = t.insertRow();
      row.forEach(v => {
        tr.insertCell().textContent =
          v === null ? "null" : typeof v === "object" ? JSON.stringify(v) : v;
      });
    });
    div.appendChild(t); out.appendChild(div);
  });
  $("timing").textContent = `${results.length} result` +
    `${results.length === 1 ? "" : "s"} · ${secs.toFixed(2)}s`;
}
function renderError(msg) {
  const out = $("out");
  const div = document.createElement("div");
  div.className = "error"; div.textContent = msg;
  out.prepend(div);
}

/* --- database management (reference gui/app/database): list KGs with
   the current one marked, create, switch, drop-with-confirm, per-KG
   relation counts, ACL listing when an auth store is configured --- */
// __DB_OPS_FN_START__ (extracted and node-tested in tests/test_gui.py)
function dbOps(kgRows, currentKg) {
  // pure view-model: [{name, current, canDrop}] sorted, default first
  const rows = kgRows
    .map(r => ({name: String(r[0]),
                current: String(r[0]) === String(currentKg)}))
    .sort((a, b) =>
      (a.name === "default" ? -1 : b.name === "default" ? 1 : 0) ||
      a.name.localeCompare(b.name));
  for (const r of rows) r.canDrop = r.name !== "default";
  return rows;
}
// __DB_OPS_FN_END__
async function loadDbPanel() {
  const panel = $("dbpanel");
  panel.innerHTML = "";
  const head = document.createElement("div");
  head.className = "meta";
  head.textContent = "Knowledge graphs";
  panel.appendChild(head);
  let kgRows = [];
  try { const [kgs] = await query(".kg list"); kgRows = kgs.rows; }
  catch (e) { renderError(e.message); return; }
  const cur = kgRows.find(r => r[1] === true || r[1] === "true");
  const t = document.createElement("table");
  const hr = t.insertRow();
  for (const htxt of ["name", "", "relations", "actions"]) {
    const th = document.createElement("th");
    th.textContent = htxt; hr.appendChild(th);
  }
  for (const row of dbOps(kgRows, cur ? cur[0] : "default")) {
    const tr = t.insertRow();
    tr.insertCell().textContent = row.name;
    tr.insertCell().textContent = row.current ? "◉ current" : "";
    const relc = tr.insertCell();
    if (row.current) {
      // count only for the current KG: probing others would move the
      // shared engine's KG cursor mid-flight (racy for other clients)
      relc.textContent = "…";
      query(".rel list")
        .then(rs => { relc.textContent = String(rs[0].rows.length); })
        .catch(() => { relc.textContent = "?"; });
    } else {
      relc.textContent = "—";
    }
    const act = tr.insertCell();
    const useB = document.createElement("button");
    useB.className = "ghost"; useB.textContent = "use";
    useB.onclick = async () => {
      try {
        await query(`.kg use ${row.name}`);
        // only reflect the switch in the header once it SUCCEEDED — a
        // 403 must not leave the dropdown claiming a KG we're not on
        $("kg").value = row.name;
      } catch (e) { renderError(e.message); }
      loadSidebar(); loadDbPanel();
    };
    act.appendChild(useB);
    if (row.canDrop) {
      const dropB = document.createElement("button");
      dropB.className = "ghost"; dropB.textContent = "drop";
      dropB.onclick = async () => {
        if (!confirm(`Drop knowledge graph '${row.name}'? This deletes ` +
                     "its relations and rules.")) return;
        try { await query(`.kg drop ${row.name}`); } catch (e) { renderError(e.message); }
        loadSidebar(); loadDbPanel();
      };
      act.appendChild(dropB);
    }
    const aclB = document.createElement("button");
    aclB.className = "ghost"; aclB.textContent = "acls";
    aclB.onclick = async () => {
      try {
        const [acls] = await query(`.kg acl list ${row.name}`);
        renderResults([acls], 0);
      } catch (e) { renderError(e.message); }
    };
    act.appendChild(aclB);
  }
  panel.appendChild(t);
  const form = document.createElement("div");
  form.style.marginTop = "6px";
  const inp = document.createElement("input");
  inp.placeholder = "new knowledge graph name";
  inp.style.width = "220px";
  const mk = document.createElement("button");
  mk.textContent = "Create";
  mk.onclick = async () => {
    const name = inp.value.trim();
    if (!name) return;
    try { await query(`.kg create ${name}`); inp.value = ""; }
    catch (e) { renderError(e.message); }
    loadSidebar(); loadDbPanel();
  };
  form.appendChild(inp); form.appendChild(mk);
  panel.appendChild(form);
}

/* --- docs panel (reference gui/app/docs): fetch /docs markdown and
   render with a tiny, safe subset renderer --- */
// __MD_FN_START__ (extracted and node-tested in tests/test_gui.py)
function mdRender(src, escFn) {
  // minimal markdown: headings, fenced code, inline code, tables,
  // paragraphs. Everything is escaped FIRST — no raw HTML passthrough.
  const out = [];
  const lines = src.split("\n");
  let i = 0, para = [];
  const flush = () => {
    if (para.length) { out.push("<p>" + para.join(" ") + "</p>"); para = []; }
  };
  const inline = s => escFn(s)
    .replace(/`([^`]+)`/g, "<code>$1</code>")
    .replace(/\*\*([^*]+)\*\*/g, "<b>$1</b>");
  while (i < lines.length) {
    const ln = lines[i];
    if (/^```/.test(ln)) {
      flush();
      const buf = [];
      i++;
      while (i < lines.length && !/^```/.test(lines[i])) buf.push(lines[i++]);
      i++;  // closing fence
      out.push("<pre><code>" + escFn(buf.join("\n")) + "</code></pre>");
      continue;
    }
    const h = /^(#{1,4})\s+(.*)$/.exec(ln);
    if (h) { flush(); out.push(`<h${h[1].length + 1}>` + inline(h[2]) +
                               `</h${h[1].length + 1}>`); i++; continue; }
    if (/^\|/.test(ln)) {
      flush();
      const rows = [];
      while (i < lines.length && /^\|/.test(lines[i])) {
        const cells = lines[i].replace(/^\||\|$/g, "").split("|");
        // the separator row is one where EVERY cell is only
        // dashes/colons — judging by the first cell alone dropped a
        // data row whose first cell was dash-like (e.g. `---`) and
        // rendered a separator with a non-dash first cell as data
        if (!cells.every(c => /^\s*:?-+:?\s*$/.test(c))) {
          rows.push(cells.map(c => inline(c.trim())));
        }
        i++;
      }
      let t = "<table>";
      rows.forEach((r, ri) => {
        t += "<tr>" + r.map(c =>
          ri === 0 ? `<th>${c}</th>` : `<td>${c}</td>`).join("") + "</tr>";
      });
      out.push(t + "</table>");
      continue;
    }
    if (/^\s*-\s+/.test(ln)) {
      flush();
      let ul = "<ul>";
      while (i < lines.length && /^\s*-\s+/.test(lines[i])) {
        let item = lines[i].replace(/^\s*-\s+/, "");
        // continuation lines (indented, not a new bullet/blank)
        while (i + 1 < lines.length && /^\s+\S/.test(lines[i + 1]) &&
               !/^\s*-\s+/.test(lines[i + 1])) { item += " " + lines[++i].trim(); }
        ul += "<li>" + inline(item) + "</li>"; i++;
      }
      out.push(ul + "</ul>");
      continue;
    }
    if (ln.trim() === "") { flush(); i++; continue; }
    para.push(inline(ln.trim())); i++;
  }
  flush();
  return out.join("\n");
}
// __MD_FN_END__
async function loadDocsPanel(page) {
  const panel = $("docspanel");
  panel.innerHTML = "";
  try {
    const idx = await (await fetch("/docs")).json();
    const nav = document.createElement("div");
    nav.className = "meta";
    idx.pages.forEach(p => {
      const a = document.createElement("a");
      a.textContent = p.title;
      a.style.cssText = "cursor:pointer;color:var(--accent);margin-right:14px";
      a.onclick = () => loadDocsPanel(p.name);
      nav.appendChild(a);
    });
    panel.appendChild(nav);
    const name = page || (idx.pages[0] && idx.pages[0].name);
    if (!name) return;
    const md = await (await fetch("/docs/" + encodeURIComponent(name))).text();
    const body = document.createElement("div");
    body.className = "result";
    body.innerHTML = mdRender(md, esc);
    panel.appendChild(body);
  } catch (e) { renderError(e.message); }
}

/* --- actions --- */
let history = JSON.parse(localStorage.getItem("iql_history") || "[]");
function renderHistory() {
  const h = $("history"); h.innerHTML = "";
  history.slice(0, 30).forEach(q => {
    const d = document.createElement("div");
    d.className = "hist"; d.textContent = q.replace(/\s+/g, " ");
    d.title = q;
    d.onclick = () => { $("q").value = q; highlight(); };
    h.appendChild(d);
  });
}
async function run() {
  const program = $("q").value.trim();
  if (!program) return;
  localStorage.setItem("iql_key", $("key").value || "");
  $("timing").textContent = "running…";
  const t0 = performance.now();
  try {
    const kg = $("kg").value;
    const prefixed = kg && kg !== "default"
      ? `.kg use ${kg}\n${program}` : program;
    const results = await query(prefixed);
    renderResults(results, (performance.now() - t0) / 1000);
    history = [program, ...history.filter(q => q !== program)].slice(0, 50);
    localStorage.setItem("iql_history", JSON.stringify(history));
    renderHistory();
    loadSidebar();
  } catch (e) {
    $("timing").textContent = "";
    renderError(e.message);
  }
}
async function loadSidebar() {
  try {
    const [rels] = await query(".rel list");
    RELS = rels.rows.map(r => String(r[0]));
    const ul = $("rels"); ul.innerHTML = "";
    rels.rows.forEach(r => {
      const li = document.createElement("li");
      li.textContent = r.join("  ");
      li.title = "describe " + r[0];
      li.onclick = () => {
        $("q").value = `.rel describe ${r[0]}`; highlight(); run();
      };
      ul.appendChild(li);
    });
    const [kgs] = await query(".kg list");
    const sel = $("kg"), cur = sel.value;
    sel.innerHTML = "";
    kgs.rows.forEach(r => {
      const o = document.createElement("option");
      o.value = o.textContent = r[0]; sel.appendChild(o);
    });
    if ([...sel.options].some(o => o.value === cur)) sel.value = cur;
  } catch (e) { /* sidebar is best-effort (e.g. before a key is set) */ }
}
async function pollHealth() {
  try {
    const r = await fetch("/health");
    $("dot").classList.toggle("ok", r.ok);
  } catch (e) { $("dot").classList.remove("ok"); }
}

/* --- change notifications over the wire protocol's websocket --- */
async function connectWS() {
  try {
    const proto = location.protocol === "https:" ? "wss" : "ws";
    // browsers cannot set headers on a WS handshake: mint a one-time
    // short-lived ticket over the authenticated POST instead of putting
    // the long-lived API key in the URL (it would persist in logs)
    let q = "";
    const k = $("key").value || localStorage.getItem("iql_key") || "";
    if (k) {
      const r = await fetch("/ws_ticket", {method: "POST", headers: headers()});
      if (r.ok) q = "?ticket=" + encodeURIComponent((await r.json()).ticket);
    }
    const ws = new WebSocket(`${proto}://${location.host}/ws${q}`);
    ws.onmessage = ev => {
      let msg; try { msg = JSON.parse(ev.data); } catch { return; }
      if (msg.type === "persistent_update" || msg.type === "notification") {
        const t = document.createElement("div");
        t.className = "toast";
        t.textContent = `change: ${msg.relation || JSON.stringify(msg)}`;
        $("notif").appendChild(t);
        setTimeout(() => t.remove(), 6000);
        loadSidebar();
      }
    };
    ws.onclose = () => setTimeout(connectWS, 5000);
  } catch (e) { /* ws optional */ }
}

/* --- wiring --- */
$("q").addEventListener("input", () => { highlight(); renderSuggest(); });
$("q").addEventListener("scroll", () => { $("hl").scrollTop = $("q").scrollTop; });
$("q").addEventListener("keydown", ev => {
  if ((ev.ctrlKey || ev.metaKey) && ev.key === "Enter") { ev.preventDefault(); run(); }
  else if (ev.key === "Tab" && suggestions.length) { ev.preventDefault(); accept(0); }
  else if (ev.key === "Escape") { suggestions = []; $("suggest").innerHTML = ""; }
});
$("run").onclick = run;
$("dbbtn").onclick = () => {
  const p = $("dbpanel");
  const show = p.style.display === "none";
  p.style.display = show ? "block" : "none";
  if (show) loadDbPanel();
};
$("docsbtn").onclick = () => {
  const p = $("docspanel");
  const show = p.style.display === "none";
  p.style.display = show ? "block" : "none";
  if (show) loadDocsPanel();
};
$("clear").onclick = () => { $("q").value = ""; highlight(); $("out").innerHTML = ""; };
$("refresh").onclick = loadSidebar;
$("key").value = localStorage.getItem("iql_key") || "";
renderHistory(); highlight(); loadSidebar(); pollHealth(); connectWS();
setInterval(pollHealth, 10000);
</script>
</body>
</html>
"""
