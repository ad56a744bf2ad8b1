"""Public marketing/landing site for the engine — the PySpark analog of
the reference's Next.js `front/` app and its `content/` corpus
(`/root/reference/front/app/{page,blog,compare,use-cases,customers}`,
`/root/reference/content/{blog,compare,use-cases,customers}`): the same
information architecture (landing hero + feature grid, a blog, compare
pages, use-case pages, case studies), served as static server-rendered
HTML from the same stdlib HTTP server that hosts the console — no
Node/Next in this stack, and every data claim in the copy is about THIS
engine (all copy is original; only the section layout mirrors the
reference).

Routes (wired in server.py):
    /front                      landing page
    /front/blog                 blog index
    /front/blog/<slug>          one post
    /front/compare              compare index
    /front/compare/<slug>       one comparison
    /front/use-cases/<slug>     one use case
    /front/customers            case studies
"""

from __future__ import annotations

import html as _html
import re as _re

_CSS = """
body{font-family:system-ui,-apple-system,sans-serif;margin:0;color:#1a1d23;
background:#fff;line-height:1.55}
a{color:#2456d6;text-decoration:none}a:hover{text-decoration:underline}
header{border-bottom:1px solid #e5e8ee;padding:14px 28px;display:flex;
gap:22px;align-items:baseline}
header .brand{font-weight:700;font-size:17px;color:#111}
main{max-width:880px;margin:0 auto;padding:28px}
.hero{padding:46px 0 30px}.hero h1{font-size:34px;margin:0 0 10px}
.hero p{font-size:18px;color:#444;max-width:640px}
.grid{display:grid;grid-template-columns:repeat(auto-fill,minmax(250px,1fr));
gap:16px;margin:26px 0}
.card{border:1px solid #e5e8ee;border-radius:8px;padding:16px}
.card h3{margin:0 0 6px;font-size:15px}.card p{margin:0;font-size:13.5px;
color:#555}
pre{background:#f6f8fa;border:1px solid #e5e8ee;border-radius:8px;
padding:14px;overflow-x:auto;font-size:13px}
h2{margin-top:34px}article p{max-width:720px}
.meta{color:#777;font-size:13px}
footer{border-top:1px solid #e5e8ee;margin-top:48px;padding:18px 28px;
color:#888;font-size:13px}
"""

_NAV = (
    '<header><span class="brand"><a href="/front">InputLayer-Spark</a></span>'
    '<a href="/front/blog">Blog</a><a href="/front/compare">Compare</a>'
    '<a href="/front/use-cases/agentic-ai">Use cases</a>'
    '<a href="/front/customers">Case studies</a>'
    '<a href="/docs">Docs</a><a href="/">Console</a></header>'
)


def _page(title: str, body: str) -> str:
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        "<meta name='viewport' content='width=device-width,initial-scale=1'>"
        f"<style>{_CSS}</style></head><body>{_NAV}<main>{body}</main>"
        "<footer>InputLayer-Spark — a streaming reasoning layer on Apache "
        "Spark. Apache-style open data plane; run it next to the data you "
        "already have.</footer></body></html>"
    )


_QUICKSTART = """from inputlayer_spark import IQLEngine, get_spark

spark = get_spark("app")
eng = IQLEngine(spark)
eng.register("orders", spark.read.parquet("s3://lake/orders"))

eng.execute('''
+big_customers(C, sum&lt;T&gt;) &lt;- orders(_, C, _, T, _, _)
?big_customers(C, Total)
''')"""


def landing_html() -> str:
    body = (
        '<div class="hero"><h1>Reason over your lake, incrementally.</h1>'
        "<p>InputLayer-Spark is a streaming reasoning layer for Apache "
        "Spark: Datalog rules with recursion, negation and aggregates, "
        "vector and temporal builtins, and materialized views that update "
        "in O(change) — all compiled to DataFrame plans Catalyst can "
        "optimize, over the parquet you already store.</p></div>"
        '<div class="grid">'
        '<div class="card"><h3>Incremental views</h3><p>Persistent rules '
        "are materialized and maintained on insert AND retract — DRed "
        "through recursion, delta merges for aggregates — so derived "
        "facts are never stale.</p></div>"
        '<div class="card"><h3>Recursive queries</h3><p>Transitive '
        "closure, reachability and same-generation run as semi-naive "
        "fixpoints with magic-set demand pruning; a ~1M-pair closure "
        "answers in seconds on a laptop-class box.</p></div>"
        '<div class="card"><h3>Vector search inside rules</h3><p>HNSW, '
        "IVF and LSH indexes participate in Datalog bodies: join graph "
        "context with nearest neighbours in one declarative query."
        "</p></div>"
        '<div class="card"><h3>Provenance</h3><p><code>.why</code> shows '
        "the proof tree behind any derived fact; <code>.why_not</code> "
        "explains absences. Answers you can audit.</p></div>"
        '<div class="card"><h3>Multi-tenant KGs</h3><p>Namespaced '
        "knowledge graphs with per-KG ACLs, session overlays and "
        "lock-free snapshot reads.</p></div>"
        '<div class="card"><h3>Training-data curation</h3><p>MinHash and '
        "semantic dedup, BM25 retrieval, Gopher quality gates, BPE "
        "training, packing and splits — the 100&nbsp;TB pipeline toolkit, "
        "built in.</p></div></div>"
        "<h2>Ten lines to first answer</h2>"
        f"<pre>{_QUICKSTART}</pre>"
        "<p>Then open the <a href='/'>web console</a>, connect the "
        "<a href='/docs'>Python or JS client</a>, or serve the engine over "
        "HTTP/WebSocket with one command.</p>"
    )
    return _page("InputLayer-Spark — streaming reasoning on Spark", body)


# --------------------------------------------------------------- blog

BLOG_POSTS: dict[str, tuple[str, str]] = {
    "recursive-queries-on-spark": (
        "Recursive queries without a graph database",
        """
<p>Most lakes answer "who bought what". The questions that matter are
recursive: who is reachable from this account, which parts feed this
assembly, which documents cite documents that cite this one. The usual
answer is to copy data into a graph database; ours is to compile the
recursion onto the engine you already run.</p>
<p>InputLayer-Spark executes recursive Datalog as a semi-naive fixpoint
of DataFrame plans: each round joins only the NEW facts (the delta)
against the rules, unions, and de-duplicates with a broadcast anti-join
while the closure stays pinned in memory. Chain-shaped rules switch to
blocked doubling — squaring the reachability relation — which takes the
round count from diameter to log(diameter). Bound queries
(<code>?reach("acme", X)</code>) are rewritten with magic sets so the
fixpoint only ever derives facts the question can use.</p>
<p>The result: a two-thousand-node, four-thousand-edge benchmark graph
whose closure holds about a million pairs completes in single-digit
seconds on one machine, and the same plan distributes untouched —
the fixpoint is ordinary shuffles and joins Spark already knows how to
scale.</p>
""",
    ),
    "deletes-should-delete": (
        "Why deletes should actually delete",
        """
<p>Incremental view maintenance is easy to demo with inserts and easy
to get wrong with deletes. If a fact is retracted, every derived fact
that depended on it must go too — unless it has another derivation.
Systems that approximate this (recompute nightly, or ignore retractions
in recursive views) serve stale derived data in between.</p>
<p>We implement delete/rederive (DRed) through recursive views: the
retraction over-deletes everything the fact could have supported, then
re-derives what still has an alternative proof, and only the true
difference is applied to the materialization. Aggregate views take the
cheaper path — sum and count merge the delta directly; min and max
re-aggregate only the touched groups.</p>
<p>The test that keeps this honest runs random insert/retract
interleavings against a from-scratch recomputation and requires the two
to agree exactly — on every round, including through recursion. If your
reasoning layer remembers things you deleted, it is not a reasoning
layer; it is a liability.</p>
""",
    ),
    "when-similarity-is-not-enough": (
        "When vector similarity is not enough",
        """
<p>Vector search answers "what looks like this?". Most production
questions are "what looks like this, is owned by that team, was active
this quarter, and is transitively connected to an incident?" — a join
of similarity with structure. Doing the similarity in one system and
the structure in another means glue code, double storage, and answers
assembled in application logic where no optimizer can see them.</p>
<p>Here, <code>hnsw_nearest</code> is a body atom like any other: the
planner probes the index, reranks exactly, and feeds the neighbours
into the rest of the rule — joins, negation, temporal windows,
recursion. One declarative query, one plan, one place to audit.</p>
<p>Similarity gets you candidates. Reasoning gets you answers.</p>
""",
    ),
    "curating-100tb": (
        "Curating 100 TB of training data with twenty operators",
        """
<p>Training-data pipelines are where engines go to die: every team
rebuilds dedup, quality gates, splits and packing as one-off jobs. We
ship them as first-class operators with the same contract as the query
engine — deterministic, oracle-tested against an independent SQL
engine, and shaped for the 100&nbsp;TB path.</p>
<p>Deduplication runs at every granularity: exact hashes, MinHash-LSH
banding for near-dups, corpus-level line dedup for boilerplate,
exact-substring span removal, and SemDeDup-style semantic pruning
confined to embedding clusters. Quality is layered the same way —
Gopher rule batteries, bigram language-model scoring, compression
signals, source-level domain gates — and selection closes the loop with
DSIR importance weights and leakage-safe splits.</p>
<p>Everything is a shuffle-disciplined DataFrame plan: hash keys
instead of documents on the wire, broadcasts only for tables that are
bounded by construction, no Python in the hot path. The operators that
look quadratic (near-dup, semantic dedup) are banded or
cluster-confined so they scale linearly with the corpus.</p>
""",
    ),
}


def blog_index_html() -> str:
    items = "".join(
        f'<div class="card"><h3><a href="/front/blog/{slug}">'
        f"{_html.escape(title)}</a></h3></div>"
        for slug, (title, _) in BLOG_POSTS.items()
    )
    return _page("Blog — InputLayer-Spark", f"<h1>Blog</h1><div class='grid'>{items}</div>")


def blog_post_html(slug: str) -> "str | None":
    post = BLOG_POSTS.get(slug or "")
    if post is None:
        return None
    title, body = post
    return _page(
        f"{title} — InputLayer-Spark",
        f"<article><h1>{_html.escape(title)}</h1>{body}</article>"
        "<p><a href='/front/blog'>&larr; all posts</a></p>",
    )


# ------------------------------------------------------------- compare

COMPARE_PAGES: dict[str, tuple[str, str]] = {
    "vs-vector-databases": (
        "vs. vector databases",
        """
<p>A vector database gives you approximate nearest neighbours over one
embedding space. InputLayer-Spark gives you nearest neighbours AS A
JOIN INPUT: the HNSW/IVF/LSH probe is an atom in a Datalog rule, so
similarity composes with ownership, time, negation and recursion inside
one optimized plan.</p>
<p>You also keep your storage: indexes are built over parquet you
already have, with the same WAL-backed durability as every relation —
no second copy of your corpus living inside a search appliance.</p>
""",
    ),
    "vs-graph-databases": (
        "vs. graph databases",
        """
<p>Graph databases excel at pointer-chasing traversals, but most
"graph" workloads in practice are recursive JOINS over tabular data
that already lives in a lake. InputLayer-Spark runs those as semi-naive
fixpoints with magic-set pruning directly over parquet — no ETL into a
proprietary store, and the non-graph 90% of your query (aggregates,
filters, vectors, time) runs in the same plan.</p>
<p>Derived relations are materialized views with incremental insert AND
retract maintenance, so "the graph" is always current without nightly
rebuilds.</p>
""",
    ),
    "vs-all-in-one-ai-stacks": (
        "vs. all-in-one AI data stacks",
        """
<p>Bundled AI-data platforms couple storage, search and orchestration
behind one API — convenient until your data, scale or cloud stops
matching their assumptions. InputLayer-Spark is a LAYER, not a
platform: it runs on stock Apache Spark, reads open formats, and its
whole query surface (IQL, HTTP, WebSocket, Python/JS clients) is
replaceable piecemeal.</p>
<p>Reasoning — rules, recursion, provenance, incremental views — is the
part you cannot bolt on later; storage and scheduling are the parts you
already have. We ship the former and refuse to own the latter.</p>
""",
    ),
}


def compare_index_html() -> str:
    items = "".join(
        f'<div class="card"><h3><a href="/front/compare/{slug}">'
        f"InputLayer-Spark {_html.escape(title)}</a></h3></div>"
        for slug, (title, _) in COMPARE_PAGES.items()
    )
    return _page(
        "Compare — InputLayer-Spark", f"<h1>Compare</h1><div class='grid'>{items}</div>"
    )


def compare_page_html(slug: str) -> "str | None":
    page = COMPARE_PAGES.get(slug or "")
    if page is None:
        return None
    title, body = page
    return _page(
        f"InputLayer-Spark {title}",
        f"<article><h1>InputLayer-Spark {_html.escape(title)}</h1>{body}"
        "</article><p><a href='/front/compare'>&larr; all comparisons</a></p>",
    )


# ----------------------------------------------------------- use cases

USE_CASES: dict[str, tuple[str, str]] = {
    "agentic-ai": (
        "Agentic AI memory",
        """
<p>Agents fail in two characteristic ways: they act on stale state, and
they cannot explain why they acted. Both are data-layer problems.
InputLayer-Spark gives an agent a knowledge graph whose derived facts
update incrementally as observations stream in — when a fact is
retracted, every conclusion built on it disappears with it — and whose
every answer carries a proof tree (<code>.why</code>) the agent, or its
operator, can inspect.</p>
<p>Session overlays let an agent explore hypotheticals ("assume the
shipment is late — what breaks?") against private ephemeral facts
without touching shared state; vector indexes let episodic memory
(embeddings) join with semantic memory (rules) in one query. The
<code>.agent</code> surface wires any LLM provider to the engine with
scripted lessons for grounding.</p>
""",
    ),
}


def use_case_html(slug: str) -> "str | None":
    page = USE_CASES.get(slug or "")
    if page is None:
        return None
    title, body = page
    return _page(
        f"{title} — InputLayer-Spark",
        f"<article><h1>{_html.escape(title)}</h1>{body}</article>",
    )


# ----------------------------------------------------------- customers

def customers_html() -> str:
    body = """
<h1>Case studies</h1>
<p class="meta">Illustrative end-to-end scenarios shipped with the
engine — run them yourself with <code>python -m inputlayer_spark.demo
--scenario retail</code> (or <code>embedding</code>).</p>
<div class="grid">
<div class="card"><h3>Grocery replenishment</h3><p>A retail chain
models stores, stock and suppliers as relations; replenishment
candidates are a rule over stock levels and supplier lead times, with
vector search surfacing substitutable products. The demo seeds the KG,
asks the question, and shows the proof tree for one recommendation.
</p></div>
<div class="card"><h3>Embedded analytics library</h3><p>A Python
service embeds the engine directly: multiple isolated knowledge graphs,
WAL-backed durability with crash recovery, concurrent lock-free readers
— the library walkthrough in <a href="/docs/embedding">docs/embedding
</a> narrates every step.</p></div>
</div>
"""
    return _page("Case studies — InputLayer-Spark", body)


def route(path: str) -> "str | None":
    """Resolve a /front... path to rendered HTML, or None for 404.
    Slugs are sanitized to bare identifiers — no traversal."""
    path = (path or "").split("?", 1)[0].rstrip("/") or "/front"
    if path == "/front":
        return landing_html()
    m = _re.fullmatch(r"/front/([a-z-]+)(?:/([A-Za-z0-9_-]+))?", path)
    if not m:
        return None
    section, slug = m.group(1), m.group(2)
    if section == "blog":
        return blog_index_html() if slug is None else blog_post_html(slug)
    if section == "compare":
        return compare_index_html() if slug is None else compare_page_html(slug)
    if section == "use-cases" and slug is not None:
        return use_case_html(slug)
    if section == "customers" and slug is None:
        return customers_html()
    return None
