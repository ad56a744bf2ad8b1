"""Sample application: seed + query the engine over the wire protocol.

Reference parity: demo/src/index.ts (connect admin client, seed KGs
from seeds/*.iql, serve) + examples/retail/printer-ink.iql (the
recommendation walkthrough). Everything here goes through the HTTP
wire client — no direct engine access — so this doubles as an
end-to-end smoke of the server + client + engine stack.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "seeds")


def _strip_comment(line: str) -> str:
    """Drop a trailing `//` comment, honoring double-quoted strings —
    a `//` inside quotes is data, a `//` after a quoted value is still
    a comment (the `'\"' not in line` heuristic got that wrong)."""
    in_str = False
    i = 0
    while i < len(line):
        c = line[i]
        if c == '"':
            # IQL string literals use "" to escape a quote
            if in_str and i + 1 < len(line) and line[i + 1] == '"':
                i += 2
                continue
            in_str = not in_str
        elif not in_str and c == "/" and line[i : i + 2] == "//":
            return line[:i].rstrip()
        i += 1
    return line


def parse_statements(content: str) -> list[str]:
    """Split an .iql seed into executable statements: blank lines
    separate; `//` comments stripped (string-aware); multi-line
    statements (a rule body continuing after `<-` or `,`) are joined —
    the same scheme the reference seeder uses (demo/src/seeder.ts
    parseStatements)."""
    statements: list[str] = []
    current = ""
    for line in content.split("\n"):
        stripped = line.strip()
        if stripped.startswith("//"):
            continue
        stripped = _strip_comment(stripped)
        if stripped == "":
            if current.strip():
                statements.append(current.strip())
            current = ""
            continue
        starts_new = stripped.startswith(("+", ".", "?", "-"))
        continuing = current.rstrip().endswith(("<-", ","))
        if starts_new and current.strip() and not continuing:
            statements.append(current.strip())
            current = stripped
        else:
            current = (current + "\n" + stripped) if current else stripped
    if current.strip():
        statements.append(current.strip())
    return statements


def seed(client, path: str) -> int:
    n = 0
    with open(path) as fh:
        for st in parse_statements(fh.read()):
            client.execute(st)
            n += 1
    return n


def show(title: str, rs) -> None:
    print(f"\n== {title}")
    cols = list(rs.columns)
    print("   " + " | ".join(cols))
    for row in rs.to_tuples():
        print("   " + " | ".join(str(v) for v in row))


RANKED = (
    '?pitch("amara", Part), part(Part, Desc, Price, E), asked(Q), '
    "D = cosine(E, Q), D < 0.05"
)


def espresso_walkthrough(client) -> None:
    n = seed(client, os.path.join(SEEDS_DIR, "espresso.iql"))
    print(f"[demo] seeded espresso_demo ({n} statements)")

    show("everything that fits amara's machines", client.query(
        '?relevant("amara", Part)'
    ))
    show("in stock too (21g basket drops: 0 on hand)", client.query(
        '?pitch("amara", Part)'
    ))
    show("vector-ranked recommendations", client.query(RANKED))

    print("\n[demo] the last shower screen sells mid-session ...")
    client.execute('-stocked("e61-shower-screen", 12)\n'
                   '+stocked("e61-shower-screen", 0)')
    show("re-query: shower screen gone", client.query(RANKED))

    print("\n[demo] amara buys a moka pot ...")
    client.execute(
        '+owns("amara", "bialetti-3c", "2026-08-15")\n'
        '+fits("bialetti-3c", "moka-gasket-3c")'
    )
    show("re-query: gasket appears", client.query(RANKED))

    show("provenance: why is the 18g basket pitched?", client.query(
        '.why pitch("amara", "e61-basket-18g")'
    ))


def retail_walkthrough(client) -> None:
    """Scenario 2 (seeds/retail.iql): recursion through the delivery
    graph, a real HNSW index over catalogue embeddings, and live
    maintenance — a new route extends the materialized closure, a
    restock retracts order lines — all over the wire client."""
    n = seed(client, os.path.join(SEEDS_DIR, "retail.iql"))
    print(f"[demo] seeded retail_ops ({n} statements)")

    show("shelves below their reorder point", client.query(
        "?needs_restock(Store, Sku)"
    ))
    show("order plan (supplier must make the sku AND reach the store)",
         client.query("?order_line(Store, Sku, Supplier)"))
    show("supplier workload", client.query("?supplier_load(Supplier, N)"))

    # ferment-co makes kimchi but only ships via d_south -> s_cedar;
    # s_birch needs kimchi and is unreachable — until a route appears
    print("\n[demo] new delivery route: d_south starts serving s_birch ...")
    client.execute('+route[("d_south", "s_birch")]')
    show("re-query: kimchi order line appears (closure extended)",
         client.query('?order_line("s_birch", Sku, Supplier)'))

    print("\n[demo] oat milk restocked at s_alder ...")
    client.execute('-shelf("s_alder", "oat-milk-1l", 4, 10)\n'
                   '+shelf[("s_alder", "oat-milk-1l", 30, 10)]')
    show("re-query: oat milk drops out of the plan",
         client.query('?order_line("s_alder", Sku, Supplier)'))

    show("index-served search: 'plant milk' embedding, top 2", client.query(
        "?hnsw_nearest(idx_catalog, [0.87, 0.2, 0.35, 0.12], 2, Sku, D)"
    ))
    show("provenance: why does grove-dairy restock s_alder's cold brew?",
         client.query('.why order_line("s_alder", "cold-brew-330", '
                      '"grove-dairy")'))




def embedding_walkthrough(spark) -> None:
    """Library-embedding narrative (docs/embedding.md): the Python-API
    analog of the reference's examples/storage_demo.rs (multi-KG
    isolation, WAL persistence -> compaction -> recovery) and
    examples/parallel_queries.rs (concurrent queries against one
    engine). Drives IQLEngine DIRECTLY — no server, no wire client."""
    import tempfile
    import time
    from concurrent.futures import ThreadPoolExecutor

    from inputlayer_spark import IQLEngine

    wal = tempfile.mkdtemp(prefix="inputlayer-embed-")
    print(f"[embed] WAL dir: {wal}")

    # --- storage_demo: multiple KGs, isolation ----------------------
    eng = IQLEngine(spark, wal_dir=wal)
    for kg in ("analytics", "staging", "production"):
        eng.execute(f".kg create {kg}")
    eng.execute(".kg use analytics")
    eng.execute("+edge[(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7), (7, 8)]")
    eng.execute("+person[(1, 100), (2, 200), (3, 300), (4, 400), (5, 500)]")
    n_all = eng.query("?edge(X, Y)").count()
    n_gt2 = eng.query("?edge(X, Y), X > 2").count()
    print(f"[embed] analytics: edge has {n_all} tuples, {n_gt2} with X > 2")
    eng.execute(".kg use staging")
    n_iso = eng.query("?edge(X, Y)").count()
    print(f"[embed] staging sees {n_iso} edge tuples (isolation)")
    assert n_iso == 0

    # --- storage_demo: WAL -> crash -> recovery -> compaction -------
    eng.execute(".kg use analytics")
    eng.execute("+adult(Id) <- person(Id, Score), Score > 150")
    del eng  # "crash": recover a brand-new engine from the same log
    eng2 = IQLEngine(spark, wal_dir=wal)
    eng2.execute(".kg use analytics")
    adults = sorted(r[0] for r in eng2.query("?adult(Id)").collect())
    print(f"[embed] recovered from WAL: adults = {adults}")
    assert adults == [2, 3, 4, 5]
    eng2.execute(".compact")
    eng3 = IQLEngine(spark, wal_dir=wal)
    eng3.execute(".kg use analytics")
    assert eng3.query("?edge(X, Y)").count() == n_all
    print("[embed] .compact generation recovers identically")

    # --- parallel_queries: concurrent reads on one engine -----------
    queries = [
        "?edge(X, Y)",
        "?edge(X, Y), X < 4",
        "?edge(X, Y), X > 2",
        "?edge(X, Y), X > 1, X < 7",
    ]
    t0 = time.perf_counter()
    seq = [eng3.query(q).count() for q in queries]
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as pool:
        par = list(pool.map(lambda q: eng3.query(q).count(), queries))
    t_par = time.perf_counter() - t0
    assert par == seq
    print(
        f"[embed] 4 queries sequential {t_seq:.2f}s vs concurrent "
        f"{t_par:.2f}s -> same counts {par} (lock-free reads)"
    )



def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=0, help="0 = ephemeral")
    ap.add_argument("--keep", action="store_true", help="leave server running")
    ap.add_argument(
        "--scenario",
        choices=("espresso", "retail", "embedding", "all"),
        default="all",
        help="which seeded walkthrough(s) to run",
    )
    args = ap.parse_args(argv)

    from inputlayer_spark.client import Client
    from inputlayer_spark.server import QueryServer
    from inputlayer_spark.session import get_spark

    spark = get_spark("inputlayer-demo")
    spark.sparkContext.setLogLevel("ERROR")
    srv = QueryServer(spark, port=args.port).start()
    print(f"[demo] server on 127.0.0.1:{srv.port}")
    client = Client(f"http://127.0.0.1:{srv.port}")

    if args.scenario in ("espresso", "all"):
        espresso_walkthrough(client)
    if args.scenario in ("retail", "all"):
        retail_walkthrough(client)
    if args.scenario in ("embedding", "all"):
        embedding_walkthrough(spark)

    if args.keep:
        print(f"[demo] --keep: server up at http://127.0.0.1:{srv.port} "
              "(console at /). Ctrl-C to stop.")
        import signal
        signal.sigwait([signal.SIGINT, signal.SIGTERM])
    srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
