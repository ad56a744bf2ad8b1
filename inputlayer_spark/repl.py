"""Interactive IQL shell over the PySpark engine (reference:
src/bin/client.rs REPL loop + display_table_result, src/main.rs).

`python -m inputlayer_spark` starts it. Feature parity with the
reference client's local surface:

- `kg> ` prompt tracking the current knowledge graph, colored when the
  output is a TTY (client.rs prompt handling + highlight.rs).
- Unicode box-drawing result tables with numeric right-alignment,
  per-column width caps, a max-row window, and a `N rows (Xms)` footer
  (client.rs:1261-1350).
- Multi-line statement accumulation on unbalanced delimiters, so bulk
  inserts and long rules can span lines (client.rs script mode).
- `.help`, `.quit` / `.exit`; parse/execution errors print and the loop
  continues (client.rs:940-960).
- Non-TTY stdin is replayed as a script: each statement echoed as
  `> stmt` (syntax-highlighted when --color) then executed.

The engine here is in-process (a SparkSession instead of a WS
connection); the server/client pair in server.py + client.py covers the
remote topology."""

from __future__ import annotations

import sys
import time
from typing import IO, List, Optional, Sequence

from inputlayer_spark.syntax import highlight_line, highlight_prompt

_HELP = """\
IQL quick help
  +rel(a, b)                    insert a fact       +rel[(1,2),(3,4)] bulk
  -rel(a, b)                    retract a fact
  +head(X,Z) <- b1(X,Y), b2(Y,Z)   persistent rule (no '+': session rule)
  ?rel(X, _)                    query (UPPERCASE = variable, _ = wildcard)
  .rel [name]   .rule list   .kg list|create|use|drop   .index list
  .why ?q(...)  .why_not rel(a,b)  .debug ?q(...)  .agent examples
  .load <file.iql>   .status   .compact   .help   .quit
"""


def format_cell(v) -> str:
    """One result cell, reference JSON rendering (client.rs:1203-1218):
    strings quoted, bools lowercase, arrays bracketed, null literal."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f'"{v}"'
    if isinstance(v, float):
        return repr(v).replace("e+", "e")
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(format_cell(x) for x in v) + "]"
    return str(v)


def _truncate(s: str, max_w: int) -> str:
    if max_w == 0 or len(s) <= max_w:
        return s
    return s[: max(max_w - 1, 0)] + "…"


def format_table(
    columns: Sequence[str],
    rows: Sequence[Sequence],
    *,
    max_rows: int = 50,
    max_col_width: int = 60,
    elapsed_ms: Optional[int] = None,
) -> str:
    """Unicode box table, reference display_table_result
    (client.rs:1261-1350): numeric columns right-aligned, widths capped,
    truncation footer when the row window clips."""
    total = len(rows)
    shown = rows[:max_rows] if 0 < max_rows < total else rows
    cells = [[_truncate(format_cell(v), max_col_width) for v in r] for r in shown]
    widths = [len(c) for c in columns]
    for r in cells:
        for i, c in enumerate(r):
            if i < len(widths):
                widths[i] = max(widths[i], len(c))
    if max_col_width > 0:
        widths = [min(w, max_col_width) for w in widths]
    numeric = [
        all(
            isinstance(r[i], (int, float)) and not isinstance(r[i], bool)
            for r in shown
        )
        if shown
        else False
        for i in range(len(columns))
    ]

    def border(l: str, mid: str, r: str) -> str:
        return l + mid.join("─" * (w + 2) for w in widths) + r

    lines = [border("┌", "┬", "┐")]
    header = "│".join(
        f" {name:<{w}} " for name, w in zip(columns, widths)
    )
    lines.append(f"│{header}│")
    lines.append(border("├", "┼", "┤"))
    for r in cells:
        body = "│".join(
            f" {c:>{w}} " if numeric[i] else f" {c:<{w}} "
            for i, (c, w) in enumerate(zip(r, widths))
        )
        lines.append(f"│{body}│")
    lines.append(border("└", "┴", "┘"))
    timing = f" ({elapsed_ms}ms)" if elapsed_ms is not None else ""
    if len(shown) < total:
        lines.append(
            f"{len(shown)} of {total} rows{timing}. Use --limit 0 for all rows."
        )
    else:
        lines.append(f"{total} rows{timing}")
    return "\n".join(lines)


class RemoteBackend:
    """Engine-shaped adapter over `client.Client` so the same Repl loop
    drives a remote server — the reference client's actual topology
    (bin/client.rs: rustyline REPL over a WS/HTTP connection). Tracks
    the current KG client-side for the prompt, like the reference's
    ReplState.prompt()."""

    class _Current:
        def __init__(self, name: str):
            self.name = name

    def __init__(self, client):
        self.client = client
        self.current = RemoteBackend._Current("default")

    def execute(self, text: str):
        results = self.client.execute(text)
        for line in text.splitlines():
            parts = line.strip().split()
            if parts[:2] == [".kg", "use"] and len(parts) > 2:
                self.current.name = parts[2]
        return results


def _balanced(text: str) -> bool:
    """True when every ( [ { is closed and no string is open — the
    accumulate-until-complete check for multi-line statements."""
    depth = 0
    in_str = False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "\\":
                i += 1
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        i += 1
    return depth <= 0 and not in_str


class Repl:
    def __init__(
        self,
        engine,
        out: IO[str] = sys.stdout,
        *,
        color: Optional[bool] = None,
        max_rows: int = 50,
        max_col_width: int = 60,
        show_timing: bool = True,
    ):
        self.engine = engine
        self.out = out
        self.color = out.isatty() if color is None else color
        self.max_rows = max_rows
        self.max_col_width = max_col_width
        self.show_timing = show_timing
        self._pending: List[str] = []

    # ----- rendering -----

    def _print(self, text: str = "") -> None:
        print(text, file=self.out)

    def prompt(self) -> str:
        p = f"{self.engine.current.name}> "
        return highlight_prompt(p) if self.color else p

    def print_result(self, df, elapsed_ms: Optional[int]) -> None:
        # DataFrame (local engine) or client.ResultSet (remote backend)
        rows = (
            [list(r) for r in df.collect()]
            if hasattr(df, "collect")
            else [list(r) for r in df.rows]
        )
        if not rows:
            self._print("No results")
            return
        self._print(
            format_table(
                df.columns,
                rows,
                max_rows=self.max_rows,
                max_col_width=self.max_col_width,
                elapsed_ms=elapsed_ms if self.show_timing else None,
            )
        )

    # ----- execution -----

    def execute(self, text: str) -> None:
        """Run a complete statement batch, printing each result table.
        Errors print and return (the REPL loop survives them)."""
        t0 = time.monotonic()
        try:
            results = self.engine.execute(text)
        except Exception as e:  # parse or execution error -> keep looping
            self._print(f"Error: {e}")
            return
        elapsed = int((time.monotonic() - t0) * 1000)
        if not results:
            self._print("OK")
        for df in results:
            self.print_result(df, elapsed)

    def handle_line(self, line: str) -> bool:
        """Feed one input line; returns False when the REPL should exit.
        Incomplete statements (unbalanced delimiters) accumulate."""
        stripped = line.strip()
        if not self._pending:
            if not stripped:
                return True
            if stripped in (".quit", ".exit", ".q"):
                self._print("Goodbye!")
                return False
            if stripped in (".help", ".?"):
                self._print(_HELP)
                return True
        self._pending.append(line)
        text = "\n".join(self._pending)
        if not _balanced(text):
            return True
        self._pending = []
        self.execute(text)
        return True

    # ----- loops -----

    def run_interactive(self, in_stream: IO[str] = sys.stdin) -> None:
        try:
            import readline  # noqa: F401 — line editing + history
        except ImportError:
            pass
        while True:
            try:
                line = input(self.prompt() if in_stream is sys.stdin else "")
            except EOFError:
                self._print("Goodbye!")
                return
            except KeyboardInterrupt:
                self._print("^C")
                self._pending = []
                continue
            if not self.handle_line(line):
                return

    def run_script(self, in_stream: IO[str]) -> None:
        """Replay a script: echo each completed statement as `> stmt`
        (highlighted under --color), then execute it."""
        for line in in_stream:
            line = line.rstrip("\n")
            stripped = line.strip()
            if self._pending or (stripped and not stripped.startswith("//")):
                echo = highlight_line(line) if self.color else line
                self._print(f"> {echo}")
            if not self.handle_line(line):
                return


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m inputlayer_spark", description="IQL shell (PySpark engine)"
    )
    ap.add_argument("script", nargs="?", help="IQL file to run (else REPL)")
    ap.add_argument("-c", "--command", help="run one statement batch and exit")
    ap.add_argument(
        "--connect",
        metavar="URL",
        help="drive a remote server (http://host:port) instead of an "
        "in-process engine — the reference client topology; no local "
        "SparkSession is started",
    )
    ap.add_argument("--kg", default=None, help="knowledge graph to use at start")
    ap.add_argument("--wal-dir", default=None, help="durable storage directory")
    ap.add_argument(
        "--config",
        default=None,
        help="config.toml (storage.data_dir -> --wal-dir, "
        "storage.default_knowledge_graph -> --kg, "
        "performance.max_result_rows -> --limit; flags win)",
    )
    ap.add_argument("--limit", type=int, default=50, help="max rows shown (0 = all)")
    ap.add_argument(
        "--color",
        choices=["auto", "always", "never"],
        default="auto",
        help="syntax/prompt coloring",
    )
    ap.add_argument("--no-timing", action="store_true")
    args = ap.parse_args(argv)

    cfg = None
    if args.config:
        import os

        from inputlayer_spark.config import Config

        cfg = Config.from_file(args.config)
        if cfg.performance.num_threads > 0:
            os.environ["SPARK_GRAFT_CPUS"] = str(cfg.performance.num_threads)
        if cfg.performance.shuffle_partitions > 0:
            os.environ["SPARK_GRAFT_SHUFFLE"] = str(
                cfg.performance.shuffle_partitions
            )
        if cfg.storage.persistence.enable_wal:
            args.wal_dir = args.wal_dir or (cfg.storage.data_dir or None)
        if args.kg is None and cfg.storage.default_knowledge_graph != "default":
            args.kg = cfg.storage.default_knowledge_graph
        if cfg.performance.max_result_rows:
            args.limit = cfg.performance.max_result_rows

    if args.connect:
        from inputlayer_spark.client import Client

        client = Client(args.connect)
        engine = RemoteBackend(client)
        if sys.stdin.isatty():
            # surface server-side change notifications while idle, like
            # the reference REPL (client.rs:978-992)
            try:
                client.on_change(
                    lambda rel: print(f"[notification] change in {rel}", file=sys.stderr)
                )
            except Exception:
                pass  # WS unavailable -> plain request/response mode
    else:
        from inputlayer_spark.engine import IQLEngine
        from inputlayer_spark.session import get_spark

        spark = get_spark("inputlayer-repl")
        spark.sparkContext.setLogLevel("ERROR")
        engine = IQLEngine(spark, wal_dir=args.wal_dir)
        if cfg is not None:
            engine.max_query_cost = cfg.performance.max_query_cost
            engine.enable_subplan_sharing = (
                cfg.optimization.enable_subplan_sharing
            )
            engine.auto_create_kgs = cfg.storage.auto_create_knowledge_graphs
            engine.enable_magic_sets = cfg.optimization.enable_magic_sets
            engine.max_kgs = cfg.storage.max_knowledge_graphs
            engine.persist_format = cfg.storage.persistence.format
            engine.persist_compression = cfg.storage.persistence.compression
            engine.agent_llm_url = cfg.agent.llm_url
            engine.agent_llm_version = cfg.agent.llm_version
            if not cfg.optimization.enable_join_planning:
                from inputlayer_spark import compiler as _compiler

                _compiler.JOIN_PLANNING_ENABLED = False
    if args.kg:
        engine.execute(f".kg create {args.kg}\n.kg use {args.kg}")

    color = {"auto": None, "always": True, "never": False}[args.color]
    repl = Repl(
        engine,
        color=color,
        max_rows=args.limit,
        show_timing=not args.no_timing,
    )
    if args.command:
        repl.execute(args.command)
        return 0
    if args.script:
        with open(args.script, encoding="utf-8") as fh:
            repl.run_script(fh)
        return 0
    if sys.stdin.isatty():
        print("InputLayer-Spark IQL shell — .help for syntax, .quit to exit")
        repl.run_interactive()
    else:
        repl.run_script(sys.stdin)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
