"""REPL tests — table rendering (reference client.rs:1261-1350 shape),
statement accumulation, error resilience, script replay, and the
`python -m inputlayer_spark -c` one-shot surface driven in-process."""

import io

from inputlayer_spark.repl import Repl, _balanced, format_cell, format_table


# ------------------------------------------------------------ formatting


def test_format_cell_reference_json_shape():
    assert format_cell(None) == "null"
    assert format_cell(True) == "true" and format_cell(False) == "false"
    assert format_cell("x") == '"x"'
    assert format_cell(3) == "3"
    assert format_cell([1.5, 2.0]) == "[1.5, 2.0]"


def test_format_table_alignment_and_footer():
    out = format_table(
        ["name", "n"], [["ab", 1], ["c", 20]], elapsed_ms=7
    )
    lines = out.splitlines()
    assert lines[0].startswith("┌") and lines[-2].startswith("└")
    assert "name" in lines[1] and "n" in lines[1]
    # numeric column right-aligned: 1 and 20 end at the same offset
    assert lines[3].rindex("1") == lines[4].rindex("0")
    # string column quoted + left-aligned
    assert '"ab"' in lines[3]
    assert lines[-1] == "2 rows (7ms)"


def test_format_table_truncation_window():
    rows = [[i] for i in range(100)]
    out = format_table(["x"], rows, max_rows=5)
    assert "5 of 100 rows" in out.splitlines()[-1]
    wide = format_table(["s"], [["y" * 200]], max_col_width=10)
    assert "…" in wide and "y" * 11 not in wide


def test_balanced_accumulation_check():
    assert _balanced("+f(1, 2)")
    assert not _balanced("+f[(1, 2),")
    assert not _balanced('+f("open')
    assert _balanced('+f("a)(b")')  # delimiters inside strings ignored
    assert _balanced('+f("esc\\"")')


# ------------------------------------------------------------ REPL loop


def make_repl(engine):
    buf = io.StringIO()
    return Repl(engine, out=buf, color=False, show_timing=False), buf


def test_repl_insert_query_and_table(engine):
    repl, buf = make_repl(engine)
    assert repl.handle_line('+edge[(1, 2), (2, 3)]')
    assert repl.handle_line("?edge(X, Y)")
    out = buf.getvalue()
    assert "OK" in out  # insert batch acknowledges
    assert "┌" in out and "2 rows" in out


def test_repl_multiline_accumulation(engine):
    repl, buf = make_repl(engine)
    assert repl.handle_line("+edge[(1, 2),")
    assert buf.getvalue() == ""  # incomplete: nothing executed yet
    assert repl.handle_line("(2, 3)]")
    repl.handle_line("?edge(X, _)")
    assert "2 rows" in buf.getvalue()


def test_repl_survives_errors(engine):
    repl, buf = make_repl(engine)
    assert repl.handle_line("?broken(X,,)")
    assert "Error:" in buf.getvalue()
    buf.truncate(0)
    # unknown relations degrade to "No results" (conformance-lenient)
    assert repl.handle_line("?nonexistent_relation(X)")
    assert repl.handle_line("+f(1)")  # still alive


def test_repl_quit_help_and_empty(engine):
    repl, buf = make_repl(engine)
    assert repl.handle_line("")
    assert repl.handle_line(".help")
    assert "insert a fact" in buf.getvalue()
    assert repl.handle_line(".quit") is False
    assert "Goodbye!" in buf.getvalue()


def test_repl_no_results_and_prompt(engine):
    repl, buf = make_repl(engine)
    repl.handle_line("+edge(1, 2)")
    repl.handle_line("?edge(9, X)")
    assert "No results" in buf.getvalue()
    assert repl.prompt() == "default> "
    repl.handle_line(".kg create other")
    repl.handle_line(".kg use other")
    assert repl.prompt() == "other> "


def test_repl_script_replay_echoes(engine):
    repl, buf = make_repl(engine)
    script = io.StringIO(
        "// comment only\n+edge(1, 2)\n?edge(X, Y)\n"
    )
    repl.run_script(script)
    out = buf.getvalue()
    assert "> +edge(1, 2)" in out and "> ?edge(X, Y)" in out
    assert "// comment only" not in out  # pure comments not echoed
    assert "1 rows" in out


def test_repl_meta_table(engine):
    repl, buf = make_repl(engine)
    repl.handle_line("+city(1)")
    repl.handle_line(".rel list")
    assert "city" in buf.getvalue()


def test_repl_remote_backend_against_live_server(spark):
    """The same Repl loop drives a remote server through client.Client —
    the reference client topology (bin/client.rs)."""
    from inputlayer_spark.client import Client
    from inputlayer_spark.repl import RemoteBackend
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark).start()
    try:
        backend = RemoteBackend(Client(f"http://127.0.0.1:{srv.port}"))
        buf = io.StringIO()
        repl = Repl(backend, out=buf, color=False, show_timing=False)
        repl.handle_line("+edge[(1, 2), (2, 3)]")
        repl.handle_line("?edge(X, Y)")
        out = buf.getvalue()
        assert "┌" in out and "2 rows" in out
        # remote errors print and the loop survives
        repl.handle_line("?broken(X,,)")
        assert "Error:" in buf.getvalue()
        # prompt tracks .kg use client-side
        repl.handle_line(".kg create remote_kg")
        repl.handle_line(".kg use remote_kg")
        assert repl.prompt() == "remote_kg> "
    finally:
        srv.stop()
