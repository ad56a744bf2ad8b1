"""JS SDK tests: runs the node test suite.

Unit tests (protocol rendering, result parsing, WS frame codec, mock-
server client behavior) always run; the integration test file connects
to a REAL Spark-backed QueryServer started here, exercising HTTP query,
WS query, and pushed change notifications end-to-end — the reference's
packages/inputlayer-js/tests/integration.test.ts flow."""

import os
import shutil
import subprocess

import pytest

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "packages", "inputlayer-js")

node = shutil.which("node")


@pytest.mark.skipif(node is None, reason="node not installed")
def test_js_sdk_unit_suite():
    out = subprocess.run(
        [node, "--test", "tests/unit.test.mjs", "tests/client.test.mjs",
         "tests/fluent.test.mjs"],
        cwd=PKG, capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr


@pytest.mark.skipif(node is None, reason="node not installed")
def test_js_sdk_integration_against_live_server(spark):
    from inputlayer_spark.server import QueryServer

    srv = QueryServer(spark).start()
    try:
        env = dict(os.environ, INPUTLAYER_URL=f"http://127.0.0.1:{srv.port}")
        out = subprocess.run(
            [node, "--test", "--test-concurrency=1",
             "tests/integration.test.mjs", "tests/fluent.test.mjs",
             "tests/api.test.mjs"],
            cwd=PKG, capture_output=True, text=True, timeout=600, env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        # live fluent roundtrip + the typed REST api-client namespaces
        assert "# pass 7" in out.stdout, out.stdout
        assert "# skipped 0" in out.stdout, out.stdout
    finally:
        srv.stop()


def test_type_declarations_cover_every_export():
    """index.d.ts (the typed-client parity surface, reference
    packages/api-client) must declare every runtime export of
    index.js — no tsc in this container, so pin coverage textually."""
    import re

    root = os.path.join(PKG, "src")
    src = open(os.path.join(root, "index.js")).read()
    dts = open(os.path.join(root, "index.d.ts")).read()
    names = set()
    for m in re.finditer(r"export\s*\{([^}]*)\}", src):
        for n in m.group(1).split(","):
            n = n.strip()
            if n:
                names.add(n)
    assert names, "no exports parsed"
    for n in sorted(names):
        assert re.search(
            rf"export (class|function|const|interface|type) {n}\b", dts
        ), f"{n} missing from index.d.ts"
    # package.json advertises the types entry
    import json as _json

    pkg = _json.load(open(os.path.join(PKG, "package.json")))
    assert pkg["types"] == "src/index.d.ts"
    assert pkg["exports"]["."]["types"] == "./src/index.d.ts"
