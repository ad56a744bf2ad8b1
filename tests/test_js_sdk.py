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
            [node, "--test", "tests/integration.test.mjs", "tests/fluent.test.mjs"],
            cwd=PKG, capture_output=True, text=True, timeout=300, env=env,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "# pass 6" in out.stdout, out.stdout  # incl. live fluent roundtrip
        assert "# skipped 0" in out.stdout, out.stdout
    finally:
        srv.stop()
