"""Minimal JSON-over-HTTP query server (stdlib-only).

The reference serves IQL over a JSON WebSocket/REST protocol
(`/root/reference/src/protocol/wire.rs:12-334`, routes
`src/protocol/rest/mod.rs:234-244`: /ws, /sessions/:id/ws, /health).
This façade speaks the same *shape* — columnar results with column
defs — over plain HTTP so it runs with no third-party dependencies:

    POST /query    {"query": "<iql>", "session": "<id>?"}
        → {"results": [{"columns": [{"name","type"}...],
                        "rows": [[...], ...]} ...]}
    GET  /health   → {"status": "ok"}
    GET  /status   → engine .status as JSON

Per-session ephemeral facts/rules ride on a session id: each session id
gets its own IQLEngine view of the shared SparkSession (the reference's
Session overlay, src/session.rs:114). One server = one driver process;
concurrency is bounded by the GIL on the driver side, while the heavy
lifting happens in Spark executors — same topology as the reference's
single-node server with worker threads.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict

from inputlayer_spark.engine import IQLEngine


def _df_payload(df) -> dict:
    cols = [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields]
    rows = [[_json_val(v) for v in row] for row in df.collect()]
    return {"columns": cols, "rows": rows}


def _json_val(v):
    if isinstance(v, (list, tuple)):
        return [_json_val(x) for x in v]
    if isinstance(v, bytes):
        return v.hex()
    return v


class QueryServer:
    """Holds one shared engine plus per-session overlay engines."""

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.engine = IQLEngine(spark)
        self.sessions: Dict[str, IQLEngine] = {}
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/health":
                    self._send(200, {"status": "ok"})
                elif self.path == "/status":
                    with outer._lock:
                        df = outer.engine.execute(".status")[0]
                        rows = {r["key"]: r["value"] for r in df.collect()}
                    self._send(200, rows)
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/query":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    engine = outer._engine_for(req.get("session"))
                    with outer._lock:
                        results = engine.execute(req.get("query", ""))
                        payload = {"results": [_df_payload(df) for df in results]}
                    self._send(200, payload)
                except Exception as exc:  # noqa: BLE001 — wire errors back
                    self._send(400, {"error": str(exc)})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def _engine_for(self, session_id) -> IQLEngine:
        """Session engines share the KG dict (shared base relations +
        persistent rules) but keep their own session facts/rules —
        the reference's snapshot-overlay semantics."""
        if not session_id:
            return self.engine
        with self._lock:
            eng = self.sessions.get(session_id)
            if eng is None:
                eng = IQLEngine(self.spark)
                eng.kgs = self.engine.kgs  # shared persistent state
                eng.current = self.engine.current
                self.sessions[session_id] = eng
            return eng

    def start(self) -> "QueryServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
