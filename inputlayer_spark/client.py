"""Python client for the IQL query server (stdlib-only).

Wire-compatible with `server.QueryServer`: JSON-over-HTTP for queries
and an RFC 6455 WebSocket for the streaming protocol (query /
insert_facts / retract_facts / add_rule / ping, plus pushed
`persistent_update` change notifications). The fluent surface mirrors
the reference Python SDK's sync client
(packages/inputlayer-py/src/inputlayer/client_sync.py — API shape only;
this is an original implementation against our own server).

    from inputlayer_spark.client import Client

    c = Client("http://127.0.0.1:8080")
    c.insert("edge", [(1, 2), (2, 3)])
    c.add_rule("+path(X, Y) <- edge(X, Y)")
    rs = c.query("?path(X, Y)")
    rs.to_tuples()          # [(1, 2), (2, 3)]
    rs.columns              # ["X", "Y"]

    unsub = c.on_change(lambda rel: print("changed:", rel))
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import struct
import threading
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Iterable, List, Optional, Sequence

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class ClientError(RuntimeError):
    """Server-side error surfaced to the client."""


@dataclass
class ResultSet:
    """One query's columnar result (reference result.py shape)."""

    columns: List[str]
    types: List[str]
    rows: List[tuple]
    truncated: bool = False

    def __len__(self) -> int:
        return len(self.rows)

    def __bool__(self) -> bool:
        return bool(self.rows)

    def __iter__(self):
        return iter(self.rows)

    def __getitem__(self, idx: int) -> tuple:
        return self.rows[idx]

    def first(self) -> Optional[tuple]:
        return self.rows[0] if self.rows else None

    def scalar(self):
        """Single value of a 1x1 result."""
        if len(self.rows) != 1 or len(self.columns) != 1:
            raise ClientError("scalar() requires a 1x1 result")
        return self.rows[0][0]

    def to_tuples(self) -> List[tuple]:
        return list(self.rows)

    def to_dicts(self) -> List[dict]:
        return [dict(zip(self.columns, r)) for r in self.rows]


def _result_from_payload(p: dict) -> ResultSet:
    return ResultSet(
        columns=[c["name"] for c in p.get("columns", [])],
        types=[c.get("type", "") for c in p.get("columns", [])],
        rows=[tuple(r) for r in p.get("rows", [])],
        truncated=bool(p.get("truncated")),
    )


class Client:
    """Synchronous client over HTTP; WS used for change subscriptions."""

    def __init__(self, url: str, session: Optional[str] = None, timeout: float = 60.0):
        self.url = url.rstrip("/")
        self.session = session
        self.timeout = timeout
        self._ws: Optional[_WsConn] = None

    # ------------------------------------------------------------ core

    def execute(self, iql: str) -> List[ResultSet]:
        """Run an IQL program; one ResultSet per statement that returns
        rows (queries and introspection meta commands)."""
        body = {"query": iql}
        if self.session:
            body["session"] = self.session
        req = urllib.request.Request(
            f"{self.url}/query",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", str(e))
            except Exception:
                msg = str(e)
            raise ClientError(msg) from None
        return [_result_from_payload(p) for p in out.get("results", [])]

    def query(self, iql: str) -> ResultSet:
        """Run a program and return its last result set."""
        results = self.execute(iql)
        if not results:
            return ResultSet(columns=[], types=[], rows=[])
        return results[-1]

    # ------------------------------------------------------ conveniences

    def insert(self, relation: str, rows: Iterable[Sequence]) -> None:
        stmts = []
        for row in rows:
            vals = ", ".join(json.dumps(v) for v in row)
            stmts.append(f"+{relation}[({vals})]")
        if stmts:
            self.execute("\n".join(stmts))

    def delete(self, relation: str, row: Sequence) -> None:
        vals = ", ".join(json.dumps(v) for v in row)
        self.execute(f"-{relation}({vals})")

    def add_rule(self, rule: str) -> None:
        self.execute(rule)

    def use_kg(self, name: str) -> None:
        self.execute(f".kg use {name}")

    def health(self) -> bool:
        try:
            with urllib.request.urlopen(f"{self.url}/health", timeout=self.timeout) as r:
                return json.loads(r.read()).get("status") == "ok"
        except OSError:
            return False

    # ---------------------------------------------------- subscriptions

    def on_change(self, callback: Callable[[str], None]) -> Callable[[], None]:
        """Subscribe to pushed persistent_update notifications. Returns
        an unsubscribe function. One WS connection is shared per client."""
        if self._ws is None:
            host = self.url.split("://", 1)[1]
            path = f"/sessions/{self.session}/ws" if self.session else "/ws"
            self._ws = _WsConn(host, path)
        return self._ws.add_listener(callback)

    def close(self) -> None:
        if self._ws is not None:
            self._ws.close()
            self._ws = None


class _WsConn:
    """Background WebSocket reader dispatching notifications."""

    def __init__(self, hostport: str, path: str):
        host, port = hostport.split(":")
        self.sock = socket.create_connection((host, int(port)), timeout=None)
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\nHost: {hostport}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += self.sock.recv(4096)
        head, self._buf = buf.split(b"\r\n\r\n", 1)
        status = head.split(b"\r\n")[0]
        if b"101" not in status:
            raise ClientError(f"websocket upgrade failed: {status!r}")
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        if accept.encode() not in head:
            raise ClientError("websocket accept key mismatch")
        self._listeners: List[Callable[[str], None]] = []
        self._closed = False
        self._thread = threading.Thread(target=self._reader, daemon=True)
        self._thread.start()

    def add_listener(self, cb: Callable[[str], None]) -> Callable[[], None]:
        self._listeners.append(cb)

        def unsub():
            if cb in self._listeners:
                self._listeners.remove(cb)

        return unsub

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _reader(self) -> None:
        try:
            while not self._closed:
                hdr = self._read_exact(2)
                opcode = hdr[0] & 0x0F
                length = hdr[1] & 0x7F
                if length == 126:
                    length = struct.unpack(">H", self._read_exact(2))[0]
                elif length == 127:
                    length = struct.unpack(">Q", self._read_exact(8))[0]
                data = self._read_exact(length)
                if opcode == 0x8:
                    break
                if opcode != 0x1:
                    continue
                try:
                    msg = json.loads(data.decode())
                except ValueError:
                    continue
                if msg.get("type") == "notification":
                    for cb in list(self._listeners):
                        try:
                            cb(msg.get("relation", ""))
                        except Exception:
                            pass
        except (OSError, ConnectionError):
            pass

    def close(self) -> None:
        self._closed = True
        try:
            self.sock.close()
        except OSError:
            pass
