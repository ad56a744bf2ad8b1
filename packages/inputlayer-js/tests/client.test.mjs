import { test } from "node:test";
import assert from "node:assert/strict";
import http from "node:http";

import {
  InputLayer,
  AuthenticationError,
  QueryError,
} from "../src/index.js";

/** Mock of the inputlayer_spark wire protocol (server.py), HTTP only. */
function mockServer({ apiKey = null } = {}) {
  const seen = [];
  const server = http.createServer((req, res) => {
    const send = (code, obj) => {
      res.writeHead(code, { "Content-Type": "application/json" });
      res.end(JSON.stringify(obj));
    };
    if (req.url === "/health") return send(200, { status: "ok" });
    if (apiKey && req.headers["x-api-key"] !== apiKey) {
      return send(401, { error: "invalid or missing API key" });
    }
    if (req.url === "/status") return send(200, { kg: "default" });
    let body = "";
    req.on("data", (c) => (body += c));
    req.on("end", () => {
      const q = JSON.parse(body || "{}");
      seen.push(q);
      if (q.query.includes("boom")) return send(400, { error: "Parse error: boom" });
      send(200, {
        results: [
          {
            columns: [
              { name: "x", type: "int" },
              { name: "y", type: "string" },
            ],
            rows: [[1, "a"]],
          },
        ],
      });
    });
  });
  return new Promise((resolve) => {
    server.listen(0, "127.0.0.1", () =>
      resolve({ server, port: server.address().port, seen }),
    );
  });
}

test("query round-trip and session forwarding", async () => {
  const { server, port, seen } = await mockServer();
  const il = new InputLayer({
    url: `http://127.0.0.1:${port}`,
    session: "s1",
  });
  await il.connect();
  const rs = await il.query("?edge(X, Y)");
  assert.deepEqual(rs.toDicts(), [{ x: 1, y: "a" }]);
  assert.equal(seen[0].session, "s1");
  await il.insert("edge", [[1, 2]]);
  assert.equal(seen[1].query, "+edge[(1, 2)]");
  await il.retract("edge", [1, 2]);
  assert.equal(seen[2].query, "-edge(1, 2)");
  await il.useKnowledgeGraph("g");
  assert.equal(seen[3].query, ".kg use g");
  server.close();
});

test("auth: 401 → AuthenticationError; API key attached when set", async () => {
  const { server, port } = await mockServer({ apiKey: "sk-test" });
  const bad = new InputLayer({ url: `http://127.0.0.1:${port}` });
  await assert.rejects(() => bad.execute("?q(X)"), AuthenticationError);
  const good = new InputLayer({
    url: `http://127.0.0.1:${port}`,
    apiKey: "sk-test",
  });
  const rs = await good.query("?q(X)");
  assert.equal(rs.length, 1);
  server.close();
});

test("query errors surface as QueryError with server message", async () => {
  const { server, port } = await mockServer();
  const il = new InputLayer({ url: `http://127.0.0.1:${port}` });
  await assert.rejects(
    () => il.execute("boom"),
    (e) => e instanceof QueryError && /Parse error/.test(e.message),
  );
  server.close();
});
