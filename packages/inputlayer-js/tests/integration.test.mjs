/**
 * End-to-end test against a REAL inputlayer_spark server (Spark-backed).
 * Skipped unless INPUTLAYER_URL is set — the Python suite
 * (tests/test_js_sdk.py) starts the server and runs this file.
 */
import { test } from "node:test";
import assert from "node:assert/strict";

import { InputLayer } from "../src/index.js";

const url = process.env.INPUTLAYER_URL;

test("live server round-trip: insert, rule, query, notifications", {
  skip: !url,
}, async () => {
  const il = new InputLayer({
    url,
    apiKey: process.env.INPUTLAYER_API_KEY || null,
  });
  await il.connect();

  const events = [];
  const off = await il.onChange((rel) => events.push(rel));

  await il.insert("js_edge", [
    [1, 2],
    [2, 3],
  ]);
  await il.addRule("+js_path(X, Y) <- js_edge(X, Y)");
  await il.addRule("+js_path(X, Z) <- js_path(X, Y), js_edge(Y, Z)");
  const rs = await il.query("?js_path(1, Y)");
  assert.deepEqual(
    rs.rows.map((r) => r[1] ?? r[0]).sort(),
    [2, 3],
  );

  // ws query path
  const ws = await il._wsConn();
  const reply = await ws.request({ type: "query", query: "?js_edge(X, Y)" });
  assert.equal(reply.type, "result");
  assert.equal(reply.rows.length, 2);

  // multi-statement WS query: the server echoes the request id on every
  // result frame and terminates with a done marker, so BOTH frames land
  // on this request even with other traffic on the connection
  const frames = await ws.requestAll({
    type: "query",
    query: "?js_edge(X, Y)\n?js_path(1, Y)",
  });
  assert.equal(frames.length, 2);
  assert.ok(frames.every((f) => f.type === "result"));
  assert.equal(frames[0].rows.length, 2);
  assert.equal(frames[1].rows.length, 2);

  // concurrent WS requests resolve independently (id-matched)
  const [r1, r2] = await Promise.all([
    ws.request({ type: "query", query: "?js_edge(1, Y)" }),
    ws.request({ type: "ping" }),
  ]);
  assert.equal(r1.type, "result");
  assert.equal(r2.type, "pong");

  // pushed change notification for the insert above
  await il.insert("js_edge", [[3, 4]]);
  await new Promise((r) => setTimeout(r, 1500));
  assert.ok(events.includes("js_edge"), `events: ${events}`);

  off();
  il.close();
});
