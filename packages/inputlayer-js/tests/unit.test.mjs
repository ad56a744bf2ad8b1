import { test } from "node:test";
import assert from "node:assert/strict";

import {
  ResultSet,
  compileValue,
  insertStatement,
  deleteStatement,
  errorFor,
  AuthenticationError,
  PermissionError,
  QueryError,
  encodeFrame,
  decodeFrames,
} from "../src/index.js";

test("compileValue renders IQL literals", () => {
  assert.equal(compileValue(42), "42");
  assert.equal(compileValue(-1.5), "-1.5");
  assert.equal(compileValue(true), "true");
  assert.equal(compileValue('say "hi"'), '"say \\"hi\\""');
  assert.equal(compileValue([1.0, 2.5]), "[1, 2.5]");
  assert.equal(compileValue(123n), "123");
  assert.throws(() => compileValue(null), TypeError);
  assert.throws(() => compileValue({}), TypeError);
});

test("statement builders", () => {
  assert.equal(
    insertStatement("edge", [
      [1, 2],
      [2, 3],
    ]),
    "+edge[(1, 2), (2, 3)]",
  );
  assert.equal(deleteStatement("p", [7, "x"]), '-p(7, "x")');
});

test("ResultSet payload parsing and accessors", () => {
  const rs = ResultSet.fromPayload({
    columns: [
      { name: "a", type: "int" },
      { name: "b", type: "string" },
    ],
    rows: [
      [1, "x"],
      [2, "y"],
    ],
  });
  assert.deepEqual(rs.columns, ["a", "b"]);
  assert.deepEqual(rs.types, ["int", "string"]);
  assert.equal(rs.length, 2);
  assert.deepEqual(rs.first(), [1, "x"]);
  assert.equal(rs.scalar(), 1);
  assert.deepEqual(rs.toDicts(), [
    { a: 1, b: "x" },
    { a: 2, b: "y" },
  ]);
  assert.deepEqual([...rs], rs.toTuples());
  assert.equal(new ResultSet().scalar(), null);
});

test("error mapping by status", () => {
  assert.ok(errorFor(401, "k") instanceof AuthenticationError);
  assert.ok(errorFor(403, "k") instanceof PermissionError);
  assert.ok(errorFor(400, "k") instanceof QueryError);
});

test("ws frame codec round-trips (client-masked frames)", () => {
  const payload = Buffer.from(JSON.stringify({ type: "ping" }));
  const frame = encodeFrame(0x1, payload);
  // decodeFrames unmasks masked frames, so a client frame round-trips
  const { frames, rest } = decodeFrames(frame);
  assert.equal(frames.length, 1);
  assert.equal(frames[0].opcode, 0x1);
  assert.deepEqual(frames[0].payload, payload);
  assert.equal(rest.length, 0);
});

test("ws decoder handles split and concatenated frames", () => {
  const f1 = encodeFrame(0x1, Buffer.from('{"a":1}'));
  const f2 = encodeFrame(0x1, Buffer.from('{"b":2}'));
  const both = Buffer.concat([f1, f2]);
  const { frames } = decodeFrames(both);
  assert.equal(frames.length, 2);
  // partial frame: nothing decoded, all bytes kept
  const part = both.subarray(0, f1.length + 3);
  const r = decodeFrames(part);
  assert.equal(r.frames.length, 1);
  assert.equal(r.rest.length, 3);
  // 126-length extended header path
  const big = encodeFrame(0x1, Buffer.alloc(300, 0x41));
  const rb = decodeFrames(big);
  assert.equal(rb.frames[0].payload.length, 300);
});

test("concurrent requests resolve with their own replies (FIFO)", async () => {
  // a stubbed WsConn: capture sends, inject replies manually
  const { WsConn } = await import("../src/ws.js");
  const conn = new WsConn("localhost", 0, "/ws");
  const sent = [];
  conn.send = (obj) => {
    sent.push(obj);
    // the server answers each request as it arrives, echoing its tag
    setImmediate(() => {
      for (const cb of [...conn._listeners]) cb({ type: "result", tag: obj.tag });
    });
  };
  // two requests issued concurrently: each must resolve with ITS reply,
  // not both with the earliest one
  const [a, b] = await Promise.all([
    conn.request({ type: "query", tag: "A" }),
    conn.request({ type: "query", tag: "B" }),
  ]);
  assert.equal(a.tag, "A");
  assert.equal(b.tag, "B");
  assert.deepEqual(sent.map((s) => s.tag), ["A", "B"]);
  // timed-out request: its LATE reply must be consumed and discarded,
  // not handed to the next request (the server always replies in order)
  let lateReply = null;
  conn.send = (obj) => {
    lateReply = () => {
      for (const cb of [...conn._listeners]) cb({ type: "result", tag: obj.tag });
    };
  };
  const failing = conn.request({ type: "query", tag: "C" }, { timeoutMs: 10 });
  await assert.rejects(failing, /timeout/);
  const fireC = lateReply;
  conn.send = (obj) => {
    lateReply = () => {
      for (const cb of [...conn._listeners]) cb({ type: "result", tag: obj.tag });
    };
  };
  const dPromise = conn.request({ type: "query", tag: "D" });
  fireC(); // C's reply arrives after D was queued — must NOT resolve D
  lateReply(); // then D's own reply
  const d = await dPromise;
  assert.equal(d.tag, "D");
  // send failure releases the queue slot instead of desyncing it
  conn.send = () => {
    throw new Error("boom");
  };
  await assert.rejects(conn.request({ type: "query", tag: "E" }), /boom/);
  conn.send = (obj) => {
    setImmediate(() => {
      for (const cb of [...conn._listeners]) cb({ type: "result", tag: obj.tag });
    });
  };
  const f = await conn.request({ type: "query", tag: "F" });
  assert.equal(f.tag, "F");
});

test("id-echoing server: multi-frame replies match by id, not FIFO", async () => {
  // Simulates the real server (server.py _ws_dispatch): echoes the
  // request id on every frame and terminates query replies with a
  // {"type":"done","id"} end marker — multi-statement programs emit
  // one result frame per statement.
  const { WsConn } = await import("../src/ws.js");
  const conn = new WsConn("localhost", 0, "/ws");
  const inject = (msg) => {
    for (const cb of [...conn._listeners]) cb(msg);
  };
  const queued = [];
  conn.send = (obj) => queued.push(obj);

  // request A is a 2-statement program (2 result frames + done);
  // request B is single-statement. The server replies to B FIRST —
  // FIFO matching would misattribute every frame.
  const pA = conn.requestAll({ type: "query", tag: "A" });
  const pB = conn.request({ type: "query", tag: "B" });
  const [idA, idB] = [queued[0].id, queued[1].id];
  inject({ type: "result", id: idB, rows: [[1]] });
  inject({ type: "done", id: idB, frames: 1 });
  inject({ type: "result", id: idA, rows: [[2]] });
  inject({ type: "notification", event: "persistent_update", relation: "r" });
  inject({ type: "result", id: idA, rows: [[3]] });
  inject({ type: "done", id: idA, frames: 2 });
  const [a, b] = await Promise.all([pA, pB]);
  assert.equal(a.length, 2);
  assert.deepEqual(a.map((f) => f.rows[0][0]), [2, 3]);
  assert.deepEqual(b.rows, [[1]]);

  // an error frame is terminal — no done marker needed
  const pC = conn.requestAll({ type: "query", tag: "C" });
  inject({ type: "error", id: queued[2].id, message: "nope" });
  const c = await pC;
  assert.equal(c[0].type, "error");
  assert.equal(conn._pending.length, 0);

  // a timed-out multi-frame request keeps its slot until its done
  // marker, so late frames are consumed — the next request is safe
  const pD = conn.requestAll({ type: "query", tag: "D" }, { timeoutMs: 10 });
  await assert.rejects(pD, /timeout/);
  const pE = conn.request({ type: "query", tag: "E" });
  inject({ type: "result", id: queued[3].id, rows: [["late-D"]] });
  inject({ type: "done", id: queued[3].id, frames: 1 });
  inject({ type: "result", id: queued[4].id, rows: [["E"]] });
  inject({ type: "done", id: queued[4].id, frames: 1 });
  const e = await pE;
  assert.deepEqual(e.rows, [["E"]]);
  assert.equal(conn._pending.length, 0);
});

test("ack and pong replies are terminal without a done marker", async () => {
  const { WsConn } = await import("../src/ws.js");
  const conn = new WsConn("localhost", 0, "/ws");
  const inject = (msg) => {
    for (const cb of [...conn._listeners]) cb(msg);
  };
  const queued = [];
  conn.send = (obj) => queued.push(obj);
  const pPing = conn.request({ type: "ping" });
  const pIns = conn.request({ type: "insert_facts", relation: "r", tuples: [[1]] });
  inject({ type: "pong", id: queued[0].id });
  inject({ type: "ack", id: queued[1].id, message: "Inserted 1 fact(s) into 'r'." });
  assert.equal((await pPing).type, "pong");
  assert.equal((await pIns).type, "ack");
  // an ack-answered query ALSO emits done; the dangling done is dropped
  const pQ = conn.request({ type: "query", tag: "noresult" });
  inject({ type: "ack", id: queued[2].id, message: "ok" });
  assert.equal((await pQ).type, "ack");
  inject({ type: "done", id: queued[2].id, frames: 1 }); // must not throw
  assert.equal(conn._pending.length, 0);
});
