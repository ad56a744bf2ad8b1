import { test } from "node:test";
import assert from "node:assert/strict";

import {
  V,
  ANY,
  rel,
  not,
  agg,
  fn,
  rule,
  sessionRule,
  query,
} from "../src/index.js";

test("rules render reference IQL", () => {
  const edge = rel("edge");
  const path = rel("path");
  const { X, Y, Z } = V;
  assert.equal(rule(path(X, Y), edge(X, Y)).iql(), "+path(X, Y) <- edge(X, Y)");
  assert.equal(
    rule(path(X, Z), edge(X, Y), path(Y, Z)).iql(),
    "+path(X, Z) <- edge(X, Y), path(Y, Z)",
  );
  assert.equal(
    sessionRule(path(X, Y), edge(X, Y)).iql(),
    "path(X, Y) <- edge(X, Y)",
  );
});

test("comparisons, arithmetic, bindings, wildcards", () => {
  const item = rel("item");
  const { Id, P, Q, T } = V;
  assert.equal(
    rule(rel("total")(Id, T), item(Id, P, Q), T.is(P.times(Q))).iql(),
    "+total(Id, T) <- item(Id, P, Q), T = (P * Q)",
  );
  assert.equal(
    query(item(Id, P, ANY), P.gt(10), P.le(100)).iql(),
    "?item(Id, P, _), P > 10, P <= 100",
  );
});

test("negation, aggregates, functions, literals", () => {
  const person = rel("person");
  const blocked = rel("blocked");
  const { X, D, S } = V;
  assert.equal(
    rule(rel("ok")(X), person(X), not(blocked(X))).iql(),
    "+ok(X) <- person(X), !blocked(X)",
  );
  assert.equal(
    rule(rel("stats")(D, agg.count(S), agg.sum(S)), rel("emp")(D, S)).iql(),
    "+stats(D, count<S>, sum<S>) <- emp(D, S)",
  );
  // camelCase aggregate names map to snake_case (topK -> top_k)
  assert.equal(agg.countDistinct(S).iql(), "count_distinct<S>");
  assert.equal(
    rule(rel("up")(X, V.U), person(X, V.N), V.U.is(fn.upper(V.N))).iql(),
    "+up(X, U) <- person(X, N), U = upper(N)",
  );
  assert.equal(
    rule(rel("t")(X), rel("s")(X, "a \"quoted\"", [1.5, 2], true)).iql(),
    '+t(X) <- s(X, "a \\"quoted\\"", [1.5, 2], true)',
  );
});

test("query limits", () => {
  const d = rel("data");
  const { X, Y } = V;
  assert.equal(query(d(X, Y), { limit: 2, offset: 1 }).iql(), "?data(X, Y), limit(2, 1)");
  assert.equal(query(d(X, Y), { limit: 5 }).iql(), "?data(X, Y), limit(5)");
});

test("live round-trip against a real server when available", { skip: !process.env.INPUTLAYER_URL }, async () => {
  const { InputLayer } = await import("../src/index.js");
  const il = new InputLayer({ url: process.env.INPUTLAYER_URL });
  const edge = rel("fl_edge");
  const path = rel("fl_path");
  const { X, Y, Z } = V;
  await il.insert("fl_edge", [
    [1, 2],
    [2, 3],
  ]);
  await il.execute(rule(path(X, Y), edge(X, Y)).iql());
  await il.execute(rule(path(X, Z), edge(X, Y), path(Y, Z)).iql());
  const rs = await il.query(query(path(1, Y)).iql());
  assert.deepEqual(rs.rows.map((r) => r[r.length - 1]).sort(), [2, 3]);
  il.close();
});
