/**
 * Typed REST api-client against a REAL inputlayer_spark server.
 * Skipped unless INPUTLAYER_URL is set — tests/test_js_sdk.py starts
 * the server and runs this file.
 */
import { test } from "node:test";
import assert from "node:assert/strict";

import { InputLayerApiClient } from "../src/index.js";

const url = process.env.INPUTLAYER_URL;

test("typed REST client: every namespace round-trips", {
  skip: !url,
}, async () => {
  // own session: `.kg use` is session-scoped there, so this file can't
  // switch the shared engine's current KG under the other test files
  const api = new InputLayerApiClient({
    url,
    apiKey: process.env.INPUTLAYER_API_KEY || null,
    session: "api-client-test",
  });
  await api.connect();

  // admin
  const h = await api.admin.health();
  assert.equal(h.status, "ok");
  const st = await api.admin.status();
  assert.ok(Object.keys(st).length > 0);
  const { ticket } = await api.admin.wsTicket();
  assert.ok(typeof ticket === "string" && ticket.length > 10);

  // docs
  const { pages } = await api.docs.list();
  assert.ok(pages.some((p) => p.name === "iql"));
  const pg = await api.docs.page("iql");
  assert.ok(pg.markdown.length > 100);

  // knowledge graphs
  await api.knowledgeGraphs.create("api_kg");
  let kgs = await api.knowledgeGraphs.list();
  assert.ok(kgs.knowledgeGraphs.some((k) => k.name === "api_kg"));
  await api.knowledgeGraphs.use("api_kg");
  kgs = await api.knowledgeGraphs.list();
  assert.equal(kgs.current, "api_kg");

  // relations: insert, describe, page, delete
  const { inserted } = await api.relations.insertData("api_edge", [
    [1, 2],
    [2, 3],
    [3, 4],
  ]);
  assert.equal(inserted, 3);
  const rels = await api.relations.list();
  const edge = rels.relations.find((r) => r.name === "api_edge");
  assert.deepEqual({ arity: edge.arity, kind: edge.kind },
                   { arity: 2, kind: "base" });
  const desc = await api.relations.describe("api_edge");
  assert.equal(desc.columns.length, 2);
  const page1 = await api.relations.getData("api_edge", { limit: 2 });
  assert.equal(page1.rows.length, 2);
  const page2 = await api.relations.getData("api_edge", {
    limit: 2,
    offset: 2,
  });
  assert.equal(page2.rows.length, 1);
  await api.relations.deleteData("api_edge", [3, 4]);

  // rules
  await api.rules.add("+api_path(X, Y) <- api_edge(X, Y)");
  const { rules } = await api.rules.list();
  assert.ok(rules.some((r) => r.name === "api_path" && r.persistent));

  // query + debug
  const [rs] = await api.query.execute({ query: "?api_path(X, Y)" });
  assert.equal(rs.rows.length, 2);
  const { plan } = await api.query.debug({ query: "?api_path(X, Y)" });
  assert.ok(plan.length > 0);

  // cleanup + identifier guard
  await api.rules.remove("api_path");
  await api.relations.drop("api_edge");
  await api.knowledgeGraphs.use("default");
  await api.knowledgeGraphs.drop("api_kg");
  await assert.rejects(
    () => api.knowledgeGraphs.create("bad; drop"),
    /invalid identifier/
  );
});
