/**
 * Typed per-endpoint REST client — the ergonomics of the reference's
 * generated API client (packages/api-client/src/client.ts, orval
 * output: namespaced `client.knowledgeGraphs.list()` /
 * `client.query.execute()` wrappers) retargeted at this server's
 * actual wire surface (inputlayer_spark/server.py):
 *
 *   GET  /health, GET /status, GET /docs, GET /docs/:page
 *   POST /query {"query", "session"?}   → {"results": [...]}
 *   POST /ws_ticket                     → {"ticket"} (one-time, 60 s)
 *
 * Knowledge-graph / relation / rule management rides the engine's meta
 * statements (`.kg list`, `.rel describe`, ...) through POST /query —
 * the server intentionally exposes ONE statement endpoint rather than
 * per-resource routes, so the typed wrappers compose the statement and
 * parse the tabular reply into plain objects. Every method returns
 * typed data (see index.d.ts), never a raw wire payload.
 */

import { ResultSet } from "./result.js";
import { errorFor, ConnectionError } from "./errors.js";
import { insertStatement, deleteStatement } from "./iql.js";

/** Quote a name into a statement position (defense-in-depth: meta
 * statements take bare identifiers only). */
function ident(name) {
  if (!/^[A-Za-z_][A-Za-z0-9_]*$/.test(name)) {
    throw new Error(`invalid identifier: ${JSON.stringify(name)}`);
  }
  return name;
}

class Http {
  constructor({ url, apiKey = null, session = null, timeoutMs = 60000 }) {
    this.url = url.replace(/\/+$/, "");
    this.apiKey = apiKey;
    this.session = session;
    this.timeoutMs = timeoutMs;
  }

  _headers() {
    const h = { "Content-Type": "application/json" };
    if (this.apiKey) h["X-API-Key"] = this.apiKey;
    return h;
  }

  async request(method, path, body = undefined) {
    let r;
    try {
      r = await fetch(`${this.url}${path}`, {
        method,
        headers: this._headers(),
        body: body === undefined ? undefined : JSON.stringify(body),
        signal: AbortSignal.timeout(this.timeoutMs),
      });
    } catch (e) {
      throw new ConnectionError(`${method} ${path}: ${e.message}`);
    }
    const text = await r.text();
    let payload = null;
    try {
      payload = text ? JSON.parse(text) : null;
    } catch {
      payload = { error: text };
    }
    if (!r.ok) {
      throw errorFor(r.status, (payload && payload.error) || r.statusText);
    }
    return payload;
  }

  /** GET returning a raw (non-JSON) body, e.g. markdown. */
  async requestText(path) {
    let r;
    try {
      r = await fetch(`${this.url}${path}`, {
        headers: this._headers(),
        signal: AbortSignal.timeout(this.timeoutMs),
      });
    } catch (e) {
      throw new ConnectionError(`GET ${path}: ${e.message}`);
    }
    const text = await r.text();
    if (!r.ok) {
      let msg = r.statusText;
      try {
        msg = JSON.parse(text).error || msg;
      } catch {}
      throw errorFor(r.status, msg);
    }
    return text;
  }

  /** POST /query and return one ResultSet per statement. */
  async execute(statements) {
    const body = { query: statements };
    if (this.session) body.session = this.session;
    const { results } = await this.request("POST", "/query", body);
    return results.map((p) => ResultSet.fromPayload(p));
  }
}

/** GET /health, /status + POST /ws_ticket. */
export class AdminApi {
  constructor(http) {
    this._http = http;
  }

  /** Health probe: {status: "ok"} when the server is serving. */
  async health() {
    return this._http.request("GET", "/health");
  }

  /** Engine `.status` as a flat string map (kg, relations, rules,
   * wal, ...). */
  async status() {
    return this._http.request("GET", "/status");
  }

  /** Mint a one-time, short-TTL WebSocket handshake ticket for the
   * header-authenticated caller. */
  async wsTicket() {
    return this._http.request("POST", "/ws_ticket");
  }
}

/** GET /docs index + /docs/:page markdown. */
export class DocsApi {
  constructor(http) {
    this._http = http;
  }

  /** {pages: [{name, title}]} */
  async list() {
    return this._http.request("GET", "/docs");
  }

  /** {name, markdown} for one page — the server returns the raw
   * markdown source (404 → error). */
  async page(name) {
    const markdown = await this._http.requestText(
      `/docs/${encodeURIComponent(name)}`
    );
    return { name, markdown };
  }
}

/** POST /query. */
export class QueryApi {
  constructor(http) {
    this._http = http;
  }

  /** Execute one or more IQL statements; one ResultSet each. */
  async execute({ query }) {
    return this._http.execute(query);
  }

  /** Plan a query without executing (`.debug`): (line, plan) rows
   * joined back into one plan string. */
  async debug({ query }) {
    const [rs] = await this._http.execute(`.debug ${query}`);
    const planIdx = rs.columns.indexOf("plan");
    return {
      plan: rs.rows.map((r) => String(r[planIdx < 0 ? 0 : planIdx])).join("\n"),
    };
  }
}

/** `.kg` management through /query. */
export class KnowledgeGraphApi {
  constructor(http) {
    this._http = http;
  }

  /** All knowledge graphs + which one is current for this session. */
  async list() {
    const [rs] = await this._http.execute(".kg list");
    const kgs = rs.toDicts().map((d) => ({
      name: String(d.name),
      current: d.current === true || d.current === "true",
    }));
    const cur = kgs.find((k) => k.current);
    return { knowledgeGraphs: kgs, current: cur ? cur.name : undefined };
  }

  async create(name) {
    await this._http.execute(`.kg create ${ident(name)}`);
  }

  async use(name) {
    await this._http.execute(`.kg use ${ident(name)}`);
  }

  async drop(name) {
    await this._http.execute(`.kg drop ${ident(name)}`);
  }
}

/** `.rel` management + data paging through /query. */
export class RelationsApi {
  constructor(http) {
    this._http = http;
  }

  /** [{name, arity, kind}] — kind is "base" | "derived". */
  async list() {
    const [rs] = await this._http.execute(".rel list");
    return {
      relations: rs.toDicts().map((d) => ({
        name: String(d.name),
        arity: Number(d.arity),
        kind: String(d.kind),
      })),
    };
  }

  /** Column names/types: [{column, type}]. */
  async describe(name) {
    const [rs] = await this._http.execute(`.rel describe ${ident(name)}`);
    return {
      columns: rs.toDicts().map((d) => ({
        column: String(d.column),
        type: String(d.type),
      })),
    };
  }

  /** Page tuples of a relation: composes
   * `?name(V0 :asc, ..), limit(n, off)` from the described arity —
   * the reference's paginated relations.getData, expressed as a
   * query (ordered on the first column so pages are stable). */
  async getData(name, { limit = 100, offset = 0 } = {}) {
    const { columns } = await this.describe(name);
    const vars = columns
      .map((_, i) => (i === 0 ? "V0 :asc" : `V${i}`))
      .join(", ");
    const [rs] = await this._http.execute(
      `?${ident(name)}(${vars}), limit(${Number(limit)}, ${Number(offset)})`
    );
    return { columns: rs.columns, rows: rs.rows };
  }

  /** Insert tuples; resolves with the inserted count. */
  async insertData(name, rows) {
    await this._http.execute(insertStatement(ident(name), rows));
    return { inserted: rows.length };
  }

  /** Delete one tuple (pattern deletes go through query.execute). */
  async deleteData(name, row) {
    await this._http.execute(deleteStatement(ident(name), row));
  }

  async drop(name) {
    await this._http.execute(`.rel drop ${ident(name)}`);
  }
}

/** `.rule` management through /query. */
export class RulesApi {
  constructor(http) {
    this._http = http;
  }

  /** [{name, definition, persistent}] */
  async list() {
    const [rs] = await this._http.execute(".rule list");
    return {
      rules: rs.toDicts().map((d) => ({
        name: String(d.name),
        definition: String(d.definition),
        persistent: d.persistent === true || d.persistent === "true",
      })),
    };
  }

  /** Add a rule (statement starting with `+head <- body`). */
  async add(definition) {
    await this._http.execute(definition);
  }

  /** Remove by head name (or 1-based index). */
  async remove(nameOrIndex) {
    const key =
      typeof nameOrIndex === "number"
        ? String(nameOrIndex)
        : ident(nameOrIndex);
    await this._http.execute(`.rule remove ${key}`);
  }
}

/**
 * Namespaced typed REST client (reference InputLayerClient shape):
 *
 *   const api = new InputLayerApiClient({ url });
 *   const { knowledgeGraphs } = await api.knowledgeGraphs.list();
 *   const [rs] = await api.query.execute({ query: "?edge(X, Y)" });
 */
export class InputLayerApiClient {
  constructor(config) {
    const http = new Http(config);
    this._http = http;
    this.admin = new AdminApi(http);
    this.docs = new DocsApi(http);
    this.query = new QueryApi(http);
    this.knowledgeGraphs = new KnowledgeGraphApi(http);
    this.relations = new RelationsApi(http);
    this.rules = new RulesApi(http);
  }

  /** Verify the server is reachable (reference client.connect()). */
  async connect() {
    const h = await this.admin.health();
    if (!h || h.status !== "ok") {
      throw new ConnectionError(`server at ${this._http.url} is not healthy`);
    }
    return this;
  }
}
