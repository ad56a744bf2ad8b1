/**
 * InputLayer — top-level async client for the inputlayer_spark query
 * server. API shape mirrors the reference JS SDK's client
 * (packages/inputlayer-js/src/client.ts: connect/close, query,
 * knowledge-graph management, notifications async iterator) re-targeted
 * at our wire protocol (inputlayer_spark/server.py):
 *
 *   POST /query {"query", "session"?}  → {"results": [...]}
 *   GET  /health, GET /status
 *   WS   /ws, /sessions/:id/ws        → query/insert_facts/add_rule/
 *                                        ping + pushed notifications
 *
 * Auth: X-API-Key header (or Authorization: Bearer) on both HTTP and
 * the WS handshake.
 */

import { ResultSet } from "./result.js";
import { errorFor, ConnectionError } from "./errors.js";
import { insertStatement, deleteStatement } from "./iql.js";
import { WsConn } from "./ws.js";

export class InputLayer {
  /**
   * @param {object} opts
   * @param {string} opts.url       e.g. "http://127.0.0.1:8080"
   * @param {string} [opts.apiKey]
   * @param {string} [opts.session] session id for ephemeral overlays
   * @param {number} [opts.timeoutMs]
   */
  constructor({ url, apiKey = null, session = null, timeoutMs = 60000 }) {
    this.url = url.replace(/\/+$/, "");
    this.apiKey = apiKey;
    this.session = session;
    this.timeoutMs = timeoutMs;
    this._ws = null;
    const u = new URL(this.url);
    this._host = u.hostname;
    this._port = Number(u.port || (u.protocol === "https:" ? 443 : 80));
  }

  _headers() {
    const h = { "Content-Type": "application/json" };
    if (this.apiKey) h["X-API-Key"] = this.apiKey;
    return h;
  }

  /** Verify the server is reachable (reference client.connect()). */
  async connect() {
    if (!(await this.health())) {
      throw new ConnectionError(`server at ${this.url} is not healthy`);
    }
    return this;
  }

  async health() {
    try {
      const r = await fetch(`${this.url}/health`, {
        signal: AbortSignal.timeout(this.timeoutMs),
      });
      return r.ok && (await r.json()).status === "ok";
    } catch {
      return false;
    }
  }

  async status() {
    const r = await fetch(`${this.url}/status`, {
      headers: this._headers(),
      signal: AbortSignal.timeout(this.timeoutMs),
    });
    return r.json();
  }

  /** Run an IQL program; one ResultSet per row-returning statement. */
  async execute(iql) {
    const body = { query: iql };
    if (this.session) body.session = this.session;
    let r;
    try {
      r = await fetch(`${this.url}/query`, {
        method: "POST",
        headers: this._headers(),
        body: JSON.stringify(body),
        signal: AbortSignal.timeout(this.timeoutMs),
      });
    } catch (e) {
      throw new ConnectionError(`cannot reach ${this.url}: ${e.message}`);
    }
    const payload = await r.json().catch(() => ({}));
    if (!r.ok) {
      throw errorFor(r.status, payload.error ?? `HTTP ${r.status}`);
    }
    return (payload.results ?? []).map(ResultSet.fromPayload);
  }

  /** Run a program and return its LAST result set. */
  async query(iql) {
    const results = await this.execute(iql);
    return results.length ? results[results.length - 1] : new ResultSet();
  }

  // ------------------------------------------------------ conveniences

  async insert(relation, rows) {
    if (rows.length) await this.execute(insertStatement(relation, rows));
  }

  async retract(relation, row) {
    await this.execute(deleteStatement(relation, row));
  }

  async addRule(rule) {
    await this.execute(rule);
  }

  async useKnowledgeGraph(name) {
    await this.execute(`.kg use ${name}`);
  }

  async createKnowledgeGraph(name) {
    await this.execute(`.kg create ${name}`);
  }

  async dropKnowledgeGraph(name) {
    await this.execute(`.kg drop ${name}`);
  }

  async listKnowledgeGraphs() {
    const rs = await this.query(".kg list");
    return rs.rows.map((r) => r[0]);
  }

  // ---------------------------------------------------- notifications

  async _wsConn() {
    if (this._ws === null) {
      const path = this.session ? `/sessions/${this.session}/ws` : "/ws";
      const headers = this.apiKey ? { "X-API-Key": this.apiKey } : {};
      this._ws = new WsConn(this._host, this._port, path, headers);
      await this._ws.connect();
    }
    return this._ws;
  }

  /**
   * Subscribe to pushed persistent_update notifications.
   * Returns an unsubscribe function.
   */
  async onChange(cb) {
    const ws = await this._wsConn();
    return ws.onMessage((msg) => {
      if (msg.type === "notification") cb(msg.relation, msg.event);
    });
  }

  /**
   * Async iterator over notification events (reference
   * client.notifications()). Ends when close() is called.
   */
  async *notifications() {
    const ws = await this._wsConn();
    const queue = [];
    let wake = null;
    const off = ws.onMessage((msg) => {
      if (msg.type !== "notification") return;
      queue.push(msg);
      if (wake) {
        wake();
        wake = null;
      }
    });
    try {
      while (!ws._closed) {
        if (queue.length) {
          yield queue.shift();
        } else {
          await new Promise((res) => {
            wake = res;
          });
        }
      }
    } finally {
      off();
    }
  }

  close() {
    if (this._ws) {
      this._ws.close();
      this._ws = null;
    }
  }
}
