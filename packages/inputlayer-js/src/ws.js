/**
 * Minimal RFC 6455 WebSocket CLIENT over node:net — zero dependencies
 * (Node 20 has no global WebSocket). Speaks exactly what the
 * inputlayer_spark server speaks: small unfragmented text frames, plus
 * close/ping/pong control frames. Client→server frames are masked as
 * the RFC requires; server→client frames arrive unmasked.
 */

import net from "node:net";
import crypto from "node:crypto";

const GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11";

export function encodeFrame(opcode, payload) {
  const mask = crypto.randomBytes(4);
  const len = payload.length;
  let header;
  if (len < 126) {
    header = Buffer.from([0x80 | opcode, 0x80 | len]);
  } else if (len < 65536) {
    header = Buffer.alloc(4);
    header[0] = 0x80 | opcode;
    header[1] = 0x80 | 126;
    header.writeUInt16BE(len, 2);
  } else {
    header = Buffer.alloc(10);
    header[0] = 0x80 | opcode;
    header[1] = 0x80 | 127;
    header.writeBigUInt64BE(BigInt(len), 2);
  }
  const masked = Buffer.from(payload);
  for (let i = 0; i < masked.length; i++) masked[i] ^= mask[i & 3];
  return Buffer.concat([header, mask, masked]);
}

/** Incremental frame parser; returns {frames: [{opcode, payload}], rest}. */
export function decodeFrames(buf) {
  const frames = [];
  let off = 0;
  for (;;) {
    if (buf.length - off < 2) break;
    const opcode = buf[off] & 0x0f;
    const maskedBit = (buf[off + 1] & 0x80) !== 0;
    let len = buf[off + 1] & 0x7f;
    let p = off + 2;
    if (len === 126) {
      if (buf.length - p < 2) break;
      len = buf.readUInt16BE(p);
      p += 2;
    } else if (len === 127) {
      if (buf.length - p < 8) break;
      len = Number(buf.readBigUInt64BE(p));
      p += 8;
    }
    let mask = null;
    if (maskedBit) {
      if (buf.length - p < 4) break;
      mask = buf.subarray(p, p + 4);
      p += 4;
    }
    if (buf.length - p < len) break;
    let payload = Buffer.from(buf.subarray(p, p + len));
    if (mask) for (let i = 0; i < payload.length; i++) payload[i] ^= mask[i & 3];
    frames.push({ opcode, payload });
    off = p + len;
  }
  return { frames, rest: buf.subarray(off) };
}

export class WsConn {
  /**
   * @param {string} host    e.g. "127.0.0.1"
   * @param {number} port
   * @param {string} path    e.g. "/ws" or "/sessions/abc/ws"
   * @param {object} headers extra handshake headers (X-API-Key, ...)
   */
  constructor(host, port, path, headers = {}) {
    this.host = host;
    this.port = port;
    this.path = path;
    this.headers = headers;
    this._listeners = new Set();
    this._buf = Buffer.alloc(0);
    this._open = null;
    this._closed = false;
    this._sock = null;
    this._pending = [];
    this._dispatcher = false;
    this._nextId = 0;
  }

  connect() {
    if (this._open) return this._open;
    this._open = new Promise((resolve, reject) => {
      const key = crypto.randomBytes(16).toString("base64");
      const expect = crypto
        .createHash("sha1")
        .update(key + GUID)
        .digest("base64");
      const sock = net.connect(this.port, this.host);
      this._sock = sock;
      sock.on("error", (e) => reject(e));
      sock.on("connect", () => {
        const extra = Object.entries(this.headers)
          .map(([k, v]) => `${k}: ${v}\r\n`)
          .join("");
        sock.write(
          `GET ${this.path} HTTP/1.1\r\n` +
            `Host: ${this.host}:${this.port}\r\n` +
            "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
            `Sec-WebSocket-Key: ${key}\r\n` +
            "Sec-WebSocket-Version: 13\r\n" +
            extra +
            "\r\n",
        );
      });
      let handshook = false;
      sock.on("data", (chunk) => {
        this._buf = Buffer.concat([this._buf, chunk]);
        if (!handshook) {
          const idx = this._buf.indexOf("\r\n\r\n");
          if (idx < 0) return;
          const head = this._buf.subarray(0, idx).toString();
          this._buf = this._buf.subarray(idx + 4);
          // stdlib Python servers answer HTTP/1.0; the RFC allows both
          if (!/HTTP\/1\.[01] 101/.test(head) || !head.includes(expect)) {
            reject(new Error(`WebSocket handshake failed: ${head.split("\r\n")[0]}`));
            sock.destroy();
            return;
          }
          handshook = true;
          resolve(this);
        }
        this._drain();
      });
      sock.on("close", () => {
        this._closed = true;
      });
    });
    return this._open;
  }

  _drain() {
    const { frames, rest } = decodeFrames(this._buf);
    this._buf = rest;
    for (const f of frames) {
      if (f.opcode === 0x1) {
        let msg;
        try {
          msg = JSON.parse(f.payload.toString("utf8"));
        } catch {
          continue;
        }
        for (const cb of [...this._listeners]) cb(msg);
      } else if (f.opcode === 0x9) {
        this._sock.write(encodeFrame(0xa, f.payload)); // ping → pong
      } else if (f.opcode === 0x8) {
        this.close();
      }
    }
  }

  /** Register a raw-message listener; returns an unsubscribe fn. */
  onMessage(cb) {
    this._listeners.add(cb);
    return () => this._listeners.delete(cb);
  }

  send(obj) {
    this._sock.write(encodeFrame(0x1, Buffer.from(JSON.stringify(obj), "utf8")));
  }

  _routeReply(msg) {
    if (msg.type === "notification") return; // pushed, not a reply
    let entry;
    let legacy = false;
    if (msg.id !== undefined) {
      entry = this._pending.find((e) => e.id === msg.id);
      if (!entry) return; // reply to a request we no longer track
    } else {
      // Legacy server without id echo: one frame per request, FIFO.
      entry = this._pending[0];
      if (!entry) return; // unsolicited frame
      legacy = true;
    }
    if (msg.type !== "done") entry.frames.push(msg);
    // Terminal frames: the explicit end marker; an error (the server
    // aborts the request after one error frame); ack/pong (always the
    // single reply to their request — a query that acks also sends a
    // done marker afterwards, which finds no pending entry and is
    // dropped); or — on a legacy server — any frame at all.
    const terminal =
      legacy ||
      msg.type === "done" ||
      msg.type === "error" ||
      msg.type === "ack" ||
      msg.type === "pong";
    if (!terminal) return;
    this._pending.splice(this._pending.indexOf(entry), 1);
    clearTimeout(entry.timer);
    if (!entry.timedOut) entry.resolve(entry.frames); // late reply: discarded
  }

  /**
   * One request/response round-trip returning ALL reply frames.
   *
   * Each request carries a client-assigned `id`; the server echoes it
   * on every reply frame and terminates multi-frame (multi-statement)
   * replies with a `{"type": "done", "id"}` end marker, so replies are
   * matched to requests by id — concurrent and multi-statement
   * requests cannot desynchronize the pending queue. A timed-out
   * request keeps its queue slot until its terminal frame arrives so
   * late frames are consumed and discarded instead of misattributed.
   * Servers that do not echo ids fall back to FIFO single-frame
   * matching.
   */
  requestAll(obj, { timeoutMs = 30000 } = {}) {
    if (!this._dispatcher) {
      this._dispatcher = true;
      this.onMessage((msg) => this._routeReply(msg));
    }
    const id = ++this._nextId;
    return new Promise((resolve, reject) => {
      const entry = { id, frames: [], resolve, timedOut: false, timer: null };
      entry.timer = setTimeout(() => {
        entry.timedOut = true; // keep the slot — consume the late reply
        reject(new Error("WebSocket request timeout"));
      }, timeoutMs);
      this._pending.push(entry);
      try {
        this.send({ ...obj, id });
      } catch (e) {
        // never sent → no reply will come; release the slot
        clearTimeout(entry.timer);
        this._pending.splice(this._pending.indexOf(entry), 1);
        reject(e);
      }
    });
  }

  /** One round-trip resolving with the LAST reply frame (the result of
   * the final statement, or the ack/error). */
  request(obj, opts = {}) {
    return this.requestAll(obj, opts).then(
      (frames) => frames[frames.length - 1],
    );
  }

  close() {
    if (this._sock && !this._closed) {
      this._closed = true;
      try {
        this._sock.write(encodeFrame(0x8, Buffer.alloc(0)));
      } catch {}
      this._sock.destroy();
    }
  }
}
