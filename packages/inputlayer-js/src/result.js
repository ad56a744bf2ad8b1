/**
 * ResultSet over the wire payload
 *   {"columns": [{"name", "type"}...], "rows": [[...], ...]}
 * API shape mirrors the reference SDK's Result (result.ts) and the
 * Python client's ResultSet (inputlayer_spark/client.py).
 */

export class ResultSet {
  constructor(columns = [], types = [], rows = []) {
    this.columns = columns;
    this.types = types;
    this.rows = rows;
  }

  static fromPayload(p) {
    const cols = p.columns ?? [];
    return new ResultSet(
      cols.map((c) => c.name),
      cols.map((c) => c.type),
      p.rows ?? [],
    );
  }

  get length() {
    return this.rows.length;
  }

  isEmpty() {
    return this.rows.length === 0;
  }

  /** First row as an array, or null. */
  first() {
    return this.rows.length ? this.rows[0] : null;
  }

  /** Single value of a 1x1 result (aggregates), or null. */
  scalar() {
    const f = this.first();
    return f && f.length ? f[0] : null;
  }

  toTuples() {
    return this.rows.map((r) => [...r]);
  }

  toDicts() {
    return this.rows.map((r) =>
      Object.fromEntries(this.columns.map((c, i) => [c, r[i]])),
    );
  }

  *[Symbol.iterator]() {
    yield* this.rows;
  }
}
