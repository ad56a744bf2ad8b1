/**
 * IQL literal rendering and statement builders.
 *
 * Value forms follow the IQL grammar the engine parses: JSON-style
 * strings, bare numbers, true/false, and `[v1, v2, ...]` vector
 * literals (same renderings the Python client uses,
 * inputlayer_spark/client.py insert/delete).
 */

export function compileValue(v) {
  if (v === null || v === undefined) {
    throw new TypeError("IQL facts cannot contain null values");
  }
  if (Array.isArray(v)) {
    return `[${v.map(compileValue).join(", ")}]`;
  }
  if (typeof v === "number" || typeof v === "boolean") {
    return JSON.stringify(v);
  }
  if (typeof v === "bigint") {
    return v.toString();
  }
  if (typeof v === "string") {
    return JSON.stringify(v);
  }
  throw new TypeError(`cannot render ${typeof v} as an IQL literal`);
}

/** `+rel[(a, b), (c, d)]` batch insert. */
export function insertStatement(relation, rows) {
  const tuples = rows.map((r) => `(${r.map(compileValue).join(", ")})`);
  return `+${relation}[${tuples.join(", ")}]`;
}

/** `-rel(a, b)` tuple delete. */
export function deleteStatement(relation, row) {
  return `-${relation}(${row.map(compileValue).join(", ")})`;
}
