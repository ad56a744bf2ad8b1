/**
 * Error hierarchy mirroring the reference SDK's exception surface
 * (packages/inputlayer-js/src/errors.ts — names only; the mapping here
 * is by HTTP status + server-rendered message, since our server wires
 * errors back as {"error": "..."}).
 */

export class InputLayerError extends Error {
  constructor(message) {
    super(message);
    this.name = new.target.name;
  }
}

export class ConnectionError extends InputLayerError {}
export class AuthenticationError extends InputLayerError {}
export class PermissionError extends InputLayerError {}
export class QueryError extends InputLayerError {}

/** Map an HTTP status + server error message to a typed error. */
export function errorFor(status, message) {
  if (status === 401) return new AuthenticationError(message);
  if (status === 403) return new PermissionError(message);
  if (status === 400) return new QueryError(message);
  return new InputLayerError(message);
}
