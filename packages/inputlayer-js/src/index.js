/**
 * inputlayer-spark — JavaScript SDK for the inputlayer_spark IQL query
 * server. Public surface mirrors the reference SDK's top-level exports
 * (packages/inputlayer-js/src/index.ts) for the client/result/error
 * layer; the typed OLM proxy layer is served by the Python fluent API
 * (inputlayer_spark/fluent.py) — see COVERAGE.md §2.11.
 */

export { InputLayer } from "./client.js";
export { ResultSet } from "./result.js";
export {
  InputLayerError,
  ConnectionError,
  AuthenticationError,
  PermissionError,
  QueryError,
  errorFor,
} from "./errors.js";
export { compileValue, insertStatement, deleteStatement } from "./iql.js";
export { WsConn, encodeFrame, decodeFrames } from "./ws.js";
export { V, ANY, rel, not, agg, fn, rule, sessionRule, query } from "./fluent.js";
export {
  InputLayerApiClient,
  AdminApi,
  DocsApi,
  QueryApi,
  KnowledgeGraphApi,
  RelationsApi,
  RulesApi,
} from "./api.js";
