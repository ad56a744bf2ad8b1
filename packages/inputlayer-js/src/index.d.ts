/**
 * Type declarations for the inputlayer-spark JS SDK — the typed-client
 * ergonomics of the reference's generated REST client
 * (packages/api-client/src/client.ts, orval output) expressed as
 * hand-maintained .d.ts over this SDK's wire surface. Zero runtime
 * cost; `tsc --noEmit` consumers get full IntelliSense and checking.
 */

// ------------------------------------------------------------ values

/** Values the wire protocol carries in result rows / fact tuples. */
export type IqlValue =
  | string
  | number
  | boolean
  | null
  | IqlValue[];

export interface ColumnInfo {
  name: string;
  type: string;
}

export interface QueryResultPayload {
  columns?: ColumnInfo[];
  rows?: IqlValue[][];
  truncated?: boolean;
}

// ------------------------------------------------------------ results

export class ResultSet implements Iterable<IqlValue[]> {
  constructor(columns?: string[], types?: string[], rows?: IqlValue[][]);
  static fromPayload(p: QueryResultPayload): ResultSet;
  columns: string[];
  types: string[];
  rows: IqlValue[][];
  readonly length: number;
  isEmpty(): boolean;
  first(): IqlValue[] | null;
  scalar(): IqlValue | null;
  toTuples(): IqlValue[][];
  toDicts(): Array<Record<string, IqlValue>>;
  [Symbol.iterator](): Iterator<IqlValue[]>;
}

// ------------------------------------------------------------ errors

export class InputLayerError extends Error {
  status?: number;
}
export class ConnectionError extends InputLayerError {}
export class AuthenticationError extends InputLayerError {}
export class PermissionError extends InputLayerError {}
export class QueryError extends InputLayerError {}
export function errorFor(status: number, message: string): InputLayerError;

// ------------------------------------------------------------ client

export interface InputLayerOptions {
  /** e.g. "http://127.0.0.1:8080" */
  url: string;
  apiKey?: string | null;
  /** session id for per-session overlay facts/rules */
  session?: string | null;
  timeoutMs?: number;
}

export type NotificationCallback = (
  relation: string,
  event: string,
) => void;

export interface NotificationEvent {
  relation: string;
  event: string;
}

export class InputLayer {
  constructor(opts: InputLayerOptions);
  connect(): Promise<void>;
  health(): Promise<boolean>;
  status(): Promise<Record<string, string>>;
  /** Run a (multi-statement) IQL program; one ResultSet per statement. */
  execute(iql: string): Promise<ResultSet[]>;
  /** Run a single query; returns its ResultSet. */
  query(iql: string): Promise<ResultSet>;
  insert(relation: string, rows: Iterable<IqlValue[]>): Promise<void>;
  retract(relation: string, row: IqlValue[]): Promise<void>;
  addRule(rule: string | RuleExpr): Promise<void>;
  useKnowledgeGraph(name: string): Promise<void>;
  createKnowledgeGraph(name: string): Promise<void>;
  dropKnowledgeGraph(name: string): Promise<void>;
  listKnowledgeGraphs(): Promise<string[]>;
  /** Subscribe to persistent_update notifications; returns unsubscribe. */
  onChange(cb: NotificationCallback): Promise<() => void>;
  /** Async iterator over notifications; ends on close(). */
  notifications(): AsyncGenerator<NotificationEvent, void, void>;
  close(): void;
}

// ------------------------------------------------------------ iql text

export function compileValue(v: IqlValue): string;
export function insertStatement(
  relation: string,
  rows: Iterable<IqlValue[]>,
): string;
export function deleteStatement(relation: string, row: IqlValue[]): string;

// ------------------------------------------------------------ websocket

export interface WsFrame {
  opcode: number;
  payload: Buffer;
}
export function encodeFrame(opcode: number, payload: Buffer): Buffer;
export function decodeFrames(buf: Buffer): {
  frames: WsFrame[];
  rest: Buffer;
};
export class WsConn {
  constructor(
    host: string,
    port: number,
    path: string,
    headers?: Record<string, string>,
  );
  connect(): Promise<void>;
  onMessage(cb: (msg: unknown) => void): () => void;
  send(msg: unknown): void;
  close(): void;
}

// ------------------------------------------------------------ fluent

export interface Expr {
  iql(): string;
}
export interface Variable extends Expr {
  name: string;
}
export interface AtomExpr extends Expr {
  relation: string;
  negated: boolean;
}
export interface RuleExpr {
  iql(): string;
  persistent: boolean;
}
export interface QueryExpr {
  iql(): string;
}

export type Term = Expr | IqlValue;

/** Variable factory: `V.X`, `V.Count`, ... */
export const V: Record<string, Variable>;
/** The wildcard `_`. */
export const ANY: Variable;
/** Atom factory: `rel("edge")(V.X, V.Y)`. */
export function rel(name: string): (...terms: Term[]) => AtomExpr;
export function not(atom: AtomExpr): AtomExpr;
/** Aggregate factory: `agg.count(V.X)`, `agg.sum(V.T)`, ... */
export const agg: Record<string, (...args: Term[]) => Expr>;
/** Builtin-function factory: `fn.cosine(V.A, V.B)`, ... */
export const fn: Record<string, (...args: Term[]) => Expr>;
export function rule(head: AtomExpr, ...body: Term[]): RuleExpr;
export function sessionRule(head: AtomExpr, ...body: Term[]): RuleExpr;
export function query(
  goal: AtomExpr,
  ...rest: (Term | { limit?: number; offset?: number })[]
): QueryExpr;

// ------------------------------------------------- typed REST client
// (reference packages/api-client/src/client.ts shape over this wire)

export interface ApiClientConfig {
  url: string;
  apiKey?: string | null;
  session?: string | null;
  timeoutMs?: number;
}

export interface KnowledgeGraphInfo {
  name: string;
  current: boolean;
}

export interface RelationInfo {
  name: string;
  arity: number;
  kind: "base" | "derived" | string;
}

export interface RuleInfo {
  name: string;
  definition: string;
  persistent: boolean;
}

export interface HealthStatus {
  status: string;
  [k: string]: unknown;
}

export class AdminApi {
  health(): Promise<HealthStatus>;
  status(): Promise<Record<string, string>>;
  wsTicket(): Promise<{ ticket: string }>;
}

export class DocsApi {
  list(): Promise<{ pages: Array<{ name: string; title?: string }> }>;
  page(name: string): Promise<{ name: string; markdown: string }>;
}

export class QueryApi {
  execute(params: { query: string }): Promise<ResultSet[]>;
  debug(params: { query: string }): Promise<{ plan: string }>;
}

export class KnowledgeGraphApi {
  list(): Promise<{
    knowledgeGraphs: KnowledgeGraphInfo[];
    current?: string;
  }>;
  create(name: string): Promise<void>;
  use(name: string): Promise<void>;
  drop(name: string): Promise<void>;
}

export class RelationsApi {
  list(): Promise<{ relations: RelationInfo[] }>;
  describe(name: string): Promise<{
    columns: Array<{ column: string; type: string }>;
  }>;
  getData(
    name: string,
    params?: { limit?: number; offset?: number }
  ): Promise<{ columns: string[]; rows: IqlValue[][] }>;
  insertData(name: string, rows: IqlValue[][]): Promise<{ inserted: number }>;
  deleteData(name: string, row: IqlValue[]): Promise<void>;
  drop(name: string): Promise<void>;
}

export class RulesApi {
  list(): Promise<{ rules: RuleInfo[] }>;
  add(definition: string): Promise<void>;
  remove(nameOrIndex: string | number): Promise<void>;
}

export class InputLayerApiClient {
  constructor(config: ApiClientConfig);
  readonly admin: AdminApi;
  readonly docs: DocsApi;
  readonly query: QueryApi;
  readonly knowledgeGraphs: KnowledgeGraphApi;
  readonly relations: RelationsApi;
  readonly rules: RulesApi;
  connect(): Promise<this>;
}
