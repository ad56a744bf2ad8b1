/**
 * Fluent IQL builder — the reference JS SDK's proxy layer as thin
 * sugar (packages/inputlayer-js/src/proxy.ts + derived.ts — API shape
 * only; this is an original implementation that renders IQL text,
 * mirroring the Python fluent layer in inputlayer_spark/fluent.py).
 *
 *   import { V, rel, agg, rule, query, not } from "inputlayer-spark";
 *   const edge = rel("edge"), path = rel("path");
 *   const { X, Y, Z } = V;
 *   rule(path(X, Z), edge(X, Y), path(Y, Z)).iql()
 *     // "+path(X, Z) <- edge(X, Y), path(Y, Z)"
 *   query(path(X, Y), X.gt(3), { limit: 10 }).iql()
 *     // "?path(X, Y), X > 3, limit(10)"
 *   rule(rel("stats")(X, agg.sum(Y)), rel("emp")(X, Y)).iql()
 *     // "+stats(X, sum<Y>) <- emp(X, Y)"
 *
 * Everything renders with .iql(); pass the text to InputLayer.execute.
 */

function render(v) {
  if (v && typeof v.iql === "function") return v.iql();
  if (typeof v === "boolean") return v ? "true" : "false";
  if (typeof v === "string") {
    return `"${v.replace(/\\/g, "\\\\").replace(/"/g, '\\"')}"`;
  }
  if (Array.isArray(v)) return `[${v.map(render).join(", ")}]`;
  return String(v);
}

class Expr {
  iql() {
    throw new Error("abstract");
  }
  // comparisons → body predicates
  eq(o) {
    return new Cmp("=", this, o);
  }
  ne(o) {
    return new Cmp("!=", this, o);
  }
  lt(o) {
    return new Cmp("<", this, o);
  }
  le(o) {
    return new Cmp("<=", this, o);
  }
  gt(o) {
    return new Cmp(">", this, o);
  }
  ge(o) {
    return new Cmp(">=", this, o);
  }
  // arithmetic → computed expressions
  plus(o) {
    return new Arith("+", this, o);
  }
  minus(o) {
    return new Arith("-", this, o);
  }
  times(o) {
    return new Arith("*", this, o);
  }
  div(o) {
    return new Arith("/", this, o);
  }
  mod(o) {
    return new Arith("%", this, o);
  }
  /** `V.T.is(expr)` → binding predicate `T = expr` */
  is(o) {
    return new Cmp("=", this, o);
  }
}

class Variable extends Expr {
  constructor(name) {
    super();
    this.name = name;
  }
  iql() {
    return this.name;
  }
}

class Cmp extends Expr {
  constructor(op, left, right) {
    super();
    this.op = op;
    this.left = left;
    this.right = right;
  }
  iql() {
    return `${render(this.left)} ${this.op} ${render(this.right)}`;
  }
}

class Arith extends Expr {
  constructor(op, left, right) {
    super();
    this.op = op;
    this.left = left;
    this.right = right;
  }
  iql() {
    return `(${render(this.left)} ${this.op} ${render(this.right)})`;
  }
}

class AggTerm extends Expr {
  constructor(func, args) {
    super();
    this.func = func;
    this.args = args;
  }
  iql() {
    return `${this.func}<${this.args.map(render).join(", ")}>`;
  }
}

class FnCall extends Expr {
  constructor(name, args) {
    super();
    this.name = name;
    this.args = args;
  }
  iql() {
    return `${this.name}(${this.args.map(render).join(", ")})`;
  }
}

class AtomExpr extends Expr {
  constructor(relation, terms, negated = false) {
    super();
    this.relation = relation;
    this.terms = terms;
    this.negated = negated;
  }
  iql() {
    const inner = `${this.relation}(${this.terms.map(render).join(", ")})`;
    return this.negated ? `!${inner}` : inner;
  }
}

class RuleExpr {
  constructor(head, body, persistent = true) {
    this.head = head;
    this.body = body;
    this.persistent = persistent;
  }
  iql() {
    const prefix = this.persistent ? "+" : "";
    return `${prefix}${this.head.iql()} <- ${this.body.map(render).join(", ")}`;
  }
}

class QueryExpr {
  constructor(goal, body, { limit = null, offset = null } = {}) {
    this.goal = goal;
    this.body = body;
    this.limit = limit;
    this.offset = offset;
  }
  iql() {
    const parts = [`?${this.goal.iql()}`, ...this.body.map(render)];
    let text = parts.join(", ");
    if (this.limit !== null) {
      text += this.offset
        ? `, limit(${this.limit}, ${this.offset})`
        : `, limit(${this.limit})`;
    }
    return text;
  }
}

/** Variable factory: `V.X`, `V.Count`, ... */
export const V = new Proxy(
  {},
  { get: (_t, name) => new Variable(String(name)) },
);

/** Wildcard `_`. */
export const ANY = new Variable("_");

/** Relation factory: `rel("edge")(X, Y)` → atom; `.not(...)` → negated. */
export function rel(name) {
  const make = (...terms) => new AtomExpr(name, terms);
  make.not = (...terms) => new AtomExpr(name, terms, true);
  make.relationName = name;
  return make;
}

/** Negate an atom: `not(edge(X, Y))`. */
export function not(atom) {
  return new AtomExpr(atom.relation, atom.terms, true);
}

/** Aggregate factory: `agg.sum(X)`, `agg.topK(3, P, S.desc)`... */
export const agg = new Proxy(
  {},
  {
    get:
      (_t, func) =>
      (...args) =>
        new AggTerm(
          String(func).replace(/[A-Z]/g, (c) => `_${c.toLowerCase()}`),
          args,
        ),
  },
);

/** Builtin-function factory: `fn.concat(a, b)`, `fn.cosine(v1, v2)`. */
export const fn = new Proxy(
  {},
  {
    get:
      (_t, name) =>
      (...args) =>
        new FnCall(String(name), args),
  },
);

/** `rule(head, ...body)` — persistent; `sessionRule` for ephemeral. */
export function rule(head, ...body) {
  return new RuleExpr(head, body, true);
}

export function sessionRule(head, ...body) {
  return new RuleExpr(head, body, false);
}

/** `query(goal, ...body, {limit, offset}?)`. */
export function query(goal, ...rest) {
  let opts = {};
  if (
    rest.length &&
    rest[rest.length - 1] &&
    typeof rest[rest.length - 1].iql !== "function" &&
    typeof rest[rest.length - 1] === "object"
  ) {
    opts = rest.pop();
  }
  return new QueryExpr(goal, rest, opts);
}
