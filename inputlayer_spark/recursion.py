"""Stratification and semi-naive recursive evaluation.

Re-implements the semantics of the reference's recursion machinery
(`/root/reference/src/recursion.rs`: SCC detection + stratification with
positive/negative edges; `src/code_generator/mod.rs:313-420` semi-naive
fixpoint, :684 TC fast path) on Spark: the fixpoint loop is a driver-side
while over DataFrame unions with localCheckpoint() to cut lineage — the
standard Datalog-on-Spark pattern (GraphX/Pregel iteration shape). At
cluster scale the checkpoint goes to the cluster checkpoint dir; on
local[32] localCheckpoint suffices.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Set, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inputlayer_spark.ast_nodes import Atom, Rule
from inputlayer_spark.compiler import CompileError, compile_body, compile_head

Resolver = Callable[[str], DataFrame]


def _pin_count(df: DataFrame) -> Tuple[DataFrame, int]:
    """Materialize `df` as a lineage-severed LogicalRDD leaf AND return
    its row count in ONE Spark job.

    Every fixpoint iteration pins its delta (localCheckpoint: severs
    lineage so plan analysis stays O(1) and self-joins stay unambiguous)
    and then counts it (emptiness = termination). `localCheckpoint(
    eager=True)` internally runs a count-shaped job to materialize, so
    the explicit `.count()` after it was a SECOND job per iteration —
    pure scheduler/py4j overhead on plans that run 10-80 jobs per query
    (guide §1/§2: the anchor-TC profile showed 15 standalone count jobs
    ≈ 1.1 s of its 13.5 s wall). The lazy checkpoint marks the RDD for
    persistence and returns the same LogicalRDD-leaf plan; the count()
    then materializes blocks and counts in one pass. Local-checkpoint
    semantics (doCheckpoint computes any missing partitions) make the
    result identical to the eager form."""
    df = df.localCheckpoint(eager=False)
    return df, df.count()


class StratificationError(ValueError):
    pass


def rule_dependencies(rules: Sequence[Rule]) -> Dict[str, Set[Tuple[str, bool]]]:
    """head → {(body_relation, negated)} over the given rules."""
    deps: Dict[str, Set[Tuple[str, bool]]] = {}
    for r in rules:
        d = deps.setdefault(r.head.relation, set())
        for lit in r.body:
            if isinstance(lit, Atom):
                d.add((lit.relation, lit.negated))
    return deps


def condensation(rules: Sequence[Rule]) -> List[List[str]]:
    """Tarjan SCCs of the head-dependency graph, in reverse topological
    order of the condensation (dependencies first). Negative edge inside
    an SCC → unstratifiable (reference rejects these too,
    docs/internals/architecture.md:385-398)."""
    deps = rule_dependencies(rules)
    heads = set(deps)
    graph: Dict[str, List[str]] = {
        h: [rel for rel, _ in deps[h] if rel in heads] for h in heads
    }

    index_counter = [0]
    stack: List[str] = []
    lowlink: Dict[str, int] = {}
    index: Dict[str, int] = {}
    on_stack: Dict[str, bool] = {}
    sccs: List[List[str]] = []

    def strongconnect(v: str) -> None:
        # iterative Tarjan to dodge recursion limits on deep rule chains
        work = [(v, 0)]
        while work:
            node, pi = work[-1]
            if pi == 0:
                index[node] = lowlink[node] = index_counter[0]
                index_counter[0] += 1
                stack.append(node)
                on_stack[node] = True
            advanced = False
            for j in range(pi, len(graph[node])):
                w = graph[node][j]
                if w not in index:
                    work[-1] = (node, j + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack.get(w):
                    lowlink[node] = min(lowlink[node], index[w])
            if advanced:
                continue
            work.pop()
            if lowlink[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == node:
                        break
                sccs.append(comp)
            if work:
                parent, _ = work[-1]
                lowlink[parent] = min(lowlink[parent], lowlink[node])

    for h in sorted(heads):
        if h not in index:
            strongconnect(h)

    # check stratifiability: no negative edge within an SCC
    comp_of = {h: ci for ci, comp in enumerate(sccs) for h in comp}
    for r in rules:
        for lit in r.body:
            if isinstance(lit, Atom) and lit.negated and lit.relation in comp_of:
                if comp_of[lit.relation] == comp_of[r.head.relation]:
                    raise StratificationError(
                        f"negation cycle through {r.head.relation} / {lit.relation}"
                    )
    return sccs  # Tarjan pops dependencies before dependents


def is_recursive_scc(scc: List[str], rules: Sequence[Rule]) -> bool:
    members = set(scc)
    if len(scc) > 1:
        return True
    for r in rules:
        if r.head.relation in members:
            for lit in r.body:
                if isinstance(lit, Atom) and not lit.negated and lit.relation in members:
                    return True
    return False


def evaluate_scc(
    scc: List[str],
    rules: Sequence[Rule],
    resolve: Resolver,
    hnsw_resolver=None,
    max_iterations: int = 10_000,
    base_of: Optional[Callable[[str], Optional[DataFrame]]] = None,
) -> Dict[str, DataFrame]:
    """Evaluate one SCC; returns head → DataFrame (positional columns).

    Non-recursive SCC: union of each rule's compiled plan.
    Recursive SCC: semi-naive — per iteration each recursive rule is
    evaluated once per recursive body atom with that occurrence bound to
    the delta and the others to the accumulator; new = result − acc.

    `base_of(head)` supplies an optional base extent (explicit facts for a
    relation that ALSO has rules — the reference unions input_tuples with
    rule derivations; magic-set seeds use the same mechanism).
    """
    members = set(scc)
    scc_rules = [r for r in rules if r.head.relation in members]
    if not scc_rules:
        return {}

    def base_extent(head: str) -> Optional[DataFrame]:
        if base_of is None:
            return None
        df = base_of(head)
        if df is None:
            return None
        # positional rename to the compiler's c0..cn convention
        return df.toDF(*[f"c{i}" for i in range(len(df.columns))])

    # ---- reference recursion quirks (golden-pinned) --------------------
    # The reference's *persistent*-rule recursion only evaluates SCCs that
    # have a non-recursive exit rule, and never runs a joint fixpoint over
    # a multi-predicate (mutual) SCC:
    #   (A) persistent mutual SCC → every member empty
    #       (examples/iql/09_recursion/08_mutual_recursion.iql,
    #        09_three_way_mutual.iql: even/odd rules print "No results.")
    #   (B) session-rule mutual SCC → each member is evaluated on its own
    #       with branches that reference an SCC mate dropped — no joint
    #       fixpoint (15_mutual_one_branch_empty.iql: a_derived stays
    #       {1,2,3} even once b_derived={10,20})
    #   (C) BOUND query over a persistent self-recursive predicate with no
    #       non-recursive exit rule → empty (the reference's magic-sets
    #       path never seeds from base facts: 56_all_paths.iql's
    #       ?reachable("s",End,D) → empty, while the unbound
    #       ?level(Node,Depth) of 41_level_tracking.iql returns the full
    #       fixpoint incl. the base fact) — handled in _try_magic
    if len(scc) > 1:
        if all(getattr(r, "persistent", False) for r in scc_rules):
            out = {}
            for head in scc:
                base = base_extent(head)
                if base is not None:
                    out[head] = base.limit(0)
            return out  # members absent from `out` resolve as empty
        out = {}
        for head in scc:
            kept = [
                r
                for r in scc_rules
                if r.head.relation == head
                and not any(
                    isinstance(lit, Atom)
                    and lit.relation in members
                    and lit.relation != head
                    for lit in r.body
                )
            ]
            if kept:
                out.update(
                    evaluate_scc(
                        [head], kept, resolve, hnsw_resolver,
                        max_iterations, base_of,
                    )
                )
            else:
                base = base_extent(head)
                if base is not None:
                    out[head] = base.limit(0)
        return out
    # Quirk (C) — persistent self-recursion with no exit rule returns
    # empty ONLY for bound queries (the reference's magic-sets path does
    # not seed from base facts); unbound queries run the full fixpoint
    # with base-fact seeds (41_level_tracking, 38_fibonacci_like). The
    # bound case is handled in IQLEngine._try_magic.
    # --------------------------------------------------------------------

    if not is_recursive_scc(scc, rules):
        out: Dict[str, DataFrame] = {}
        for head in scc:
            dfs = [
                compile_head(
                    compile_body(
                        r.body,
                        resolve,
                        hnsw_resolver,
                        bool_consts_nop=getattr(r, "persistent", False),
                    ),
                    r.head,
                )
                for r in scc_rules
                if r.head.relation == head
            ]
            base = base_extent(head)
            if base is not None:
                dfs.append(base)
            merged = dfs[0]
            for d in dfs[1:]:
                merged = merged.unionByName(d)
            out[head] = merged.distinct() if len(dfs) > 1 else merged
        return out

    # ---- recursive SCC: semi-naive fixpoint ----
    # Per-iteration cost is dominated by fixed Spark overheads, not data:
    # base relations (e.g. the edge table) re-scan their source on every
    # iteration — cache them once for the loop. Tiny-delta shuffle fan-out
    # is handled by AQE partition coalescing (parallelismFirst=false,
    # session.py) instead of mutating the session-wide shuffle-partition
    # conf, which raced with concurrent queries on a shared SparkSession.
    base_cache: Dict[str, DataFrame] = {}
    outer_resolve = resolve

    def resolve(name: str) -> DataFrame:  # noqa: F811 — loop-scoped cache
        if name not in base_cache:
            base_cache[name] = outer_resolve(name).persist()
        return base_cache[name]

    try:
        doubled = _try_path_doubling(
            scc_rules, members, resolve, hnsw_resolver, base_extent
        )
        if doubled is not None:
            return doubled
        return _seminaive_fixpoint(
            scc_rules, members, resolve, hnsw_resolver, base_extent, max_iterations
        )
    finally:
        # unpersist on every exit path (incl. non-convergence / compile
        # errors) so cached base frames don't leak into later queries
        for df in base_cache.values():
            df.unpersist()


def _try_path_doubling(
    scc_rules,
    members,
    resolve,
    hnsw_resolver,
    base_extent,
) -> Optional[Dict[str, DataFrame]]:
    """Log-depth evaluation for composable linear recursion.

    A single-head SCC whose one recursive rule is a state-update
    composition — head and recursive atom agree on "carried" positions and
    the updated positions are rebound through a non-recursive sub-body —
    is `h = X ∘ S*` for seed X (exit rules + base facts) and step relation
    S (old-state → new-state pairs from the sub-body). Both TC directions
    qualify: `p(X,Z) <- p(X,Y), e(Y,Z)` and `p(X,Z) <- e(X,Y), p(Y,Z)`.

    Evaluate by squaring: R ← R ∪ R∘S_k and S_{k+1} ← S_k ∪ S_k∘S_k
    reach fixpoint in ceil(log2(depth)) iterations instead of depth —
    a 200-edge chain golden is 8 Spark jobs, not 200 (the reference's
    deep-recursion goldens, examples/iql/09_recursion/06-07). Stopping
    when R stabilizes is exact: a minimal-length tuple of X∘S* missing
    from R would have its predecessor in R, hence be in R∘S ⊆ R.

    Returns None when the shape doesn't apply (multiple/mutual recursive
    rules, constants or repeated vars in the recursive atom, filters over
    carried variables) — the semi-naive fixpoint remains the general path.
    Gated to seeds of comparable size to the step relation: for a tiny
    seed over a big graph, squaring densifies S globally while seeded
    semi-naive stays output-proportional.
    """
    from inputlayer_spark.ast_nodes import Var
    from pyspark.sql import functions as F

    if len(members) != 1:
        return None
    head_rel = next(iter(members))

    rec_rules = []
    exit_rules = []
    for r in scc_rules:
        rec_atoms = [
            lit
            for lit in r.body
            if isinstance(lit, Atom) and not lit.negated and lit.relation in members
        ]
        if any(
            isinstance(lit, Atom) and lit.negated and lit.relation in members
            for lit in r.body
        ):
            return None
        if rec_atoms:
            rec_rules.append((r, rec_atoms))
        else:
            exit_rules.append(r)
    if len(rec_rules) != 1 or len(rec_rules[0][1]) != 1:
        return None
    r, (hatom,) = rec_rules[0][0], rec_rules[0][1]

    def plain_distinct_vars(terms):
        names = [
            t.name
            for t in terms
            if isinstance(t, Var) and not t.is_wildcard
        ]
        if len(names) != len(terms) or len(set(names)) != len(terms):
            return None
        return names

    hd = plain_distinct_vars(r.head.terms)
    hh = plain_distinct_vars(hatom.terms)
    if hd is None or hh is None or len(hd) != len(hh):
        return None

    carried = [i for i in range(len(hd)) if hd[i] == hh[i]]
    updated = [i for i in range(len(hd)) if hd[i] != hh[i]]
    if not updated:
        return None  # head == recursive atom: a no-op rule, nothing to derive
    carried_vars = {hd[i] for i in carried}
    in_vars = [hh[i] for i in updated]
    out_vars = [hd[i] for i in updated]
    if set(in_vars) & set(out_vars):
        return None  # variable moves between positions — not a composition
    if carried_vars & (set(in_vars) | set(out_vars)):
        return None

    rest = tuple(lit for lit in r.body if lit is not hatom)
    if not rest:
        return None
    try:
        step_body = compile_body(
            rest,
            resolve,
            hnsw_resolver,
            bool_consts_nop=getattr(r, "persistent", False),
        )
    except Exception:
        return None  # sub-body not safe standalone — fall back
    ecols = set(step_body.columns)
    if not (set(in_vars) | set(out_vars)) <= ecols:
        return None
    if carried_vars & ecols:
        return None  # step depends on carried state — not composable

    k = len(updated)
    s_cols = [f"s{i}" for i in range(k)]
    t_cols = [f"t{i}" for i in range(k)]
    step = step_body.select(
        *[F.col(v).alias(s_cols[i]) for i, v in enumerate(in_vars)],
        *[F.col(v).alias(t_cols[i]) for i, v in enumerate(out_vars)],
    ).distinct()

    # seed: exit rules + base extent, in positional c0..cn form
    seed_parts = []
    for er in exit_rules:
        try:
            seed_parts.append(
                compile_head(
                    compile_body(
                        er.body,
                        resolve,
                        hnsw_resolver,
                        bool_consts_nop=getattr(er, "persistent", False),
                    ),
                    er.head,
                )
            )
        except _EmptyRelation:
            continue
    base = base_extent(head_rel)
    if base is not None:
        seed_parts.append(base)
    if not seed_parts:
        return {}  # no seed → empty fixpoint; caller treats missing as empty

    seed = seed_parts[0]
    for p in seed_parts[1:]:
        seed = seed.unionByName(p)
    seed, n_seed = _pin_count(seed.distinct())
    if n_seed == 0:
        return {}
    step, n_step = _pin_count(step)
    if n_step == 0:
        return {head_rel: seed}
    # tiny seed over a big step graph: seeded semi-naive is
    # output-proportional; squaring would densify S globally
    if n_seed * 20 < n_step:
        return None

    arity = len(hd)
    rcols = [f"c{i}" for i in range(arity)]
    upd_c = [rcols[i] for i in updated]

    # Driver-local closure for small inputs (the broadcast-threshold
    # principle): seed and step are already computed BY Spark with full
    # body semantics; when both fit comfortably in the driver, the pure
    # composition loop runs in Python in microseconds instead of
    # O(log depth) cluster jobs. Falls back mid-way if the closure
    # explodes past the result cap.
    if n_seed + n_step <= _local_fixpoint_max():
        local = _local_composition_closure(
            seed, step, arity, updated, k, s_cols, t_cols
        )
        if local is not None:
            return {head_rel: local}

    compose_seq = [0]

    def compose_r(rdf: DataFrame, sdf: DataFrame) -> DataFrame:
        # unique aliases per call: the super-sweep chains TWO compose
        # joins against the same step frame in one plan, so attribute
        # references must be qualified to stay unambiguous
        compose_seq[0] += 1
        la, ra = f"__cr_l{compose_seq[0]}", f"__cr_r{compose_seq[0]}"
        rdf, sdf = rdf.alias(la), sdf.alias(ra)
        # ONE F.expr / selectExpr round-trip per sweep (r14): the
        # per-column Column towers cost ~40 py4j round-trips per sweep
        # x ~15-25 sweeps per deep fixpoint — identical join condition
        # and projection
        cond = F.expr(
            " AND ".join(
                f"{la}.{upd_c[i]} = {ra}.{s_cols[i]}" for i in range(k)
            )
        )
        out = rdf.join(sdf, cond, "inner")
        proj = []
        for i in range(arity):
            if i in updated:
                proj.append(
                    f"{ra}.{t_cols[updated.index(i)]} AS {rcols[i]}"
                )
            else:
                proj.append(f"{la}.{rcols[i]}")
        return out.selectExpr(*proj)

    def compose_s(sdf: DataFrame) -> DataFrame:
        # self-join: alias both sides so column refs resolve unambiguously
        a, b = sdf.alias("__pd_l"), sdf.alias("__pd_r")
        cond = F.expr(
            " AND ".join(
                f"__pd_l.{t_cols[i]} = __pd_r.{s_cols[i]}" for i in range(k)
            )
        )
        return a.join(b, cond, "inner").selectExpr(
            *[f"__pd_l.{c}" for c in s_cols],
            *[f"__pd_r.{c}" for c in t_cols],
        )

    # ---- distributed blocked doubling + semi-naive delta sweep ----
    #
    # Unbounded squaring (S ← S ∪ S∘S every iteration) is catastrophic on
    # DENSE step relations: once S approaches the closure, S∘S's join
    # intermediate is Σ_m indeg(m)·outdeg(m) ≈ |V|³/6 — measured ~560M
    # rows on a 1500-node/73k-edge graph whose closure is ~1.05M pairs.
    # So (a) WIDEN the step by squaring only while it stays within a
    # growth cap of the original (cheap on path-like graphs, where
    # squaring is the whole win: each delta sweep then advances 2^k
    # hops), and (b) run the R-side as a SEMI-NAIVE delta loop — only
    # newly derived tuples compose with S, so total join intermediate is
    # |closure| · avg-degree, not per-iteration recomputation. Dense
    # graphs skip (a) immediately and their small diameter bounds (b)'s
    # iteration count; deep sparse chains widen to ~8× and sweep in
    # depth/2^k jobs. Same blocked-doubling shape as the seeded BFS in
    # magic_sets.seeded_tc_closure.
    # A squaring is accepted only while it behaves like a path graph
    # (per-squaring growth ≤3× — a chain doubles exactly; a dense graph
    # jumps 7×+ on the FIRST squaring and must keep its raw edges, since
    # every widened step multiplies the delta sweeps' join fan-out) and
    # the total stays within 8× of the original edges.
    # NOTE (r10): an "exact" alternative was measured and REVERTED —
    # gating on the squaring join's intermediate (|S| × max out-degree
    # ≤ 10-30M) lets wide-but-shallow graphs widen to 4+ hops, and the
    # sweeps then pay out-degree-many rederivations per closure pair:
    # anchor 10.8 s -> 24-26 s, transitive_closure_large 27 s -> 72 s.
    # The growth ratio IS the right signal: it detects exactly the
    # fan-out that multiplies sweep volume.
    growth_cap = 8
    widened, n_widened = step, n_step
    for _ in range(6):  # ≤ 64-hop widening
        s2, n2 = _pin_count(
            widened.unionByName(compose_s(widened)).distinct()
        )
        if n2 == n_widened:
            break  # step relation closed — S* reached
        if n2 > 3 * n_widened or n2 > growth_cap * n_step:
            break  # densifying: stop squaring, sweep with what we have
        widened, n_widened = s2, n2

    # map-side the step when it fits an executor: the big (delta) side
    # then never shuffles in the compose join
    sweep_step = (
        F.broadcast(widened) if n_widened <= 2_000_000 else widened
    )
    # the accumulated result stays a LAZY union of checkpointed deltas:
    # deltas are pairwise disjoint by construction, every part is
    # already materialized, and re-checkpointing the growing union each
    # sweep would rewrite O(sweeps × |closure|) rows for nothing
    # Termination is guaranteed without an artificial depth bound: each
    # sweep's `new` is disjoint from `result` (subtract), so a nonempty
    # delta strictly grows the result toward the finite closure — at
    # most |closure| sweeps. A fixed small bound would wrongly reject
    # chains deeper than bound × 2^k hops (the pre-round-5 loop's 64
    # squarings covered any depth; sweeps don't). The huge cap below is
    # a runaway backstop, not a semantic limit.
    result = seed
    n_result = n_seed
    delta = seed

    def anti_result(composed: DataFrame, res: DataFrame) -> DataFrame:
        """Null-safe broadcast anti-join: drop already-derived tuples
        MAP-SIDE before any shuffle — on dense graphs a late sweep's
        composition is dominated by rederivations of known pairs
        (measured ~38M rows vs a ~1M-pair closure), so this cuts the
        per-sweep shuffle volume to the surviving new derivations."""
        left, right = composed.alias("__sw_l"), res.alias("__sw_r")
        cond = F.expr(
            " AND ".join(f"__sw_l.{c} <=> __sw_r.{c}" for c in rcols)
        )
        return left.join(F.broadcast(right), cond, "left_anti")

    for _ in range(1_000_000):  # depth/2^k sweeps; exits on empty delta
        if n_result <= 3_000_000:
            # broadcast null-safe anti-join + distinct ≡ EXCEPT
            # DISTINCT, but already-derived tuples are dropped MAP-SIDE
            # before any shuffle (see anti_result). A two-sweep fusion
            # (both hops in one action sharing the result broadcast via
            # ReuseExchange) was built and A/B-measured this round:
            # anchor-TC mins 10.7-11.9 s fused vs 10.5-10.6 s classic —
            # the second hop's duplicated d1 aggregate and the wider
            # fused plan cost more than the saved broadcast build, so
            # it was REVERTED (OPTIMIZATION_r13.md).
            new, n_new = _pin_count(
                anti_result(compose_r(delta, sweep_step), result).distinct()
            )
            # _pin_count severs lineage (localCheckpoint), so the next
            # sweep's delta⋈step join doesn't alias two frames sharing
            # the step's lineage (ambiguous self-join)
            if n_new == 0:
                return {head_rel: result}
            result = result.unionByName(new)
            n_result += n_new
            delta = new
        else:
            # result too big to broadcast: EXCEPT DISTINCT (dedups the
            # composition AND removes derived tuples in one shuffle);
            # single-hop sweeps — there is no shared broadcast build to
            # amortize on this branch
            composed = compose_r(delta, sweep_step)
            new, n_new = _pin_count(composed.subtract(result))
            if n_new == 0:
                return {head_rel: result}
            result = result.unionByName(new)
            n_result += n_new
            delta = new
    raise CompileError(
        "path-doubling fixpoint did not stabilize within the sweep backstop"
    )


def _local_fixpoint_max() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_LOCAL_FIXPOINT_MAX", "100000"))


def _local_fixpoint_result_max() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_LOCAL_FIXPOINT_RESULT_MAX", "2000000"))


def _norm_key(vals: tuple):
    """Join-key normalization so Python dict equality matches Spark join
    semantics: Spark treats NaN == NaN as true in joins; Python's NaN is
    never equal to itself."""
    out = []
    for v in vals:
        if isinstance(v, float) and v != v:
            out.append("__nan__")
        else:
            out.append(v)
    return tuple(out)


def _local_composition_closure(
    seed: DataFrame, step: DataFrame, arity, updated, k, s_cols, t_cols
) -> Optional[DataFrame]:
    """Python semi-naive closure of seed ∘ step*. Returns None if the
    result outgrows the cap (caller falls back to distributed doubling).
    Null join keys never match (SQL inner-join semantics)."""
    spark = seed.sparkSession
    seed_rows = [tuple(r) for r in seed.collect()]
    adj: Dict[tuple, list] = {}
    for r in step.collect():
        key_in = tuple(r[i] for i in range(k))
        key_out = tuple(r[k + i] for i in range(k))
        if any(v is None for v in key_in) or any(v is None for v in key_out):
            continue  # null keys don't join
        adj.setdefault(_norm_key(key_in), []).append(key_out)

    cap = _local_fixpoint_result_max()
    result = set(seed_rows)
    frontier = list(result)
    while frontier:
        new = []
        for t in frontier:
            # None-keyed states can't appear in adj (skipped above), so
            # the lookup itself enforces null-never-joins
            key = _norm_key(tuple(t[i] for i in updated))
            for nxt in adj.get(key, ()):
                nt = list(t)
                for pos, val in zip(updated, nxt):
                    nt[pos] = val
                ntt = tuple(nt)
                if ntt not in result:
                    result.add(ntt)
                    new.append(ntt)
        if len(result) > cap:
            return None
        frontier = new

    from inputlayer_spark.session import small_local_df

    return small_local_df(spark, result, seed.schema)


def _seminaive_fixpoint(
    scc_rules,
    members,
    resolve,
    hnsw_resolver,
    base_extent,
    max_iterations,
) -> Dict[str, DataFrame]:
    exit_rules = []
    rec_rules = []
    for r in scc_rules:
        rec_atoms = [
            idx
            for idx, lit in enumerate(r.body)
            if isinstance(lit, Atom) and not lit.negated and lit.relation in members
        ]
        if rec_atoms:
            rec_rules.append((r, rec_atoms))
        else:
            exit_rules.append(r)

    acc: Dict[str, Optional[DataFrame]] = {h: None for h in members}
    delta: Dict[str, Optional[DataFrame]] = {h: None for h in members}

    def resolve_with(overlay: Dict[str, DataFrame]) -> Resolver:
        def _r(name: str) -> DataFrame:
            if name in overlay:
                df = overlay[name]
                if df is None:
                    raise _EmptyRelation(name)
                return df
            return resolve(name)

        return _r

    # Pinning strategy: eager localCheckpoint. persist() caches DATA but
    # leaves the LOGICAL plan intact, so per-iteration plan analysis
    # (unionByName/anti-join over an acc that references prior iterations)
    # grows without bound — measured as 10s+ driver-side unionByName calls
    # by iteration ~8 (faulthandler stack: py4j send_command inside
    # unionByName). localCheckpoint swaps the plan for a LogicalRDD leaf:
    # analysis stays O(1) per iteration. Checkpoint blocks are freed by
    # the ContextCleaner (spark.cleaner.periodicGC.interval=45s,
    # session.py) rather than deterministically — the lesser evil.
    pinned: List[DataFrame] = []

    def pin(df: DataFrame) -> Tuple[DataFrame, int]:
        return _pin_count(df)

    # initialize from exit rules + base extents (explicit facts / magic seeds)
    for r in exit_rules:
        df = compile_head(
            compile_body(
                r.body, resolve, hnsw_resolver,
                bool_consts_nop=getattr(r, "persistent", False),
            ),
            r.head,
        )
        prev = acc[r.head.relation]
        acc[r.head.relation] = df if prev is None else prev.unionByName(df).distinct()
    for h in members:
        base = base_extent(h)
        if base is not None:
            prev = acc[h]
            acc[h] = base if prev is None else prev.unionByName(base).distinct()
    acc_rows: Dict[str, int] = {h: 0 for h in members}
    for h in members:
        if acc[h] is not None:
            acc[h], acc_rows[h] = pin(acc[h])
        delta[h] = acc[h]

    def apply_rules(
        cur_delta: Dict[str, Optional[DataFrame]],
        cur_acc: Dict[str, Optional[DataFrame]],
    ) -> Dict[str, Optional[DataFrame]]:
        """One semi-naive application: per rule, one evaluation per
        recursive occurrence with that occurrence reading the delta and
        the rest the accumulator. Purely lazy — no actions."""
        new_tuples: Dict[str, Optional[DataFrame]] = {h: None for h in members}
        for r, rec_positions in rec_rules:
            for focus in rec_positions:
                overlay: Dict[str, DataFrame] = {}
                skip = False
                body = list(r.body)
                for idx, lit in enumerate(r.body):
                    if not (isinstance(lit, Atom) and not lit.negated and lit.relation in members):
                        continue
                    source = cur_delta if idx == focus else cur_acc
                    df = source[lit.relation]
                    if df is None:
                        skip = True
                        break
                    # same relation may need delta AND acc in one body —
                    # alias each occurrence to a unique name
                    alias = f"__{lit.relation}__{idx}"
                    overlay[alias] = df
                    body[idx] = Atom(alias, lit.terms)
                if skip:
                    continue
                try:
                    df = compile_head(
                        compile_body(
                            tuple(body),
                            resolve_with(overlay),
                            hnsw_resolver,
                            bool_consts_nop=getattr(r, "persistent", False),
                        ),
                        r.head,
                    )
                except _EmptyRelation:
                    continue
                prev = new_tuples[r.head.relation]
                new_tuples[r.head.relation] = df if prev is None else prev.unionByName(df)
        return new_tuples

    # acc is kept as a lazy union of pinned deltas; every few iterations
    # it is compacted into one fresh pinned frame so per-iteration plan
    # analysis (anti-join against acc) stays O(1) instead of growing with
    # the iteration count — measured to dominate deep-BFS fixpoints.
    ACC_COMPACT_EVERY = 4
    acc_parts: Dict[str, int] = {h: 1 for h in members}

    iteration = 0
    while True:
        iteration += 1
        if iteration > max_iterations:
            raise CompileError(f"fixpoint did not converge in {max_iterations} iterations")

        collected = apply_rules(delta, acc)

        any_new = False
        for h in members:
            if collected[h] is None:
                delta[h] = None
                continue
            candidate = collected[h].distinct()
            if acc[h] is not None:
                # dedup against acc map-side while acc is broadcastable
                # (the distributed-TC branch's 3M-row policy): a plain
                # left-anti would shuffle BOTH the candidate and the
                # ever-growing acc every iteration — the dominant cost
                # of deep fixpoints once acc outgrows a few 100k rows.
                # Row cap scaled by width so WIDE relations don't ship
                # multi-GB broadcasts (strings estimated at ~24B/cell;
                # ≤3M rows for the 2-col closure shape, shrinking as
                # columns grow, bounded by ~256MB estimated).
                est_row_bytes = 12 + 24 * len(acc[h].columns)
                bcast_rows = min(3_000_000, (256 << 20) // est_row_bytes)
                anti = (
                    F.broadcast(acc[h])
                    if acc_rows[h] <= bcast_rows
                    else acc[h]
                )
                candidate = candidate.join(
                    anti, on=list(candidate.columns), how="left_anti"
                )
            candidate, n = pin(candidate)
            if n == 0:
                delta[h] = None
                continue
            any_new = True
            delta[h] = candidate
            # acc grows as a lazy union of pinned deltas; compact it back
            # to one pinned frame every few iterations (see above)
            acc[h] = candidate if acc[h] is None else acc[h].unionByName(candidate)
            acc_rows[h] += n
            acc_parts[h] += 1
            if acc_parts[h] >= ACC_COMPACT_EVERY:
                acc[h], _ = pin(acc[h])
                acc_parts[h] = 1
        if not any_new:
            break

    out = {}
    for h in members:
        if acc[h] is not None:
            # compact: acc is a lazy union over iteration checkpoints;
            # one final checkpoint gives consumers a flat scan. LAZY
            # (r14, the r13 _pin_count discipline): the eager form ran
            # the full-closure rewrite as its own standalone job; the
            # lazy pin folds it into the consumer's first action —
            # same blocks, one fewer job per recursive query.
            out[h] = acc[h].localCheckpoint(eager=False)
    return out


class _EmptyRelation(Exception):
    def __init__(self, name: str):
        self.name = name


# ---------------------------------------------------------------- DRed


def _bcast_rows_cap(ncols: int) -> int:
    """Row cap for broadcast hints, scaled by estimated row width
    (~24B/cell) and bounded at ~256MB — the same policy as the general
    fixpoint's dedup gate."""
    return min(3_000_000, (256 << 20) // (12 + 24 * max(ncols, 1)))


def _maybe_bcast(df: Optional[DataFrame], n: Optional[int]) -> Optional[DataFrame]:
    """Broadcast-hint a frame whose row count is known small. The
    maintenance loops join tiny deltas against million-row cached
    fixpoints whose checkpointed (LogicalRDD) stats Catalyst can't
    estimate — without the hint it plans a sort-merge join that
    shuffles the big cached side on every maintenance step."""
    if df is None or n is None:
        return df
    return F.broadcast(df) if n <= _bcast_rows_cap(len(df.columns)) else df


def _apply_with_sources(
    r: Rule,
    focus_idx: Optional[int],
    focus_df: Optional[DataFrame],
    member_src: Dict[str, Optional[DataFrame]],
    resolve_base: Resolver,
    hnsw_resolver,
) -> Optional[DataFrame]:
    """Evaluate rule `r` with the positive atom at `focus_idx` reading
    `focus_df`, other member atoms reading `member_src[rel]`, and every
    remaining relation via `resolve_base`. Returns the compiled head
    frame, or None when any required source is empty/absent."""
    from inputlayer_spark.compiler import EmptyAritylessRelation

    overlay: Dict[str, DataFrame] = {}
    body = list(r.body)
    for idx, lit in enumerate(r.body):
        if not (isinstance(lit, Atom) and not lit.negated):
            continue
        if focus_idx is not None and idx == focus_idx:
            df = focus_df
        elif lit.relation in member_src:
            df = member_src[lit.relation]
        else:
            continue
        if df is None:
            return None
        alias = f"__{lit.relation}__{idx}"
        overlay[alias] = df
        body[idx] = Atom(alias, lit.terms)

    def res(name: str) -> DataFrame:
        if name in overlay:
            return overlay[name]
        return resolve_base(name)

    try:
        return compile_head(
            compile_body(
                tuple(body), res, hnsw_resolver,
                bool_consts_nop=getattr(r, "persistent", False),
            ),
            r.head,
        )
    except EmptyAritylessRelation:
        return None


def dred_retract(
    scc_rules: Sequence[Rule],
    members: Sequence[str],
    deleted_rel: str,
    deleted_df: DataFrame,
    cached: Dict[str, DataFrame],
    resolve_old: Resolver,
    resolve_new: Resolver,
    hnsw_resolver,
    max_iterations: int = 24,
) -> Optional[Dict[str, DataFrame]]:
    """DRed (delete–rederive) maintenance of a positive recursive SCC's
    materialized fixpoint after base-fact deletions — the Spark analog of
    the reference's differential retraction through recursive views
    (src/incremental.rs:36-41; BENCHMARKS.md:67-71: 602 ms re-query vs
    11.3 s recompute). Classic algorithm (Gupta/Mumick/Subrahmanian '93):

    1. OVERDELETE — semi-naive fixpoint over deletions: every cached
       tuple with at least one derivation through a deleted fact, seeded
       by the deleted base tuples, propagated through the SCC's rules
       against the OLD database. Cost tracks the deletion cone, not the
       view.
    2. REDERIVE — restrict to overdeleted tuples and find those with an
       alternative derivation from the remaining database; one full rule
       application seeds it, then semi-naive deltas. This is the only
       full-width step — a single application, not depth-many.

    Caller guarantees: all rules positive (no negation), no aggregates,
    no hnsw predicates, `cached` holds every member's old extent, and
    non-member body relations are unaffected by the deletion.
    Returns {member: maintained DataFrame}, or None to signal the caller
    to fall back to full recomputation.

    Cost guard — WHEN DRed loses to recompute: the overdelete loop
    propagates the deletion cone ONE derivation step per iteration
    (linear rules), each iteration costing a handful of Spark jobs. On a
    deep chain a single deleted edge near the end overdeletes
    depth-many tuples across depth-many iterations — measured runaway
    (hundreds of iterations × ~4 jobs) where the from-scratch
    path-doubling recompute is LOG-depth. So DRed bails to recompute
    when (a) the cone hasn't converged within `max_iterations` hops, or
    (b) the overdeleted set exceeds half of the cached view (rederiving
    most of the view = recomputing it, with extra bookkeeping). Bailing
    is always safe: the caller invalidates and re-derives.
    """
    import os
    import sys
    import time as _time

    trace = os.environ.get("SPARK_GRAFT_DRED_TRACE") == "1"
    t_start = _time.perf_counter()
    n_pins = [0]
    marks: List[Tuple[str, float]] = []

    def mark(label: str):
        if trace:
            marks.append((label, _time.perf_counter() - t_start))

    rules = list(scc_rules)
    members_set = set(members)

    def pin(df: DataFrame) -> Tuple[DataFrame, int]:
        n_pins[0] += 1
        return _pin_count(df)

    def union_into(acc: Dict[str, Optional[DataFrame]], head: str, df):
        if df is None:
            return
        prev = acc.get(head)
        acc[head] = df if prev is None else prev.unionByName(df)

    cached_src: Dict[str, Optional[DataFrame]] = {m: cached[m] for m in members_set}

    # ---------------------------------------------------- 1. overdelete
    over: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    delta: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    delta_rows: Dict[str, int] = {}
    seed: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    deleted_small = _maybe_bcast(deleted_df, deleted_df.count())
    for r in rules:
        for idx, lit in enumerate(r.body):
            if (
                isinstance(lit, Atom)
                and not lit.negated
                and lit.relation == deleted_rel
            ):
                union_into(
                    seed,
                    r.head.relation,
                    _apply_with_sources(
                        r, idx, deleted_small, cached_src, resolve_old, hnsw_resolver
                    ),
                )
    over_rows = 0
    for h in members_set:
        if seed[h] is None:
            continue
        cand = seed[h].distinct().join(
            cached[h], on=list(seed[h].columns), how="left_semi"
        )
        cand, n = pin(cand)
        if n:
            over[h] = delta[h] = cand
            delta_rows[h] = n
            over_rows += n

    mark("overdelete_seed")
    # cone-size budget: half the cached view (see docstring guard (b));
    # counting cached extents costs one job per member, paid once
    cone_budget = max(1, sum(cached[h].count() for h in members_set) // 2)
    mark("cone_budget")

    iteration = 0
    while any(delta[h] is not None for h in members_set):
        iteration += 1
        if iteration > max_iterations or over_rows > cone_budget:
            return None  # deep/wide cone: recompute (log-depth) wins
        new_tuples: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
        for r in rules:
            for idx, lit in enumerate(r.body):
                if not (
                    isinstance(lit, Atom)
                    and not lit.negated
                    and lit.relation in members_set
                ):
                    continue
                if delta[lit.relation] is None:
                    continue
                union_into(
                    new_tuples,
                    r.head.relation,
                    _apply_with_sources(
                        r,
                        idx,
                        _maybe_bcast(
                            delta[lit.relation], delta_rows.get(lit.relation)
                        ),
                        cached_src,
                        resolve_old,
                        hnsw_resolver,
                    ),
                )
        next_delta: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
        for h in members_set:
            if new_tuples[h] is None:
                continue
            cand = new_tuples[h].distinct().join(
                cached[h], on=list(new_tuples[h].columns), how="left_semi"
            )
            if over[h] is not None:
                cand = cand.join(over[h], on=list(cand.columns), how="left_anti")
            cand, n = pin(cand)
            if n:
                next_delta[h] = cand
                delta_rows[h] = n
                over[h] = cand if over[h] is None else over[h].unionByName(cand)
                over_rows += n
        delta = next_delta
    over_iters = iteration
    mark("overdelete_loop")

    if all(over[h] is None for h in members_set):
        # deletion cone never reached this SCC — extents unchanged
        return {h: cached[h] for h in members_set}
    for h in members_set:
        if over[h] is not None:
            over[h], _ = pin(over[h])

    # ---------------------------------------------------- 2. rederive
    remaining: Dict[str, DataFrame] = {}
    for h in members_set:
        if over[h] is None:
            remaining[h] = cached[h]
        else:
            rem = cached[h].join(over[h], on=list(cached[h].columns), how="left_anti")
            remaining[h], _ = pin(rem)

    red: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    # seed: ONE rule application over the remaining db, restricted to the
    # overdeleted tuples (alternative-derivation check). Rules whose head
    # has no overdeleted tuples are skipped outright — their seed would
    # be discarded by the semi-join below. (A cone-column pre-filter of
    # the body atoms was measured here and REVERTED: on dense closures
    # the cone's head-variable projections cover most of the domain, so
    # the extra broadcast semi-joins cost a view-width pass without
    # shrinking the join — r10 probe: rederive_seed 1.0-1.5 s unfiltered
    # vs 2.6-3.4 s filtered on the bench's 1M-pair closure.)
    seedR: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    for r in rules:
        h = r.head.relation
        if over[h] is None:
            continue  # nothing overdeleted under this head: no rederive
        union_into(
            seedR,
            h,
            _apply_with_sources(
                r, None, None, remaining, resolve_new, hnsw_resolver
            ),
        )
    deltaR: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    deltaR_rows: Dict[str, int] = {}
    for h in members_set:
        if seedR[h] is None or over[h] is None:
            continue
        cand = seedR[h].distinct().join(
            over[h], on=list(seedR[h].columns), how="left_semi"
        )
        cand, n = pin(cand)
        if n:
            red[h] = deltaR[h] = cand
            deltaR_rows[h] = n
    mark("rederive_seed")

    iteration = 0
    while any(deltaR[h] is not None for h in members_set):
        iteration += 1
        if iteration > max_iterations:
            return None
        cur: Dict[str, Optional[DataFrame]] = {}
        for h in members_set:
            cur[h] = (
                remaining[h]
                if red[h] is None
                else remaining[h].unionByName(red[h])
            )
        new_tuples = {h: None for h in members_set}
        for r in rules:
            for idx, lit in enumerate(r.body):
                if not (
                    isinstance(lit, Atom)
                    and not lit.negated
                    and lit.relation in members_set
                ):
                    continue
                if deltaR[lit.relation] is None:
                    continue
                union_into(
                    new_tuples,
                    r.head.relation,
                    _apply_with_sources(
                        r,
                        idx,
                        _maybe_bcast(
                            deltaR[lit.relation], deltaR_rows.get(lit.relation)
                        ),
                        cur,
                        resolve_new,
                        hnsw_resolver,
                    ),
                )
        next_deltaR: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
        for h in members_set:
            if new_tuples[h] is None or over[h] is None:
                continue
            cand = new_tuples[h].distinct().join(
                over[h], on=list(new_tuples[h].columns), how="left_semi"
            )
            if red[h] is not None:
                cand = cand.join(red[h], on=list(cand.columns), how="left_anti")
            cand, n = pin(cand)
            if n:
                next_deltaR[h] = cand
                deltaR_rows[h] = n
                red[h] = cand if red[h] is None else red[h].unionByName(cand)
        deltaR = next_deltaR
    mark("rederive_loop")

    out: Dict[str, DataFrame] = {}
    for h in members_set:
        final = remaining[h] if red[h] is None else remaining[h].unionByName(red[h])
        # LAZY pin (r14): the overdelete anti-join + closure rewrite
        # fold into the consumer's first action (one job) instead of
        # running as a standalone materialization job per retraction;
        # all inputs are pinned leaves, so what materializes is
        # identical (same immutability argument as the r13 engine-view
        # pins).
        out[h] = final.localCheckpoint(eager=False)
    if trace:
        mark("final_pin")
        total = _time.perf_counter() - t_start
        prev = 0.0
        parts = []
        for label, t in marks:
            parts.append(f"{label}={t - prev:.3f}s")
            prev = t
        print(
            f"# DRED_TRACE total={total:.3f}s over_iters={over_iters} "
            f"red_iters={iteration} pins={n_pins[0]} over_rows={over_rows} "
            + " ".join(parts),
            file=sys.stderr,
        )
    return out


def seminaive_insert(
    scc_rules: Sequence[Rule],
    members: Sequence[str],
    inserted_rel: str,
    inserted_df: DataFrame,
    cached: Dict[str, DataFrame],
    resolve_new: Resolver,
    hnsw_resolver,
    max_iterations: int = 24,
) -> Optional[Dict[str, DataFrame]]:
    """Semi-naive INSERTION maintenance of a positive recursive SCC's
    materialized fixpoint after base-fact inserts — the counterpart of
    `dred_retract` for the +Δ direction (reference differential update,
    src/incremental.rs:26-34; BENCHMARKS.md:50-66: ms-scale re-query
    after inserting into a view with a ~1M-tuple closure).

    Monotone Datalog needs no overdelete/rederive: the new fixpoint is
    the old one plus every tuple derivable using ≥1 inserted fact.

    1. SEED — each rule applied with one occurrence of the inserted base
       relation bound to the Δ rows and everything else at its NEW
       extent (members at their cached fixpoints). Applying Δ at each
       occurrence separately covers multi-occurrence rules under set
       semantics.
    2. PROPAGATE — classic semi-naive deltas through the member atoms,
       anti-joined against the accumulated extents, until empty.

    Caller guarantees (same contract as dred_retract): all rules
    positive, no aggregates or hnsw predicates, `cached` holds every
    member's old extent, non-member body relations are unaffected by the
    insert, and `resolve_new` already resolves `inserted_rel` to its
    post-insert extent.

    Cost guard: a Δ whose derivation cone is DEEP (an edge prepended to
    a long chain reaches depth-many new tuples one hop per iteration)
    loses to the log-depth doubling recompute, so bail to None past
    `max_iterations`. Bailing is always safe — the caller falls back to
    invalidate + recompute.
    """
    rules = list(scc_rules)
    members_set = set(members)

    def pin(df: DataFrame) -> Tuple[DataFrame, int]:
        return _pin_count(df)

    def union_into(acc: Dict[str, Optional[DataFrame]], head: str, df):
        if df is None:
            return
        prev = acc.get(head)
        acc[head] = df if prev is None else prev.unionByName(df)

    acc: Dict[str, DataFrame] = {h: cached[h] for h in members_set}

    def minus_acc(h: str, cand: DataFrame) -> DataFrame:
        """cand \\ acc[h] without shuffling the (large) accumulated
        extent: semi-join acc DOWN to rows matching the tiny candidate
        set (broadcast, one streaming pass over acc), then anti-join
        tiny-vs-tiny — the try_delta_merge trick."""
        cand = cand.distinct()
        existing = acc[h].join(
            F.broadcast(cand), on=list(cand.columns), how="left_semi"
        )
        # existing ⊆ cand is tiny too — broadcast it so the final
        # anti-join is a broadcast hash join, not a shuffled SMJ
        return cand.join(
            F.broadcast(existing), on=list(cand.columns), how="left_anti"
        )

    # ------------------------------------------------------- 1. seed
    seed: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    inserted_small = _maybe_bcast(inserted_df, inserted_df.count())
    for r in rules:
        for idx, lit in enumerate(r.body):
            if (
                isinstance(lit, Atom)
                and not lit.negated
                and lit.relation == inserted_rel
            ):
                union_into(
                    seed,
                    r.head.relation,
                    _apply_with_sources(
                        r, idx, inserted_small, acc, resolve_new, hnsw_resolver
                    ),
                )
    delta: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
    delta_rows: Dict[str, int] = {}
    for h in members_set:
        if seed[h] is None:
            continue
        cand, n = pin(minus_acc(h, seed[h]))
        if n:
            delta[h] = cand
            delta_rows[h] = n
            acc[h] = acc[h].unionByName(cand)

    # -------------------------------------------------- 2. propagate
    iteration = 0
    while any(delta[h] is not None for h in members_set):
        iteration += 1
        if iteration > max_iterations:
            return None  # deep cone: log-depth recompute wins
        new_tuples: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
        for r in rules:
            for idx, lit in enumerate(r.body):
                if not (
                    isinstance(lit, Atom)
                    and not lit.negated
                    and lit.relation in members_set
                ):
                    continue
                if delta[lit.relation] is None:
                    continue
                union_into(
                    new_tuples,
                    r.head.relation,
                    _apply_with_sources(
                        r,
                        idx,
                        _maybe_bcast(
                            delta[lit.relation], delta_rows.get(lit.relation)
                        ),
                        acc,
                        resolve_new,
                        hnsw_resolver,
                    ),
                )
        next_delta: Dict[str, Optional[DataFrame]] = {h: None for h in members_set}
        for h in members_set:
            if new_tuples[h] is None:
                continue
            cand, n = pin(minus_acc(h, new_tuples[h]))
            if n:
                next_delta[h] = cand
                delta_rows[h] = n
                acc[h] = acc[h].unionByName(cand)
        delta = next_delta

    out: Dict[str, DataFrame] = {}
    for h in members_set:
        # KEPT EAGER (r14 honest negative, measured on the bench's own
        # 1M-pair/10-edge-cycle shape): returning the lazy UNION of the
        # cached extent + pinned deltas (no rewrite at all) measured
        # +1.3 s per maintenance cycle — every downstream scan of the
        # union read ~0.3 s slower than the freshly rewritten compact
        # leaf — and a LAZY pin only moved the rewrite into the next
        # query (exec -0.2 s, query +0.2 s, net wash, worse tail
        # latency for the re-query the bench measures). The eager
        # rewrite keeps consumers on a flat, just-written leaf.
        out[h] = acc[h].localCheckpoint(eager=True)
    return out
