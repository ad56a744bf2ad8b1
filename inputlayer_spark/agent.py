"""Teaching agent — guided onboarding lessons behind the `.agent` meta
command (reference: src/agent/mod.rs, src/agent/examples.rs,
src/agent/claude.rs; wire dispatch src/protocol/handler.rs:2170-2345).

The reference ships a Claude-backed REPL assistant with two layers:

1. A fully deterministic scripted-lesson engine: a registry of teaching
   examples, each a sequence of (message, iql) steps that builds a
   knowledge graph with the user (`.agent examples`, `.agent start <id>`,
   `.agent next`, `.agent setup <id>`).
2. An optional LLM layer for free-form questions between steps, which
   degrades gracefully to a canned reply when no API key is configured
   (reference mod.rs:212-222).

This module re-expresses both: the scripted layer is complete and
offline-deterministic (every lesson's IQL executes against the PySpark
engine — asserted in tests/test_agent.py), and the LLM layer is a
pluggable provider callable. The default provider calls the public
Anthropic Messages API over stdlib urllib when INPUTLAYER_CLAUDE_API_KEY
is set, mirroring reference claude.rs; tests inject a deterministic fake.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

# ------------------------------------------------------------ config


Provider = Callable[[str, List[dict], str, int], str]
"""(system_prompt, messages, model, max_tokens) -> assistant text."""


@dataclass
class AgentConfig:
    """Reference AgentConfig (mod.rs:20-43): key from env, model + budget."""

    api_key: Optional[str] = field(
        default_factory=lambda: os.environ.get("INPUTLAYER_CLAUDE_API_KEY")
    )
    model: str = "claude-haiku-4-5-20251001"
    max_tokens: int = 800
    # pluggable LLM backend; None -> call_claude when api_key is set
    provider: Optional[Provider] = None
    # endpoint + version header come from config ([agent] llm_url /
    # llm_version) so deployments can point at a proxy
    llm_url: Optional[str] = None
    llm_version: Optional[str] = None

    def is_available(self) -> bool:
        return bool(self.api_key) or self.provider is not None


# ------------------------------------------------------------ lessons


@dataclass(frozen=True)
class TeachingStep:
    message: str  # what the agent says (short)
    iql: str  # the statement the user is invited to run


@dataclass(frozen=True)
class TeachingExample:
    id: str
    name: str
    description: str
    category: str
    difficulty: str
    steps: Tuple[TeachingStep, ...]
    system_prompt: str

    def step_count(self) -> int:
        return len(self.steps)

    def step_message(self, idx: int) -> Optional[str]:
        if 0 <= idx < len(self.steps):
            s = self.steps[idx]
            return f"{s.message}\n\n```iql\n{s.iql}\n```"
        return None

    def build_system_prompt(self, kg_context: str, lesson_done: bool) -> str:
        """Compose the LLM system prompt: lesson persona + live KG state +
        response rules + the IQL quick reference (mod.rs:35-66)."""
        ctx = kg_context[:2000]
        if lesson_done:
            guidance = (
                "- The lesson is finished: answer questions about IQL, the "
                "engine, or the user's current knowledge graph, grounded in "
                "the KG State section.\n"
                "- Put any runnable suggestion in an ```iql code block.\n"
                '- "Explain this query" means provenance: suggest '
                "`.why ?query(...)`, not `.debug`."
            )
        else:
            guidance = (
                "- Answer briefly, then steer back to the current lesson "
                "step.\n- Put any runnable suggestion in an ```iql code "
                "block."
            )
        return (
            f"{self.system_prompt}\n\n## KG State\n{ctx}\n\n"
            f"## Response Rules\n- Keep answers to a few sentences.\n"
            f"{guidance}\n\n{IQL_REFERENCE}"
        )


def _steps(*pairs: Tuple[str, str]) -> Tuple[TeachingStep, ...]:
    return tuple(TeachingStep(message=m, iql=q) for m, q in pairs)


IQL_REFERENCE = """\
## IQL Quick Reference

### Statements
- `+rel(a, b)` inserts a fact; `+rel[(1, 2), (3, 4)]` bulk-inserts.
- `-rel(a, b)` retracts a tuple; `-rel(X, Y) <- rel(X, Y), X > 5` is a
  conditional delete.
- `+head(X, Z) <- body1(X, Y), body2(Y, Z)` defines a persistent rule;
  without the leading `+` the rule lives only in this session.
- `?rel(X, Y)` queries: UPPERCASE names are variables, quoted/lowercase
  values are constants, `_` matches anything.
- `!atom(X)` negates (X must also occur in a positive atom).
- Aggregates go in a rule or query head: `count<X>`, `count_distinct<X>`,
  `sum<X>`, `min<X>`, `max<X>`, `avg<X>`.
- Arithmetic `+ - * / %`, comparisons `= != < <= > >=`, and computed
  bindings `V = expr` are allowed in rule bodies.
- Vector literals `[1.0, 2.0]`; `cosine(a, b)`, `euclidean(a, b)`,
  `dot(a, b)` score them.
- `+rel(col: int, name: string, v: vector)` declares a typed schema.
  Types: int, float, string, bool, timestamp, vector.

### Meta commands
- `.why ?q(...)` proof tree; `.why full ?q(...)` includes every
  aggregation contributor; `.why_not rel(a, b)` explains a missing tuple.
- `.debug ?q(...)` shows the query plan without running it.
- `.rel` / `.rel <name>` / `.rel drop <name>` inspect relations.
- `.rule list` / `.rule def <name>` / `.rule drop <name>` manage rules.
- `.kg list|create|use|drop` switch knowledge graphs; `.session` lists
  session-only state.
- `.index create <name> on <rel>(<col>) metric cosine` plus
  `.index list|stats|rebuild|drop` manage vector indexes.
- `.load <file.iql>` runs a script; `.status` and `.compact` manage the
  engine.

### Semantics worth knowing
- Derived relations update incrementally: a fact change recomputes only
  the affected views.
- Retraction is support-aware: a derived tuple disappears only when its
  last derivation path is gone.
- Recursion is allowed (`+path(X,Z) <- path(X,Y), edge(Y,Z)`); negation
  must be stratified (no negation through a recursive cycle).
"""


def _flights() -> TeachingExample:
    return TeachingExample(
        id="flights",
        name="Flight Network",
        description="End-to-end tour: facts, queries, recursive rules, "
        "aggregation, provenance, and retraction on a flight network.",
        category="Complete Tour",
        difficulty="beginner",
        system_prompt=(
            "You are teaching IQL basics on a flight-network knowledge "
            "graph: direct_flight(origin, destination, miles) facts, a "
            "recursive can_reach rule, and provenance over it."
        ),
        steps=_steps(
            (
                "Welcome! A knowledge graph starts with facts. Insert one "
                "direct flight as a 3-column tuple: origin, destination, "
                "distance in miles.",
                '+direct_flight("jfk", "lax", 2475)',
            ),
            (
                "Bulk insert adds several tuples in one statement — handy "
                "for seeding data.",
                '+direct_flight[("lax", "nrt", 5451), ("jfk", "cdg", 3635), '
                '("cdg", "sin", 6673), ("nrt", "sin", 3327)]',
            ),
            (
                "Query with `?`. Uppercase names are variables, so this "
                "lists every flight out of JFK.",
                '?direct_flight("jfk", X, Y)',
            ),
            (
                "Use `_` when you don't care about a column — here we only "
                "want destinations.",
                '?direct_flight("jfk", X, _)',
            ),
            (
                "Rules derive new relations. `can_reach` starts as: one "
                "hop reaches. The leading `+` makes the rule persistent.",
                "+can_reach(X, Y) <- direct_flight(X, Y, _)",
            ),
            (
                "Now make it recursive: if you can reach Y and there is a "
                "flight Y to Z, you can reach Z. The engine computes the "
                "fixpoint for you.",
                "+can_reach(X, Z) <- can_reach(X, Y), direct_flight(Y, Z, _)",
            ),
            (
                "Query the derived relation — multi-hop routes appear even "
                "though we never inserted them.",
                '?can_reach("jfk", X)',
            ),
            (
                "Filters go in the body. Session rules (no `+`) vanish "
                "when the session ends — good for ad-hoc analysis.",
                "long_haul(X, Y) <- direct_flight(X, Y, D), D > 5000",
            ),
            (
                "Query the session rule like any relation.",
                "?long_haul(X, Y)",
            ),
            (
                "Aggregates live in the head: count destinations reachable "
                "from each origin.",
                "+route_count(X, count<Y>) <- can_reach(X, Y)",
            ),
            (
                "Check the counts — JFK should reach the most airports.",
                "?route_count(X, C)",
            ),
            (
                "Provenance: `.why` shows the proof tree — which rules and "
                "facts derived a tuple. Try it on a two-hop route.",
                '.why ?can_reach("jfk", "sin")',
            ),
            (
                "`.why_not` explains absence: which condition blocked a "
                "derivation.",
                '.why_not can_reach("sin", "jfk")',
            ),
            (
                "Retraction removes a fact AND every conclusion that "
                "depended only on it. Drop the LAX-Tokyo leg.",
                '-direct_flight("lax", "nrt", 5451)',
            ),
            (
                "Tokyo is now unreachable from JFK, and route_count shrank "
                "— derived state stayed consistent automatically.",
                '?can_reach("jfk", X)',
            ),
            (
                "Finally, `.rel` lists every relation in the graph. You "
                "have completed the tour — experiment freely!",
                ".rel list",
            ),
        ),
    )


def _retraction() -> TeachingExample:
    return TeachingExample(
        id="retraction",
        name="Correct Retraction",
        description="Support-aware deletion: a derived fact survives until "
        "its LAST derivation path is retracted.",
        category="Truth Maintenance",
        difficulty="intermediate",
        system_prompt=(
            "You are teaching truth maintenance: trusts(a, b) edges, a "
            "derived endorsement with multiple support paths, and what "
            "retraction does to each."
        ),
        steps=_steps(
            (
                "Seed a trust network where two independent paths lead "
                "from alice to dana.",
                '+trusts[("alice", "bob"), ("bob", "dana"), '
                '("alice", "carol"), ("carol", "dana")]',
            ),
            (
                "Derive two-hop endorsements.",
                "+endorses(X, Z) <- trusts(X, Y), trusts(Y, Z)",
            ),
            (
                "alice endorses dana — via bob AND via carol.",
                '?endorses("alice", X)',
            ),
            (
                "Inspect the proof tree: both derivations show up.",
                '.why ?endorses("alice", "dana")',
            ),
            (
                "Retract the bob path. Naive deletion would drop the "
                "endorsement; support-aware retraction must not.",
                '-trusts("bob", "dana")',
            ),
            (
                "Still endorsed: the carol path remains. This is the "
                "difference between deleting rows and maintaining truth.",
                '?endorses("alice", "dana")',
            ),
            (
                "Now remove the last support.",
                '-trusts("carol", "dana")',
            ),
            (
                "Gone — no derivation path survives, so neither does the "
                "conclusion.",
                '?endorses("alice", X)',
            ),
        ),
    )


def _provenance() -> TeachingExample:
    return TeachingExample(
        id="provenance",
        name="Proof Trees",
        description="Explain every answer: .why derivation chains, "
        ".why full aggregation contributors, .why_not blockers.",
        category="Explainability",
        difficulty="intermediate",
        system_prompt=(
            "You are teaching provenance on an access-control graph: "
            "member/grants facts, a derived allowed relation, and the "
            ".why family of commands."
        ),
        steps=_steps(
            (
                "Build a tiny access-control model: group membership and "
                "per-group grants.",
                '+member[("eve", "eng"), ("mallory", "sales")]',
            ),
            (
                "Grants say which group may touch which resource.",
                '+grants[("eng", "repo"), ("eng", "ci"), ("sales", "crm")]',
            ),
            (
                "Access is derived, never stored.",
                "+allowed(U, R) <- member(U, G), grants(G, R)",
            ),
            (
                "Ask what eve can touch.",
                '?allowed("eve", X)',
            ),
            (
                "`.why` answers the auditor's question: WHY is this "
                "allowed? The tree names the rule and both supporting "
                "facts.",
                '.why ?allowed("eve", "repo")',
            ),
            (
                "Aggregate views have provenance too. Count resources per "
                "user.",
                "+access_count(U, count<R>) <- allowed(U, R)",
            ),
            (
                "`.why full` enumerates every contributor to the "
                "aggregate, not just the rule.",
                '.why full ?access_count("eve", C)',
            ),
            (
                "And the negative case: WHY can't mallory reach the repo? "
                "`.why_not` names the exact blocking condition.",
                '.why_not allowed("mallory", "repo")',
            ),
        ),
    )


def _incremental() -> TeachingExample:
    return TeachingExample(
        id="incremental",
        name="Incremental Views",
        description="Derived relations update from deltas, not recomputes: "
        "watch an aggregate view track inserts and retractions.",
        category="Incremental Updates",
        difficulty="intermediate",
        system_prompt=(
            "You are teaching incremental view maintenance on "
            "sale(region, amount) facts with a revenue-per-region "
            "aggregate view."
        ),
        steps=_steps(
            (
                "Insert a day of sales.",
                '+sale[("emea", 1200), ("emea", 800), ("apac", 950)]',
            ),
            (
                "Define revenue per region. This is a materialized view: "
                "the engine keeps it current as facts change.",
                "+revenue(R, sum<A>) <- sale(R, A)",
            ),
            (
                "First read computes the aggregate.",
                "?revenue(R, T)",
            ),
            (
                "Insert one more sale. Only the apac group is affected — "
                "the engine merges the delta instead of rescanning "
                "everything.",
                '+sale("apac", 500)',
            ),
            (
                "apac moved to 1450; emea was untouched work.",
                "?revenue(R, T)",
            ),
            (
                "Retraction also flows through: remove a recorded sale.",
                '-sale("emea", 800)',
            ),
            (
                "emea dropped to 1200. At a billion rows this "
                "delta-maintenance is the difference between milliseconds "
                "and a full recompute.",
                "?revenue(R, T)",
            ),
        ),
    )


def _rules_vectors() -> TeachingExample:
    return TeachingExample(
        id="rules_vectors",
        name="Rules + Vectors",
        description="Hybrid reasoning: combine symbolic rules with vector "
        "similarity in one body.",
        category="Hybrid Reasoning",
        difficulty="advanced",
        system_prompt=(
            "You are teaching hybrid symbolic/vector queries: note(id, "
            "topic, embedding) facts scored with cosine() inside rule "
            "bodies."
        ),
        steps=_steps(
            (
                "Facts can carry vector columns — store three notes with "
                "tiny 3-d embeddings.",
                '+note[("n1", "billing", [0.9, 0.1, 0.0]), '
                '("n2", "billing", [0.8, 0.2, 0.1]), '
                '("n3", "outage", [0.0, 0.1, 0.9])]',
            ),
            (
                "Score every pair with cosine() right in the rule body — "
                "vector math is a first-class builtin.",
                "+pair_sim(A, B, S) <- note(A, _, V1), note(B, _, V2), "
                "S = cosine(V1, V2), A != B",
            ),
            (
                "Look at the scores: the two billing notes should be "
                "close, the outage note far.",
                "?pair_sim(A, B, S)",
            ),
            (
                "Now the hybrid part: near-duplicates are pairs that are "
                "similar AND share a topic — geometry plus symbols in one "
                "rule.",
                "+near_dup(A, B) <- pair_sim(A, B, S), S > 0.95, "
                "note(A, T, _), note(B, T, _)",
            ),
            (
                "Only the billing pair qualifies.",
                "?near_dup(A, B)",
            ),
            (
                "Similarity search against a literal query vector works "
                "the same way.",
                "+close_to_query(X, S) <- note(X, _, V), "
                "S = cosine(V, [1.0, 0.0, 0.0]), S > 0.5",
            ),
            (
                "The billing notes match the query direction.",
                "?close_to_query(X, S)",
            ),
        ),
    )


def _agentic_ai() -> TeachingExample:
    return TeachingExample(
        id="agentic_ai",
        name="Agent Memory",
        description="A guardrailed agent memory: observations as facts, "
        "capabilities as rules, negation as a policy gate.",
        category="Agentic AI",
        difficulty="advanced",
        system_prompt=(
            "You are teaching agent-memory modeling: observation and "
            "tool facts, a derived may_call capability with a negation "
            "guardrail, and provenance as an audit log."
        ),
        steps=_steps(
            (
                "An agent's memory is just facts: what it observed, with "
                "a step counter.",
                '+observation[(1, "user_asked_refund"), '
                '(2, "order_found"), (3, "payment_verified")]',
            ),
            (
                "Tools it could call, and what each requires.",
                '+tool[("refund", "payment_verified"), '
                '("escalate", "user_asked_refund")]',
            ),
            (
                "Deny-list as plain facts — policy is data.",
                '+blocked("escalate")',
            ),
            (
                "Capability rule: a tool may be called when its "
                "precondition was observed AND it is not blocked. The `!` "
                "is stratified negation.",
                "+may_call(T) <- tool(T, P), observation(_, P), !blocked(T)",
            ),
            (
                "Only refund passes the gate.",
                "?may_call(T)",
            ),
            (
                "Every decision is auditable — the proof tree IS the audit "
                "log.",
                '.why ?may_call("refund")',
            ),
            (
                "And the blocked path explains itself.",
                '.why_not may_call("escalate")',
            ),
            (
                "Policies change at runtime: unblock escalation and the "
                "capability appears — no redeploy, just a retraction.",
                '-blocked("escalate")',
            ),
            (
                "Both tools are now callable.",
                "?may_call(T)",
            ),
        ),
    )


def _schemas() -> TeachingExample:
    return TeachingExample(
        id="schemas",
        name="Typed Schemas",
        description="Declare column names and types up front; the engine "
        "enforces them on every insert.",
        category="Data Modeling",
        difficulty="beginner",
        system_prompt=(
            "You are teaching schema declarations: typed city relations, "
            "enforcement on insert, and introspection with .rel."
        ),
        steps=_steps(
            (
                "Declare a relation with named, typed columns BEFORE "
                "inserting — like DDL.",
                "+city(name: string, country: string, population: int)",
            ),
            (
                "Inserts must now match the declared arity and types.",
                '+city[("osaka", "jp", 2691000), ("lyon", "fr", 522000)]',
            ),
            (
                "Introspect the schema you declared.",
                ".rel city",
            ),
            (
                "Typed columns still join and filter like any other.",
                "+big_city(N) <- city(N, _, P), P > 1000000",
            ),
            (
                "Only osaka qualifies.",
                "?big_city(N)",
            ),
            (
                "Schemas compose with every other feature — add a typed "
                "vector column for embeddings.",
                "+city_vec(name: string, v: vector)",
            ),
            (
                "Vector-typed inserts are checked too.",
                '+city_vec[("osaka", [0.1, 0.9]), ("lyon", [0.8, 0.2])]',
            ),
            (
                "`.rel list` shows the full catalog — you now model data, "
                "not just store it.",
                ".rel list",
            ),
        ),
    )


_EXAMPLES: Dict[str, TeachingExample] = {
    ex.id: ex
    for ex in (
        _flights(),
        _retraction(),
        _provenance(),
        _incremental(),
        _rules_vectors(),
        _agentic_ai(),
        _schemas(),
    )
}


def all_examples() -> List[TeachingExample]:
    return list(_EXAMPLES.values())


def get_example(example_id: str) -> Optional[TeachingExample]:
    return _EXAMPLES.get(example_id)


# ------------------------------------------------------------ sessions


@dataclass
class AgentSession:
    example_id: str
    current_step: int = 0
    messages: List[dict] = field(default_factory=list)
    kg_context: str = ""

    def add_user_message(self, content: str) -> None:
        self.messages.append({"role": "user", "content": content})

    def add_assistant_message(self, content: str) -> None:
        self.messages.append({"role": "assistant", "content": content})


@dataclass(frozen=True)
class AgentResponse:
    content: str
    suggested_query: Optional[str] = None
    done: bool = True


def extract_suggested_query(response: str) -> Optional[str]:
    """Pull a runnable suggestion out of an LLM reply: the first `?` or
    `.why` line inside the first fenced code block, else the whole block
    (reference mod.rs:335-358)."""
    for marker in ("```iql", "```datalog", "```"):
        start = response.find(marker)
        if start == -1:
            continue
        code_start = start + len(marker)
        end = response.find("```", code_start)
        if end == -1:
            continue
        code = response[code_start:end].strip()
        for line in code.splitlines():
            t = line.strip()
            if t.startswith("?") or t.startswith(".why"):
                return t
        if code:
            return code
    return None


_NO_BACKEND_REPLY = (
    "Free-form questions need an LLM backend (set "
    "INPUTLAYER_CLAUDE_API_KEY or configure a provider). The scripted "
    "lesson still works: run the suggested query, or `.agent next` to "
    "advance."
)


class AgentManager:
    """Session registry + lesson stepper + optional LLM dispatch
    (reference AgentManager, mod.rs:172-331). Thread-safe: the server
    shares one engine across WS connections."""

    def __init__(self, config: Optional[AgentConfig] = None):
        self.config = config or AgentConfig()
        self.sessions: Dict[str, AgentSession] = {}
        self._lock = threading.Lock()

    def is_available(self) -> bool:
        return self.config.is_available()

    def get_or_create_session(self, session_id: str, example_id: str) -> str:
        key = f"{session_id}:{example_id}"
        with self._lock:
            self.sessions.setdefault(key, AgentSession(example_id))
        return key

    # ----- scripted layer -----

    def start_example(self, session_key: str, example_id: str) -> AgentResponse:
        ex = get_example(example_id)
        if ex is None:
            raise ValueError(f"Unknown example: {example_id}")
        with self._lock:
            self.sessions[session_key] = AgentSession(example_id)
        return AgentResponse(
            content=ex.step_message(0) or "No steps defined for this example.",
            suggested_query=ex.steps[0].iql if ex.steps else None,
            done=False,
        )

    def next_step(self, session_key: str) -> AgentResponse:
        with self._lock:
            session = self.sessions.get(session_key)
            if session is None:
                raise ValueError("Session not found")
            session.current_step += 1
            step = session.current_step
            ex = get_example(session.example_id)
        if ex is None:
            raise ValueError("Example not found")
        if step >= ex.step_count():
            return AgentResponse(
                content="Lesson complete! Experiment with your own queries, "
                "or ask me anything.",
            )
        return AgentResponse(
            content=ex.step_message(step) or "",
            suggested_query=ex.steps[step].iql,
            done=step + 1 >= ex.step_count(),
        )

    # ----- LLM layer -----

    def process_message(
        self, session_key: str, user_message: str, kg_context: str
    ) -> AgentResponse:
        provider = self.config.provider
        if provider is None and self.config.api_key:
            provider = lambda sys, msgs, model, mx: call_claude(  # noqa: E731
                self.config.api_key,
                model,
                sys,
                msgs,
                mx,
                url=self.config.llm_url,
                version=self.config.llm_version,
            )
        if provider is None:
            return AgentResponse(content=_NO_BACKEND_REPLY)

        with self._lock:
            session = self.sessions.get(session_key)
            if session is None:
                raise ValueError("Session not found")
            session.kg_context = kg_context
            session.add_user_message(user_message)
            ex = get_example(session.example_id)
            lesson_done = ex is None or session.current_step >= ex.step_count()
            if ex is not None:
                system = ex.build_system_prompt(kg_context, lesson_done)
            else:
                system = (
                    "You are an IQL teaching assistant. Current knowledge "
                    f"graph context:\n{kg_context}\n\n{IQL_REFERENCE}"
                )
            messages = list(session.messages)

        reply = provider(system, messages, self.config.model, self.config.max_tokens)

        with self._lock:
            session = self.sessions.get(session_key)
            if session is not None:
                session.add_assistant_message(reply)
        return AgentResponse(
            content=reply, suggested_query=extract_suggested_query(reply)
        )

    # ----- dispatch (reference handler.rs agent_query, 2173-2245) -----

    def agent_query(
        self, session_id: str, command: str, kg_context: str
    ) -> AgentResponse:
        cmd = command.strip()
        if cmd in ("", "examples"):
            listing = "\n".join(
                f"- **{ex.name}** ({ex.category}, {ex.difficulty}): "
                f"{ex.description} [id: {ex.id}]"
                for ex in all_examples()
            )
            return AgentResponse(
                content=f"Available examples:\n\n{listing}\n\n"
                "Use `.agent start <id>` to begin."
            )
        if cmd.startswith("start "):
            example_id = cmd[len("start "):].strip()
            key = self.get_or_create_session(session_id, example_id)
            return self.start_example(key, example_id)
        if cmd == "next":
            with self._lock:
                key = next(
                    (k for k in self.sessions if k.startswith(session_id)), None
                )
            if key is None:
                return AgentResponse(content="No active lesson.")
            return self.next_step(key)
        with self._lock:
            key = next((k for k in self.sessions if k.startswith(session_id)), None)
        if key is None:
            return AgentResponse(
                content="No active example. Start one with "
                "`.agent start <example_id>` or list them with "
                "`.agent examples`."
            )
        return self.process_message(key, cmd, kg_context)


def setup_iql(example_id: str) -> str:
    """All step statements of a lesson joined into one script — the
    `.agent setup <id>` payload the GUI uses to seed a KG
    (reference handler.rs:2257-2281)."""
    ex = get_example(example_id)
    if ex is None:
        return ""
    return "\n".join(s.iql for s in ex.steps)


# ------------------------------------------------------------ provider


def call_claude(
    api_key: str,
    model: str,
    system_prompt: str,
    messages: Sequence[dict],
    max_tokens: int,
    url: Optional[str] = None,
    version: Optional[str] = None,
) -> str:
    """Default LLM provider: the public Anthropic Messages API over
    stdlib urllib (reference claude.rs:9-102). Only reached when an API
    key is configured; tests always inject a fake provider instead.
    Endpoint and version-header defaults live in config.AgentLLMConfig
    ([agent] llm_url / llm_version)."""
    from inputlayer_spark.config import AgentLLMConfig

    defaults = AgentLLMConfig()
    url = url or defaults.llm_url
    version = version or defaults.llm_version
    body = json.dumps(
        {
            "model": model,
            "max_tokens": max_tokens,
            "system": system_prompt,
            "messages": [
                {"role": m["role"], "content": m["content"]} for m in messages
            ],
        }
    ).encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "x-api-key": api_key,
            "anthropic-version": version,
            "content-type": "application/json",
        },
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            payload = json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:  # pragma: no cover - network
        detail = e.read().decode(errors="replace")[:200]
        raise RuntimeError(f"Claude API error ({e.code}): {detail}") from e
    except OSError as e:  # pragma: no cover - network
        raise RuntimeError(f"Claude API request failed: {e}") from e
    parts = payload.get("content") or []
    text = "".join(p.get("text", "") for p in parts if p.get("type") == "text")
    if not text:
        raise RuntimeError("Claude API returned no text content")
    return text
