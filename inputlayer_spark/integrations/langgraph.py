"""Agent-graph integration: KG-driven nodes, routing, memory, checkpoints.

Re-expresses the reference SDK's LangGraph integration
(packages/inputlayer-py/src/inputlayer/integrations/langgraph/:
``kg_node`` query/mutation node factories (nodes.py:12-80), ``kg_router``
conditional edges whose branches are IQL queries evaluated in insertion
order with first-non-empty-wins (router.py:20-60), ``escape_iql``
(_utils.py), ``InputLayerMemory`` semantic long-term memory storing
conversation turns as facts with rule-derived topics/relevance
(memory.py:1-60), and a KG-backed checkpointer (checkpointer.py)) as a
framework-agnostic layer:

* nothing here imports langgraph — the factories return plain callables
  with the ``(state: dict) -> dict`` / ``(state) -> str`` signatures
  LangGraph's ``StateGraph.add_node`` / ``add_conditional_edges``
  accept, so they plug in directly when langgraph IS installed and are
  fully testable when it is not (this container ships no langgraph);
* the executor is anything with ``execute(iql)`` returning result
  frames — an in-process `IQLEngine`, the wire `Client`, or a session
  engine — carried in the state dict under ``kg_key`` (the reference's
  convention) or bound at factory time.

Original implementation: the reference is async (awaitable nodes over
the wire protocol); this layer is synchronous and datalog-rule-flavored.
"""

from __future__ import annotations

import base64
import json
from typing import Any, Callable, Dict, List, Optional

__all__ = [
    "escape_iql",
    "kg_node",
    "kg_router",
    "AgentMemory",
    "CheckpointStore",
]


def escape_iql(value: str) -> str:
    """Escape a user-supplied string for safe interpolation inside an
    IQL string literal (reference _utils.escape_iql): backslashes first,
    then quotes; newlines normalized so one value can't smuggle a second
    statement."""
    return (
        str(value)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "")
    )


def _rows(result) -> List[tuple]:
    """Rows from whatever execute()/query() returned (DataFrame list,
    ResultSet list, or a single frame)."""
    if isinstance(result, list):
        result = result[-1] if result else None
    if result is None:
        return []
    rows = getattr(result, "rows", None)
    if rows is not None:
        return [tuple(r) for r in rows]
    try:
        return [tuple(r) for r in result.collect()]
    except Exception:
        return []


def _executor(state: Dict[str, Any], kg_key: str, bound):
    ex = bound if bound is not None else state.get(kg_key)
    if ex is None:
        raise ValueError(
            f"kg_node/kg_router: no executor bound and state[{kg_key!r}] is missing"
        )
    return ex


def kg_node(
    *,
    query: Optional[Any] = None,
    relation: Optional[type] = None,
    operation: str = "query",
    state_key: str = "results",
    kg_key: str = "kg",
    kg=None,
) -> Callable[[Dict[str, Any]], Dict[str, Any]]:
    """Node factory (reference nodes.py kg_node): returns
    ``(state) -> partial_state``.

    * query mode (default): run ``query`` (a string or ``(state) -> str``
      callable) and write its rows to ``state_key``.
    * insert/delete mode: read OLM model instances (or a single one)
      from ``state_key`` and render the mutation via the model class.

    The executor comes from ``state[kg_key]`` unless bound with ``kg=``.
    """
    if operation not in ("query", "insert", "delete"):
        raise ValueError(
            f"kg_node: operation must be 'query', 'insert', or 'delete', "
            f"got {operation!r}"
        )
    if operation == "query" and query is None:
        raise ValueError("Must provide 'query' for query operations")
    if operation in ("insert", "delete") and relation is None:
        raise ValueError(f"Must provide 'relation' for {operation} operations")

    def node(state: Dict[str, Any]) -> Dict[str, Any]:
        ex = _executor(state, kg_key, kg)
        if operation == "query":
            iql = query(state) if callable(query) else query
            return {state_key: _rows(ex.execute(iql))}
        payload = state.get(state_key) or []
        instances = payload if isinstance(payload, (list, tuple)) else [payload]
        if not instances:
            return {}
        if operation == "insert":
            ex.execute(relation.insert_iql(list(instances)))
        else:
            for inst in instances:
                ex.execute(inst.delete_iql())
        return {}

    return node


def kg_router(
    *,
    branches: Dict[str, Any],
    default: str = "end",
    kg_key: str = "kg",
    kg=None,
) -> Callable[[Dict[str, Any]], str]:
    """Conditional-edge factory (reference router.py kg_router): branches
    map target-node names to IQL queries (strings or ``(state) -> str``
    callables), evaluated in insertion order; the first whose query
    returns rows wins, else ``default``. A branch whose query errors is
    skipped (a bad rule must not crash the agent graph); executor
    failures from missing handles still raise."""

    def route(state: Dict[str, Any]) -> str:
        # _executor raises OUTSIDE the try: a missing handle is an
        # infrastructure error, never a skippable branch. Inside the
        # loop every exception is query-level (incl. CompileError,
        # which subclasses ValueError) and skips the branch.
        ex = _executor(state, kg_key, kg)
        for target, q in branches.items():
            iql = q(state) if callable(q) else q
            try:
                if _rows(ex.execute(iql)):
                    return target
            except Exception:
                continue  # query-level failure: skip the branch
        return default

    return route


# --------------------------------------------------------------- memory

_STOPWORDS = frozenset(
    "a an and are as at be but by for from has have i in is it its me my of "
    "on or our so that the their them they this to was we what when where "
    "which who will with you your".split()
)


class AgentMemory:
    """Semantic long-term memory backed by a KG (reference memory.py
    InputLayerMemory): conversation turns stored as facts, topics
    extracted per turn, and DERIVED relations — not imperative Python —
    answering "what is this thread about" and "which earlier turns are
    relevant to topic T":

        memory_turn(thread, turn, role, content, ts)
        turn_topic(thread, turn, topic)
        active_topic(thread, topic, n)   <- count of topic mentions
        relevant_turn(thread, turn, role, content, topic)

    `recall(thread)` returns the last `window` turns; `recall(thread,
    topic=...)` returns the turns sharing that topic via the derived
    relation."""

    def __init__(self, executor, window: int = 6) -> None:
        self.ex = executor
        self.window = int(window)
        # Seeded lazily from the KG's max stored turn so a new
        # AgentMemory over an existing KG (process restart, or two
        # instances on one thread) continues the sequence instead of
        # reusing (thread, turn) keys and corrupting recall ordering.
        self._counter: Optional[int] = None

    def _seed_counter(self) -> int:
        try:
            rows = _rows(
                self.ex.execute("?memory_turn(_, Turn:desc, _, _, _), limit(1)")
            )
        except Exception:  # relation not created yet → fresh sequence
            rows = []
        # rows carry the full tuple shape (thread, turn, ...); turn is
        # the second column
        return int(rows[0][1]) if rows else 0

    def setup(self) -> None:
        self.ex.execute(
            "+memory_turn(thread: string, turn: int, role: string, "
            "content: string, ts: int)"
        )
        self.ex.execute("+turn_topic(thread: string, turn: int, topic: string)")
        self.ex.execute(
            "+active_topic(T, Topic, count<Turn>) <- turn_topic(T, Turn, Topic)"
        )
        self.ex.execute(
            "+relevant_turn(T, Turn, Role, Content, Topic) <- "
            "turn_topic(T, Turn, Topic), memory_turn(T, Turn, Role, Content, _)"
        )

    @staticmethod
    def extract_topics(content: str, max_topics: int = 5) -> List[str]:
        """Cheap deterministic topic extraction (reference
        _memory_helpers.extract_topics): lowercase alpha tokens, stopword
        filtered, ≥4 chars, first-seen order."""
        seen: List[str] = []
        for tok in content.lower().split():
            word = "".join(c for c in tok if c.isalpha())
            if len(word) >= 4 and word not in _STOPWORDS and word not in seen:
                seen.append(word)
                if len(seen) >= max_topics:
                    break
        return seen

    def store(self, thread_id: str, role: str, content: str,
              ts: Optional[int] = None) -> int:
        if self._counter is None:
            self._counter = self._seed_counter()
        self._counter += 1
        turn = self._counter
        # ts=0 (epoch zero) is a valid caller timestamp — only None
        # falls back to the turn counter
        stamp = turn if ts is None else int(ts)
        t, r, c = escape_iql(thread_id), escape_iql(role), escape_iql(content)
        self.ex.execute(
            f'+memory_turn[("{t}", {turn}, "{r}", "{c}", {stamp})]'
        )
        topics = self.extract_topics(content)
        if topics:
            facts = ", ".join(
                f'("{t}", {turn}, "{escape_iql(topic)}")' for topic in topics
            )
            self.ex.execute(f"+turn_topic[{facts}]")
        return turn

    def recall(self, thread_id: str, topic: Optional[str] = None) -> List[tuple]:
        t = escape_iql(thread_id)
        if topic is not None:
            q = (
                f'?relevant_turn("{t}", Turn:asc, Role, Content, '
                f'"{escape_iql(topic)}")'
            )
        else:
            q = (
                f'?memory_turn("{t}", Turn:desc, Role, Content, _), '
                f"limit({self.window})"
            )
        rows = _rows(self.ex.execute(q))
        return sorted(rows, key=lambda r: r[1] if len(r) > 1 else 0)

    def active_topics(self, thread_id: str) -> List[tuple]:
        t = escape_iql(thread_id)
        return _rows(self.ex.execute(f'?active_topic("{t}", Topic, N:desc)'))

    def recall_node(self, state_key: str = "context",
                    thread_key: str = "thread_id"):
        """Graph node writing recalled turns into the state
        (reference _memory_helpers.make_recall_node)."""

        def node(state: Dict[str, Any]) -> Dict[str, Any]:
            return {state_key: self.recall(state[thread_key])}

        return node

    def store_node(self, role: str = "user", content_key: str = "input",
                   thread_key: str = "thread_id"):
        def node(state: Dict[str, Any]) -> Dict[str, Any]:
            self.store(state[thread_key], role, state[content_key])
            return {}

        return node


# ----------------------------------------------------------- checkpoints


class CheckpointStore:
    """KG-backed checkpoint persistence (reference checkpointer.py
    InputLayerCheckpointer, minus the langgraph base class — wiring this
    into ``BaseCheckpointSaver`` is a thin adapter requiring the
    optional langgraph dependency, which this container doesn't ship).

    Checkpoints are arbitrary JSON-able payloads keyed (thread, seq),
    serialized base64 so the fact literal is IQL-safe
    (_checkpoint_serde.py does the same over msgpack)."""

    def __init__(self, executor) -> None:
        self.ex = executor

    def setup(self) -> None:
        self.ex.execute(
            "+checkpoint(thread: string, seq: int, payload: string)"
        )

    @staticmethod
    def _enc(payload) -> str:
        return base64.b64encode(
            json.dumps(payload, sort_keys=True).encode()
        ).decode()

    @staticmethod
    def _dec(blob: str):
        return json.loads(base64.b64decode(blob))

    def put(self, thread_id: str, seq: int, payload) -> None:
        t = escape_iql(thread_id)
        self.ex.execute(
            f'+checkpoint[("{t}", {int(seq)}, "{self._enc(payload)}")]'
        )

    def get_latest(self, thread_id: str):
        """(seq, payload) of the newest checkpoint, or None."""
        t = escape_iql(thread_id)
        rows = _rows(
            self.ex.execute(
                f'?checkpoint("{t}", Seq:desc, Payload), limit(1)'
            )
        )
        if not rows:
            return None
        seq, blob = rows[0][-2], rows[0][-1]
        return int(seq), self._dec(blob)

    def list(self, thread_id: str) -> List[tuple]:
        """Ascending (seq, payload) history for a thread."""
        t = escape_iql(thread_id)
        rows = _rows(
            self.ex.execute(f'?checkpoint("{t}", Seq:asc, Payload)')
        )
        return [(int(r[-2]), self._dec(r[-1])) for r in rows]

    def prune_thread(self, thread_id: str, keep_latest: int = 1) -> int:
        """Delete all but the newest `keep_latest` checkpoints of a
        thread (reference _checkpointer_mixin.prune_thread); returns the
        number removed."""
        hist = self.list(thread_id)
        doomed = hist[: max(len(hist) - keep_latest, 0)]
        t = escape_iql(thread_id)
        for seq, _ in doomed:
            self.ex.execute(f'-checkpoint("{t}", {seq}, _)')
        return len(doomed)
