"""Agent-graph integration layer (model: reference SDK
integrations/langgraph/ — kg_node, kg_router, memory, checkpointer),
framework-agnostic and driven against a live engine."""

import pytest

from inputlayer_spark.engine import IQLEngine
from inputlayer_spark.integrations.langgraph import (
    AgentMemory,
    CheckpointStore,
    escape_iql,
    kg_node,
    kg_router,
)
from inputlayer_spark.olm import Model


def test_escape_iql_blocks_literal_breakout():
    assert escape_iql('he said "hi"') == 'he said \\"hi\\"'
    assert escape_iql("a\\b") == "a\\\\b"
    assert escape_iql("two\nlines") == "two\\nlines"


def test_kg_node_query_and_insert(spark):
    class Finding(Model):
        id: int
        label: str

    eng = IQLEngine(spark)
    Finding.declare(eng)
    store = kg_node(relation=Finding, operation="insert", state_key="new")
    out = store({"kg": eng, "new": [Finding(id=1, label="a"), Finding(id=2, label="b")]})
    assert out == {}
    search = kg_node(query="?finding(Id, L)", state_key="findings")
    got = search({"kg": eng})
    assert sorted(got["findings"]) == [(1, "a"), (2, "b")]
    # parameterized query via callable + escape
    by_label = kg_node(
        query=lambda s: f'?finding(Id, "{escape_iql(s["want"])}")',
        state_key="hit",
    )
    assert by_label({"kg": eng, "want": "b"})["hit"] == [(2, "b")]
    # delete mode removes exactly the given instances
    kg_node(relation=Finding, operation="delete", state_key="gone")(
        {"kg": eng, "gone": Finding(id=1, label="a")}
    )
    assert search({"kg": eng})["findings"] == [(2, "b")]
    with pytest.raises(ValueError):
        kg_node(operation="query")  # missing query
    with pytest.raises(ValueError):
        search({})  # no executor in state


def test_kg_router_first_nonempty_branch_wins(spark):
    eng = IQLEngine(spark)
    eng.execute("+ready[]")
    eng.execute("+missing[(1)]")
    route = kg_router(
        branches={
            "answer": "?ready(X)",
            "gather": "?missing(X)",
            "broken": "?no_such_relation(X)",
        },
        default="end",
    )
    assert route({"kg": eng}) == "gather"
    eng.execute("+ready[(1)]")
    assert route({"kg": eng}) == "answer"
    # all-empty + erroring branches → default, errors skipped not raised
    route2 = kg_router(branches={"a": "?no_such(X)"}, default="fallback", kg=eng)
    assert route2({}) == "fallback"


def test_agent_memory_store_recall_topics(spark):
    eng = IQLEngine(spark)
    mem = AgentMemory(eng, window=2)
    mem.setup()
    mem.store("t1", "user", "I need help with Python machine learning")
    mem.store("t1", "assistant", "Sure - which machine learning library?")
    mem.store("t1", "user", "Mostly pyspark pipelines")
    mem.store("t2", "user", "Unrelated thread about cooking pasta")

    # windowed recall: last 2 turns of t1 only, ascending turn order
    got = mem.recall("t1")
    assert len(got) == 2
    assert [r[-2] for r in got] == [
        "Sure - which machine learning library?",
        "Mostly pyspark pipelines",
    ]
    # topic recall goes through the DERIVED relevant_turn relation
    hits = mem.recall("t1", topic="machine")
    assert len(hits) == 2 and all("machine" in r[-2] for r in hits)
    # active_topic counts mentions per thread
    tops = dict((r[-2], r[-1]) for r in mem.active_topics("t1"))
    assert tops["machine"] == 2 and tops["pyspark"] == 1
    assert "pasta" not in tops
    # node factories read/write plain state dicts
    node = mem.recall_node(state_key="ctx")
    assert len(node({"thread_id": "t1"})["ctx"]) == 2
    mem.store_node(content_key="input")({"thread_id": "t2", "input": "more pasta talk"})
    assert len(mem.recall("t2")) == 2


def test_agent_memory_counter_survives_restart(spark):
    """A fresh AgentMemory over an existing KG must continue the turn
    sequence, not reuse (thread, turn) keys (ADVICE r5)."""
    eng = IQLEngine(spark)
    mem = AgentMemory(eng, window=10)
    mem.setup()
    t1 = mem.store("t1", "user", "first message about databases")
    t2 = mem.store("t1", "assistant", "reply about databases")
    assert (t1, t2) == (1, 2)

    # simulate a process restart: new instance, same engine/KG
    mem2 = AgentMemory(eng, window=10)
    t3 = mem2.store("t1", "user", "third message after restart")
    assert t3 == 3  # seeded from max stored turn, no duplicate keys

    got = mem2.recall("t1")
    assert [r[1] for r in got] == [1, 2, 3]
    # a third instance on an untouched-by-it thread also continues
    mem3 = AgentMemory(eng, window=10)
    assert mem3.store("t2", "user", "new thread") == 4


def test_checkpoint_store_roundtrip_and_prune(spark):
    eng = IQLEngine(spark)
    cp = CheckpointStore(eng)
    cp.setup()
    cp.put("run-1", 1, {"step": "plan", "data": [1, 2]})
    cp.put("run-1", 2, {"step": "act"})
    cp.put("run-2", 1, {"step": "other"})
    assert cp.get_latest("run-1") == (2, {"step": "act"})
    assert [s for s, _ in cp.list("run-1")] == [1, 2]
    removed = cp.prune_thread("run-1", keep_latest=1)
    assert removed == 1
    assert cp.list("run-1") == [(2, {"step": "act"})]
    assert cp.get_latest("run-2") == (1, {"step": "other"})
    assert cp.get_latest("run-3") is None
