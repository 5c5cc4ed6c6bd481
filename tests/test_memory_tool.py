"""Memory agent-tool facade (agent/Memory.kt:113-465) over the hybrid
retriever: builder chain, base-query scoping, eager preload + dedup,
contribution/description text, call() input parsing and rendering."""

import pytest

from dice_spark.agent.memory_tool import DEFAULT_LIMIT, Memory
from dice_spark.operators.propquery import PropQuery

AS_OF = "2024-06-01 00:00:00"


@pytest.fixture()
def props(spark):
    rows = [
        # prop_id, context_id, text, confidence, decay, status, pinned
        ("p1", "ctx", "Alice lives in Berlin", 0.9, 0.0, "ACTIVE"),
        ("p2", "ctx", "Alice plays piano", 0.8, 0.0, "ACTIVE"),
        ("p3", "ctx", "Alice visited Rome", 0.7, 0.0, "ACTIVE"),
        ("p4", "ctx", "Old stale fact", 0.9, 0.0, "SUPERSEDED"),
        ("p5", "other", "Bob likes tea", 0.9, 0.0, "ACTIVE"),
        ("p6", "ctx", "Low-confidence rumor", 0.2, 0.0, "ACTIVE"),
    ]
    # deliberately NO temporal metadata columns — the retriever must add
    # null placeholders itself (a bare store is a legal store)
    return spark.createDataFrame(
        rows,
        "prop_id string, context_id string, text string, confidence double, "
        "decay double, status string",
    )


def _mem(props):
    return Memory.for_context("ctx").with_store(props).with_as_of(AS_OF)


def test_builder_validation_and_immutability(props):
    m = _mem(props)
    with pytest.raises(ValueError):
        m.with_min_confidence(1.5)
    with pytest.raises(ValueError):
        m.with_default_limit(0)
    with pytest.raises(ValueError):
        m.with_eager_topic_search(0)
    with pytest.raises(ValueError):
        m.with_eager_search_about("q", 0)
    m2 = m.with_topic("travel")
    assert m.topic != m2.topic  # copy, not mutation (data class copy parity)
    assert m2.description == "Memories about travel"


def test_base_query_scopes_to_active_and_context(props):
    m = _mem(props)
    q = m.base_query()
    assert q.statuses == ["ACTIVE"] and q.context_id == "ctx"
    assert q.min_effective_confidence == 0.5
    ids = {r["prop_id"] for r in m._scoped().select("prop_id").collect()}
    # SUPERSEDED (p4), other-context (p5), sub-floor (p6) are all out
    assert ids == {"p1", "p2", "p3"}


def test_narrowed_by_can_widen_statuses(props):
    # base is applied BEFORE narrowedBy so a consumer may widen explicitly
    # (Memory.kt:188-191 comment)
    from dataclasses import replace

    m = _mem(props).narrowed_by(
        lambda q: replace(q, statuses=["ACTIVE", "SUPERSEDED"])
    )
    ids = {r["prop_id"] for r in m._scoped().select("prop_id").collect()}
    assert "p4" in ids


def test_eager_merge_order_and_dedup(props):
    # about-search first (most contextual), then topic, then query; dedup by id
    m = (
        _mem(props)
        .with_topic("piano music")
        .with_eager_search_about("Alice lives in Berlin", 1)
        .with_eager_topic_search(1)
        .with_eager_query(lambda q: PropQuery(
            context_id=q.context_id,
            min_effective_confidence=q.min_effective_confidence,
            effective_confidence_as_of=q.effective_confidence_as_of,
            statuses=q.statuses,
            order_by="EFFECTIVE_CONFIDENCE_DESC", limit=2,
        ))
    )
    eager = m._load_eager()
    assert eager[0]["prop_id"] == "p1"  # aboutMemories first
    ids = [r["prop_id"] for r in eager]
    assert len(ids) == len(set(ids))  # deduplicated
    assert m.eager_proposition_ids() >= {"p1"}


def test_contribution_lists_key_memories_and_count(props):
    m = _mem(props).with_eager_query(
        lambda q: PropQuery(
            context_id=q.context_id,
            min_effective_confidence=q.min_effective_confidence,
            effective_confidence_as_of=q.effective_confidence_as_of,
            statuses=q.statuses,
            order_by="EFFECTIVE_CONFIDENCE_DESC", limit=2,
        )
    )
    text = m.contribution()
    assert text.startswith("Reference: memory")
    assert "3 memories available." in text
    assert "Key memories about the user & context:" in text
    assert "1. Alice lives in Berlin" in text
    assert "[1 more retrievable via the memory tool]" in text
    assert text.rstrip().endswith(
        "Notes: Use when: whenever you need to recall information about "
        "the user & context"
    )


def test_tool_description_count_grammar(props, spark):
    assert "3 memories available." in _mem(props).tool_description()
    one = props.filter("prop_id = 'p1'")
    assert "1 memory available." in _mem(one).tool_description()
    empty = props.filter("prop_id = 'none'")
    assert "No memories stored yet." in _mem(empty).tool_description()
    d = _mem(props).definition()
    assert d["name"] == "memory" and "query" in d["inputSchema"]["properties"]


def test_parse_input_fallbacks():
    assert Memory.parse_input("") == {}
    assert Memory.parse_input("  ") == {}
    assert Memory.parse_input("not json") == {}
    assert Memory.parse_input('{"query": "x", "limit": 3}') == {"query": "x", "limit": 3}
    assert Memory.parse_input('[1,2]') == {}  # non-object JSON


def test_call_list_all_and_search_and_topic_fallback(props):
    m = _mem(props)
    listed = m.call("")
    assert listed.startswith("All memories (3):")
    assert "- Alice lives in Berlin" in listed
    hit = m.call('{"query": "where does Alice live"}')
    assert hit.startswith("Memories about 'where does Alice live'")
    assert "[" in hit  # probe tags rendered
    # `topic` accepted as silent fallback parameter name
    via_topic = m.call('{"topic": "where does Alice live"}')
    assert via_topic.startswith("Memories about 'where does Alice live'")


def test_call_eager_exclusion_and_empty_messages(props):
    m = _mem(props).with_eager_query(
        lambda q: PropQuery(
            context_id=q.context_id,
            min_effective_confidence=q.min_effective_confidence,
            effective_confidence_as_of=q.effective_confidence_as_of,
            statuses=q.statuses,
            order_by="EFFECTIVE_CONFIDENCE_DESC", limit=10,
        )
    )
    # all 3 in-scope memories are eager -> list-all has nothing new
    assert m.call("") == "No additional memories beyond those already provided."
    empty = _mem(props.filter("prop_id = 'none'"))
    assert empty.call("") == "No memories stored yet."
    no_hit = empty.call('{"query": "zzz"}')
    assert no_hit.startswith("No memories matched 'zzz'.")
    assert no_hit.endswith(".")


def test_provenance_and_entity_suffixes(props, spark):
    ents = spark.createDataFrame(
        [("p1", "Alice", "e-alice"), ("p1", "Berlin", "e-berlin")],
        "prop_id string, span string, resolved_id string",
    )
    m = (
        Memory.for_context("ctx")
        .with_store(props, prop_entities=ents)
        .with_as_of(AS_OF)
        .with_provenance(lambda ids: {"p1": ["standup notes 6/1", ""]})
    )
    out = m.call('{"query": "Alice Berlin", "limit": 2}')
    line = next(l for l in out.splitlines() if "Alice lives in Berlin" in l)
    assert "— source: standup notes 6/1" in line
    assert "Alice (e-alice)" in line and "Berlin (e-berlin)" in line
    # resolver failure degrades gracefully (memory still answers, uncited)
    boom = m.with_provenance(lambda ids: (_ for _ in ()).throw(RuntimeError()))
    assert "Alice lives in Berlin" in boom.call('{"query": "Alice Berlin"}')
