"""Oracle.ask layered answering (query/oracle/LlmOracle.kt:48-140):
symbolic edge pass, confident negative, proposition fallback, unknown."""

from __future__ import annotations

from dice_spark.operators.oracle_query import oracle_ask, parse_question

RELS = ["works with", "mentors", "is allergic to"]
NAMES = ["Alice Nguyen", "Bob Smith"]


def _kg(spark):
    edges = spark.createDataFrame(
        [
            ("e1", "e2", "WORKS_WITH", "e1-[WORKS_WITH]->e2", ["p1", "p2"]),
            ("e2", "e3", "MENTORS", "e2-[MENTORS]->e3", ["p3"]),
        ],
        "source_id string, target_id string, edge_type string, edge_ref string, "
        "source_prop_ids array<string>",
    )
    entities = spark.createDataFrame(
        [("e1", "Alice Nguyen"), ("e2", "Bob Smith"), ("e3", "Carol Jones")],
        "entity_id string, canonical_name string",
    )
    props = spark.createDataFrame(
        [
            ("p1", "Alice Nguyen works with Bob Smith.", 0.9),
            ("p4", "Project Apollo shipped a milestone.", 0.6),
        ],
        "prop_id string, text string, confidence double",
    )
    return edges, entities, props


def test_parse_question_priority_and_bindings():
    pred, bound = parse_question("Who works with Alice Nguyen?", RELS, NAMES)
    assert pred == "works with" and bound == ["Alice Nguyen"]
    pred, bound = parse_question("Tell me about Apollo", RELS, NAMES)
    assert pred is None and bound == []


def test_symbolic_positive_answer(spark):
    edges, entities, props = _kg(spark)
    row = oracle_ask("Who works with Alice Nguyen?", edges, entities, props, RELS, NAMES).collect()[0]
    assert row["answer"] == "Alice Nguyen works with Bob Smith"
    assert row["source"] == "PROLOG" and not row["negative"]
    assert row["confidence"] == 0.9
    assert row["grounding"] == "p1,p2" and row["n_grounding"] == 2


def test_symbolic_confident_negative(spark):
    edges, entities, props = _kg(spark)
    row = oracle_ask("Who is allergic to peanuts?", edges, entities, props, RELS, NAMES).collect()[0]
    assert row["negative"] and row["source"] == "PROLOG"
    # negativeFromProlog confidence 0.8 (Question.kt:58-67)
    assert row["confidence"] == 0.8
    assert row["n_grounding"] == 0


def test_proposition_fallback(spark):
    edges, entities, props = _kg(spark)
    row = oracle_ask("what happened with project apollo", edges, entities, props, RELS, NAMES).collect()[0]
    assert row["source"] == "PROPOSITIONS" and not row["negative"]
    # answer = top similarity hit; confidence = max hit confidence
    assert row["answer"] == "Project Apollo shipped a milestone."
    assert row["confidence"] == 0.9  # max over the top-5 hits (p1 also scores)
    assert row["n_grounding"] == 2


def test_unknown_when_store_empty(spark):
    edges, entities, props = _kg(spark)
    empty = props.filter("prop_id = 'none'")
    row = oracle_ask("anything at all", edges, entities, empty, RELS, NAMES).collect()[0]
    assert row["negative"] and row["source"] == "NONE" and row["confidence"] == 0.0
    assert row["answer"].startswith("I don't have enough information to answer: ")
