"""LLM-variant projector seams (projection/graph/LlmGraphProjector.kt:141-240,
LlmRelationshipDescriptionSynthesizer.kt:59-113): classification and
description synthesis as pluggable Arrow stages with deterministic defaults."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from dice_spark.operators.llm_projection import (
    default_synthesize,
    llm_classify_projection,
    synthesis_requests,
    synthesize_descriptions,
)


def _props(spark, rows):
    return spark.createDataFrame(
        rows,
        "prop_id string, text string, predicate string, subj_span string, "
        "obj_span string, subj_type string, obj_type string, subj_id string, "
        "obj_id string, confidence double",
    )


def _relations(spark):
    return spark.createDataFrame(
        [
            ("works with", "Person", "Person"),
            ("founded", "Person", "Organization"),
            ("likes", None, None),
        ],
        "predicate string, subject_type string, object_type string",
    )


BASE = [
    ("p1", "Alice works with Bob", "works with", "Alice", "Bob",
     "Person", "Person", "e-a", "e-b", 0.95),
    ("p2", "Carol founded Acme", "founded", "Carol", "Acme",
     "Person", "Organization", "e-c", "e-acme", 0.9),
    ("p3", "Dana works with Erin", "works with", "Dana", "Erin",
     "Person", "Person", "e-d", "e-e", 0.2),   # below policy floor
    ("p4", "Frank works with Grace", "works with", "Frank", "Grace",
     "Person", "Person", None, "e-g", 0.92),   # unresolved subject
]


def test_default_classifier_matches_rule_based_projector(spark):
    got = llm_classify_projection(_props(spark, BASE), _relations(spark))
    rows = {r.prop_id: r for r in got.collect()}
    assert rows["p1"].result == "SUCCESS"
    assert (rows["p1"].source_id, rows["p1"].target_id, rows["p1"].edge_type) == (
        "e-a", "e-b", "WORKS_WITH"
    )
    assert rows["p2"].result == "SUCCESS" and rows["p2"].edge_type == "FOUNDED"
    assert rows["p3"].result == "SKIPPED" and rows["p3"].reason == "PolicyRejected"
    assert rows["p4"].result == "FAILED" and "resolve" in rows["p4"].reason


def test_span_authoritative_direction_with_role_fallback(spark):
    # A classifier that names the OBJECT span as the source must flip the
    # edge; one that returns an unmatched span falls back to the role.
    def flipping(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prop_id": pdf["prop_id"],
                "has_relationship": True,
                "relationship_type": pdf["predicate"],
                "from_span": pdf["obj_span"],      # span wins: flipped
                "to_span": "no such span",          # falls back to OBJECT role
                "reasoning": "test",
            }
        )

    got = llm_classify_projection(
        _props(spark, BASE[:1]), _relations(spark), classify_fn=flipping
    )
    r = got.collect()[0]
    assert r.result == "SUCCESS"
    # from: span matched the object mention -> e-b; to: unmatched span -> OBJECT role -> e-b
    assert (r.source_id, r.target_id) == ("e-b", "e-b")


def test_unknown_relationship_type_fails(spark):
    def invents(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prop_id": pdf["prop_id"],
                "has_relationship": True,
                "relationship_type": "TELEPORTS_TO",
                "from_span": pdf["subj_span"],
                "to_span": pdf["obj_span"],
                "reasoning": "test",
            }
        )

    got = llm_classify_projection(
        _props(spark, BASE[:1]), _relations(spark), classify_fn=invents
    )
    r = got.collect()[0]
    assert r.result == "FAILED" and "TELEPORTS_TO" in r.reason


def test_no_allowed_relationship_fails_before_classification(spark):
    rels = spark.createDataFrame(
        [("owns", "Company", "Asset")],
        "predicate string, subject_type string, object_type string",
    )
    got = llm_classify_projection(_props(spark, BASE[:1]), rels)
    r = got.collect()[0]
    assert r.result == "FAILED" and "No allowed relationships" in r.reason


def test_null_type_defaults_related_to(spark):
    def no_type(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "prop_id": pdf["prop_id"],
                "has_relationship": True,
                "relationship_type": None,
                "from_span": pdf["subj_span"],
                "to_span": pdf["obj_span"],
                "reasoning": "test",
            }
        )

    got = llm_classify_projection(
        _props(spark, BASE[:1]), _relations(spark), classify_fn=no_type
    )
    r = got.collect()[0]
    assert r.result == "SUCCESS" and r.edge_type == "RELATED_TO"


def _edges(spark):
    return spark.createDataFrame(
        [
            ("e-a", "e-b", "WORKS_WITH", "existing text", "e-a-[WORKS_WITH]->e-b"),
            ("e-x", "e-y", "OWNS", "old description", "e-x-[OWNS]->e-y"),
        ],
        "source_id string, target_id string, edge_type string, "
        "description string, edge_ref string",
    )


def test_synthesis_requests_rank_and_cap(spark):
    props = _props(
        spark,
        [
            ("p1", "Alice works with Bob", "works with", "Alice", "Bob",
             "Person", "Person", "e-a", "e-b", 0.7),
            ("p5", "Alice still works with Bob", "works with", "Alice", "Bob",
             "Person", "Person", "e-a", "e-b", 0.9),
        ],
    )
    entities = spark.createDataFrame(
        [("e-a", "Alice"), ("e-b", "Bob")], "entity_id string, canonical_name string"
    )
    req = synthesis_requests(_edges(spark), props, entities, k=1).collect()
    by_ref = {r.edge_ref: r for r in req}
    r = by_ref["e-a-[WORKS_WITH]->e-b"]
    # top-1 by confidence desc
    assert list(r.support_ids) == ["p5"]
    assert r.source_name == "Alice" and r.target_name == "Bob"
    # the unsupported edge still gets a request row with empty support
    assert list(by_ref["e-x-[OWNS]->e-y"].support_ids) == []


def test_default_synthesizer_contract(spark):
    props = _props(spark, BASE[:1])
    entities = spark.createDataFrame(
        [("e-a", "Alice"), ("e-b", "Bob")], "entity_id string, canonical_name string"
    )
    out = synthesize_descriptions(
        synthesis_requests(_edges(spark), props, entities)
    ).collect()
    by_ref = {r.edge_ref: r for r in out}
    supported = by_ref["e-a-[WORKS_WITH]->e-b"]
    assert supported.description == "Alice works with Bob: Alice works with Bob"
    assert supported.confidence == 0.95
    assert list(supported.source_prop_ids) == ["p1"]
    # empty support: existing description kept, confidence 0, no sources
    # (LlmRelationshipDescriptionSynthesizer.kt:60-67)
    empty = by_ref["e-x-[OWNS]->e-y"]
    assert empty.description == "old description"
    assert empty.confidence == 0.0
    assert list(empty.source_prop_ids) == []


def test_pipeline_edges_get_descriptions(spark):
    from dice_spark.pipeline import run_pipeline
    from dice_spark.synth import CANONICAL_FLOW_CONF, canonical_flow_rows, make_transcripts

    out = run_pipeline(
        make_transcripts(spark, canonical_flow_rows()),
        context_id="synth-test",
        conf_overrides=CANONICAL_FLOW_CONF,
    )
    req = synthesis_requests(out["edges"], out["propositions"], out["entities"])
    got = synthesize_descriptions(req)
    assert got.count() == out["edges"].count()
    assert got.filter(F.col("confidence") <= 0).count() == 0
