"""KnowledgeGraphDelta contract (text2graph/KnowledgeGraphDelta.kt:27-69,
MultiPassKnowledgeGraphBuilder.kt:31-85): per-batch diff of entities and
relationships against a durable store."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.delta import (
    compute_delta,
    delta_summary,
    new_or_modified_entities,
)


def _entities(spark, rows):
    return spark.createDataFrame(
        rows, "entity_id string, canonical_name string, entity_type string"
    )


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "edge_ref string, edge_type string, confidence double"
    )


def _chunks(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "chunk_id string")


def test_entity_split_by_id_and_name(spark):
    batch = _entities(
        spark,
        [
            ("e1", "Alice Nguyen", "Person"),   # id match
            ("e9", "Bob Stone", "Person"),      # name match to s2
            ("e7", "Carol New", "Person"),      # no match -> new
        ],
    )
    existing = _entities(
        spark,
        [("e1", "Alice Nguyen", "Person"), ("s2", "Bob Stone", "person")],
    )
    d = compute_delta(
        _chunks(spark, ["c1"]), batch, _edges(spark, []), existing, _edges(spark, [])
    )
    merged = {r.entity_id: r.existing_id for r in d["merged_entities"].collect()}
    assert merged == {"e1": "e1", "e9": "s2"}
    assert [r.entity_id for r in d["new_entities"].collect()] == ["e7"]


def test_relationship_split_is_reconciler_lifecycle(spark):
    batch_edges = _edges(
        spark, [("a-[KNOWS]->b", "KNOWS", 0.9), ("a-[LIKES]->c", "LIKES", 0.9)]
    )
    store_edges = _edges(spark, [("a-[KNOWS]->b", "KNOWS", 0.5)])
    d = compute_delta(
        _chunks(spark, ["c1"]), _entities(spark, []), batch_edges, None, store_edges
    )
    assert [r.edge_ref for r in d["merged_relationships"].collect()] == ["a-[KNOWS]->b"]
    assert [r.edge_ref for r in d["new_relationships"].collect()] == ["a-[LIKES]->c"]


def test_no_store_means_everything_new(spark):
    batch = _entities(spark, [("e1", "Alice", "Person")])
    d = compute_delta(
        _chunks(spark, ["c1", "c1", "c2"]), batch, _edges(spark, [("x", "T", 0.9)])
    )
    assert d["merged_entities"].count() == 0
    assert d["new_entities"].count() == 1
    assert d["merged_relationships"].count() == 0
    assert d["new_relationships"].count() == 1
    assert sorted(r.chunk_id for r in d["chunk_ids"].collect()) == ["c1", "c2"]


def test_new_or_modified_merged_precedence(spark):
    # Same id on both sides (cross-batch union scenario): the merged view of
    # the entity wins, per KnowledgeGraphDelta.newOrModifiedEntities.
    d = {
        "merged_entities": _entities(spark, [("e1", "Doctor Alice", "Doctor")]).withColumn(
            "existing_id", F.lit("e1")
        ),
        "new_entities": _entities(
            spark, [("e1", "Alice", "Person"), ("e2", "Bob", "Person")]
        ),
    }
    got = {r.entity_id: r.canonical_name for r in new_or_modified_entities(d).collect()}
    assert got == {"e1": "Doctor Alice", "e2": "Bob"}


def test_summary_counts(spark):
    d = compute_delta(
        _chunks(spark, ["c1", "c2"]),
        _entities(spark, [("e1", "Alice", "Person")]),
        _edges(spark, [("x", "T", 0.9)]),
    )
    got = {r.category: r.n for r in delta_summary(d).collect()}
    assert got == {
        "chunk_ids": 2,
        "new_entities": 1,
        "merged_entities": 0,
        "new_relationships": 1,
        "merged_relationships": 0,
    }


def test_pipeline_returns_delta(spark):
    from dice_spark.pipeline import run_pipeline
    from dice_spark.synth import CANONICAL_FLOW_CONF, canonical_flow_rows, make_transcripts

    transcripts = make_transcripts(spark, canonical_flow_rows())
    out = run_pipeline(
        transcripts, context_id="delta-test", conf_overrides=CANONICAL_FLOW_CONF
    )
    d = out["delta"]
    # No store supplied: every entity and edge in the batch is new.
    assert d["new_entities"].count() == out["entities"].count()
    assert d["merged_entities"].count() == 0
    assert d["new_relationships"].count() == out["edges"].count()
    assert d["chunk_ids"].count() > 0

    # Re-run the same batch against its own output as the durable store:
    # everything merges, nothing is new.
    out2 = run_pipeline(
        transcripts,
        context_id="delta-test",
        conf_overrides=CANONICAL_FLOW_CONF,
        existing_entities=out["entities"],
        existing_edges=out["edges"],
    )
    d2 = out2["delta"]
    assert d2["new_entities"].count() == 0
    assert d2["merged_entities"].count() == out["entities"].count()
    assert d2["new_relationships"].count() == 0
    assert d2["merged_relationships"].count() == out["edges"].count()
