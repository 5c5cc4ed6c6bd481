"""Domain event emission (common/DiceEvent.kt surfaces re-expressed as an
append-only events relation; DefaultCollectorRunner.kt:190-218 one event per
applied transition, EventEmittingPropositionRepository.kt:81-126 typed save
events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.events import (
    extraction_batch_event,
    revision_events,
    status_change_events,
    sweep_status_events,
)


def test_status_change_events_delta(spark):
    before = spark.createDataFrame(
        [("p1", "ACTIVE"), ("p2", "ACTIVE"), ("p3", "STALE")],
        "prop_id string, status string",
    )
    after = spark.createDataFrame(
        [("p1", "ACTIVE"), ("p2", "STALE"), ("p3", "ACTIVE")],
        "prop_id string, status string",
    )
    got = {
        r["prop_id"]: (r["previous_status"], r["new_status"])
        for r in status_change_events(before, after, "r1", reason="sweep").collect()
    }
    assert got == {"p2": ("ACTIVE", "STALE"), "p3": ("STALE", "ACTIVE")}


def test_sweep_events_combine_reasons_and_skip_marked(spark):
    """Dry-run MARKED records emit nothing; two strategies marking the same
    proposition combine into ONE event with sorted comma-joined reasons
    (DefaultCollectorRunner.kt:201-209)."""
    records = spark.createDataFrame(
        [
            ("r1", "p1", "SWEPT", None, "low_utility"),
            ("r1", "p1", "SWEPT", None, "decayed"),
            ("r1", "p2", "MARKED", None, "decayed"),
        ],
        "run_id string, prop_id string, lifecycle string, target_ref string, reason string",
    )
    events = sweep_status_events(records).collect()
    assert len(events) == 1
    assert events[0]["prop_id"] == "p1"
    assert events[0]["reason"] == "decayed,low_utility"


def test_revision_events_typed(spark):
    revised = spark.createDataFrame(
        [
            ("p1", "MERGED"),
            ("p2", "REINFORCED"),
            ("p3", "CONTRADICTED"),
            ("p4", "WORLD_PROGRESSION"),
            ("p5", "REVIEW"),
            ("p6", "UNCHANGED"),
            ("n1", "NEW"),
        ],
        "prop_id string, revision_outcome string",
    )
    got = {
        r["prop_id"]: (r["event_type"], r["new_status"])
        for r in revision_events(revised, "rev-1").collect()
    }
    assert got == {
        "p1": ("PropositionMerged", None),
        "p2": ("PropositionReinforced", None),
        "p3": ("PropositionContradicted", "CONTRADICTED"),
        "p4": ("PropositionStatusChanged", "SUPERSEDED"),
        "p5": ("PropositionRoutedToReview", None),
        "n1": ("PropositionDiscovered", None),
    }
    assert "p6" not in got  # UNCHANGED emits nothing


def test_extraction_batch_event_payload(spark):
    stats = spark.createDataFrame(
        [(100, 7, 93)], "n_chunks int, n_quarantined int, n_propositions int"
    )
    rows = extraction_batch_event(stats, "batch-1").collect()
    assert len(rows) == 1
    assert rows[0]["event_type"] == "ExtractionBatchCompleted"
    assert rows[0]["payload"] == "n_chunks=100,n_propositions=93,n_quarantined=7"
