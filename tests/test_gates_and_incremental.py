"""Admission gates + incremental trigger semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.gates import apply_gates
from dice_spark.streaming.incremental import assemble_triggered, triggered_windows


def test_gate_decisions(spark):
    props = spark.createDataFrame(
        [
            ("p1", "Alice works with Bob.", "works with", 0.9, "ACTIVE", None),
            ("p2", "Carol works with Dana.", "works with", 0.1, "ACTIVE", None),       # Reject (<0.2)
            ("p3", "Erin works with Frank.", "works with", 0.25, "ACTIVE", None),      # SkipProjection (<0.3)
            ("p4", "Grace works with Heidi.", "works with", 0.9, "CONTRADICTED", None),# SkipProjection
            ("p5", "Bob mentors Carol.", "mentors", 0.9, "ACTIVE", "MERGED"),          # RouteToReview
        ],
        "prop_id string, text string, predicate string, eff_conf double, status string, revision_outcome string",
    )
    got = {r["prop_id"]: r["gate_decision"] for r in apply_gates(props, min_confidence=0.2).collect()}
    assert got == {
        "p1": "Persist",
        "p2": "Reject",
        "p3": "SkipProjection",
        "p4": "SkipProjection",
        "p5": "RouteToReview",
    }


def test_evidence_floor_demotion_and_substring_quirk(spark):
    props = spark.createDataFrame(
        [
            ("p1", "Alice works with Bob.", "works with", 0.5, "ACTIVE", None),
            ("p2", "Acme networks with Globex.", "networks with", 0.5, "ACTIVE", None),
            ("p3", "Carol works with Dana.", "works with", 0.95, "ACTIVE", None),
        ],
        "prop_id string, text string, predicate string, eff_conf double, status string, revision_outcome string",
    )
    floors = spark.createDataFrame(
        [(0, "works with", 0.9, "associates with")],
        "priority int, predicate string, min_confidence double, demote_to string",
    )
    rows = {r["prop_id"]: r for r in apply_gates(props, floors=floors).collect()}
    assert rows["p1"]["gate_decision"] == "Demote"
    assert rows["p1"]["predicate"] == "associates with"
    # the documented quirk: substring matching means 'works with' floor also
    # catches 'networks with' (StandardGates.kt:288-300)
    assert rows["p2"]["gate_decision"] == "Demote"
    assert rows["p3"]["gate_decision"] == "Persist"


def test_trigger_threshold(spark):
    from datetime import datetime, timezone

    rows = []
    for c, n in [("small", 3), ("big", 7), ("grown", 10)]:
        for t in range(n):
            rows.append((c, t, "user", f"turn {t}", None, datetime(2026, 1, 1, tzinfo=timezone.utc)))
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")

    # no bookmarks: 'small' (3 < 4) not triggered
    w = {r["conv_id"]: (r["window_start"], r["window_end"]) for r in triggered_windows(tr, None).collect()}
    assert "small" not in w
    assert w["big"] == (0, 7)
    assert w["grown"] == (0, 10)

    # bookmark at 8 for 'grown': 10-8=2 < trigger -> not triggered;
    # bookmark at 2 for 'big': 7-2=5 >= 4 -> window [0, 7) with overlap 2
    bm = spark.createDataFrame([("grown", 8), ("big", 2)], "conv_id string, end_index int")
    w2 = {r["conv_id"]: (r["window_start"], r["window_end"]) for r in triggered_windows(tr, bm).collect()}
    assert "grown" not in w2
    assert w2["big"] == (0, 7)

    chunks = assemble_triggered(tr, triggered_windows(tr, bm))
    got = {r["conv_id"]: r["n_turns"] for r in chunks.collect()}
    assert got == {"big": 7}


def test_triggered_chunks_render_names_like_batch(spark):
    """The incremental path must render named turns exactly like the batch
    assembler ("name (role): text"), so identical input yields identical
    chunk text and content hashes on both paths."""
    from dice_spark.operators.assembly import assemble_windows
    from dice_spark.streaming.incremental import assemble_triggered, triggered_windows

    tr = spark.createDataFrame(
        [("c1", i, "user" if i % 2 == 0 else "agent",
          f"line {i}", "Alice" if i % 2 == 0 else None) for i in range(4)],
        "conv_id string, turn_idx int, role string, text string, name string",
    )
    batch = assemble_windows(tr, window_size=4, overlap=0).collect()
    inc = assemble_triggered(
        tr, triggered_windows(tr, None, window_size=4, overlap=0, trigger=1)
    ).collect()
    assert len(batch) == 1 and len(inc) == 1
    assert "Alice (user): line 0" in inc[0].text
    assert inc[0].text == batch[0].text
    assert inc[0].content_hash == batch[0].content_hash
