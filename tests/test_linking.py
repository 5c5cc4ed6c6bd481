"""Tiered resolution against an entity registry: exactly-one rule, levels."""

from __future__ import annotations

from dice_spark.operators.linking import resolution_counters, resolve_against_entities


def _entities(spark):
    return spark.createDataFrame(
        [
            ("e1", "Hunter Hordern", "Person"),
            ("e2", "Johannes Brahms", "Person"),
            ("e3", "Katharine Jones", "Person"),
            ("e4", "Alex Chen", "Person"),
            ("e5", "Alex Chen", "Person"),      # duplicate name -> ambiguity
            ("e6", "Mercury", "Planet"),
        ],
        "entity_id string, canonical_name string, entity_type string",
    )


def _mentions(spark):
    return spark.createDataFrame(
        [
            ("Hunter Hordern", "Person"),    # EXACT
            ("Dr. Hunter Hordern", "Person"),# NORMALIZED (title strip)
            ("Brahms", "Person"),            # PARTIAL (single word, len>=4)
            ("Katherine Jones", "Person"),   # FUZZY (lev 1)
            ("Alex Chen", "Person"),         # ambiguous (two candidates) -> NO_MATCH
            ("Mercury", "Person"),           # type mismatch -> NO_MATCH
            ("Zelda Fitzgerald", "Person"),  # unknown -> NO_MATCH
        ],
        "span string, entity_type string",
    )


def test_resolution_levels(spark):
    got = {
        r["span"]: (r["resolution_level"], r["resolved_id"])
        for r in resolve_against_entities(_mentions(spark), _entities(spark)).collect()
    }
    assert got["Hunter Hordern"] == ("EXACT", "e1")
    assert got["Dr. Hunter Hordern"] == ("NORMALIZED", "e1")
    assert got["Brahms"] == ("PARTIAL", "e2")
    assert got["Katherine Jones"] == ("FUZZY", "e3")
    # exactly-one rule: two Alex Chens -> ambiguous at every tier
    assert got["Alex Chen"][0] == "NO_MATCH"
    # label compatibility: Person mention never matches Planet entity
    assert got["Mercury"][0] == "NO_MATCH"
    assert got["Zelda Fitzgerald"][0] == "NO_MATCH"


def test_resolution_counters(spark):
    resolved = resolve_against_entities(_mentions(spark), _entities(spark))
    counts = {r["resolution_level"]: r["n"] for r in resolution_counters(resolved).collect()}
    assert counts == {"EXACT": 1, "NORMALIZED": 1, "PARTIAL": 1, "FUZZY": 1, "NO_MATCH": 3}
