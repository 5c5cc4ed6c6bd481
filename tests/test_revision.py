"""Revision arithmetic + fast-path semantics (FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.revision import classify_pairs_udf, revise


def _props(spark, rows):
    return spark.createDataFrame(
        rows,
        "prop_id string, context_id string, text string, confidence double, "
        "decay double, pinned boolean, status string, reinforce_count int, "
        "grounding array<string>",
    )


def test_canonical_text_merge(spark):
    existing = _props(spark, [
        ("p1", "c", "Claudia Carter has been at Meridian Labs for about 3 years.",
         0.95, 0.5, False, "ACTIVE", 0, ["g1"]),
    ])
    incoming = _props(spark, [
        ("n1", "c", "Claudia Carter has been at Meridian Labs for about 3 years",
         0.8, 0.9, False, "ACTIVE", 0, ["g2"]),
    ])
    out = {r["prop_id"]: r for r in revise(existing, incoming).collect()}
    assert len(out) == 1
    p = out["p1"]
    assert p["revision_outcome"] == "MERGED"
    assert abs(p["confidence"] - min(0.95 + 0.3 * 0.8, 0.99)) < 1e-9  # 0.99 cap
    assert abs(p["decay"] - 0.5 * 0.7) < 1e-9
    assert p["reinforce_count"] == 1
    assert sorted(p["grounding"]) == ["g1", "g2"]


def test_unrelated_is_new(spark):
    existing = _props(spark, [("p1", "c", "Alice works with Bob.", 0.9, 0.1, False, "ACTIVE", 0, [])])
    incoming = _props(spark, [("n1", "c", "Dana founded Initech.", 0.8, 0.2, False, "ACTIVE", 0, [])])
    out = {r["prop_id"]: r["revision_outcome"] for r in revise(existing, incoming).collect()}
    assert out == {"p1": "UNCHANGED", "n1": "NEW"}


def test_reinforce_and_contradict(spark):
    existing = _props(spark, [
        ("p1", "c", "Alice works with Bob at Globex.", 0.8, 0.4, False, "ACTIVE", 2, ["g1"]),
        ("p2", "c", "Carol leads Project Apollo.", 0.9, 0.2, False, "ACTIVE", 0, []),
        ("p3", "c", "Dana manages Initech.", 0.9, 0.2, True, "ACTIVE", 0, []),
    ])
    incoming = _props(spark, [
        ("n1", "c", "Alice collaborates with Bob at Globex.", 0.7, 0.5, False, "ACTIVE", 0, ["g2"]),
        ("n2", "c", "Carol does not lead Project Apollo.", 0.9, 0.1, False, "ACTIVE", 0, []),
        ("n3", "c", "Dana never manages Initech.", 0.9, 0.1, False, "ACTIVE", 0, []),
    ])
    pairs = spark.createDataFrame(
        [("p1", "n1", "SIMILAR", 0.8), ("p2", "n2", "CONTRADICTORY", 0.9), ("p3", "n3", "CONTRADICTORY", 0.9)],
        "existing_id string, new_id string, relation string, similarity double",
    )
    out = {r["prop_id"]: r for r in revise(existing, incoming, pairs).collect()}
    r1 = out["p1"]
    assert r1["revision_outcome"] == "REINFORCED"
    assert abs(r1["confidence"] - min(0.8 + 0.1 * 0.7, 0.95)) < 1e-9
    assert abs(r1["decay"] - 0.4 * 0.85) < 1e-9
    assert r1["reinforce_count"] == 3
    r2 = out["p2"]
    assert r2["revision_outcome"] == "CONTRADICTED" and r2["status"] == "CONTRADICTED"
    assert abs(r2["confidence"] - max(0.9 * 0.3, 0.05)) < 1e-9
    assert abs(r2["decay"] - min(0.2 + 0.15, 1.0)) < 1e-9
    # pinned original intact, routed to review
    r3 = out["p3"]
    assert r3["revision_outcome"] == "REVIEW" and r3["status"] == "ACTIVE"
    assert r3["confidence"] == 0.9


def test_similar_below_floor_treated_unrelated(spark):
    existing = _props(spark, [("p1", "c", "Alice works with Bob.", 0.8, 0.4, False, "ACTIVE", 0, [])])
    incoming = _props(spark, [("n1", "c", "Alice sometimes sees Bob.", 0.7, 0.5, False, "ACTIVE", 0, [])])
    pairs = spark.createDataFrame(
        [("p1", "n1", "SIMILAR", 0.5)],
        "existing_id string, new_id string, relation string, similarity double",
    )
    out = {r["prop_id"]: r["revision_outcome"] for r in revise(existing, incoming, pairs).collect()}
    assert out == {"p1": "UNCHANGED", "n1": "NEW"}


def test_classifier_udf_shapes(spark):
    pairs = spark.createDataFrame(
        [
            ("a", "b", "Alice works with Bob.", "Alice works with Bob"),
            ("a", "c", "Alice works with Bob.", "Alice does not works with Bob."),
            ("a", "d", "Alice works with Bob.", "Completely different content here."),
        ],
        "existing_id string, new_id string, existing_text string, new_text string",
    )
    got = {r["new_id"]: r["relation"] for r in classify_pairs_udf(pairs).collect()}
    assert got["b"] == "IDENTICAL"
    assert got["c"] == "CONTRADICTORY"
    assert got["d"] == "UNRELATED"


def test_entity_overlap_prefilter(spark):
    from dice_spark.operators.revision import entity_overlap_prefilter

    pairs = spark.createDataFrame(
        [("p1", "n1"), ("p2", "n2"), ("p3", "n3")],
        "existing_id string, new_id string",
    )
    mentions_a = spark.createDataFrame(
        [("p1", "Alice", "e1"), ("p2", "Bob", None), ("p3", "Carol", "e3")],
        "prop_id string, span string, resolved_id string",
    )
    mentions_b = spark.createDataFrame(
        [("n1", "Alice Smith", "e1"), ("n2", "BOB", None), ("n3", "Dave", "e4")],
        "prop_id string, span string, resolved_id string",
    )
    kept = {(r["existing_id"], r["new_id"]) for r in entity_overlap_prefilter(pairs, mentions_a, mentions_b).collect()}
    # p1/n1 share resolved entity e1; p2/n2 share the lowered span "bob";
    # p3/n3 share nothing -> dropped.
    assert kept == {("p1", "n1"), ("p2", "n2")}
    # The plan must be hash-join only: an OR-join would appear as
    # BroadcastNestedLoopJoin / CartesianProduct.
    plan = entity_overlap_prefilter(pairs, mentions_a, mentions_b)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_vector_fast_path_splits(spark):
    from dice_spark.operators.revision import vector_fast_path

    pairs = spark.createDataFrame(
        [
            ("e1", "n1", "Alice works with Bob.", "alice WORKS with bob"),   # cosine 1.0 -> auto
            ("e2", "n2", "Alice works with Bob.", "Bob collaborates Alice"),# mid -> classify
            ("e3", "n3", "Alice works with Bob.", "zzzz qqqq xxxx"),        # below floor -> drop
        ],
        "existing_id string, new_id string, existing_text string, new_text string",
    )
    auto, to_classify = vector_fast_path(pairs)
    assert {r["existing_id"] for r in auto.collect()} == {"e1"}
    assert auto.collect()[0]["relation"] == "IDENTICAL"
    assert {r["existing_id"] for r in to_classify.collect()} == {"e2"}


def test_revise_batch_vector_fast_path_reinforces(spark):
    from dice_spark.operators.revision import revise_batch

    existing = _props(spark, [("p1", "c", "Alice works with Bob.", 0.8, 0.4, False, "ACTIVE", 0, [])])
    # Same letters, different surface: canonical-text fast path misses,
    # embedding fast path auto-merges (reinforce arithmetic).
    incoming = _props(spark, [("n1", "c", "bob works with alice", 0.7, 0.5, False, "ACTIVE", 0, [])])
    mentions_e = spark.createDataFrame([("p1", "alice", None)], "prop_id string, span string, resolved_id string")
    mentions_i = spark.createDataFrame([("n1", "alice", None)], "prop_id string, span string, resolved_id string")
    out = {r["prop_id"]: r for r in revise_batch(
        existing, incoming, mentions_e, mentions_i, use_vector_fast_path=True
    ).collect()}
    assert out["p1"]["revision_outcome"] == "REINFORCED"


def test_identical_classification_merges(spark):
    """A classifier-IDENTICAL pair with DIFFERENT canonical text (word-order
    permutation: same token set, different sequence) merges with the merge
    arithmetic and consumes the incoming prop — classifiedToResult's
    identical-first branch (LlmPropositionReviser.kt:478-509). Identical
    outranks similar for the same new prop."""
    existing = _props(spark, [
        ("p1", "c", "Alice works with Bob.", 0.8, 0.5, False, "ACTIVE", 0, ["g1"]),
        ("p2", "c", "Alice works with Bob today.", 0.7, 0.5, False, "ACTIVE", 0, ["g2"]),
    ])
    incoming = _props(spark, [
        ("n1", "c", "Bob works with Alice.", 0.6, 0.9, False, "ACTIVE", 0, ["g3"]),
    ])
    pairs = spark.createDataFrame(
        [
            ("p1", "n1", "IDENTICAL", 1.0),
            ("p2", "n1", "SIMILAR", 0.8),
        ],
        "existing_id string, new_id string, relation string, similarity double",
    )
    out = {r["prop_id"]: r for r in revise(existing, incoming, pairs).collect()}
    assert set(out) == {"p1", "p2"}  # n1 consumed, never NEW
    assert out["p1"]["revision_outcome"] == "MERGED"
    assert out["p1"]["confidence"] == round(min(0.8 + 0.3 * 0.6, 0.99), 6)
    assert out["p1"]["reinforce_count"] == 1
    assert sorted(out["p1"]["grounding"]) == ["g1", "g3"]
    # the SIMILAR pair for the same new prop is outranked -> p2 untouched
    assert out["p2"]["revision_outcome"] == "UNCHANGED"
