"""Contrast pass (PropositionContraster.kt:56-75 + LlmPropositionContraster.kt
derived-value arithmetic): level = max+1, modal context, decay = source
average, clamps, empty groups, text dedupe."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.contrast import contrast_groups, default_contraster

COLS = "prop_id string, context_id string, text string, predicate string, subj_span string, obj_span string, confidence double, decay double, level int"


def _group(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _alice_bob(spark):
    ga = _group(spark, [
        ("a1", "ctx1", "Alice prefers morning meetings.", "prefers", "Alice", "morning meetings", 0.9, 0.2, 0),
        ("a2", "ctx1", "Alice likes Python.", "likes", "Alice", "Python", 0.8, 0.4, 1),
        ("a3", "ctx1", "Alice works remotely.", "works", "Alice", "remotely", 0.7, 0.6, 0),
    ])
    gb = _group(spark, [
        ("b1", "ctx1", "Bob prefers afternoon meetings.", "prefers", "Bob", "afternoon meetings", 0.85, 0.4, 2),
        ("b2", "ctx2", "Bob likes Java.", "likes", "Bob", "Java", 0.95, 0.2, 0),
        ("b3", "ctx1", "Bob works in office.", "works", "Bob", "in office", 0.6, 0.8, 0),
    ])
    return ga, gb


def test_contrast_pairs_shared_predicate_divergent_object(spark):
    ga, gb = _alice_bob(spark)
    out = contrast_groups(ga, gb, "Alice", "Bob", target_count=10)
    rows = {r["text"]: r for r in out.collect()}
    assert "Alice prefers morning meetings whereas Bob prefers afternoon meetings." in rows
    assert "Alice likes Python whereas Bob likes Java." in rows
    assert "Alice works remotely whereas Bob works in office." in rows
    assert len(rows) == 3


def test_contrast_derived_arithmetic(spark):
    ga, gb = _alice_bob(spark)
    out = {r["text"]: r for r in contrast_groups(ga, gb, "Alice", "Bob", 10).collect()}
    r = out["Alice likes Python whereas Bob likes Java."]
    # level = max(level over A∪B) + 1 = 2 + 1
    assert r["level"] == 3
    # decay = avg of the pair's sources (0.4 + 0.2) / 2
    assert abs(r["decay"] - 0.3) < 1e-9
    # confidence = min of the pair (deterministic LLM stand-in)
    assert abs(r["confidence"] - 0.8) < 1e-9
    # modal context over A∪B: ctx1 appears 5x, ctx2 once
    assert r["context_id"] == "ctx1"
    assert r["status"] == "ACTIVE"
    assert sorted(r["source_ids"]) == ["a2", "b2"]
    assert r["n_sources"] == 2


def test_contrast_empty_group_yields_nothing(spark):
    ga, _ = _alice_bob(spark)
    empty = ga.filter(F.lit(False))
    assert contrast_groups(ga, empty, "Alice", "Bob", 5).count() == 0
    assert contrast_groups(empty, ga, "Bob", "Alice", 5).count() == 0


def test_contrast_target_count_keeps_best_pairs(spark):
    ga, gb = _alice_bob(spark)
    out = contrast_groups(ga, gb, "Alice", "Bob", target_count=1).collect()
    # best pair by min(conf) desc: prefers (0.9, 0.85) -> 0.85 beats likes 0.8
    assert len(out) == 1
    assert out[0]["text"] == "Alice prefers morning meetings whereas Bob prefers afternoon meetings."


def test_contrast_same_object_pairs_excluded(spark):
    ga = _group(spark, [("a1", "c", "Alice likes Python.", "likes", "Alice", "Python", 0.9, 0.1, 0)])
    gb = _group(spark, [("b1", "c", "Bob likes Python.", "likes", "Bob", "Python", 0.9, 0.1, 0)])
    assert contrast_groups(ga, gb, "A", "B", 5).count() == 0


def test_contrast_text_dedupe_keeps_min_sources(spark):
    # two A-side props render the identical contrast sentence
    ga = _group(spark, [
        ("a1", "c", "s1", "likes", "Alice", "Python", 0.9, 0.1, 0),
        ("a2", "c", "s2", "likes", "Alice", "Python", 0.9, 0.3, 0),
    ])
    gb = _group(spark, [("b1", "c", "s3", "likes", "Bob", "Java", 0.9, 0.5, 0)])
    out = contrast_groups(ga, gb, "A", "B", 5).collect()
    assert len(out) == 1
    assert sorted(out[0]["source_ids"]) == ["a1", "b1"]
    assert abs(out[0]["decay"] - 0.3) < 1e-9


def test_default_contraster_pair_cap_bounds_head_predicate(spark):
    # 20 x 20 rows sharing one predicate: candidates bounded by PAIR_CAP^2
    ga = _group(spark, [(f"a{i}", "c", f"ta{i}", "likes", "A", f"oa{i}", 0.5 + i / 100.0, 0.1, 0) for i in range(20)])
    gb = _group(spark, [(f"b{i}", "c", f"tb{i}", "likes", "B", f"ob{i}", 0.5 + i / 100.0, 0.1, 0) for i in range(20)])
    pairs = default_contraster(ga, gb, "A", "B", target_count=10_000)
    assert pairs.count() == 64  # PAIR_CAP=8 per side


def test_contrast_overlapping_groups_count_shared_prop_once(spark):
    # a2 belongs to BOTH caller-filtered groups; the exploded source join
    # must still count it once (n_sources=2, decay = avg of the pair).
    shared = ("a2", "ctx1", "Alice likes Python.", "likes", "Alice", "Python", 0.8, 0.4, 1)
    ga = _group(spark, [shared])
    gb = _group(spark, [
        shared,
        ("b2", "ctx2", "Bob likes Java.", "likes", "Bob", "Java", 0.95, 0.2, 0),
    ])
    out = contrast_groups(ga, gb, "Alice", "Bob", 10).collect()
    by_text = {r["text"]: r for r in out}
    r = by_text["Alice likes Python whereas Bob likes Java."]
    assert r["n_sources"] == 2
    assert abs(r["decay"] - 0.3) < 1e-9  # (0.4 + 0.2) / 2, a2 not doubled
    # level = max over the DISTINCT union (1) + 1
    assert r["level"] == 2
