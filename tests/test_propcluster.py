"""findClusters + DuplicateCollectorStrategy (operators/propcluster.py).

Reference semantics pinned here:
* InMemoryPropositionRepository.findClusters:129-152 — cosine >= 0.7 pairs,
  anchor id < other id, topK per anchor.
* DuplicateCollectorStrategy.kt:47-115 — overlapping clusters union-find into
  one component; survivor = max(effectiveConfidence, reinforceCount, id);
  every other member marked Duplicate(survivorId).
"""

from __future__ import annotations

from dice_spark.operators.propcluster import duplicate_collector, find_clusters


def _props(spark, rows):
    return spark.createDataFrame(
        rows,
        "prop_id string, context_id string, predicate string, text string, "
        "confidence double, reinforce_count int",
    )


def test_find_clusters_pairs_and_topk(spark):
    # p1/p2 are near-identical texts (cosine ~1); p3 is unrelated letters.
    df = _props(
        spark,
        [
            ("p1", "c", "WORKS_AT", "alice works at acme", 0.9, 0),
            ("p2", "c", "WORKS_AT", "alice works at acme!", 0.8, 1),
            ("p3", "c", "WORKS_AT", "zzz qqq vvv", 0.7, 0),
        ],
    )
    pairs = find_clusters(df).collect()
    assert [(r.anchor_id, r.other_id) for r in pairs] == [("p1", "p2")]
    assert pairs[0].cosine >= 0.99


def test_blocking_keeps_different_predicates_apart(spark):
    df = _props(
        spark,
        [
            ("p1", "c", "WORKS_AT", "alice works at acme", 0.9, 0),
            ("p2", "c", "REPORTS_TO", "alice works at acme", 0.8, 0),
        ],
    )
    assert find_clusters(df).count() == 0


def test_duplicate_collector_survivor_and_marks(spark):
    # Three near-identical texts -> one component; survivor = highest
    # confidence, then reinforce_count, then greatest id.
    df = _props(
        spark,
        [
            ("p1", "c", "WORKS_AT", "alice works at acme", 0.8, 0),
            ("p2", "c", "WORKS_AT", "alice works at acme!", 0.95, 0),
            ("p3", "c", "WORKS_AT", "ALICE works at acme.", 0.8, 2),
            ("p4", "c", "WORKS_AT", "zzz qqq vvv", 0.99, 9),
        ],
    )
    marks = {r.prop_id: r for r in duplicate_collector(df).collect()}
    assert set(marks) == {"p1", "p2", "p3"}  # p4 in no pair -> untouched
    assert all(r.survivor_id == "p2" for r in marks.values())
    assert marks["p2"].mark == "SURVIVOR"
    assert marks["p1"].mark == "DUPLICATE" and marks["p3"].mark == "DUPLICATE"
    assert all(r.cluster_size == 3 for r in marks.values())


def test_survivor_tie_breaks_on_reinforce_then_greatest_id(spark):
    df = _props(
        spark,
        [
            ("a1", "c", "X", "same text here", 0.9, 1),
            ("a2", "c", "X", "same text here", 0.9, 2),
            ("a3", "c", "X", "same text here", 0.9, 2),
        ],
    )
    marks = {r.prop_id: r.mark for r in duplicate_collector(df).collect()}
    # conf ties -> reinforce 2 beats 1 -> greatest id among (a2, a3) wins.
    assert marks == {"a1": "DUPLICATE", "a2": "DUPLICATE", "a3": "SURVIVOR"}


def test_find_clusters_lsh_path_matches_exact_on_near_identical(spark):
    """The LSH candidate path finds near-identical texts (shingle Jaccard
    ~1 collides in every band) and still blocks on (context, predicate)."""
    df = _props(
        spark,
        [
            ("p1", "c", "WORKS_AT", "alice works at acme corp today", 0.9, 0),
            ("p2", "c", "WORKS_AT", "alice works at acme corp today!", 0.8, 1),
            ("p3", "c", "REPORTS_TO", "alice works at acme corp today", 0.7, 0),
            ("p4", "c", "WORKS_AT", "zzz qqq vvv www rrr ttt", 0.7, 0),
        ],
    )
    pairs = find_clusters(df, use_lsh=True).collect()
    assert [(r.anchor_id, r.other_id) for r in pairs] == [("p1", "p2")]
    assert pairs[0].cosine >= 0.99


def test_duplicate_collector_lsh_passthrough(spark):
    df = _props(
        spark,
        [
            ("p1", "c", "WORKS_AT", "alice works at acme corp today", 0.8, 0),
            ("p2", "c", "WORKS_AT", "alice works at acme corp today!", 0.95, 0),
        ],
    )
    out = {r.prop_id: r.mark for r in duplicate_collector(df, use_lsh=True).collect()}
    assert out == {"p2": "SURVIVOR", "p1": "DUPLICATE"}
