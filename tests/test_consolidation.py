"""Dream-loop consolidation passes: AbstractionPass grouping/idempotency/
pinned immunity, ContradictionResolutionPass weaker-loses + pinned review,
orchestrated cycle (AbstractionPass.kt:48-100, ContradictionResolutionPass.kt:40-92)."""

from __future__ import annotations

from dice_spark.operators.consolidation import (
    abstraction_cycles,
    abstraction_pass,
    contradiction_pass,
    dream_loop,
)

PROP_SCHEMA = (
    "prop_id string, context_id string, text string, confidence double, "
    "decay double, pinned boolean, status string, level int, source_ids array<string>"
)


def _props(spark, rows):
    return spark.createDataFrame(rows, PROP_SCHEMA)


def _pe(spark, rows):
    return spark.createDataFrame(rows, "prop_id string, resolved_id string")


def test_abstraction_groups_and_supersedes(spark):
    # five level-0 ACTIVE props on e1 -> abstract; p6 on e2 (below threshold).
    rows = [
        (f"p{i}", "c", f"fact {i} about alice", 0.8, 0.1, False, "ACTIVE", 0, [])
        for i in range(1, 6)
    ] + [("p6", "c", "lone fact", 0.9, 0.0, False, "ACTIVE", 0, [])]
    pe = _pe(spark, [(f"p{i}", "e1") for i in range(1, 6)] + [("p6", "e2")])
    out = abstraction_pass(_props(spark, rows), pe, "c").collect()
    by_outcome = {}
    for r in out:
        by_outcome.setdefault(r["consolidation_outcome"], []).append(r)
    abs_rows = by_outcome["ABSTRACTED"]
    assert len(abs_rows) == 1 and abs_rows[0]["level"] == 1
    assert sorted(abs_rows[0]["source_ids"]) == [f"p{i}" for i in range(1, 6)]
    assert abs_rows[0]["text"].startswith("Summary[e1]: ")
    assert {r["prop_id"] for r in by_outcome["SUPERSEDED"]} == {f"p{i}" for i in range(1, 6)}
    assert all(r["status"] == "SUPERSEDED" for r in by_outcome["SUPERSEDED"])
    assert {r["prop_id"] for r in by_outcome["UNCHANGED"]} == {"p6"}


def test_abstraction_idempotency_guard_and_pinned(spark):
    rows = [
        (f"p{i}", "c", f"fact {i}", 0.8, 0.1, i == 1, "ACTIVE", 0, [])
        for i in range(1, 6)
    ] + [
        # existing abstraction already covering the whole group -> guard skips
        ("a1", "c", "Summary", 0.8, 0.1, False, "ACTIVE", 1, [f"p{i}" for i in range(1, 6)]),
    ]
    pe = _pe(spark, [(f"p{i}", "e1") for i in range(1, 6)])
    out = abstraction_pass(_props(spark, rows), pe, "c").collect()
    assert all(r["consolidation_outcome"] == "UNCHANGED" for r in out)

    # without the existing abstraction, the pinned member p1 stays ACTIVE
    out2 = abstraction_pass(_props(spark, rows[:5]), pe, "c").collect()
    got = {r["prop_id"]: r for r in out2 if r["consolidation_outcome"] != "ABSTRACTED"}
    assert got["p1"]["status"] == "ACTIVE" and got["p1"]["consolidation_outcome"] == "UNCHANGED"
    assert got["p2"]["status"] == "SUPERSEDED"


def test_contradiction_weaker_loses_and_pinned_review(spark):
    rows = [
        ("p1", "c", "Alice is employed by Acme.", 0.9, 0.0, False, "ACTIVE", 0, []),
        ("p2", "c", "Alice is not employed by Acme.", 0.4, 0.0, False, "ACTIVE", 0, []),
        ("p3", "c", "Bob mentors Carol.", 0.9, 0.0, False, "ACTIVE", 0, []),
        ("p4", "c", "Bob does not mentors Carol.", 0.95, 0.0, True, "ACTIVE", 0, []),
    ]
    props = _props(spark, rows)
    mentions = spark.createDataFrame(
        [("p1", "alice", None), ("p2", "alice", None), ("p3", "bob", None), ("p4", "bob", None)],
        "prop_id string, span string, resolved_id string",
    )
    out = {r["prop_id"]: r for r in contradiction_pass(props, "2024-06-01 00:00:00", mentions=mentions).collect()}
    # p2 is the weaker side of a contradictory pair -> CONTRADICTED
    assert out["p2"]["consolidation_outcome"] == "CONTRADICTED" and out["p2"]["status"] == "CONTRADICTED"
    assert out["p1"]["consolidation_outcome"] == "UNCHANGED"
    # p3 is weaker than the pinned p4? No: p3 (0.9) < p4 (0.95) -> p3 loses (not pinned) -> CONTRADICTED
    assert out["p3"]["consolidation_outcome"] == "CONTRADICTED"
    assert out["p4"]["consolidation_outcome"] == "UNCHANGED"


def test_contradiction_pinned_loser_routes_to_review(spark):
    rows = [
        ("p1", "c", "Dana leads Globex.", 0.9, 0.0, False, "ACTIVE", 0, []),
        ("p2", "c", "Dana does not leads Globex.", 0.3, 0.0, True, "ACTIVE", 0, []),
    ]
    mentions = spark.createDataFrame(
        [("p1", "dana", None), ("p2", "dana", None)],
        "prop_id string, span string, resolved_id string",
    )
    out = {r["prop_id"]: r for r in contradiction_pass(_props(spark, rows), "2024-06-01 00:00:00", mentions=mentions).collect()}
    # pinned loser is conflict-protected: REVIEW, status untouched
    assert out["p2"]["consolidation_outcome"] == "REVIEW" and out["p2"]["status"] == "ACTIVE"


def test_dream_loop_cycle(spark):
    rows = [
        (f"p{i}", "c", f"fact {i} about erin", 0.8, 0.1, False, "ACTIVE", 0, [])
        for i in range(1, 6)
    ]
    pe = _pe(spark, [(f"p{i}", "e1") for i in range(1, 6)])
    out = dream_loop(_props(spark, rows), pe, "c", "2024-06-01 00:00:00")
    counts = {(r["pass"], r["consolidation_outcome"]): r["n"] for r in out["counters"].collect()}
    assert counts[("abstraction", "ABSTRACTED")] == 1
    assert counts[("abstraction", "SUPERSEDED")] == 5
    store = out["store"].collect()
    assert len(store) == 6  # 5 superseded + 1 abstraction


def test_dream_loop_with_decay_sweep_tail(spark):
    """retire_below enables the DecaySweepPass tail: low-confidence unpinned
    ACTIVE props retire to STALE after abstraction/contradiction."""
    rows = [
        ("p1", "c", "weak fact about zed", 0.2, 0.1, False, "ACTIVE", 0, []),
        ("p2", "c", "strong fact about zed", 0.9, 0.1, False, "ACTIVE", 0, []),
        ("p3", "c", "pinned weak fact", 0.2, 0.1, True, "ACTIVE", 0, []),
    ]
    pe = _pe(spark, [("p1", "e9"), ("p2", "e8"), ("p3", "e7")])
    out = dream_loop(
        _props(spark, rows), pe, "c", "2024-06-01 00:00:00", retire_below=0.5
    )
    status = {r.prop_id: r.status for r in out["store"].collect()}
    assert status["p1"] == "STALE"  # below floor, unpinned -> swept
    assert status["p2"] == "ACTIVE"
    assert status["p3"] == "ACTIVE"  # pinned is eviction-immune
    counts = {(r["pass"], r["consolidation_outcome"]): r["n"] for r in out["counters"].collect()}
    assert counts[("decay_sweep", "SWEPT")] == 1
    assert out["sweep_records"].count() == 1


def test_abstraction_regrowth_mints_fresh_id(spark):
    """When a group grows past a prior abstraction, the new abstraction's
    prop_id must differ from the stale one (id digests the member set, like
    the reference abstractor's fresh ids — AbstractionPass.kt:104)."""
    from dice_spark.operators.consolidation import abstraction_pass

    def tables_of(n):
        rows = [
            (f"p{i}", "c1", f"fact {i}", 0.9, 0.01, False, "ACTIVE", 0, [])
            for i in range(n)
        ]
        props = spark.createDataFrame(
            rows,
            "prop_id string, context_id string, text string, confidence double, "
            "decay double, pinned boolean, status string, level int, "
            "source_ids array<string>",
        )
        pe = spark.createDataFrame(
            [(f"p{i}", "e1") for i in range(n)],
            "prop_id string, resolved_id string",
        )
        return props, pe

    first = abstraction_pass(*tables_of(5), "c1", threshold=5)
    abs1 = first.filter("consolidation_outcome = 'ABSTRACTED'").collect()
    assert len(abs1) == 1

    # Re-run over a grown group (the guard's full-coverage check misses).
    second = abstraction_pass(*tables_of(7), "c1", threshold=5)
    abs2 = second.filter("consolidation_outcome = 'ABSTRACTED'").collect()
    assert len(abs2) == 1
    assert abs1[0].prop_id != abs2[0].prop_id


def test_abstraction_source_level_one(spark):
    """Level-1 abstractions themselves abstract at >= threshold members:
    level = max(source levels) + 1 (PropositionAbstractor.kt:40)."""
    rows = [
        (f"a{i}", "c", f"Summary[e{i}]: facts", 0.8, 0.1, False, "ACTIVE", 1, [f"p{i}"])
        for i in range(1, 6)
    ] + [("p9", "c", "ground fact", 0.9, 0.0, False, "ACTIVE", 0, [])]
    pe = _pe(spark, [(f"a{i}", "eH") for i in range(1, 6)] + [("p9", "e2")])
    out = abstraction_pass(_props(spark, rows), pe, "c", source_level=1).collect()
    abs_rows = [r for r in out if r["consolidation_outcome"] == "ABSTRACTED"]
    assert len(abs_rows) == 1 and abs_rows[0]["level"] == 2
    assert sorted(abs_rows[0]["source_ids"]) == [f"a{i}" for i in range(1, 6)]
    sup = {r["prop_id"] for r in out if r["consolidation_outcome"] == "SUPERSEDED"}
    assert sup == {f"a{i}" for i in range(1, 6)}
    # the level-0 row is out of stratum -> untouched
    assert [r["status"] for r in out if r["prop_id"] == "p9"] == ["ACTIVE"]


def test_abstraction_over_max_level_is_noop(spark):
    """new level > max_level -> group skipped, sources stay ACTIVE
    (AbstractionPass.kt:86-94: never retire sources with nothing to
    replace them)."""
    rows = [
        (f"t{i}", "c", f"level-3 summary {i}", 0.8, 0.1, False, "ACTIVE", 3, [])
        for i in range(1, 6)
    ]
    pe = _pe(spark, [(f"t{i}", "eT") for i in range(1, 6)])
    out = abstraction_pass(_props(spark, rows), pe, "c", source_level=3).collect()
    assert all(r["consolidation_outcome"] == "UNCHANGED" for r in out)
    assert all(r["status"] == "ACTIVE" for r in out)


def test_abstraction_cycles_reaches_level_two(spark):
    """Multi-cycle loop: a level-0 group abstracts in cycle 1; a pre-existing
    level-1 cohort on a shared entity abstracts to level 2 in cycle 2."""
    rows = [
        (f"p{i}", "c", f"fact {i} about erin", 0.8, 0.1, False, "ACTIVE", 0, [])
        for i in range(1, 6)
    ] + [
        (f"a{i}", "c", f"Prior summary {i}", 0.7, 0.1, False, "ACTIVE", 1, [f"x{i}"])
        for i in range(1, 6)
    ]
    pe = _pe(
        spark,
        [(f"p{i}", "e1") for i in range(1, 6)]
        + [(f"a{i}", "eH") for i in range(1, 6)],
    )
    out = abstraction_cycles(_props(spark, rows), pe, "c")
    store = out["store"].collect()
    by_level = {}
    for r in store:
        by_level.setdefault(r["level"], []).append(r)
    # cycle 1: one new level-1 abstraction over e1; its 5 sources superseded
    new_l1 = [r for r in by_level[1] if r["text"].startswith("Summary[e1]")]
    assert len(new_l1) == 1 and new_l1[0]["status"] == "ACTIVE"
    assert all(r["status"] == "SUPERSEDED" for r in by_level[0])
    # cycle 2: the eH cohort abstracts to one ACTIVE level-2 row
    assert len(by_level[2]) == 1 and by_level[2][0]["status"] == "ACTIVE"
    assert sorted(by_level[2][0]["source_ids"]) == [f"a{i}" for i in range(1, 6)]
    prior_ids = {f"a{i}" for i in range(1, 6)}
    assert all(
        r["status"] == "SUPERSEDED" for r in by_level[1] if r["prop_id"] in prior_ids
    )
    counts = {
        (r["level"], r["consolidation_outcome"]): r["n"]
        for r in out["counters"].collect()
    }
    assert counts[(1, "ABSTRACTED")] == 1 and counts[(2, "ABSTRACTED")] == 1


def test_abstraction_zipf_head_group_is_capped(spark):
    """A hot entity with 10^5 members must not materialize an unbounded
    per-group array: source_ids is capped at MAX_SOURCE_IDS (smallest ids,
    rank-before-collect) while n-member-exact aggregates (confidence avg,
    SUPERSEDED count) stay correct."""
    from pyspark.sql import functions as F

    from dice_spark.operators.consolidation import MAX_SOURCE_IDS

    n = 100_000
    props = (
        spark.range(n)
        .select(
            F.format_string("p%06d", F.col("id")).alias("prop_id"),
            F.lit("c").alias("context_id"),
            F.format_string("fact %d about the user", F.col("id")).alias("text"),
            F.lit(0.8).alias("confidence"),
            F.lit(0.1).alias("decay"),
            F.lit(False).alias("pinned"),
            F.lit("ACTIVE").alias("status"),
            F.lit(0).alias("level"),
            F.array().cast("array<string>").alias("source_ids"),
        )
    )
    pe = props.select("prop_id", F.lit("the-user").alias("resolved_id"))
    out = abstraction_pass(props, pe, "c")
    abs_rows = out.filter(F.col("consolidation_outcome") == "ABSTRACTED").collect()
    assert len(abs_rows) == 1
    assert len(abs_rows[0]["source_ids"]) == MAX_SOURCE_IDS
    assert abs_rows[0]["source_ids"][0] == "p000000"
    assert abs_rows[0]["confidence"] == 0.8
    counts = {
        r["consolidation_outcome"]: r["n"]
        for r in out.groupBy("consolidation_outcome").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["SUPERSEDED"] == n
