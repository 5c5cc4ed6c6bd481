"""Decay sweep, hysteresis, report ordering, BFS/path/two-hop queries."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from dice_spark.operators.graphquery import neighborhood, path_between, two_hop_links
from dice_spark.operators.sweep import decay_sweep, hysteresis_transition, report_top_n

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
AS_OF = datetime(2026, 1, 2, tzinfo=timezone.utc)  # age = 1 day


def _props(spark, rows):
    df = spark.createDataFrame(
        rows,
        "prop_id string, text string, confidence double, decay double, "
        "pinned boolean, status string",
    )
    return (
        df.withColumn("content_revised", F.lit(T0))
        .withColumn("valid_from", F.lit(None).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("invalidated_at", F.lit(None).cast("timestamp"))
    )


def test_decay_sweep_marks_stale_never_deletes(spark):
    props = _props(spark, [
        ("keep", "strong", 0.95, 0.0, False, "ACTIVE"),   # eff 0.95
        ("sweep", "weak", 0.2, 0.9, False, "ACTIVE"),     # eff 0.2*e^-1.8 ~ 0.033
        ("pinned", "weak but pinned", 0.2, 0.9, True, "ACTIVE"),
    ])
    updated, records = decay_sweep(props, F.lit(AS_OF), retire_below=0.5, run_id="r1")
    status = {r["prop_id"]: r["status"] for r in updated.collect()}
    assert status == {"keep": "ACTIVE", "sweep": "STALE", "pinned": "ACTIVE"}
    recs = records.collect()
    assert len(recs) == 1 and recs[0]["prop_id"] == "sweep" and recs[0]["lifecycle"] == "SWEPT"
    assert updated.count() == 3  # nothing hard-deleted


def test_decay_sweep_dry_run(spark):
    props = _props(spark, [("sweep", "weak", 0.2, 0.9, False, "ACTIVE")])
    updated, records = decay_sweep(props, F.lit(AS_OF), retire_below=0.5, dry_run=True)
    assert updated.collect()[0]["status"] == "ACTIVE"
    assert records.collect()[0]["lifecycle"] == "MARKED"


def test_hysteresis(spark):
    props = _props(spark, [
        ("a", "t", 0.05, 0.0, False, "ACTIVE"),  # below 0.1 -> STALE
        ("b", "t", 0.15, 0.0, False, "ACTIVE"),  # in band -> stays ACTIVE
        ("c", "t", 0.15, 0.0, False, "STALE"),   # in band -> stays STALE
        ("d", "t", 0.25, 0.0, False, "STALE"),   # above 0.2 -> ACTIVE
    ])
    got = {r["prop_id"]: r["status"] for r in hysteresis_transition(props, F.lit(AS_OF)).collect()}
    assert got == {"a": "STALE", "b": "ACTIVE", "c": "STALE", "d": "ACTIVE"}


def test_hysteresis_pinned_are_sweep_exempt(spark):
    # DecayStatusPolicy.evaluate returns null for pinned (:141): both a
    # would-be STALE fall and a would-be ACTIVE recovery hold instead
    props = _props(spark, [
        ("p1", "t", 0.05, 0.0, True, "ACTIVE"),
        ("p2", "t", 0.25, 0.0, True, "STALE"),
    ])
    got = {r["prop_id"]: r["status"] for r in hysteresis_transition(props, F.lit(AS_OF)).collect()}
    assert got == {"p1": "ACTIVE", "p2": "STALE"}


def test_hysteresis_utility_weights(spark):
    # utility = eff * (1 + iw*importance) * (1 + rw*ln1p(reinforce)) — a
    # below-threshold eff_conf is rescued by importance/reinforcement
    # (StatusTransitionPolicy.kt:120-140)
    props = _props(spark, [
        ("weighted", "t", 0.08, 0.0, False, "ACTIVE"),
        ("plain", "t", 0.08, 0.0, False, "ACTIVE"),
    ]).withColumn(
        "importance", F.when(F.col("prop_id") == "weighted", 1.0).otherwise(0.0)
    ).withColumn(
        "reinforce_count", F.when(F.col("prop_id") == "weighted", 3).otherwise(0)
    )
    got = {
        r["prop_id"]: r["status"]
        for r in hysteresis_transition(
            props, F.lit(AS_OF), importance_weight=1.0, reinforce_weight=0.5
        ).collect()
    }
    # weighted: 0.08 * 2 * (1 + 0.5*ln4) ~ 0.27 -> holds ACTIVE; plain: 0.08 -> STALE
    assert got == {"weighted": "ACTIVE", "plain": "STALE"}


def test_report_top_n_ordering(spark):
    props = _props(spark, [
        ("p-bob", "b", 0.95, 0.0, False, "ACTIVE"),
        ("p-alice", "a", 0.95, 0.0, False, "ACTIVE"),
        ("p-decay", "d", 0.2, 0.9, False, "ACTIVE"),
    ])
    order = [r["prop_id"] for r in report_top_n(props, F.lit(AS_OF), 3).collect()]
    # eff conf desc, ties by id asc (StructuredReportProjector.kt:62-66)
    assert order == ["p-alice", "p-bob", "p-decay"]


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, "WORKS_WITH") for a, b in pairs], "source_id string, target_id string, edge_type string"
    )


def test_neighborhood_and_path(spark):
    e = _edges(spark, [("alice", "bob"), ("bob", "carol"), ("carol", "dana")])
    nb1 = {r["entity_id"]: r["distance"] for r in neighborhood(e, "alice", 1).collect()}
    assert nb1 == {"bob": 1}
    nb = {r["entity_id"]: r["distance"] for r in neighborhood(e, "alice", 5).collect()}
    assert nb == {"bob": 1, "carol": 2, "dana": 3}
    assert path_between(e, "alice", "carol") == ["alice", "bob", "carol"]
    assert path_between(e, "alice", "zed") is None
    assert path_between(e, "alice", "alice") == ["alice"]


def test_two_hop_links_golden(spark):
    # canonical-flow fixture: edges alice->bob->carol, carol->dana
    e = _edges(spark, [("alice", "bob"), ("bob", "carol"), ("carol", "dana")])
    got = [(r["source"], r["target"], list(r["connecting"])) for r in two_hop_links(e).collect()]
    assert got == [("alice", "carol", ["bob"]), ("bob", "dana", ["carol"])]


def test_two_hop_hub_connecting_capped(spark):
    """Two hub entities sharing many neighbours: the connecting array is
    capped at MAX_CONNECTING_IDS (smallest ids — deterministic) while
    n_connecting keeps the exact distinct-neighbour count."""
    from dice_spark.operators.graphquery import MAX_CONNECTING_IDS

    n = 300
    rows = [("hub0", f"leaf{i:04d}") for i in range(n)]
    rows += [("hub1", f"leaf{i:04d}") for i in range(n)]
    out = (
        two_hop_links(_edges(spark, rows))
        .filter("source = 'hub0' AND target = 'hub1'")
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert r["n_connecting"] == n
    assert len(r["connecting"]) == MAX_CONNECTING_IDS
    assert r["connecting"][0] == "leaf0000"
    assert r["connecting"][-1] == f"leaf{MAX_CONNECTING_IDS - 1:04d}"
