"""Authority-floored BFS + proposition-edge view (GraphQuery.kt:92-100,161-178)."""

from __future__ import annotations

from dice_spark.operators.graphquery import neighborhood, prop_edges


def _props(spark):
    rows = [
        # prop_id, subj_id, obj_id, status, authority_tier
        ("p1", "alice", "acme", "ACTIVE", "PRIMARY"),
        ("p2", "acme", "bob", "ACTIVE", "SECONDARY"),
        ("p3", "bob", "carol", "ACTIVE", "DERIVED"),
        ("p4", "carol", "dan", "ACTIVE", "UNKNOWN"),
        ("p5", "alice", "eve", "STALE", "PRIMARY"),  # not ACTIVE -> no edge
        ("p6", "alice", None, "ACTIVE", "PRIMARY"),  # unresolved -> no edge
    ]
    return spark.createDataFrame(
        rows,
        "prop_id string, subj_id string, obj_id string, status string, "
        "authority_tier string",
    )


def test_prop_edges_filters_unresolved_and_inactive(spark):
    e = prop_edges(_props(spark))
    assert {r.prop_id for r in e.collect()} == {"p1", "p2", "p3", "p4"}


def test_neighborhood_authority_floor(spark):
    e = prop_edges(_props(spark))
    # No floor: UNKNOWN edge still walks -> dan reachable at distance 4.
    full = {r.entity_id: r.distance for r in neighborhood(e, "alice", 5).collect()}
    assert full == {"acme": 1, "bob": 2, "carol": 3, "dan": 4}
    # DERIVED floor: everything except UNKNOWN -> dan unreachable.
    derived = {
        r.entity_id: r.distance
        for r in neighborhood(e, "alice", 5, min_authority="DERIVED").collect()
    }
    assert derived == {"acme": 1, "bob": 2, "carol": 3}
    # SECONDARY floor cuts the DERIVED edge too.
    sec = {
        r.entity_id: r.distance
        for r in neighborhood(e, "alice", 5, min_authority="SECONDARY").collect()
    }
    assert sec == {"acme": 1, "bob": 2}
    # UNKNOWN floor still drops UNKNOWN edges ("any floor").
    unk = {
        r.entity_id: r.distance
        for r in neighborhood(e, "alice", 5, min_authority="UNKNOWN").collect()
    }
    assert unk == {"acme": 1, "bob": 2, "carol": 3}


def test_neighborhood_predecessor_attribution(spark):
    e = prop_edges(_props(spark))
    preds = {r.entity_id: r.pred for r in neighborhood(e, "alice", 5).collect()}
    assert preds == {"acme": "alice", "bob": "acme", "carol": "bob", "dan": "carol"}


def test_neighborhood_unrecognized_tier_dropped_by_any_floor(spark):
    """A tier string outside AUTHORITY_TIERS fails safe like UNKNOWN: dropped
    by every floor, never promoted above PRIMARY (GraphQuery.kt:92-100)."""
    rows = [
        ("p1", "alice", "acme", "ACTIVE", "PRIMARY"),
        ("p2", "acme", "bob", "ACTIVE", "bogus-tier"),
    ]
    e = prop_edges(
        spark.createDataFrame(
            rows,
            "prop_id string, subj_id string, obj_id string, status string, "
            "authority_tier string",
        )
    )
    for floor in ["PRIMARY", "SECONDARY", "DERIVED", "UNKNOWN"]:
        got = {
            r.entity_id
            for r in neighborhood(e, "alice", 3, min_authority=floor).collect()
        }
        assert got == {"acme"}, floor


def test_bfs_releases_edge_cache(spark):
    """neighborhood/path_between must not pin their symmetric edge relation
    past the call: a long-lived session issuing many BFS queries would
    otherwise accumulate one cached copy of the edge list per call."""
    from dice_spark.operators.graphquery import neighborhood, path_between

    # Hermetic baseline: other modules' fixtures may hold caches in the
    # shared session; this test is about what BFS itself leaves behind.
    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "source_id string, target_id string"
    )
    n = neighborhood(edges, "a", max_depth=3)
    assert n.count() == 3
    p = path_between(edges, "a", "d", max_depth=4)
    assert p == ["a", "b", "c", "d"]
    # The leak was CacheManager-pinned relations (cache() lives until an
    # explicit unpersist, unlike localCheckpoint RDDs which the
    # ContextCleaner GCs): after both calls the cache manager must be empty.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
