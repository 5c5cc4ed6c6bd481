"""Zipf-head edge cap: project_edges must bound the per-edge id array.

Mirrors the abstraction_pass hot-entity cap test — the same fact extracted
from very many conversations ("user LIVES_IN Paris" at 10^12 turns) projects
to ONE edge_ref; its source_prop_ids array must stay bounded while the exact
support count (n_source_props) and max-confidence stay correct.
Reference semantics: RelationBasedGraphProjector.project merges same-ref
edges (GraphProjector.kt:55); the cap is a scale adaptation, count-exact.
"""

from pyspark.sql import functions as F

from dice_spark.operators.projection import MAX_EDGE_SOURCE_IDS, project_edges


def test_hot_edge_source_ids_capped(spark):
    n = 50_000
    classified = spark.range(n).select(
        F.lit("PROJECTED").alias("lifecycle"),
        F.lit("user").alias("subj_id"),
        F.lit("paris").alias("obj_id"),
        F.lit("lives in").alias("predicate"),
        (F.lit(0.85) + (F.col("id") % 10) / 100.0).alias("confidence"),
        F.format_string("the user lives in Paris (%d)", F.col("id")).alias("text"),
        F.format_string("p%06d", F.col("id")).alias("prop_id"),
    )
    edges = project_edges(classified).collect()
    assert len(edges) == 1
    e = edges[0]
    assert e["edge_ref"] == "user-[LIVES_IN]->paris"
    assert e["n_source_props"] == n
    assert len(e["source_prop_ids"]) == MAX_EDGE_SOURCE_IDS
    # smallest prop_ids survive — deterministic across reruns/parallelism
    assert e["source_prop_ids"][0] == "p000000"
    assert e["source_prop_ids"][-1] == f"p{MAX_EDGE_SOURCE_IDS - 1:06d}"
    assert e["confidence"] == 0.94


def test_small_edge_groups_unchanged(spark):
    classified = spark.createDataFrame(
        [
            ("PROJECTED", "a", "b", "knows", 0.9, "a knows b", "p1"),
            ("PROJECTED", "a", "b", "knows", 0.95, "a knows b again", "p2"),
            ("PROJECTED", "a", "c", "likes", 0.88, "a likes c", "p3"),
            ("SKIPPED", "a", "d", "knows", 0.99, "skipped row", "p4"),
        ],
        "lifecycle string, subj_id string, obj_id string, predicate string,"
        " confidence double, text string, prop_id string",
    )
    rows = {r["edge_ref"]: r for r in project_edges(classified).collect()}
    assert set(rows) == {"a-[KNOWS]->b", "a-[LIKES]->c"}
    ab = rows["a-[KNOWS]->b"]
    assert ab["source_prop_ids"] == ["p1", "p2"]
    assert ab["n_source_props"] == 2
    assert ab["confidence"] == 0.95
    assert ab["description"] == "a knows b"
