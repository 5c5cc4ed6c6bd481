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


def test_vector_tier_bucketed_join_resolves_word_reversal(spark):
    """The (type, hyperplane-bucket) blocked vector tier still catches word
    reorderings — permuted names have identical letter-count embeddings,
    hence identical sign buckets — and the plan stays an equi-join (no
    cartesian / broadcast-nested-loop fallback)."""
    from dice_spark.operators.linking import resolve_against_entities

    m = spark.createDataFrame(
        [("Nguyen Alice", "Person"), ("Marta Diaz", "Person")],
        "span string, entity_type string",
    )
    e = spark.createDataFrame(
        [("e1", "Alice Nguyen", "Person"), ("e2", "Diaz Marta", "Person")],
        "entity_id string, canonical_name string, entity_type string",
    )
    out = resolve_against_entities(m, e, vector_tier=True)
    got = {r.span: (r.resolution_level, r.resolved_id) for r in out.collect()}
    assert got == {
        "Nguyen Alice": ("VECTOR", "e1"),
        "Marta Diaz": ("VECTOR", "e2"),
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_creation_veto_on_closed_types(spark):
    """NO_MATCH on a closed type (creation_permitted=false) -> VETOED, no
    entity may be minted; open and unlisted types keep NO_MATCH
    (EscalatingEntityResolver.createNewOrVeto, :224-237)."""
    from dice_spark.operators.linking import resolve_against_entities

    m = spark.createDataFrame(
        [
            ("Alice Nguyen", "Person"),     # resolves EXACT
            ("Zorblatt Vex", "Person"),     # open type -> NO_MATCH
            ("Quarterly Report", "Document"),  # closed type -> VETOED
            ("Acme Corp", "Org"),           # unlisted type -> NO_MATCH
        ],
        "span string, entity_type string",
    )
    e = spark.createDataFrame(
        [("e1", "Alice Nguyen", "Person")],
        "entity_id string, canonical_name string, entity_type string",
    )
    schema = spark.createDataFrame(
        [("Person", True), ("Document", False)],
        "entity_type string, creation_permitted boolean",
    )
    out = resolve_against_entities(m, e, schema=schema)
    got = {r.span: r.resolution_level for r in out.collect()}
    assert got == {
        "Alice Nguyen": "EXACT",
        "Zorblatt Vex": "NO_MATCH",
        "Quarterly Report": "VETOED",
        "Acme Corp": "NO_MATCH",
    }
    assert {r.resolved_id for r in out.collect() if r.resolution_level == "VETOED"} == {None}


def test_by_id_tier_runs_first_and_verifies(spark):
    """ByIdCandidateSearcher: a suggested_id present in the registry resolves
    BY_ID before any name tier; an unknown suggested_id falls through the
    ladder; mentions without ids are unaffected."""
    mentions = spark.createDataFrame(
        [
            ("The Maestro", "Person", "e2"),       # id hit -> BY_ID (name would never match)
            ("Hunter Hordern", "Person", "e9"),    # bogus id -> falls to EXACT
            ("Zelda Fitzgerald", "Person", None),  # no id, unknown -> NO_MATCH
        ],
        "span string, entity_type string, suggested_id string",
    )
    got = {
        r["span"]: (r["resolution_level"], r["resolved_id"])
        for r in resolve_against_entities(mentions, _entities(spark)).collect()
    }
    assert got["The Maestro"] == ("BY_ID", "e2")
    assert got["Hunter Hordern"] == ("EXACT", "e1")
    assert got["Zelda Fitzgerald"][0] == "NO_MATCH"


def test_by_id_ambiguous_suggestions_fall_through(spark):
    """The exactly-one rule applies to BY_ID like every tier: one mention key
    carrying two different registry-valid suggested ids is ambiguous — it
    falls through to the name ladder (here resolving EXACT on its span)
    instead of fanning out two resolution rows for a single mention."""
    mentions = spark.createDataFrame(
        [
            ("Hunter Hordern", "Person", "e2"),
            ("Hunter Hordern", "Person", "e3"),  # same key, conflicting id
        ],
        "span string, entity_type string, suggested_id string",
    )
    rows = resolve_against_entities(mentions, _entities(spark)).collect()
    got = {(r["span"], r["resolution_level"], r["resolved_id"]) for r in rows}
    assert got == {("Hunter Hordern", "EXACT", "e1")}


def test_vector_tier_over_real_embedding_columns(spark):
    """VectorCandidateSearcher over a REAL embedding column
    (VectorCandidateSearcher.kt:39-44): mention/entity vectors come from
    array<float> columns instead of the letter-count stand-in; same
    hyperplane-bucket candidate join, same >=0.95 exactly-one auto-accept,
    same rejection when two candidates clear the bar."""
    from pyspark.sql import functions as F

    from dice_spark.operators.linking import resolve_against_entities

    ents = spark.createDataFrame(
        [
            ("E1", "vzzq one", "vector", [1.0, 0.0, 0.0, 0.0]),
            ("E2", "vzzq two", "vector", [0.0, 1.0, 0.0, 0.0]),
            # E3 nearly parallel to E1 -> a second >=0.95 candidate for m1
            ("E3", "vzzq three", "vector", [0.999, 0.04, 0.0, 0.0]),
        ],
        "entity_id string, canonical_name string, entity_type string, embedding array<float>",
    )
    mentions = spark.createDataFrame(
        [
            ("qxj one", "vector", [1.0, 0.0, 0.0, 0.0]),     # ambiguous: E1+E3
            ("qxj two", "vector", [0.0, 1.0, 0.0, 0.0]),     # exactly one: E2
            ("qxj far", "vector", [0.0, 0.0, 0.0, 1.0]),     # no candidate
        ],
        "span string, entity_type string, m_embedding array<float>",
    )
    out = {
        r["span"]: r
        for r in resolve_against_entities(
            mentions,
            ents,
            vector_tier=True,
            vector_bucket_planes=2,
            mention_vec_col="m_embedding",
            entity_vec_col="embedding",
            embedding_dim=4,
        ).collect()
    }
    assert out["qxj two"]["resolved_id"] == "E2"
    assert out["qxj two"]["resolution_level"] == "VECTOR"
    # two candidates >= 0.95 -> exactly-one rule rejects, bakeoff (letter
    # cosine of disjoint names) scores 0 -> NO_MATCH
    assert out["qxj one"]["resolved_id"] is None
    assert out["qxj one"]["resolution_level"] == "NO_MATCH"
    assert out["qxj far"]["resolved_id"] is None
    assert out["qxj far"]["resolution_level"] == "NO_MATCH"
