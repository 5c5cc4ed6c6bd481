"""Mention validation rules (MentionValidationRule.kt rule table) and
provenance stamping / authority tiers / authority-weighted trust
(PropositionPipeline.stampProvenance, spi/Authority.kt, AuthorityWeightedTrustScorer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.mention_filter import (
    EntityTypeGuard,
    LengthConstraint,
    MinWordCount,
    NoVagueReferences,
    NotBlank,
    PatternConstraint,
    filter_mentions,
    rejection_reason,
)
from dice_spark.operators.provenance import (
    authority_tier,
    stamp_provenance,
    trust_score,
    with_provenance_metadata,
)


def _reasons(spark, spans, rules=None):
    df = spark.createDataFrame([(s,) for s in spans], "span string")
    return {
        r["span"]: r["why"]
        for r in df.select("span", rejection_reason("span", rules).alias("why")).collect()
    }


def test_default_rules_match_reference_table(spark):
    got = _reasons(
        spark,
        ["  ", "this company", "That person", "the", "Alice Nguyen", "x" * 151, "An apple"],
    )
    assert got["  "] == "blank"
    assert got["this company"] == "vague_reference"
    assert got["That person"] == "vague_reference"  # case-insensitive starter
    assert got["the"] == "vague_reference"  # bare starter, exact match
    assert got["An apple"] == "vague_reference"
    assert got["x" * 151] == "length"
    assert got["Alice Nguyen"] is None


def test_rule_composition_fail_fast_order(spark):
    rules = [NotBlank(), MinWordCount(2), LengthConstraint(min_length=5)]
    got = _reasons(spark, ["", "Bob", "Al B", "Alice Nguyen"], rules)
    assert got[""] == "blank"
    assert got["Bob"] == "word_count"  # word_count fires before length
    assert got["Al B"] == "length"
    assert got["Alice Nguyen"] is None


def test_pattern_and_type_guard(spark):
    rules = [PatternConstraint(pattern=r"[A-Z][a-z]+( [A-Z][a-z]+)*")]
    got = _reasons(spark, ["Alice Nguyen", "alice nguyen"], rules)
    assert got["Alice Nguyen"] is None and got["alice nguyen"] == "pattern"
    rules = [EntityTypeGuard(invalid_patterns=["person", "a company"])]
    got = _reasons(spark, ["person", "A company called X", "Acme Corp"], rules)
    assert got["person"] == "generic_reference"
    assert got["A company called X"] == "generic_reference"
    assert got["Acme Corp"] is None


def test_filter_mentions_split(spark):
    df = spark.createDataFrame(
        [("Alice", "Person"), ("this thing", "Person")], "span string, entity_type string"
    )
    valid, rejected = filter_mentions(df)
    assert [r["span"] for r in valid.collect()] == ["Alice"]
    rej = rejected.collect()
    assert rej[0]["span"] == "this thing" and rej[0]["reject_reason"] == "vague_reference"


def test_stamp_provenance_and_authority(spark):
    props = spark.createDataFrame(
        [("p1", ["c1", "c2"]), ("p2", ["c2"]), ("p3", [])],
        "prop_id string, grounding array<string>",
    )
    chunks = spark.createDataFrame(
        [("c1", "hash1"), ("c2", "hash2")], "chunk_id string, content_hash string"
    )
    out = {r["prop_id"]: r for r in with_provenance_metadata(props, chunks, hash_col="content_hash").collect()}
    assert out["p1"]["provenance"] == ["content:hash1", "content:hash2"]
    assert out["p2"]["provenance"] == ["content:hash2"]
    # no grounding -> empty provenance -> UNKNOWN fail-safe (Authority.kt:35-131)
    assert out["p3"]["provenance"] == [] and out["p3"]["authority_tier"] == "UNKNOWN"
    assert out["p1"]["authority_tier"] == "DERIVED" and out["p1"]["trust_score"] == 0.6
    assert out["p3"]["trust_score"] == 0.5


def test_authority_strongest_locator_wins(spark):
    df = spark.createDataFrame(
        [
            (["content:x", "connector:slack/123"],),
            (["file:/tmp/a", "content:y"],),
            (["uri:https://example.org"],),
            (["weird:thing"],),
        ],
        "provenance array<string>",
    )
    rows = df.select(
        authority_tier("provenance").alias("tier"), trust_score("provenance").alias("t")
    ).collect()
    assert [(r["tier"], r["t"]) for r in rows] == [
        ("PRIMARY", 0.9),
        ("SECONDARY", 0.75),
        ("SECONDARY", 0.75),
        ("UNKNOWN", 0.5),
    ]


def test_explicit_locator_column_overrides_content(spark):
    props = spark.createDataFrame([("p1", ["c1"])], "prop_id string, grounding array<string>")
    chunks = spark.createDataFrame(
        [("c1", "hashX", "connector:crm/42")],
        "chunk_id string, content_hash string, source_locator string",
    )
    out = stamp_provenance(
        props, chunks, hash_col="content_hash", locator_col="source_locator"
    ).collect()[0]
    assert out["provenance"] == ["connector:crm/42"]


def test_pipeline_additional_grounding_reaches_propositions(spark):
    """run_pipeline(additional_grounding=[...]) merges the extra ids into
    every persisted proposition's grounding on top of the primary chunk ids
    (PropositionPipeline.processOnce / rememberText); provenance locators
    stay chunk-derived (non-chunk ids resolve no locator)."""
    from datetime import datetime, timezone

    from dice_spark.pipeline import run_pipeline
    from dice_spark.schemas import TRANSCRIPTS

    rows = [
        ("conv-0", t, "user", f"Agent Zero works with Project Alpha{t}.", None,
         datetime(2026, 1, 1, 0, t, tzinfo=timezone.utc))
        for t in range(6)
    ]
    tr = spark.createDataFrame(rows, TRANSCRIPTS)
    out = run_pipeline(tr, context_id="ag", additional_grounding=["email:t1", "hubspot:42"])
    props = out["propositions"].select("grounding", "provenance").collect()
    assert props
    for p in props:
        g = list(p["grounding"])
        assert g[-2:] == ["email:t1", "hubspot:42"]
        assert len(g) > 2  # primary chunk ids kept, extras appended
        # no locator minted for the non-chunk ids
        assert all("email:t1" not in loc for loc in p["provenance"])


def test_resolve_sources_batch_contract(spark):
    """ProvenanceResolver.resolveSources (agent/ProvenanceResolver.kt:30-46):
    one batch call, most-authoritative source first, sourceless and unknown
    ids absent from the result."""
    from dice_spark.operators.provenance import resolve_sources

    props = spark.createDataFrame(
        [
            ("p1", ["content:abc", "connector:slack/1", "uri:x"]),
            ("p2", []),
            ("p3", ["content:z"]),
        ],
        "prop_id string, provenance array<string>",
    )
    got = {r["prop_id"]: list(r["sources"]) for r in resolve_sources(props, ["p1", "p2", "p9"]).collect()}
    assert got == {"p1": ["connector:slack/1", "uri:x", "content:abc"]}
    # DataFrame id input behaves identically
    ids = spark.createDataFrame([("p3",)], "prop_id string")
    got2 = {r["prop_id"]: list(r["sources"]) for r in resolve_sources(props, ids).collect()}
    assert got2 == {"p3": ["content:z"]}
