"""Prolog fact emission parity with PrologTypes / DefaultPrologProjector.

Expected strings are the reference's own test vectors
(projection/prolog/PrologTypesTest.kt:28-125)."""

from pyspark.sql import functions as F

from dice_spark.operators.prolog import (
    DEFAULT_MAPPINGS,
    predicate_for,
    project_prolog,
    quote_atom,
    theory_string,
    write_theory,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        rows,
        "source_id string, target_id string, edge_type string, "
        "confidence double, source_prop_ids array<string>",
    )


def test_quote_atom_normalizes_special_characters(spark):
    # PrologTypesTest.kt:52-57
    df = spark.createDataFrame(
        [("Hello World",), ("Alice-123",), ("Test@Value",),
         ("550e8400-e29b-41d4-a716-446655440000",)],
        "v string",
    )
    got = [r[0] for r in df.select(quote_atom(F.col("v"))).collect()]
    assert got[:3] == ["'hello_world'", "'alice_123'", "'test_value'"]
    assert got[3].startswith("'") and got[3].endswith("'") and "_" in got[3]


def test_fact_confidence_grounding_lines(spark):
    # PrologFactTests / ConfidenceFactTests / GroundingFactTests
    edges = _edges(spark, [("alice", "bob", "FRIEND_OF", 0.9, ["prop-123"])])
    rows = {r["kind"]: r["line"] for r in project_prolog(edges).collect()}
    assert rows["fact"] == "friend_of('alice', 'bob')."
    assert rows["confidence"] == "confidence(friend_of('alice', 'bob'), 0.900000)."
    # grounding quotes the proposition id VERBATIM (PrologTypes.kt:160-166)
    assert rows["grounded_by"] == "grounded_by(friend_of('alice', 'bob'), 'prop-123')."


def test_predicate_mapping_and_camel_fallback(spark):
    df = spark.createDataFrame(
        [("EXPERT_IN",), ("WORKS_AT",), ("mentoredBy",), ("NEW_TYPE",)],
        "t string",
    )
    got = [r[0] for r in df.select(predicate_for(F.col("t"))).collect()]
    # mapped types (PrologSchema.DEFAULT_MAPPINGS)
    assert got[0] == "expert_in" and got[1] == "works_at"
    # camelCase fallback (PrologSchema.camelToSnakeCase)
    assert got[2] == "mentored_by"
    # unmapped UPPER_SNAKE -> lowercase
    assert got[3] == "new_type"
    assert DEFAULT_MAPPINGS["MANAGES"] == "manages"


def test_grounding_one_row_per_source_prop(spark):
    edges = _edges(
        spark, [("a1", "b1", "WORKS_AT", 0.8, ["prop-1", "prop-2"])]
    )
    out = project_prolog(edges)
    assert out.filter(F.col("kind") == "grounded_by").count() == 2
    assert out.filter(F.col("kind") == "fact").count() == 1
    # include flags mirror the reference constructor args
    assert project_prolog(edges, include_confidence=False).filter(
        F.col("kind") == "confidence"
    ).count() == 0
    assert project_prolog(edges, include_grounding=False).filter(
        F.col("kind") == "grounded_by"
    ).count() == 0


def test_theory_sections_and_file_emission(spark, tmp_path):
    edges = _edges(
        spark,
        [
            ("alice", "kubernetes", "EXPERT_IN", 0.95, ["p1"]),
            ("alice", "techcorp", "WORKS_AT", 0.8, ["p2", "p3"]),
        ],
    )
    rows = project_prolog(edges)
    theory = theory_string(rows, base_rules="senior(X) :- expert_in(X, _).")
    # toTheory section order (PrologTypes.kt:330-350)
    assert theory.index("% Base inference rules") < theory.index("% Projected facts")
    assert theory.index("% Projected facts") < theory.index("% Confidence metadata")
    assert theory.index("% Confidence metadata") < theory.index("% Grounding/provenance")
    assert "expert_in('alice', 'kubernetes')." in theory
    assert "senior(X) :- expert_in(X, _)." in theory

    out = str(tmp_path / "theory")
    write_theory(rows, out, base_rules="senior(X) :- expert_in(X, _).")
    import glob

    facts = []
    for f in glob.glob(f"{out}/fact/part-*"):
        facts.extend(line.strip() for line in open(f) if line.strip())
    assert sorted(facts) == [
        "expert_in('alice', 'kubernetes').",
        "works_at('alice', 'techcorp').",
    ]
    assert open(f"{out}/rules.pl").read().startswith("% Base inference rules")
    grounds = []
    for f in glob.glob(f"{out}/grounded_by/part-*"):
        grounds.extend(line.strip() for line in open(f) if line.strip())
    assert len(grounds) == 3
