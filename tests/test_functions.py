"""Unit tests for the column-expression function library (reference parity
tables from FIXTURES.md §3/§5)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dice_spark.functions.decay import effective_confidence
from dice_spark.functions.normalize import norm_key
from dice_spark.functions.textfns import (
    canonical_name_score,
    canonicalize_text,
    upper_snake,
)

NORMALIZE_CASES = [
    ("Hunter Hordern", "hunter hordern"),
    ("Dr. Hunter Hordern", "hunter hordern"),
    ("Hordern, Hunter", "hunter hordern"),
    ("Lynda M. Coker", "lynda coker"),
    ("Lynda M Coker", "lynda coker"),
    ("Coker, Lynda M.", "lynda coker"),
    ("Lynda Coker", "lynda coker"),
    ("John Smith Jr.", "john smith"),
    ("John Smith", "john smith"),
    ("Mrs. Jane Doe Sr.", "jane doe"),
    ("  Spaced   Out  ", "spaced out"),
]


def test_normalize_name_table(spark):
    df = spark.createDataFrame([(s,) for s, _ in NORMALIZE_CASES], "name string")
    got = [r["k"] for r in df.select(norm_key("name").alias("k")).collect()]
    assert got == [e for _, e in NORMALIZE_CASES]


def test_canonicalize_text(spark):
    df = spark.createDataFrame(
        [("Claudia Carter has been at Meridian Labs for about 3 years.",),
         ("Claudia Carter has been at Meridian Labs for about 3 years",)],
        "text string",
    )
    got = {r["c"] for r in df.select(canonicalize_text("text").alias("c")).collect()}
    assert got == {"claudia carter has been at meridian labs for about 3 years"}


def test_upper_snake(spark):
    df = spark.createDataFrame([("works with",), ("is expert in",), ("likes",)], "p string")
    got = [r["t"] for r in df.select(upper_snake("p").alias("t")).collect()]
    assert got == ["WORKS_WITH", "IS_EXPERT_IN", "LIKES"]


def test_canonical_name_score_ordering(spark):
    forms = ["hunter.hordern@example.com", "HUNTER HORDERN", "Hunter Hordern", "Hunter"]
    df = spark.createDataFrame([(f,) for f in forms], "name string")
    rows = df.select("name", canonical_name_score("name").alias("s")).collect()
    best = max(rows, key=lambda r: r["s"])["name"]
    assert best == "Hunter Hordern"


def test_effective_confidence_decay(spark):
    rows = [
        # (conf, decay, age_days) -> expected conf * exp(-decay*2*age)
        (0.8, 0.0, 100),
        (0.8, 0.5, 1),
        (0.9, 0.1, 10),
    ]
    df = spark.createDataFrame(
        [
            (c, d, f"2026-01-01 00:00:00", f"2026-01-{1+a:02d} 00:00:00" if a < 30 else "2026-04-11 00:00:00")
            for c, d, a in rows
        ],
        "confidence double, decay double, content_revised string, as_of string",
    ).select(
        "confidence",
        "decay",
        F.to_timestamp("content_revised").alias("content_revised"),
        F.to_timestamp("as_of").alias("as_of"),
        F.lit(None).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(None).cast("timestamp").alias("invalidated_at"),
    )
    got = [
        r["e"]
        for r in df.select(
            effective_confidence(as_of=F.col("as_of")).alias("e")
        ).collect()
    ]
    exp = [c * math.exp(-d * 2.0 * a) for c, d, a in rows]
    for g, e in zip(got, exp):
        assert abs(g - e) < 1e-9


def test_effective_confidence_temporal_branches(spark):
    df = spark.createDataFrame(
        [
            # invalidated before as_of -> 0
            (0.9, 0.1, "2026-01-01", "2026-01-02", None, None, "2026-01-05", "2026-02-01"),
            # closed valid window containing as_of -> conf undecayed
            (0.9, 0.9, "2026-01-01", "2026-01-02", "2026-01-01", "2026-03-01", None, "2026-02-01"),
            # open window -> decays from valid_from (31 days)
            (0.8, 0.1, "2026-01-01", "2026-01-01", "2026-01-01", None, None, "2026-02-01"),
            # window not yet current -> 0
            (0.8, 0.0, "2026-01-01", "2026-01-01", "2026-03-01", None, None, "2026-02-01"),
        ],
        "confidence double, decay double, created string, content_revised string, "
        "valid_from string, valid_to string, invalidated_at string, as_of string",
    )
    for c in ["content_revised", "valid_from", "valid_to", "invalidated_at", "as_of"]:
        df = df.withColumn(c, F.to_timestamp(c))
    got = [r["e"] for r in df.select(effective_confidence(as_of=F.col("as_of")).alias("e")).collect()]
    assert got[0] == 0.0
    assert abs(got[1] - 0.9) < 1e-12
    assert abs(got[2] - 0.8 * math.exp(-0.1 * 2.0 * 31)) < 1e-9
    assert got[3] == 0.0


def test_knowledge_type_heuristic(spark):
    """HeuristicKnowledgeTypeClassifier.kt:24-38: decay > 0.5 EPISODIC;
    confidence > 0.7 and decay < 0.3 SEMANTIC; else WORKING."""
    from pyspark.sql import functions as F

    from dice_spark.functions.knowledge_type import heuristic_knowledge_type

    df = spark.createDataFrame(
        [("e", 0.9, 0.6), ("s", 0.8, 0.1), ("w1", 0.5, 0.1), ("w2", 0.8, 0.4)],
        "id string, confidence double, decay double",
    )
    got = {r["id"]: r["kt"] for r in df.select("id", heuristic_knowledge_type().alias("kt")).collect()}
    assert got == {"e": "EPISODIC", "s": "SEMANTIC", "w1": "WORKING", "w2": "WORKING"}


def test_knowledge_type_relation_ladder_declaration_order(spark):
    """RelationBasedKnowledgeTypeClassifier.kt:30-48: first declared
    predicate contained in the text wins; unmatched text falls back."""
    from dice_spark.functions.knowledge_type import relation_knowledge_type

    df = spark.createDataFrame(
        [
            ("a", "Alice WORKS WITH and mentors Bob", 0.9, 0.1),
            ("b", "Alice mentors Bob", 0.9, 0.1),
            ("c", "Alice likes tea", 0.9, 0.1),  # no predicate -> heuristic SEMANTIC
        ],
        "id string, text string, confidence double, decay double",
    )
    rels = [("works with", "EPISODIC"), ("mentors", "PROCEDURAL")]
    got = {r["id"]: r["kt"] for r in df.select("id", relation_knowledge_type(rels).alias("kt")).collect()}
    assert got == {"a": "EPISODIC", "b": "PROCEDURAL", "c": "SEMANTIC"}
