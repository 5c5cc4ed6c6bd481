"""MemoryConsolidator port (operators/memory.py) — DefaultMemoryConsolidator
semantics from MemoryConsolidator.kt:75-210."""

from __future__ import annotations

from dice_spark.operators.memory import consolidate_session


def _props(spark, rows):
    return spark.createDataFrame(
        rows, "prop_id string, text string, confidence double, grounding array<string>"
    )


def _ents(spark, rows):
    return spark.createDataFrame(rows, "prop_id string, resolved_id string")


def test_reinforce_merge_promote_discard(spark):
    longterm = _props(
        spark,
        [
            ("e1", "alice works at acme", 0.8, ["c1"]),
            ("e2", "bob likes coffee and tea", 0.7, ["c2"]),
        ],
    )
    session = _props(
        spark,
        [
            # identical words + same entity -> sim 0.7*1 + 0.3*1 = 1.0 > 0.9 -> REINFORCED
            ("s1", "alice works at acme", 0.5, ["c9"]),
            # word jaccard 3/5=0.6, entity jaccard 1 -> 0.72 in [0.7, 0.9] -> MERGED
            ("s2", "alice quietly works at acme", 0.9, ["c8"]),
            # no match, high confidence -> PROMOTED
            ("s3", "carol paints murals downtown", 0.9, ["c7"]),
            # no match, low confidence -> DISCARDED
            ("s4", "dan hums", 0.3, ["c6"]),
        ],
    )
    se = _ents(spark, [("s1", "E-alice"), ("s2", "E-alice")])
    le = _ents(spark, [("e1", "E-alice")])
    out = consolidate_session(session, longterm, se, le)
    oc = {r.prop_id: (r.outcome, r.matched_id) for r in out["outcomes"].collect()}
    assert oc == {
        "s1": ("REINFORCED", "e1"),
        "s2": ("MERGED", "e1"),
        "s3": ("PROMOTED", None),
        "s4": ("DISCARDED", None),
    }
    r = out["reinforced"].collect()[0]
    assert r.prop_id == "e1" and round(r.confidence, 6) == 0.9
    assert r.grounding == ["c1", "c9"]  # union-distinct
    m = out["merged"].collect()[0]
    assert m.text == "alice quietly works at acme"  # session conf 0.9 > 0.8
    assert m.confidence == 0.9
    p = out["promoted"].collect()[0]
    assert p.status == "ACTIVE"


def test_entity_empty_conventions(spark):
    # Both entity sets empty -> entity sim 0.5; identical text -> sim
    # 0.7 + 0.15 = 0.85 -> MERGED (not reinforced).
    longterm = _props(spark, [("e1", "the sky is blue", 0.8, [])])
    session = _props(spark, [("s1", "the sky is blue", 0.9, [])])
    out = consolidate_session(session, longterm)
    oc = out["outcomes"].collect()[0]
    assert oc.outcome == "MERGED" and abs(oc.similarity - 0.85) < 1e-9
    # One side empty -> entity sim 0.0; identical text -> 0.7 -> still MERGED
    se = _ents(spark, [("s1", "E-x")])
    out2 = consolidate_session(session, longterm, session_entities=se)
    oc2 = out2["outcomes"].collect()[0]
    assert oc2.outcome == "MERGED" and abs(oc2.similarity - 0.7) < 1e-9


def test_below_threshold_no_match(spark):
    # word jaccard 1/7 ~ 0.14 -> sim < 0.7 -> falls to promote/discard
    longterm = _props(spark, [("e1", "alice works at acme", 0.8, [])])
    session = _props(spark, [("s1", "alice sings very loud opera arias", 0.7, [])])
    out = consolidate_session(session, longterm)
    assert out["outcomes"].collect()[0].outcome == "PROMOTED"


def test_max_token_df_cap_keeps_rare_token_pairs(spark):
    """Capped blocking still finds pairs sharing a rare token; the cap only
    drops the boilerplate token from the index, not from similarity."""
    longterm = _props(
        spark,
        [
            ("e1", "alice works at acme", 0.8, []),
            ("e2", "bob works at globex", 0.8, []),
            ("e3", "carol works at initech", 0.8, []),
        ],
    )
    session = _props(spark, [("s1", "alice works at acme", 0.9, [])])
    # 'works'/'at' appear in every long-term prop -> capped out of blocking;
    # 'alice'/'acme' still block s1 against e1.
    out = consolidate_session(session, longterm, max_token_df=0.9)
    oc = out["outcomes"].collect()[0]
    assert oc.outcome == "MERGED" and oc.matched_id == "e1"


def test_lsh_pair_stage_matches_inverted_index_on_clear_pairs(spark):
    """use_lsh=True (banded-MinHash candidates) finds the same outcomes as
    the inverted-index path when pairs are clearly above the floor (identical
    or near-identical word sets collide in every band)."""
    longterm = _props(
        spark,
        [
            ("e1", "alice works at acme", 0.8, ["c1"]),
            ("e2", "bob likes coffee and tea", 0.7, ["c2"]),
        ],
    )
    session = _props(
        spark,
        [
            # identical words, no entity relations -> sim 0.7*1 + 0.5*0.3
            # = 0.85 in [0.7, 0.9] -> MERGED with e1
            ("s1", "alice works at acme", 0.5, ["c9"]),
            ("s2", "carol paints murals downtown", 0.9, ["c7"]),  # PROMOTED
            ("s3", "dan hums", 0.3, ["c6"]),                   # DISCARDED
        ],
    )
    exact = consolidate_session(session, longterm)["outcomes"].collect()
    lsh = consolidate_session(session, longterm, use_lsh=True)["outcomes"].collect()
    as_map = lambda rows: {r.prop_id: (r.outcome, r.matched_id) for r in rows}
    assert as_map(lsh) == as_map(exact)
    assert as_map(lsh)["s1"] == ("MERGED", "e1")
