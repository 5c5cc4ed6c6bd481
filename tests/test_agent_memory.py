"""Agent-memory RRF hybrid search (agent/MemoryRetriever.kt:59-215):
tokenizer contract, term-overlap keyword probe, RRF consensus ranking,
eager-id handling, thin-hits gate for the related tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.agent_memory import RRF_K, memory_search, tokenize

def AS_OF():
    return F.to_timestamp(F.lit("2024-12-31 00:00:00"))


COLS = (
    "prop_id string, text string, confidence double, decay double, "
    "content_revised timestamp, valid_from timestamp, valid_to timestamp, "
    "invalidated_at timestamp"
)


def _props(spark, rows):
    full = [r + (None, None, None) for r in rows]
    return spark.createDataFrame(full, COLS).withColumn(
        "content_revised", F.to_timestamp(F.lit("2024-12-30 00:00:00"))
    )


def test_tokenize_contract():
    # lower-cased letter/digit runs, length >= 3, distinct, order kept
    assert tokenize("Evidence I'm interested in Canva!") == [
        "evidence", "interested", "canva"
    ]
    assert tokenize("a an of") == []
    assert tokenize("Canva canva CANVA") == ["canva"]


def test_keyword_probe_matches_salient_term(spark):
    # the reference's own motivating case (:135-141): the phrase never
    # substring-matches, its rare token does
    props = _props(spark, [
        ("p1", "The user evaluated Canva for design work.", 0.9, 0.0, None),
        ("p2", "The user likes gardening.", 0.9, 0.0, None),
    ])
    out = memory_search(props, "evidence I'm interested in Canva", AS_OF(), limit=5)
    rows = out.collect()
    by_id = {r["prop_id"]: r for r in rows}
    assert "keyword" in by_id["p1"]["sources"]
    # p2 has zero token overlap: vector-only tier, ranked below the consensus hit
    assert by_id["p2"]["sources"] == "vector"
    assert rows[0]["prop_id"] == "p1"


def test_rrf_consensus_outranks_lone_hit(spark):
    props = _props(spark, [
        ("p1", "alpha bravo charlie", 0.9, 0.0, None),
        ("p2", "zzzz qqqq", 0.9, 0.0, None),
    ])
    out = memory_search(props, "alpha bravo", AS_OF(), limit=5).collect()
    assert out[0]["prop_id"] == "p1"
    assert out[0]["sources"] == "keyword,vector"
    # consensus: two probes' contributions sum
    assert out[0]["rrf"] > 1.0 / (RRF_K + 1)


def test_eager_ids_rank_in_probes_but_drop_from_result(spark):
    props = _props(spark, [
        ("p1", "alpha bravo one", 0.9, 0.0, None),
        ("p2", "alpha bravo two", 0.8, 0.0, None),
        ("p3", "alpha bravo three", 0.7, 0.0, None),
    ])
    full = memory_search(props, "alpha bravo", AS_OF(), limit=3).collect()
    sans = memory_search(props, "alpha bravo", AS_OF(), eager_ids=["p1"], limit=3).collect()
    assert all(r["prop_id"] != "p1" for r in sans)
    # p1 still consumed rank 1 inside the probes: p2's rrf is unchanged
    full_p2 = next(r["rrf"] for r in full if r["prop_id"] == "p2")
    sans_p2 = next(r["rrf"] for r in sans if r["prop_id"] == "p2")
    assert full_p2 == sans_p2


def test_thin_gate_adds_related_tier(spark):
    props = _props(spark, [
        ("p1", "alpha likes tea", 0.9, 0.0, None),
        ("p2", "completely different words here", 0.8, 0.0, None),
    ])
    pe = spark.createDataFrame(
        [("p1", "e1", 0), ("p2", "e1", 0)],
        "prop_id string, resolved_id string, mention_idx int",
    )
    # limit 5 > 2 direct hits -> thin -> p2 reachable via shared entity e1
    out = {r["prop_id"]: r for r in
           memory_search(props, "alpha", AS_OF(), prop_entities=pe, limit=5).collect()}
    assert "related" in out["p2"]["sources"]


def test_no_related_tier_when_direct_hits_fill_limit(spark):
    props = _props(spark, [(f"p{i}", f"alpha item {i}", 0.9, 0.0, None) for i in range(6)])
    pe = spark.createDataFrame(
        [(f"p{i}", "e1", 0) for i in range(6)],
        "prop_id string, resolved_id string, mention_idx int",
    )
    out = memory_search(props, "alpha", AS_OF(), prop_entities=pe, limit=3).collect()
    assert all("related" not in r["sources"] for r in out)


def test_result_caps_at_limit_ordered_by_rrf(spark):
    props = _props(spark, [(f"p{i}", f"alpha {i}", 0.9, 0.0, None) for i in range(10)])
    out = memory_search(props, "alpha", AS_OF(), limit=4).collect()
    assert len(out) == 4
    rrfs = [r["rrf"] for r in out]
    assert rrfs == sorted(rrfs, reverse=True)


def test_rrf_floats_consensus_above_higher_ranked_lone_hit(spark):
    # MemoryTest 'RRF floats a consensus hit above a higher-ranked
    # single-probe hit': vector-rank-2 + keyword-rank-1 beats vector-rank-1
    props = _props(spark, [
        # same letter histogram as "canva" -> wins the vector probe, but no
        # query TOKEN appears in the text, so the keyword probe skips it
        ("a", "aaaa nnnn vvvv cccc", 0.9, 0.0, None),
        ("b", "beta canva fact", 0.9, 0.0, None),
    ])
    out = memory_search(props, "canva", AS_OF(), limit=5).collect()
    by_id = {r["prop_id"]: r for r in out}
    assert by_id["b"]["sources"] == "keyword,vector"
    ranks = [r["prop_id"] for r in out]
    assert ranks.index("b") < ranks.index("a")


def test_rrf_ties_keep_tier_order_vector_first(spark):
    # MemoryTest 'RRF ties keep tier order - vector before keyword': with
    # limit=1 each probe returns exactly its rank-1 hit — `v` wins the vector
    # probe (letter cosine ~0.94 vs ~0.34), `k` wins the keyword probe (equal
    # 1-token overlap, pool tie-break on prop_id: "k" < "v"). Equal RRF 1/61;
    # insertion order keeps the vector tier first, so the single kept row is v.
    props = _props(spark, [
        ("v", "aaaa", 0.9, 0.0, None),
        ("k", "zzzz beta", 0.9, 0.0, None),
    ])
    out = memory_search(props, "aaaa beta", AS_OF(), limit=1).collect()
    assert len(out) == 1
    assert out[0]["prop_id"] == "v" and out[0]["sources"] == "vector"


def test_list_all_eager_consume_slots(spark):
    """MemoryRetriever.listAll (:83-100): the store query limits FIRST, then
    eager ids filter — eager memories consume result slots."""
    from dice_spark.operators.agent_memory import memory_list_all

    props = _props(spark, [(f"p{i}", f"text {i}", 0.9 - i / 100.0, 0.0, None) for i in range(6)])
    out = memory_list_all(props, AS_OF(), eager_ids=["p0", "p1"], limit=3).collect()
    # top-3 by eff conf are p0,p1,p2; the two eager ones drop AFTER the limit
    assert [r["prop_id"] for r in out] == ["p2"]
    assert out[0]["rank"] == 1


def test_memory_search_empty_store(spark):
    props = _props(spark, [("p1", "x", 0.9, 0.0, None)]).filter("prop_id = 'none'")
    assert memory_search(props, "anything", AS_OF(), limit=5).count() == 0
