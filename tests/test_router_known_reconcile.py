"""RetrievalRouter modes + clamps, KnownEntityResolver fast path,
Reconciler ADOPTED/PROJECTED, stale cascade, named-turn MessageFormatter."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dice_spark.operators.router import MODES, DiscoveryQuery, retrieve


@pytest.fixture
def store(spark):
    import datetime as dt

    rows = [
        ("p1", "c1", "Alice works with Bob", dt.datetime(2024, 1, 1)),
        ("p2", "c1", "Bob mentors Carol", dt.datetime(2024, 2, 1)),
        ("p3", "c1", "Dana founded Acme", dt.datetime(2024, 3, 1)),
        ("p4", "c2", "Alice works with Bob", dt.datetime(2024, 1, 1)),  # other context
    ]
    return spark.createDataFrame(rows, "prop_id string, context_id string, text string, created timestamp")


@pytest.fixture
def pe(spark):
    return spark.createDataFrame(
        [("p1", "e1"), ("p1", "e2"), ("p2", "e2"), ("p2", "e3"), ("p3", "e4")],
        "prop_id string, resolved_id string",
    )


@pytest.fixture
def edges(spark):
    return spark.createDataFrame(
        [("e1", "e2", "WORKS_WITH"), ("e2", "e3", "MENTORS")],
        "source_id string, target_id string, edge_type string",
    )


def ids(res):
    return [r["prop_id"] for r in res["propositions"].collect()]


def test_vector_mode_scoped_and_ranked(store):
    res = retrieve(store, DiscoveryQuery(mode="VECTOR", text="alice works with bob", top_k=2), "c1")
    got = ids(res)
    assert got[0] == "p1" and "p4" not in got  # exact text tops; context scoped


def test_entity_and_graph_walk(store, pe, edges):
    assert ids(retrieve(store, DiscoveryQuery(mode="ENTITY", entity_id="e3"), "c1", pe)) == ["p2"]
    # walk from e1 at depth 2 reaches e2, e3 -> props p1, p2
    res = retrieve(store, DiscoveryQuery(mode="GRAPH_WALK", entity_id="e1", depth=2), "c1", pe, edges)
    assert sorted(ids(res)) == ["p1", "p2"]


def test_temporal_and_clamps(store):
    res = retrieve(store, DiscoveryQuery(mode="TEMPORAL", from_ts="2024-01-15 00:00:00", to_ts="2024-02-15 00:00:00"), "c1")
    assert ids(res) == ["p2"]
    # depth/topK clamped, bogus mode raises
    with pytest.raises(ValueError):
        retrieve(store, DiscoveryQuery(mode="NOPE"), "c1")
    assert set(MODES) == {"VECTOR", "ENTITY", "GRAPH_WALK", "TEMPORAL", "HYBRID"}


def test_hybrid_merge_tiers(store, pe, edges):
    # vector hit (exact text) ranks tier 0; graph-only neighbours tier 1.
    res = retrieve(
        store,
        DiscoveryQuery(mode="HYBRID", text="bob mentors carol", entity_id="e1", depth=1, top_k=3),
        "c1", pe, edges,
    )
    got = ids(res)
    assert got[0] == "p2"  # best vector score first
    assert set(got) >= {"p1", "p2"}


def test_known_entity_fast_path(spark):
    from dice_spark.operators.linking import known_entity_fast_path

    mentions = spark.createDataFrame(
        [("Dr. Alice Nguyen", "Person"), ("Acme Corp", "Org"), ("Nobody Here", "Person")],
        "span string, entity_type string",
    )
    known = spark.createDataFrame(
        [("k1", "Alice Nguyen", ["person"]), ("k2", "Acme Corp", ["saas"])],
        "entity_id string, canonical_name string, labels array<string>",
    )
    resolved, remaining = known_entity_fast_path(mentions, known)
    got = {r["span"]: (r["resolved_id"], r["resolution_level"]) for r in resolved.collect()}
    # title strips to the known name; labels cover the type -> REFERENCE_ONLY
    assert got["Dr. Alice Nguyen"] == ("k1", "KNOWN_REFERENCE")
    # name matches but 'org' not in known labels -> label widening
    assert got["Acme Corp"] == ("k2", "KNOWN_WIDENED")
    assert [r["span"] for r in remaining.collect()] == ["Nobody Here"]


def test_reconcile_adopted_vs_projected(spark):
    from dice_spark.operators.projection import reconcile_edges, stale_cascade

    batch = spark.createDataFrame(
        [("a-[X]->b",), ("c-[Y]->d",)], "edge_ref string"
    )
    existing = spark.createDataFrame([("a-[X]->b",)], "edge_ref string")
    got = {r["edge_ref"]: r["lifecycle"] for r in reconcile_edges(batch, existing).collect()}
    assert got == {"a-[X]->b": "ADOPTED", "c-[Y]->d": "PROJECTED"}
    got = {r["edge_ref"]: r["lifecycle"] for r in reconcile_edges(batch, None).collect()}
    assert set(got.values()) == {"PROJECTED"}

    records = spark.createDataFrame(
        [("r1", "p1"), ("r1", "p2"), ("r1", "p3")], "run_id string, prop_id string"
    )
    props = spark.createDataFrame(
        [("p1", "ACTIVE"), ("p2", "CONTRADICTED"), ("p3", "SUPERSEDED")],
        "prop_id string, status string",
    )
    stale = {r["prop_id"]: r["stale"] for r in stale_cascade(records, props).collect()}
    assert stale == {"p1": False, "p2": True, "p3": True}


def test_named_turn_formatter_roundtrip(spark):
    from dice_spark.operators.assembly import assemble_windows, split_turns

    rows = [
        ("c1", 0, "user", "Hello there.", None, None, "Hunter"),
        ("c1", 1, "assistant", "Hi!", None, None, None),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, name string"
    )
    chunks = assemble_windows(tr)
    text = chunks.collect()[0]["text"]
    # reference MessageFormatter: "name (role): content" when a name exists
    assert text == "Hunter (user): Hello there.\n\nassistant: Hi!"
    turns = {r["turn_idx"]: (r["role"], r["text"]) for r in split_turns(chunks).collect()}
    assert turns == {0: ("user", "Hello there."), 1: ("assistant", "Hi!")}


def test_grounding_edges_exact_and_suffix(spark):
    from dice_spark.operators.projection import grounding_edges

    props = spark.createDataFrame(
        [("p1", ["chunk:abc", "orphanhash"]), ("p2", ["def"])],
        "prop_id string, grounding array<string>",
    )
    nodes = spark.createDataFrame(
        [("chunk:abc",), ("ns:nested:def",), ("store:abc",)], "node_id string"
    )
    out = grounding_edges(props, nodes)
    refs = {r["edge_ref"] for r in out["edges"].collect()}
    # exact match wins for chunk:abc (no suffix fan-out once exact hits);
    # bare ids ("orphanhash", "def") never suffix-match -> skipped.
    assert refs == {"p1-[GROUNDED_IN]->chunk:abc"}
    rep = out["report"].collect()[0]
    assert (rep["attempted"], rep["written"], rep["skipped"]) == (3, 1, 2)


def test_grounding_suffix_resolution(spark):
    from dice_spark.operators.projection import grounding_edges

    props = spark.createDataFrame([("p1", ["legacy:xyz"])], "prop_id string, grounding array<string>")
    nodes = spark.createDataFrame([("modern:ns:xyz",)], "node_id string")
    out = grounding_edges(props, nodes)
    assert {r["target_id"] for r in out["edges"].collect()} == {"modern:ns:xyz"}


def test_sweep_collector_run_header(spark):
    from pyspark.sql import functions as F

    from dice_spark.operators.sweep import collector_run_header, decay_sweep

    import datetime as dt

    props = spark.createDataFrame(
        [
            ("p1", 0.9, 0.0, False, "ACTIVE", dt.datetime(2024, 1, 1)),
            ("p2", 0.2, 0.9, False, "ACTIVE", dt.datetime(2024, 1, 1)),
        ],
        "prop_id string, confidence double, decay double, pinned boolean, status string, content_revised timestamp",
    )
    props = props.withColumn("valid_from", F.lit(None).cast("timestamp")) \
        .withColumn("valid_to", F.lit(None).cast("timestamp")) \
        .withColumn("invalidated_at", F.lit(None).cast("timestamp"))
    as_of = F.to_timestamp(F.lit("2024-06-01 00:00:00"))
    _, records = decay_sweep(props, as_of, run_id="r1")
    hdr = collector_run_header(records, "r1", dry_run=False, as_of=as_of).collect()[0]
    assert hdr["run_id"] == "r1" and hdr["n_records"] == 1
    assert hdr["n_swept"] == 1 and hdr["n_marked"] == 0


def test_capability_contract_all_modes(store, pe, edges):
    """RetrievalRouter.kt capability fragments: an absent fragment yields a
    typed-empty result with supported=False, never a fallback scan; ENTITY /
    GRAPH_WALK need no fragment; HYBRID still runs its graph tier but reports
    supported = vector-capable."""
    full = {"VECTOR", "TEMPORAL"}
    none: set[str] = set()

    for caps in (full, {"VECTOR"}, {"TEMPORAL"}, none):
        # VECTOR gated on the VECTOR fragment.
        res = retrieve(
            store, DiscoveryQuery(mode="VECTOR", text="alice works with bob"),
            "c1", capabilities=caps,
        )
        assert res["supported"] == ("VECTOR" in caps)
        if "VECTOR" not in caps:
            assert res["propositions"].count() == 0

        # TEMPORAL gated on the TEMPORAL fragment.
        res = retrieve(
            store,
            DiscoveryQuery(mode="TEMPORAL", from_ts="2024-01-15 00:00:00", to_ts="2024-02-15 00:00:00"),
            "c1", capabilities=caps,
        )
        assert res["supported"] == ("TEMPORAL" in caps)
        if "TEMPORAL" not in caps:
            assert res["propositions"].count() == 0

        # ENTITY / GRAPH_WALK always supported.
        res = retrieve(store, DiscoveryQuery(mode="ENTITY", entity_id="e3"), "c1", pe, capabilities=caps)
        assert res["supported"] is True and ids(res) == ["p2"]
        res = retrieve(store, DiscoveryQuery(mode="GRAPH_WALK", entity_id="e1", depth=2), "c1", pe, edges, capabilities=caps)
        assert res["supported"] is True

        # HYBRID: graph tier regardless, supported = vector-capable.
        res = retrieve(
            store,
            DiscoveryQuery(mode="HYBRID", text="alice works with bob", entity_id="e1", depth=2),
            "c1", pe, edges, capabilities=caps,
        )
        assert res["supported"] == ("VECTOR" in caps)
        got = ids(res)
        assert len(got) > 0  # graph tier still returns results
        if "VECTOR" not in caps:
            rows = res["propositions"].collect()
            assert {r["tier"] for r in rows} == {1}
