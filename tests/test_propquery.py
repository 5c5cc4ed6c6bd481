"""PropQuery filter/order/limit semantics vs PropositionQuery.matchesFilters
(PropositionStore.kt:55-84): each active filter, fail-open trust, tristate
pinned, entity any/all, orderings with deterministic tie-break."""

from __future__ import annotations

import pytest

from dice_spark.operators.propquery import PropQuery, apply_prop_query

SCHEMA = (
    "prop_id string, context_id string, text string, status string, level int, "
    "confidence double, decay double, reinforce_count int, pinned boolean, "
    "importance double, created timestamp, last_touched timestamp, "
    "last_accessed timestamp, trust_score double"
)

ROWS = [
    # id   ctx   text     status        lvl conf  decay rc pinned imp  created              touched              accessed             trust
    ("p1", "c1", "alpha", "ACTIVE",      0, 0.9, 0.0, 3, False, 0.8, "2024-01-01 00:00:00", "2024-06-01 00:00:00", "2024-07-01 00:00:00", 0.9),
    ("p2", "c1", "beta",  "ACTIVE",      1, 0.8, 0.5, 0, True,  0.2, "2024-02-01 00:00:00", "2024-02-02 00:00:00", "2024-02-03 00:00:00", None),
    ("p3", "c1", "gamma", "CONTRADICTED", 0, 0.7, 0.1, 1, False, 0.5, "2024-03-01 00:00:00", "2024-03-02 00:00:00", "2024-03-03 00:00:00", 0.2),
    ("p4", "c2", "delta", "ACTIVE",      2, 0.6, 0.0, 5, False, 0.9, "2024-04-01 00:00:00", "2024-04-02 00:00:00", "2024-04-03 00:00:00", 0.5),
]

ENTS = [("p1", "e1"), ("p1", "e2"), ("p2", "e2"), ("p3", "e3"), ("p4", "e1")]


@pytest.fixture
def props(spark):
    import datetime as dt

    def conv(r):
        return tuple(
            dt.datetime.fromisoformat(v) if isinstance(v, str) and v[:2] == "20" else v
            for v in r
        )

    return spark.createDataFrame([conv(r) for r in ROWS], SCHEMA)


@pytest.fixture
def pe(spark):
    return spark.createDataFrame(ENTS, "prop_id string, resolved_id string")


def ids(df):
    return {r["prop_id"] for r in df.collect()}


def test_scope_status_level(props):
    assert ids(apply_prop_query(props, PropQuery(context_id="c1"))) == {"p1", "p2", "p3"}
    assert ids(apply_prop_query(props, PropQuery(statuses=["ACTIVE"]))) == {"p1", "p2", "p4"}
    assert ids(apply_prop_query(props, PropQuery(min_level=1, max_level=1))) == {"p2"}


def test_time_ranges(props):
    q = PropQuery(created_after="2024-01-15 00:00:00", created_before="2024-03-15 00:00:00")
    assert ids(apply_prop_query(props, q)) == {"p2", "p3"}
    q = PropQuery(revised_after="2024-04-01 00:00:00")
    assert ids(apply_prop_query(props, q)) == {"p1", "p4"}
    q = PropQuery(accessed_before="2024-02-03 00:00:00")
    assert ids(apply_prop_query(props, q)) == {"p2"}


def test_pinned_tristate_and_trust_fail_open(props):
    assert ids(apply_prop_query(props, PropQuery(pinned=True))) == {"p2"}
    assert ids(apply_prop_query(props, PropQuery(pinned=False))) == {"p1", "p3", "p4"}
    # min_trust 0.4: p1 (0.9) and p4 (0.5) pass, p3 (0.2) drops,
    # p2 (null) passes FAIL-OPEN (passesMinTrust).
    assert ids(apply_prop_query(props, PropQuery(min_trust_score=0.4))) == {"p1", "p2", "p4"}


def test_effective_confidence_filter(props):
    # as_of 2024-06-02: p1 decay 0 -> 0.9; p2 decay .5, age ~121d -> ~0;
    # p3 decay .1, age ~92d -> ~0; p4 decay 0 -> 0.6.
    q = PropQuery(
        min_effective_confidence=0.5,
        effective_confidence_as_of="2024-06-02 00:00:00",
    )
    assert ids(apply_prop_query(props, q)) == {"p1", "p4"}
    with pytest.raises(ValueError):
        apply_prop_query(props, PropQuery(min_effective_confidence=0.5))


def test_entity_filters(props, pe):
    assert ids(apply_prop_query(props, PropQuery(entity_id="e1"), pe)) == {"p1", "p4"}
    assert ids(apply_prop_query(props, PropQuery(any_entity_ids=["e2", "e3"]), pe)) == {"p1", "p2", "p3"}
    assert ids(apply_prop_query(props, PropQuery(all_entity_ids=["e1", "e2"]), pe)) == {"p1"}
    with pytest.raises(ValueError):
        apply_prop_query(props, PropQuery(entity_id="e1"))


def test_order_and_limit(props):
    got = [r["prop_id"] for r in apply_prop_query(
        props, PropQuery(order_by="REINFORCE_COUNT_DESC", limit=2)
    ).collect()]
    assert got == ["p4", "p1"]
    got = [r["prop_id"] for r in apply_prop_query(
        props, PropQuery(order_by="IMPORTANCE_DESC")
    ).collect()]
    assert got == ["p4", "p1", "p3", "p2"]
    with pytest.raises(ValueError):
        apply_prop_query(props, PropQuery(order_by="BOGUS"))


def test_find_similar_with_scores_plain_and_filtered(spark):
    from dice_spark.operators.propquery import PropQuery, find_similar_with_scores

    rows = [
        ("p1", "c", "alice works at acme", "ACTIVE", 0, 0.9, 0.1, 0, False),
        ("p2", "c", "alice works at acme corp", "ACTIVE", 0, 0.8, 0.1, 1, False),
        ("p3", "c", "zzz qqq vvv", "ACTIVE", 0, 0.7, 0.1, 0, False),
        ("p4", "c", "alice works at acme inc", "STALE", 0, 0.6, 0.1, 0, False),
    ]
    props = spark.createDataFrame(
        rows,
        "prop_id string, context_id string, text string, status string, "
        "level int, confidence double, decay double, reinforce_count int, "
        "pinned boolean",
    )
    # Plain variant: score-desc order, threshold prunes the unrelated row.
    out = find_similar_with_scores(props, "alice works at acme", threshold=0.9, top_k=10)
    got = [(r.prop_id, r.score) for r in out.collect()]
    # letter-count cosine ranks "...inc" (p4) above "...corp" (p2)
    assert [p for p, _ in got] == ["p1", "p4", "p2"]
    assert got[0][1] == 1.0
    # Filtered variant: matchesFilters first (ACTIVE only) -> p4 gone.
    q = PropQuery(statuses=["ACTIVE"])
    out2 = find_similar_with_scores(
        props, "alice works at acme", threshold=0.9, top_k=10, query=q
    )
    assert [r.prop_id for r in out2.collect()] == ["p1", "p2"]
    # topK clamp applies after ordering.
    out3 = find_similar_with_scores(props, "alice works at acme", threshold=0.0, top_k=1)
    assert [r.prop_id for r in out3.collect()] == ["p1"]


def test_time_filter_on_missing_column_raises(spark):
    """A time filter against a store lacking the column raises instead of
    silently matching zero rows (the NULL-placeholder comparison trap)."""
    bare = spark.createDataFrame(
        [("p1", "c1", "t", "ACTIVE", 0, 0.9, 0.01, 0, False)],
        "prop_id string, context_id string, text string, status string, "
        "level int, confidence double, decay double, reinforce_count int, "
        "pinned boolean",
    )
    for q in (
        PropQuery(created_after="2026-01-01"),
        PropQuery(revised_before="2026-01-01"),
        PropQuery(accessed_after="2026-01-01"),
    ):
        with pytest.raises(ValueError, match="time filter"):
            apply_prop_query(bare, q)
