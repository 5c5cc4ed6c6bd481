"""Datalog fixpoint parity with the dice-rules.pl semantics PrologEngine
evaluates (projection/prolog/PrologEngine.kt:52-206)."""

import pytest

from dice_spark.operators.prolog_rules import (
    DICE_RULES,
    Atom,
    Rule,
    apply_rules,
    derived_only,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "predicate string, x string, y string")


def test_transitive_chain(spark):
    # a -> b -> c -> d: chain must contain every forward pair
    facts = _facts(
        spark,
        [("reports_to", "a", "b"), ("reports_to", "b", "c"), ("reports_to", "c", "d")],
    )
    out = apply_rules(facts)
    chain = {
        (r["x"], r["y"])
        for r in out.filter("predicate = 'reports_to_chain'").collect()
    }
    assert chain == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }


def test_cycle_terminates(spark):
    # a -> b -> a: UNION dedup must converge (tabled-resolution parity),
    # deriving the self-reachability pairs a Prolog solver also proves
    facts = _facts(spark, [("reports_to", "a", "b"), ("reports_to", "b", "a")])
    chain = {
        (r["x"], r["y"])
        for r in apply_rules(facts)
        .filter("predicate = 'reports_to_chain'")
        .collect()
    }
    assert chain == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_coworker_inequality_and_symmetry(spark):
    facts = _facts(
        spark,
        [
            ("is_employed_by", "alice", "acme"),
            ("is_employed_by", "bob", "acme"),
            ("is_employed_by", "carol", "other"),
        ],
    )
    cw = {
        (r["x"], r["y"])
        for r in apply_rules(facts).filter("predicate = 'coworker'").collect()
    }
    # X \= Y removes self-pairs; both orientations derived, carol excluded
    assert cw == {("alice", "bob"), ("bob", "alice")}


def test_derived_only_excludes_base(spark):
    facts = _facts(spark, [("reports_to", "a", "b")])
    out = apply_rules(facts)
    der = derived_only(facts, out)
    preds = {r["predicate"] for r in der.collect()}
    assert "reports_to" not in preds
    assert preds == {"reports_to_chain"}


def test_rule_layering_derived_from_derived(spark):
    # a rule whose body consumes another rule's head must see it at the
    # next round (the fixpoint is over ALL derived facts, not base only)
    rules = DICE_RULES + (
        Rule(
            "chain_peer",
            ("X", "Y"),
            (Atom("reports_to_chain", ("X", "Z")), Atom("reports_to_chain", ("Y", "Z"))),
            not_equal=(("X", "Y"),),
        ),
    )
    facts = _facts(
        spark, [("reports_to", "a", "c"), ("reports_to", "b", "c")]
    )
    peers = {
        (r["x"], r["y"])
        for r in apply_rules(facts, rules).filter("predicate = 'chain_peer'").collect()
    }
    assert peers == {("a", "b"), ("b", "a")}


def test_unbound_head_variable_raises(spark):
    facts = _facts(spark, [("reports_to", "a", "b")])
    bad = (Rule("broken", ("X", "W"), (Atom("reports_to", ("X", "Y")),)),)
    with pytest.raises(ValueError):
        apply_rules(facts, bad)
