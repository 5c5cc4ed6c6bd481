"""ExtractionPerspective role scoping (LlmPropositionExtractor.kt:46-56):
USER keeps only user-turn facts, AGENT only assistant-turn facts, ALL is the
backward-compatible default; both extractor paths agree."""

from __future__ import annotations

import pytest

from dice_spark.operators.assembly import assemble_windows, split_turns
from dice_spark.operators.extraction import (
    extract_triples,
    extract_triples_udf,
    scope_to_perspective,
)
from dice_spark.synth import _T0, make_transcripts, relations_df


def _turns(spark):
    rows = [
        ("conv-p", 0, "user", "Alice works with Bob.", None, _T0),
        ("conv-p", 1, "assistant", "Carol mentors Dana.", None, _T0.replace(minute=1)),
        ("conv-p", 2, "user", "Erin reports to Frank.", None, _T0.replace(minute=2)),
        ("conv-p", 3, "tool", "Gail works with Hank.", None, _T0.replace(minute=3)),
    ]
    return split_turns(assemble_windows(make_transcripts(spark, rows)))


@pytest.mark.parametrize("perspective,subjects", [
    ("ALL", {"Alice", "Carol", "Erin", "Gail"}),
    ("USER", {"Alice", "Erin"}),
    ("AGENT", {"Carol"}),
])
def test_perspective_scopes_roles(spark, perspective, subjects):
    turns = _turns(spark)
    udf = extract_triples_udf(turns, perspective=perspective)
    expr = extract_triples(turns, relations_df(spark), perspective=perspective)
    assert {r["subj_span"] for r in udf.collect()} == subjects
    # both extractor paths produce identical rows under the scope
    cols = ["chunk_id", "turn_idx", "sentence", "predicate", "subj_span", "obj_span"]
    assert sorted(map(tuple, udf.select(*cols).collect())) == sorted(
        map(tuple, expr.select(*cols).collect())
    )


def test_unknown_perspective_raises(spark):
    with pytest.raises(ValueError, match="perspective"):
        scope_to_perspective(_turns(spark), "NARRATOR")
