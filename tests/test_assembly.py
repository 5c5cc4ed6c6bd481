"""Turn assembly: window math + the per-turn text-equality invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from dice_spark.operators.assembly import assemble_windows, split_turns
from dice_spark.schemas import TRANSCRIPTS


def _mk(spark, n_turns: int, conv="c1"):
    from datetime import datetime, timezone

    rows = [
        (conv, i, "user" if i % 2 == 0 else "assistant", f"Turn {i} says: hello, world {i}.", None,
         datetime(2026, 1, 1, i // 60, i % 60, tzinfo=timezone.utc))
        for i in range(n_turns)
    ]
    return spark.createDataFrame(rows, TRANSCRIPTS)


def test_window_coverage_and_overlap(spark):
    tr = _mk(spark, 45)
    chunks = assemble_windows(tr).collect()
    # stride 18: windows [0,20) [18,38) [36,45)
    spans = sorted((c["window_start"], c["window_end"]) for c in chunks)
    assert spans == [(0, 20), (18, 38), (36, 45)]
    assert all(c["n_turns"] == c["window_end"] - c["window_start"] for c in chunks)


def test_per_turn_text_equality(spark):
    """The row invariant: rendering then splitting reproduces every turn's
    text exactly, under stable turn ordering."""
    tr = _mk(spark, 45)
    turns = split_turns(assemble_windows(tr))
    orig = tr.select("conv_id", "turn_idx", "role", "text")
    back = turns.select("conv_id", "turn_idx", "role", "text").distinct()
    diff1 = orig.exceptAll(back).count()
    diff2 = back.exceptAll(orig).count()
    assert diff1 == 0 and diff2 == 0


def test_small_conversation_single_window(spark):
    tr = _mk(spark, 3)
    chunks = assemble_windows(tr).collect()
    assert len(chunks) == 1
    assert chunks[0]["window_start"] == 0 and chunks[0]["window_end"] == 3
    assert chunks[0]["text"].count("\n\n") == 2


def test_overlap_turns_appear_in_both_windows(spark):
    tr = _mk(spark, 22)
    turns = split_turns(assemble_windows(tr))
    counts = {r["turn_idx"]: r["n"] for r in turns.groupBy("turn_idx").agg(F.count("*").alias("n")).collect()}
    assert counts[18] == 2 and counts[19] == 2
    assert counts[0] == 1 and counts[17] == 1 and counts[21] == 1
