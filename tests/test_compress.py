"""ContextCompressor port (common/resolver/ContextCompressor.kt): window,
sentence, and adaptive strategies, compressForAll, and the Spark column seam.
Scenarios mirror ContextCompressorTest.kt."""

from __future__ import annotations

import pytest

from dice_spark.functions.compress import (
    adaptive_compress,
    compress_context,
    compress_for_all,
    sentence_compress,
    window_compress,
)


def test_window_null_blank_inputs():
    assert window_compress(None, "Brahms") is None
    assert window_compress("   ", "Brahms") is None
    assert window_compress("Some text about music", "") is None


def test_window_extracts_around_mention():
    text = (
        "I've been listening to a lot of classical music. "
        "I really love Brahms. His symphonies are wonderful."
    )
    out = window_compress(text, "Brahms", window_chars=20, max_snippets=2, max_total_chars=300)
    assert out is not None and "Brahms" in out
    assert len(out) < len(text)
    assert out.startswith("...") and out.endswith("...")  # interior snippet


def test_window_partial_name_word_boundary():
    text = "The concert featured works by Johannes Brahms and Clara Schumann."
    out = window_compress(text, "Brahms Johannes")  # no exact hit; word hits
    assert out is not None and "Brahms" in out
    # substring inside a word must NOT match ("rah" inside Brahms)
    none_hit = window_compress("xyz abc", "rah")
    assert none_hit == "xyz abc"  # falls back to (short) full text


def test_window_merges_close_mentions_and_caps_length():
    long_text = "Brahms " * 100 + "is a great composer."
    out = window_compress(long_text, "Brahms", window_chars=50, max_snippets=2, max_total_chars=300)
    assert out is not None
    assert len(out) <= 310  # maxTotalChars + ellipsis


def test_window_unmentioned_truncates_to_sentences():
    text = (
        "This is a long first sentence about classical music. "
        "A second sentence about composers. A trailing fragment"
    )
    out = window_compress(text, "NonExistent", max_total_chars=80)
    assert out is not None
    assert out.endswith(".")  # complete-sentence truncation
    assert len(out) <= 80


def test_sentence_compressor_selects_and_surrounds():
    text = "Context before. Brahms was amazing. Context after. Unrelated one."
    out = sentence_compress(text, "Brahms", max_sentences=2, include_surrounding=True)
    assert out is not None and "Brahms" in out
    assert "Context before" in out and "Context after" in out
    assert "Unrelated" not in out

    no_surround = sentence_compress(text, "Brahms", max_sentences=2, include_surrounding=False)
    assert no_surround == "Brahms was amazing."


def test_sentence_compressor_unmentioned_returns_head():
    text = "First sentence here. Second sentence here. Third sentence here. Fourth."
    out = sentence_compress(text, "Ghost", max_sentences=2)
    assert out == "First sentence here. Second sentence here."


def test_adaptive_thresholds():
    short = "Brahms wrote symphonies."
    assert adaptive_compress(short, "Brahms") == short  # identity under 500
    medium = ("Filler sentence here. " * 30) + "Brahms appears once. " + ("More filler. " * 10)
    out_m = adaptive_compress(medium, "Brahms")
    assert out_m is not None and "Brahms" in out_m and len(out_m) < len(medium)
    long = ("word " * 500) + "Brahms " + ("word " * 500)
    out_l = adaptive_compress(long, "Brahms")
    assert out_l is not None and "Brahms" in out_l and len(out_l) <= 510


def test_compress_for_all_joins_distinct():
    text = "Alice met Bob at the cafe near the river in the late afternoon sun."
    out = compress_for_all(text, ["Alice", "Bob", "Alice"])
    assert out is not None and "Alice" in out
    # Alice + Bob windows overlap the whole short text -> one distinct snippet
    assert out.count(" ... ") == 0


def test_compress_context_column(spark):
    df = spark.createDataFrame(
        [
            ("m1", "Some filler. " * 60 + "Brahms is mentioned here. " + "Tail. " * 10, "Brahms"),
            ("m2", None, "Brahms"),
            ("m3", "short text", "Ghost"),
        ],
        "id string, source_text string, name string",
    )
    rows = {
        r["id"]: r["ctx"]
        for r in df.select(
            "id", compress_context("source_text", "name").alias("ctx")
        ).collect()
    }
    assert rows["m1"] is not None and "Brahms" in rows["m1"]
    assert rows["m2"] is None
    assert rows["m3"] == "short text"  # adaptive identity under 500 chars
    with pytest.raises(ValueError, match="strategy"):
        compress_context("source_text", "name", strategy="bogus")


def test_bakeoff_receives_compressed_context(spark):
    """resolve_against_entities threads compressed source context into the
    bakeoff seam when mentions carry a source_text column
    (EscalatingEntityResolver.kt:183)."""
    from dice_spark.operators.linking import resolve_against_entities

    filler = "Unrelated chatter about many topics. " * 20
    mentions = spark.createDataFrame(
        [("Nguyen Alice", "Person", filler + "Nguyen Alice joined the team recently.")],
        "span string, entity_type string, source_text string",
    )
    # Both normalize to the key "alice nguyen" (suffix stripped): two
    # candidates at cosine 1.0, so the exactly-one auto tier declines and
    # both pairs reach the bakeoff seam.
    entities = spark.createDataFrame(
        [
            ("e1", "Alice Nguyen", "Person"),
            ("e2", "Alice Nguyen Jr", "Person"),
        ],
        "entity_id string, canonical_name string, entity_type string",
    )
    seen = {}

    def probing_scorer(pairs):
        seen["cols"] = pairs.columns
        seen["ctx"] = [r["context"] for r in pairs.select("context").collect()]
        from dice_spark.operators.linking import default_bakeoff_scorer

        return default_bakeoff_scorer(pairs.drop("context"))

    out = resolve_against_entities(
        mentions, entities, vector_tier=True, bakeoff_scorer=probing_scorer
    )
    res = out.collect()
    assert "context" in seen["cols"]
    assert seen["ctx"] and all(c is not None and "Nguyen" in c for c in seen["ctx"])
    assert all(len(c) < len(filler) + 50 for c in seen["ctx"])  # actually compressed
    assert {r["resolution_level"] for r in res} <= {"VECTOR", "BAKEOFF"}
