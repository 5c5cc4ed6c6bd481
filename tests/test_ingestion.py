"""Ingestion handler: ledger dedup-claim, quarantine sink, retry-after-fail
(TextIngestionHandler.kt: Ingested / Deduplicated / Failed outcomes)."""

from __future__ import annotations

from dice_spark.ingestion import LEDGER_TABLE, QUARANTINE_TABLE, ingest_batch
from dice_spark.storage import Warehouse


def _arts(spark, rows):
    return spark.createDataFrame(rows, "source_id string, text string")


def test_outcomes_and_quarantine(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    batch = _arts(
        spark,
        [
            ("a1", "Alice works with Bob."),
            ("a2", "Alice works with Bob."),  # same content -> in-batch dedup
            ("a3", "   "),                    # blank -> quarantine
            (None, "orphan text"),            # no source id -> quarantine
            ("a4", "Carol mentors Dana."),
        ],
    )
    out = ingest_batch(batch, wh)
    got = {r["source_id"]: (r["outcome"], r["fail_reason"]) for r in out["outcomes"].collect()}
    assert got["a1"] == ("INGESTED", None)
    assert got["a2"] == ("DEDUPLICATED", None)
    assert got["a3"] == ("FAILED", "blank_text")
    assert got[None] == ("FAILED", "missing_source_id")
    assert got["a4"] == ("INGESTED", None)
    assert wh.exists(LEDGER_TABLE) and wh.exists(QUARANTINE_TABLE)
    assert wh.read(QUARANTINE_TABLE).count() == 2


def test_rerun_deduplicates_and_failed_can_retry(spark, tmp_path):
    wh = Warehouse(str(tmp_path), spark)
    ingest_batch(_arts(spark, [("a1", "Alice works with Bob."), ("bad", " ")]), wh)
    # Rerun: same content deduplicates; the failed artifact, now fixed, was
    # never claimed so it ingests (the reference releases the claim on failure).
    out = ingest_batch(
        _arts(spark, [("a1", "Alice works with Bob."), ("bad", "Fixed text now.")]), wh
    )
    got = {r["source_id"]: r["outcome"] for r in out["outcomes"].collect()}
    assert got == {"a1": "DEDUPLICATED", "bad": "INGESTED"}


def test_explicit_hash_wins(spark):
    batch = spark.createDataFrame(
        [("a1", "text body", "pinnedhash")],
        "source_id string, text string, content_hash string",
    )
    out = ingest_batch(batch, None)
    assert out["ingested"].collect()[0]["content_hash"] == "pinnedhash"


def test_make_warehouse_backend_selection(spark, tmp_path):
    """No Iceberg runtime in this sandbox: auto falls back to the parquet
    snapshot warehouse; asking for iceberg explicitly is honest about the
    missing jar (fails on catalog setup), unknown backends are rejected."""
    import pytest as _pytest

    from dice_spark.storage import Warehouse, iceberg_available, make_warehouse

    assert iceberg_available(spark) is False
    wh = make_warehouse(spark, str(tmp_path / "wh"))
    assert isinstance(wh, Warehouse)
    with _pytest.raises(ValueError):
        make_warehouse(spark, str(tmp_path / "wh2"), backend="bogus")
