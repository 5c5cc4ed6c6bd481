"""Batch ingestion with ledger dedup-claim and a quarantine sink.

Ports TextIngestionHandler (/root/reference/dice-ingestion/src/main/kotlin/com/
embabel/dice/ingestion/support/TextIngestionHandler.kt): each artifact hashes
(explicit content_hash wins, else sha256 of text), claims its hash against the
ingestion ledger — already-claimed content is DEDUPLICATED, not re-processed —
and invalid artifacts land in the FAILED quarantine with a reason instead of
poisoning the run. The reference releases a failed artifact's claim so a retry
is not wrongly deduplicated; set-oriented equivalent: failed rows are never
written to the ledger in the first place (validation precedes the claim).

Set-oriented shapes: hash = one projection; the ledger claim is an anti-join
against the ledger table; outcomes are one unioned relation. At 10^12 turns
the ledger join keys on content hash (uniform), no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dice_spark.storage import Warehouse

LEDGER_TABLE = "ingestion_ledger"
QUARANTINE_TABLE = "ingestion_quarantine"


def _validated(artifacts: DataFrame, text_col: str, id_col: str) -> DataFrame:
    reason = (
        F.when(F.col(id_col).isNull(), "missing_source_id")
        .when(F.col(text_col).isNull() | (F.length(F.trim(text_col)) == 0), "blank_text")
    )
    return artifacts.withColumn("fail_reason", reason)


def ingest_batch(
    artifacts: DataFrame,
    warehouse: Warehouse | None = None,
    text_col: str = "text",
    id_col: str = "source_id",
    hash_col: str = "content_hash",
) -> dict[str, DataFrame]:
    """Ingest a batch of artifacts. Returns dict with:

    * ``ingested`` — rows whose hash claim succeeded (feed the pipeline);
    * ``deduplicated`` — rows whose content hash was already in the ledger;
    * ``quarantined`` — invalid rows with ``fail_reason`` (the quarantine sink);
    * ``outcomes`` — (source_id, content_hash, outcome, fail_reason) summary,
      outcome in INGESTED | DEDUPLICATED | FAILED (ArtifactOutcome).

    With a ``warehouse``, claims MERGE into the ledger table and quarantined
    rows append to the quarantine table, so a rerun of the same batch
    deduplicates and a fixed artifact can retry (its failed hash was never
    claimed).
    """
    hashed = artifacts.withColumn(
        hash_col,
        F.coalesce(
            F.col(hash_col) if hash_col in artifacts.columns else F.lit(None).cast("string"),
            F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256),
        ),
    )
    tagged = _validated(hashed, text_col, id_col)
    quarantined = tagged.filter(F.col("fail_reason").isNotNull())
    valid = tagged.filter(F.col("fail_reason").isNull()).drop("fail_reason")

    if warehouse is not None and warehouse.exists(LEDGER_TABLE):
        ledger = warehouse.read(LEDGER_TABLE).select(hash_col)
        deduplicated = valid.join(ledger, hash_col, "left_semi")
        ingested = valid.join(ledger, hash_col, "left_anti")
    else:
        deduplicated = valid.limit(0)
        ingested = valid
    # In-batch duplicate content also claims once: min source_id wins the
    # claim, later artifacts with the same hash are DEDUPLICATED.
    from pyspark.sql.window import Window

    rn = F.row_number().over(Window.partitionBy(hash_col).orderBy(id_col))
    ranked = ingested.withColumn("_rn", rn)
    dup_in_batch = ranked.filter(F.col("_rn") > 1).drop("_rn")
    ingested = ranked.filter(F.col("_rn") == 1).drop("_rn")
    deduplicated = deduplicated.unionByName(dup_in_batch)

    if warehouse is not None:
        warehouse.merge(
            LEDGER_TABLE, ingested.select(hash_col, id_col).distinct(), [hash_col]
        )
        if quarantined.limit(1).count() > 0:
            warehouse.append(QUARANTINE_TABLE, quarantined)

    outcomes = (
        ingested.select(id_col, hash_col, F.lit("INGESTED").alias("outcome"), F.lit(None).cast("string").alias("fail_reason"))
        .unionByName(
            deduplicated.select(id_col, hash_col, F.lit("DEDUPLICATED").alias("outcome"), F.lit(None).cast("string").alias("fail_reason"))
        )
        .unionByName(quarantined.select(id_col, hash_col, F.lit("FAILED").alias("outcome"), "fail_reason"))
    )
    return {
        "ingested": ingested,
        "deduplicated": deduplicated,
        "quarantined": quarantined,
        "outcomes": outcomes,
    }
