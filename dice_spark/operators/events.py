"""Domain event emission — the observability surface consumers subscribe to.

The reference emits typed DiceEvents inline as propositions move through the
engine (common/DiceEvent.kt: PropositionDiscovered / Merged / Reinforced /
Contradicted / RoutedToReview / StatusChanged / ExtractionBatchCompleted;
proposition/EventEmittingPropositionRepository.kt wraps every save;
projection/memory/DefaultCollectorRunner.kt:190-218 emits exactly one
PropositionStatusChanged per applied sweep transition, with the marking
strategies' distinct reason keys sorted and comma-joined so the event is
order-independent).

The Spark-native consumption of that contract is an append-only ``events``
relation produced as a BY-PRODUCT of the batch operators — pure projections
and one co-partitioned equi-join, never a new shuffle over the store. A
downstream consumer tails the events table (or its stream) instead of
registering an inline listener.

Uniform schema: (event_type, run_id, prop_id, previous_status, new_status,
reason, payload). prop_id is NULL for batch-level events; payload carries the
batch tallies as a deterministic sorted k=v string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_COLUMNS = [
    "event_type", "run_id", "prop_id", "previous_status", "new_status",
    "reason", "payload",
]


def _shape(df: DataFrame) -> DataFrame:
    out = df
    defaults = {
        "run_id": F.lit(None).cast("string"),
        "prop_id": F.lit(None).cast("string"),
        "previous_status": F.lit(None).cast("string"),
        "new_status": F.lit(None).cast("string"),
        "reason": F.lit(None).cast("string"),
        "payload": F.lit(None).cast("string"),
    }
    for name, default in defaults.items():
        if name not in out.columns:
            out = out.withColumn(name, default)
    return out.select(*EVENT_COLUMNS)


def status_change_events(
    before: DataFrame,
    after: DataFrame,
    run_id: str,
    reason: str | None = None,
) -> DataFrame:
    """PropositionStatusChanged rows for every proposition whose status
    differs between two store snapshots (the generic delta form — one
    equi-join on prop_id, co-partitioned with the store's own key)."""
    b = before.select(F.col("prop_id"), F.col("status").alias("previous_status"))
    a = after.select(F.col("prop_id"), F.col("status").alias("new_status"))
    return _shape(
        b.join(a, "prop_id")
        .filter(F.col("previous_status") != F.col("new_status"))
        .select(
            F.lit("PropositionStatusChanged").alias("event_type"),
            F.lit(run_id).alias("run_id"),
            "prop_id",
            "previous_status",
            "new_status",
            F.lit(reason).cast("string").alias("reason"),
        )
    )


def sweep_status_events(
    records: DataFrame,
    previous_status: str = "ACTIVE",
    new_status: str = "STALE",
) -> DataFrame:
    """One PropositionStatusChanged per APPLIED sweep transition
    (DefaultCollectorRunner.kt:190-218): MARKED (dry-run) records emit
    nothing; several strategies marking the same proposition combine into ONE
    event whose reason is their distinct keys, sorted and comma-joined."""
    applied = records.filter(F.col("lifecycle") == "SWEPT")
    return _shape(
        applied.groupBy("run_id", "prop_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("reason")), ",").alias("reason")
        )
        .select(
            F.lit("PropositionStatusChanged").alias("event_type"),
            "run_id",
            "prop_id",
            F.lit(previous_status).alias("previous_status"),
            F.lit(new_status).alias("new_status"),
            "reason",
        )
    )


# revision_outcome -> (event_type, new_status for status-bearing events)
_REVISION_EVENTS = {
    "NEW": ("PropositionDiscovered", None),
    "MERGED": ("PropositionMerged", None),
    "REINFORCED": ("PropositionReinforced", None),
    "CONTRADICTED": ("PropositionContradicted", "CONTRADICTED"),
    "WORLD_PROGRESSION": ("PropositionStatusChanged", "SUPERSEDED"),
    "REVIEW": ("PropositionRoutedToReview", None),
}


def revision_events(revised: DataFrame, run_id: str) -> DataFrame:
    """Typed events from a revise() output — the EventEmittingPropositionRepository
    surface (save -> Discovered/Merged/Reinforced/Contradicted/RoutedToReview,
    EventEmittingPropositionRepository.kt:81-126) as a pure projection of the
    revision_outcome column. Status-bearing outcomes also carry the
    previous/new status pair; UNCHANGED rows emit nothing."""
    mapping = F.create_map(
        *[x for k, (t, _) in _REVISION_EVENTS.items() for x in (F.lit(k), F.lit(t))]
    )
    status_map = F.create_map(
        *[
            x
            for k, (_, s) in _REVISION_EVENTS.items()
            if s is not None
            for x in (F.lit(k), F.lit(s))
        ]
    )
    return _shape(
        revised.filter(F.col("revision_outcome") != "UNCHANGED")
        .select(
            mapping[F.col("revision_outcome")].alias("event_type"),
            F.lit(run_id).alias("run_id"),
            "prop_id",
            F.when(
                status_map[F.col("revision_outcome")].isNotNull(), "ACTIVE"
            ).alias("previous_status"),
            status_map[F.col("revision_outcome")].alias("new_status"),
            F.lower("revision_outcome").alias("reason"),
        )
    )


def extraction_batch_event(stats: DataFrame, run_id: str) -> DataFrame:
    """One ExtractionBatchCompleted row per batch (DiceEvent.kt
    ExtractionBatchCompleted / PropositionExtractionStats): the tally columns
    of a 1-row stats relation serialize into a deterministic sorted k=v
    payload string."""
    cols = sorted(stats.columns)
    payload = F.concat_ws(
        ",", *[F.concat(F.lit(f"{c}="), F.col(c).cast("string")) for c in cols]
    )
    return _shape(
        stats.select(
            F.lit("ExtractionBatchCompleted").alias("event_type"),
            F.lit(run_id).alias("run_id"),
            payload.alias("payload"),
        )
    )
