"""Decay sweep / status transitions / report aggregates (maintenance jobs).

Ports: DecayCollectorStrategy (projection/memory/DecayCollectorStrategy.kt:39-62 —
mark unpinned ACTIVE with effective confidence < retire_below as STALE),
StatusTransitionSweepPolicy (spi/SweepPolicy.kt:56-74 — pinned are skipped,
nothing is ever hard-deleted), DecayStatusPolicy hysteresis
(spi/StatusTransitionPolicy.kt:91-112 — ACTIVE->STALE below 0.1,
STALE->ACTIVE above 0.2), and StructuredReportProjector
(dice-report/.../StructuredReportProjector.kt:31-79 — groupBy status/level and
top-N by effective confidence desc, id asc; the golden test pins exact order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dice_spark.functions.decay import effective_confidence

RETIRE_BELOW_DEFAULT = 0.5
HYSTERESIS_STALE_BELOW = 0.1
HYSTERESIS_ACTIVE_ABOVE = 0.2


def with_effective_confidence(props: DataFrame, as_of: Column, **kw) -> DataFrame:
    return props.withColumn(
        "eff_conf", F.round(effective_confidence(as_of=as_of, **kw), 6)
    )


def decay_sweep(props: DataFrame, as_of: Column, retire_below: float = RETIRE_BELOW_DEFAULT, dry_run: bool = False, run_id: str = "sweep-0") -> tuple[DataFrame, DataFrame]:
    """Mark unpinned ACTIVE props with eff_conf < retire_below -> STALE.

    Returns (updated_props, collector_records). dry_run records MARKED without
    mutating (DefaultCollectorRunner.kt:239-259).
    """
    p = with_effective_confidence(props, as_of)
    mark = (~F.col("pinned")) & (F.col("status") == "ACTIVE") & (F.col("eff_conf") < retire_below)
    records = p.filter(mark).select(
        F.lit(run_id).alias("run_id"),
        "prop_id",
        F.lit("MARKED" if dry_run else "SWEPT").alias("lifecycle"),
        F.lit(None).cast("string").alias("target_ref"),
        F.concat(F.lit("eff_conf<"), F.lit(str(retire_below))).alias("reason"),
    )
    if dry_run:
        return props, records
    updated = p.withColumn(
        "status", F.when(mark, "STALE").otherwise(F.col("status"))
    ).drop("eff_conf")
    return updated, records


def collector_run_header(records: DataFrame, run_id: str, dry_run: bool, as_of: Column) -> DataFrame:
    """The CollectorRun header row the reference persists alongside the
    per-proposition records (DefaultCollectorRunner: one run summary with the
    run id, mode, and counts). One aggregate over the records relation."""
    return records.agg(
        F.lit(run_id).alias("run_id"),
        F.lit(bool(dry_run)).alias("dry_run"),
        as_of.alias("as_of"),
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.when(F.col("lifecycle") == "MARKED", 1).otherwise(0)).alias("n_marked"),
        F.sum(F.when(F.col("lifecycle") == "SWEPT", 1).otherwise(0)).alias("n_swept"),
    )


def utility_composite(
    props: DataFrame,
    as_of: Column,
    k_multiplier: float = 2.0,
    importance_weight: float = 0.0,
    reinforce_weight: float = 0.0,
) -> Column:
    """DecayStatusPolicy utility (spi/StatusTransitionPolicy.kt:120-140):

        utility = effectiveConfidence(kMultiplier)
                * (1 + importanceWeight * importance)
                * (1 + reinforceWeight  * ln1p(reinforceCount))

    With the default weights of 0.0 this reduces to plain decayed effective
    confidence, exactly as the reference documents. Missing importance /
    reinforce_count columns contribute 0 (the reference's unset defaults)."""
    imp = (
        F.coalesce(F.col("importance"), F.lit(0.0))
        if "importance" in props.columns
        else F.lit(0.0)
    )
    rc = (
        F.coalesce(F.col("reinforce_count").cast("double"), F.lit(0.0))
        if "reinforce_count" in props.columns
        else F.lit(0.0)
    )
    eff = F.round(effective_confidence(as_of=as_of, k=k_multiplier), 6)
    return F.round(
        eff
        * (F.lit(1.0) + F.lit(importance_weight) * imp)
        * (F.lit(1.0) + F.lit(reinforce_weight) * F.log1p(rc)),
        6,
    )


def hysteresis_transition(
    props: DataFrame,
    as_of: Column,
    staleness_threshold: float = HYSTERESIS_STALE_BELOW,
    recovery_threshold: float = HYSTERESIS_ACTIVE_ABOVE,
    k_multiplier: float = 2.0,
    importance_weight: float = 0.0,
    reinforce_weight: float = 0.0,
) -> DataFrame:
    """DecayStatusPolicy (spi/StatusTransitionPolicy.kt:91-148): pinned
    propositions are sweep-exempt (evaluate returns null -> status held);
    otherwise ACTIVE -> STALE when utility falls strictly below
    ``staleness_threshold``, STALE -> ACTIVE when it rises strictly above
    ``recovery_threshold``; the band between the two holds the prior status
    (no oscillation around a single cut-off)."""
    utility = utility_composite(
        props, as_of, k_multiplier, importance_weight, reinforce_weight
    )
    pinned = F.col("pinned") if "pinned" in props.columns else F.lit(False)
    return props.withColumn(
        "status",
        F.when(pinned, F.col("status"))
        .when(
            (F.col("status") == "ACTIVE") & (utility < F.lit(staleness_threshold)),
            "STALE",
        )
        .when(
            (F.col("status") == "STALE") & (utility > F.lit(recovery_threshold)),
            "ACTIVE",
        )
        .otherwise(F.col("status")),
    )


def report_by_status(props: DataFrame) -> DataFrame:
    return props.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")


def report_by_level(props: DataFrame) -> DataFrame:
    return props.groupBy("level").agg(F.count(F.lit(1)).alias("n")).orderBy("level")


def report_top_n(props: DataFrame, as_of: Column, n: int = 10) -> DataFrame:
    """Top-N by (effective confidence desc, prop_id asc) — pinned ordering
    (StructuredReportProjector.kt:62-66)."""
    return (
        with_effective_confidence(props, as_of)
        .orderBy(F.desc("eff_conf"), F.asc("prop_id"))
        .select("prop_id", "text", "eff_conf")
        .limit(n)
    )
