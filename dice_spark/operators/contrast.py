"""Contrast pass — articulate differences between two labeled proposition groups.

Ports PropositionContraster (reference:
dice/src/main/kotlin/com/embabel/dice/operations/contrast/PropositionContraster.kt:56-75
— compare two ``PropositionGroup``s and emit propositions describing their
differences) with the derived-value arithmetic of LlmPropositionContraster
(operations/contrast/LlmPropositionContraster.kt:100-230):

- either group empty -> no contrasts;
- ``level``      = max(level over A ∪ B) + 1;
- ``context_id`` = the most common contextId across A ∪ B (deterministic
  tie-break: smaller context_id — the reference's ``maxByOrNull`` keeps the
  first-encountered max, which is iteration-order dependent in Kotlin; we pin
  the tie);
- per contrast: ``source_ids`` = the supporting ids from both groups (A's
  then B's); contrasts with no valid sources are dropped
  (LlmPropositionContraster.kt:171-175);
- ``decay``      = average decay of the used sources, clamped to [0, 1];
- ``confidence`` = seam-assessed, clamped to [0, 1];
- ``status`` ACTIVE, no mentions/grounding.

The contrast *generator* is an LLM seam in the reference (ContrastResponse /
ContrastItem, LlmPropositionContraster.kt:235-258). ``default_contraster`` is
the deterministic stand-in: propositions from the two groups that share a
predicate but disagree on the object are difference pairs ("Alice prefers
morning meetings" vs "Bob prefers afternoon meetings" — the interface's own
example), rendered as one contrast sentence per pair.

Scale shape: groups are label-scoped (props about one entity / one quarter),
so both sides are small relations; the pair generator still bounds itself —
each side is ranked to the top PAIR_CAP rows per predicate before the
predicate equi-join, so a head predicate inside a large group can produce at
most PAIR_CAP² pairs, never |A|×|B|. The derived scalars (max level, modal
context) are 1-row aggregates crossJoined back (same bounded pattern as the
grounding report); no per-group arrays grow with corpus size.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Each group side keeps its top-PAIR_CAP props per predicate (confidence
# desc, prop_id asc) before pairing: the candidate join is then bounded by
# PAIR_CAP^2 per shared predicate regardless of group size.
PAIR_CAP = 8

ContrasterFn = Callable[[DataFrame, DataFrame, str, str, int], DataFrame]


def default_contraster(
    group_a: DataFrame,
    group_b: DataFrame,
    label_a: str,
    label_b: str,
    target_count: int,
) -> DataFrame:
    """Deterministic contrast generator (the LLM seam's stand-in).

    Pairs propositions across the groups on a shared ``predicate`` with
    differing ``obj_span`` (same difference the reference's example contrasts
    articulate), scores each pair min(conf_a, conf_b), and keeps the
    ``target_count`` best (confidence desc, a_id asc, b_id asc — pinned
    order). Returns (text, confidence, reasoning, source_ids).
    """

    def side(df: DataFrame, tag: str) -> DataFrame:
        rn = F.row_number().over(
            Window.partitionBy("predicate").orderBy(
                F.desc("confidence"), F.asc("prop_id")
            )
        )
        return (
            df.select("prop_id", "predicate", "subj_span", "obj_span", "confidence")
            .withColumn("_rn", rn)
            .filter(F.col("_rn") <= PAIR_CAP)
            .drop("_rn")
            .select(
                F.col("prop_id").alias(f"{tag}_id"),
                "predicate",
                F.col("subj_span").alias(f"{tag}_subj"),
                F.col("obj_span").alias(f"{tag}_obj"),
                F.col("confidence").alias(f"{tag}_conf"),
            )
        )

    pairs = (
        side(group_a, "a")
        .join(side(group_b, "b"), "predicate")
        .filter(F.col("a_obj") != F.col("b_obj"))
    )
    best = F.row_number().over(
        Window.orderBy(
            F.desc(F.least("a_conf", "b_conf")), F.asc("a_id"), F.asc("b_id")
        )
    )
    text = F.concat(
        F.col("a_subj"), F.lit(" "), F.col("predicate"), F.lit(" "),
        F.col("a_obj"), F.lit(" whereas "), F.col("b_subj"), F.lit(" "),
        F.col("predicate"), F.lit(" "), F.col("b_obj"), F.lit("."),
    )
    return (
        pairs.withColumn("_rank", best)
        .filter(F.col("_rank") <= target_count)
        .select(
            text.alias("text"),
            F.least("a_conf", "b_conf").alias("confidence"),
            F.concat(
                F.lit(f"'{label_a}' and '{label_b}' share predicate '"),
                F.col("predicate"),
                F.lit("' with divergent objects"),
            ).alias("reasoning"),
            F.array(F.col("a_id"), F.col("b_id")).alias("source_ids"),
        )
    )


def contrast_groups(
    group_a: DataFrame,
    group_b: DataFrame,
    label_a: str,
    label_b: str,
    target_count: int = 3,
    contraster: ContrasterFn | None = None,
) -> DataFrame:
    """Contrast two labeled proposition groups into new derived propositions.

    Groups are proposition relations carrying at least (prop_id, context_id,
    text, predicate, obj_span, confidence, decay, level). Output columns:
    prop_id, context_id, text, confidence, decay, reasoning, status, level,
    source_ids, n_sources.
    """
    contrasts = (contraster or default_contraster)(
        group_a, group_b, label_a, label_b, target_count
    )
    # The store's (contextId, text) uniqueness holds for derived props too:
    # if a contraster renders the same sentence from two different pairs,
    # keep one deterministic winner (smallest source_ids).
    contrasts = (
        contrasts.withColumn(
            "_tr",
            F.row_number().over(Window.partitionBy("text").orderBy(F.asc("source_ids"))),
        )
        .filter(F.col("_tr") == 1)
        .drop("_tr")
    )

    cols = ["prop_id", "context_id", "decay", "level"]
    # Groups are arbitrary caller filters and may overlap; a proposition in
    # both would match the exploded source_ids join twice (doubling
    # n_sources, biasing avg_decay and the modal context), so the union is
    # distinct by prop_id.
    allp = (
        group_a.select(*cols)
        .unionByName(group_b.select(*cols))
        .dropDuplicates(["prop_id"])
    )

    # level' = max(level)+1 over A ∪ B (LlmPropositionContraster.kt:146-148)
    lvl = allp.agg((F.coalesce(F.max("level"), F.lit(0)) + 1).alias("new_level"))
    # modal contextId over A ∪ B (:151-156), tie -> min context_id
    ctx = (
        allp.groupBy("context_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), F.asc("context_id"))
        .limit(1)
        .select("context_id")
    )
    scalars = F.broadcast(lvl.crossJoin(ctx))  # 1 x 1 row

    # decay = average decay of the used sources (:203-215); resolved by
    # exploding the (target_count-bounded) source_ids and joining the group
    # union — both sides tiny, the join broadcasts.
    src = (
        contrasts.select("text", F.explode("source_ids").alias("prop_id"))
        .join(allp.select("prop_id", "decay"), "prop_id")
        .groupBy("text")
        .agg(F.avg("decay").alias("avg_decay"), F.count(F.lit(1)).alias("n_sources"))
    )

    clamp = lambda c: F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))  # noqa: E731
    return (
        contrasts.join(src, "text")  # drops contrasts with no valid sources
        .filter(F.col("n_sources") > 0)
        .crossJoin(scalars)
        .select(
            F.md5(F.concat_ws("|", F.col("context_id"), F.col("text"))).alias(
                "prop_id"
            ),
            "context_id",
            "text",
            F.round(clamp(F.col("confidence")), 6).alias("confidence"),
            F.round(clamp(F.col("avg_decay")), 6).alias("decay"),
            "reasoning",
            F.lit("ACTIVE").alias("status"),
            F.col("new_level").alias("level"),
            "source_ids",
            F.col("n_sources").cast("int").alias("n_sources"),
        )
    )
