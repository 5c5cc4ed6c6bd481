"""LLM-variant projector seams: relationship classification and edge-description
synthesis as pluggable Arrow-batched stages.

Reference: projection/graph/LlmGraphProjector.kt:141-240 (policy check ->
allowed-relationship filter -> LLM classification -> span-authoritative
mention resolution with role fallback -> type validation -> projected edge)
and projection/graph/LlmRelationshipDescriptionSynthesizer.kt:59-113
(propositions mentioning both entities -> structured {description, confidence,
sourceIndices} -> ids filtered to valid indices; empty input returns the
existing description with confidence 0).

Spark shape: everything the reference does around the LLM call stays JVM-side
column logic (policy, allowed-type join, direction resolution, validation).
Only the model call itself crosses into Python, through ``mapInPandas`` on a
bounded request row — the same seam pattern as extraction.classify_batch. The
default functions are deterministic stand-ins so the whole path is testable
and oracle-mirrorable; a real deployment passes its own ``classify_fn`` /
``synthesize_fn`` with the identical batch signature.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dice_spark.functions.textfns import upper_snake
from dice_spark.operators.projection import DEFAULT_MIN_CONFIDENCE

TOP_K_SUPPORT = 5  # supporting propositions per edge fed to the synthesizer

_CLASSIFY_SCHEMA = (
    "prop_id string, has_relationship boolean, relationship_type string, "
    "from_span string, to_span string, reasoning string"
)

_SYNTH_SCHEMA = (
    "edge_ref string, description string, confidence double, "
    "source_prop_ids array<string>"
)


def default_classify(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic classifier: the matched relation predicate IS the
    relationship (RelationBasedGraphProjector semantics), subject->object
    direction. A row with no matched predicate has no relationship."""
    has_rel = pdf["predicate"].notna()
    out = pd.DataFrame(
        {
            "prop_id": pdf["prop_id"],
            "has_relationship": has_rel,
            "relationship_type": pdf["predicate"],
            "from_span": pdf["subj_span"].where(has_rel),
            "to_span": pdf["obj_span"].where(has_rel),
            "reasoning": has_rel.map(
                lambda h: "predicate match" if h else "No relationship implied"
            ),
        }
    )
    return out


def llm_classify_projection(
    props: DataFrame,
    relations: DataFrame,
    classify_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    min_confidence: float = DEFAULT_MIN_CONFIDENCE,
) -> DataFrame:
    """LlmGraphProjector.project (LlmGraphProjector.kt:141-240) over a batch.

    Expects resolved proposition rows (subj_id/obj_id attached). Returns one
    row per proposition with ``result`` SUCCESS | SKIPPED | FAILED, ``reason``,
    and on success the projected-edge columns (source_id, target_id,
    relationship_type, confidence, description).

    Stage order mirrors the reference exactly:
    1. policy check (confidence floor) -> SKIPPED, never classified;
    2. allowed-relationship filter: relations whose declared subject/object
       type constraints match the proposition's mention types; none -> FAILED
       before any classification;
    3. the classification seam (Arrow batch in, structured verdict out);
    4. hasRelationship=false -> FAILED with the classifier's reasoning;
    5. span-authoritative direction: the classifier's span wins when it
       matches a mention (case-insensitive), else fall back to the
       SUBJECT/OBJECT role mention (the span-first-then-role rule);
    6. unresolved from/to id -> FAILED;
    7. normalized type must be in the allowed set -> else FAILED.
    """
    fn = classify_fn or default_classify

    rels = F.broadcast(
        relations.select(
            "predicate",
            upper_snake("predicate").alias("_rel_type"),
            "subject_type",
            "object_type",
        )
    )
    # Mention-type match per LlmGraphProjector.kt:157-162: a null constraint
    # matches anything; a declared constraint must equal one of the
    # proposition's mention types (either side — the reference matches
    # against the unordered mention-type set).
    mention_match = (
        (
            F.col("r.subject_type").isNull()
            | (F.lower("r.subject_type") == F.lower("p.subj_type"))
            | (F.lower("r.subject_type") == F.lower("p.obj_type"))
        )
        & (
            F.col("r.object_type").isNull()
            | (F.lower("r.object_type") == F.lower("p.subj_type"))
            | (F.lower("r.object_type") == F.lower("p.obj_type"))
        )
    )
    allowed = (
        props.alias("p")
        .join(rels.alias("r"), mention_match, "left")
        .groupBy("p.prop_id")
        .agg(F.array_sort(F.collect_set("r._rel_type")).alias("allowed_types"))
    )
    p = props.join(allowed, "prop_id", "left").withColumn(
        "allowed_types", F.coalesce("allowed_types", F.array().cast("array<string>"))
    )

    policy_ok = F.col("confidence") >= min_confidence
    has_allowed = F.size("allowed_types") > 0
    to_classify = p.filter(policy_ok & has_allowed)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    verdicts = to_classify.select(
        "prop_id", "text", "predicate", "subj_span", "obj_span",
        "subj_type", "obj_type", "confidence",
    ).mapInPandas(run, _CLASSIFY_SCHEMA)

    v = p.join(verdicts, "prop_id", "left")

    # Span-authoritative direction with role fallback (LlmGraphProjector.kt:
    # 186-196): try the classifier's span against both mentions first; only
    # when no span matches does the SUBJECT/OBJECT role mention win.
    def pick(span_col: str, fallback_id: str, fallback_name: str):
        s = F.lower(F.col(span_col))
        matched_id = (
            F.when(s == F.lower("subj_span"), F.col("subj_id"))
            .when(s == F.lower("obj_span"), F.col("obj_id"))
            .otherwise(F.col(fallback_id))
        )
        matched_name = (
            F.when(s == F.lower("subj_span"), F.col("subj_span"))
            .when(s == F.lower("obj_span"), F.col("obj_span"))
            .otherwise(F.col(fallback_name))
        )
        return matched_id, matched_name

    from_id, from_name = pick("from_span", "subj_id", "subj_span")
    to_id, to_name = pick("to_span", "obj_id", "obj_span")
    norm_type = upper_snake("relationship_type")

    result = (
        F.when(~policy_ok, F.lit("SKIPPED"))
        .when(~has_allowed, F.lit("FAILED"))
        .when(~F.col("has_relationship"), F.lit("FAILED"))
        .when(from_id.isNull() | to_id.isNull(), F.lit("FAILED"))
        .when(
            F.col("relationship_type").isNotNull()
            & ~F.array_contains(F.col("allowed_types"), norm_type),
            F.lit("FAILED"),
        )
        .otherwise(F.lit("SUCCESS"))
    )
    reason = (
        F.when(~policy_ok, F.lit("PolicyRejected"))
        .when(~has_allowed, F.concat(F.lit("No allowed relationships between entity types: "), F.lower("subj_type"), F.lit(","), F.lower("obj_type")))
        .when(~F.col("has_relationship"), F.coalesce("reasoning", F.lit("No relationship implied")))
        .when(from_id.isNull() | to_id.isNull(), F.lit("Could not resolve entity IDs"))
        .when(
            F.col("relationship_type").isNotNull()
            & ~F.array_contains(F.col("allowed_types"), norm_type),
            F.concat(F.lit("Relationship type '"), F.col("relationship_type"), F.lit("' not in schema or relations")),
        )
    )
    return v.select(
        "prop_id",
        "text",
        "confidence",
        result.alias("result"),
        reason.alias("reason"),
        F.when(result == "SUCCESS", from_id).alias("source_id"),
        F.when(result == "SUCCESS", to_id).alias("target_id"),
        F.when(result == "SUCCESS", from_name).alias("source_span"),
        F.when(result == "SUCCESS", to_name).alias("target_span"),
        F.when(result == "SUCCESS", F.coalesce(norm_type, F.lit("RELATED_TO"))).alias(
            "edge_type"
        ),
    )


def synthesis_requests(
    edges: DataFrame,
    props: DataFrame,
    entities: DataFrame | None = None,
    k: int = TOP_K_SUPPORT,
) -> DataFrame:
    """One request row per edge: its top-k supporting propositions
    (rank-before-collect — bounded arrays even on a Zipf-head entity pair),
    plus display names when an entities table is supplied.

    Support = resolved propositions asserting exactly this edge
    (source, target, type), ranked confidence desc then prop_id — the
    deterministic stand-in for "propositions that mention both entities".
    """
    support = props.select(
        F.col("subj_id").alias("source_id"),
        F.col("obj_id").alias("target_id"),
        upper_snake("predicate").alias("edge_type"),
        "prop_id",
        "text",
        "confidence",
    ).filter(F.col("source_id").isNotNull() & F.col("target_id").isNotNull())
    w = Window.partitionBy("source_id", "target_id", "edge_type").orderBy(
        F.desc("confidence"), F.asc("prop_id")
    )
    topk = (
        support.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("source_id", "target_id", "edge_type")
        .agg(
            F.collect_list(F.struct("_rn", "prop_id", "text", "confidence")).alias("_s")
        )
        .withColumn("_s", F.array_sort("_s"))
        .select(
            "source_id",
            "target_id",
            "edge_type",
            F.col("_s.prop_id").alias("support_ids"),
            F.col("_s.text").alias("support_texts"),
            F.col("_s.confidence").alias("support_confidences"),
        )
    )
    req = edges.select(
        "edge_ref", "source_id", "target_id", "edge_type",
        F.col("description").alias("existing_description"),
    ).join(topk, ["source_id", "target_id", "edge_type"], "left")
    if entities is not None:
        src_names = entities.select(
            F.col("entity_id").alias("source_id"),
            F.col("canonical_name").alias("source_name"),
        )
        dst_names = entities.select(
            F.col("entity_id").alias("target_id"),
            F.col("canonical_name").alias("target_name"),
        )
        req = req.join(src_names, "source_id", "left").join(
            dst_names, "target_id", "left"
        )
    else:
        req = req.withColumn("source_name", F.col("source_id")).withColumn(
            "target_name", F.col("target_id")
        )
    return req.select(
        "edge_ref",
        F.coalesce("source_name", "source_id").alias("source_name"),
        F.coalesce("target_name", "target_id").alias("target_name"),
        "edge_type",
        "existing_description",
        F.coalesce("support_ids", F.array().cast("array<string>")).alias("support_ids"),
        F.coalesce("support_texts", F.array().cast("array<string>")).alias("support_texts"),
        F.coalesce("support_confidences", F.array().cast("array<double>")).alias(
            "support_confidences"
        ),
    )


def default_synthesize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic synthesizer mirroring the reference's output contract:
    empty support -> (existing description or '', confidence 0, no sources);
    else a templated description from the top-ranked supporting text,
    confidence = mean of the supporting confidences rounded to 6, sources =
    every (already rank-capped) supporting id."""
    rows = []
    for r in pdf.itertuples(index=False):
        texts = list(r.support_texts)
        if not texts:
            rows.append(
                (r.edge_ref, r.existing_description or "", 0.0, [])
            )
            continue
        rel_words = str(r.edge_type).replace("_", " ").lower()
        desc = f"{r.source_name} {rel_words} {r.target_name}: {texts[0]}"
        confs = list(r.support_confidences)
        conf = round(sum(confs) / len(confs), 6)
        rows.append((r.edge_ref, desc, conf, list(r.support_ids)))
    return pd.DataFrame(
        rows, columns=["edge_ref", "description", "confidence", "source_prop_ids"]
    )


def synthesize_descriptions(
    requests: DataFrame,
    synthesize_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
) -> DataFrame:
    """Run the synthesis seam: request rows -> (edge_ref, description,
    confidence, source_prop_ids). Arrow-batched; one output row per edge."""
    fn = synthesize_fn or default_synthesize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return requests.mapInPandas(run, _SYNTH_SCHEMA)
