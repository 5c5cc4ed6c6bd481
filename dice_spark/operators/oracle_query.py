"""Question-answering oracle over the constructed KG (layered fallback).

Ports the Oracle surface (reference:
dice/src/main/kotlin/com/embabel/dice/query/oracle/Oracle.kt:29-40,
Question.kt:27-107, LlmOracle.kt:48-140):

1. **symbolic** pass (LlmOracle.tryPrologAnswer) — the reference projects
   edges into a Prolog fact base and answers binding queries against it; the
   Spark-native equivalent queries the SAME projected relation (the kg_edges
   table IS what PrologProjector projects) with the parsed (predicate,
   bound-entity) pattern. Matches -> Answer(confidence 0.9, source PROLOG,
   grounding = the matched edges' supporting proposition ids); a parsed
   query with zero matches -> negative answer ("Prolog query returned no
   results", Question.negativeFromProlog);
2. **proposition** fallback (LlmOracle.tryPropositionAnswer) — findSimilar
   (threshold 0.0, topK 5); answer synthesized from the hits (LLM seam;
   deterministic stand-in = the top hit's text), confidence = max of the
   hits' confidences, grounding = hit ids, source PROPOSITIONS;
3. **unknown** (Answer.unknown) — confidence 0.0, negative, source NONE.

The question -> query-plan step is an LLM seam in the reference
(generateQueryPlan). ``parse_question`` is the deterministic stand-in: the
first relation predicate (by declared priority) contained in the lowercased
question text, plus any registry entity names contained in it as bindings.
It runs at plan-build time on a literal string, so both engines can share
the parse verbatim.

AnswerSource values {PROLOG, PROPOSITIONS, NONE} are kept name-for-name
(Question.kt AnswerSource) even though the symbolic store here is the edge
relation, so a reference consumer reading answers sees the same contract.

Scale shape: the symbolic pass is a filter on (edge_type) — partition-
prunable on the edges table — plus an optional broadcast-size entity-name
containment check; the proposition pass is the existing orderBy+limit
top-k. Answers are 1-row relations; nothing scales with corpus size except
the pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dice_spark.operators.propquery import find_similar_with_scores

PROLOG_CONFIDENCE = 0.9  # LlmOracle.kt fromProlog confidence
NEGATIVE_PROLOG_CONFIDENCE = 0.8  # Question.kt negativeFromProlog
PROP_TOP_K = 5  # LlmOracle.tryPropositionAnswer topK
# The reference formats every Prolog binding into the answer; a hub predicate
# at corpus scale has unbounded bindings, so the rendered answer keeps the
# first MAX_BINDINGS matches (edge_ref order) — the negative/positive
# decision is unaffected.
MAX_BINDINGS = 10
UNKNOWN_TEXT_PREFIX = "I don't have enough information to answer: "


def parse_question(
    question: str,
    relations: list[str],
    entity_names: list[str],
) -> tuple[str | None, list[str]]:
    """Deterministic query-plan stand-in (LlmOracle.generateQueryPlan seam):
    first declared relation predicate contained in the question (match
    priority = declaration order, the projector's own rule), plus registry
    entity names contained in it (sorted for determinism)."""
    q = question.lower()
    predicate = next((r for r in relations if r.lower() in q), None)
    bound = sorted(n for n in entity_names if n.lower() in q)
    return predicate, bound


def _edge_type(predicate: str) -> str:
    import re

    return re.sub(r"\s+", "_", predicate.strip().upper())


def oracle_ask(
    question: str,
    edges: DataFrame,
    entities: DataFrame,
    props: DataFrame,
    relations: list[str],
    entity_names: list[str],
) -> DataFrame:
    """Answer ``question`` -> one Answer row:
    (question, answer, confidence, negative, source, n_grounding, grounding).

    grounding is the comma-joined supporting ids (edge source_prop_ids for
    the symbolic pass, hit prop_ids for the proposition pass), capped by the
    edges table's own support cap.
    """
    predicate, bound = parse_question(question, relations, entity_names)
    qlit = F.lit(question)

    if predicate is not None:
        # symbolic pass: bindings against the projected edge relation
        named = (
            edges.join(
                F.broadcast(
                    entities.select(
                        F.col("entity_id").alias("source_id"),
                        F.col("canonical_name").alias("source_name"),
                    )
                ),
                "source_id",
            )
            .join(
                F.broadcast(
                    entities.select(
                        F.col("entity_id").alias("target_id"),
                        F.col("canonical_name").alias("target_name"),
                    )
                ),
                "target_id",
            )
            .filter(F.col("edge_type") == _edge_type(predicate))
        )
        if bound:
            hit = F.lit(False)
            for name in bound:
                hit = hit | (F.col("source_name") == name) | (F.col("target_name") == name)
            named = named.filter(hit)
        matches = named.orderBy("edge_ref").limit(MAX_BINDINGS)
        rendered = F.concat(
            F.col("source_name"), F.lit(f" {predicate} "), F.col("target_name")
        )
        answer = matches.agg(
            qlit.alias("question"),
            F.array_sort(F.collect_list(rendered)).alias("_arr"),
            F.count(F.lit(1)).alias("_n"),
            F.array_sort(F.flatten(F.collect_list("source_prop_ids"))).alias("_g"),
        )
        return answer.select(
            "question",
            F.when(F.col("_n") > 0, F.concat_ws("; ", F.col("_arr")))
            .otherwise(F.lit("No, I couldn't find information about that."))
            .alias("answer"),
            # negativeFromProlog carries confidence 0.8 (Question.kt:58-67):
            # "Prolog found no results" is itself a confident negative.
            F.when(F.col("_n") > 0, F.lit(PROLOG_CONFIDENCE))
            .otherwise(F.lit(NEGATIVE_PROLOG_CONFIDENCE))
            .alias("confidence"),
            (F.col("_n") == 0).alias("negative"),
            F.lit("PROLOG").alias("source"),
            F.when(F.col("_n") > 0, F.size("_g")).otherwise(F.lit(0))
            .cast("int")
            .alias("n_grounding"),
            F.when(F.col("_n") > 0, F.concat_ws(",", F.col("_g")))
            .otherwise(F.lit(""))
            .alias("grounding"),
        )

    # proposition fallback: similarity top-k, answer = top hit (synthesis seam)
    from pyspark.sql.window import Window

    hits = find_similar_with_scores(
        props, question, threshold=0.0, top_k=PROP_TOP_K
    ).withColumn(
        "_rn", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("prop_id")))
    )
    answer = hits.agg(
        qlit.alias("question"),
        F.coalesce(F.max(F.when(F.col("_rn") == 1, F.col("text"))), F.lit("")).alias("_top"),
        F.max("confidence").alias("_conf"),
        F.count(F.lit(1)).alias("_n"),
        F.concat_ws(",", F.array_sort(F.collect_list("prop_id"))).alias("grounding"),
    )
    return answer.select(
        "question",
        F.when(F.col("_n") > 0, F.col("_top"))
        .otherwise(F.concat(F.lit(UNKNOWN_TEXT_PREFIX), qlit))
        .alias("answer"),
        F.when(F.col("_n") > 0, F.round(F.coalesce(F.col("_conf"), F.lit(0.7)), 6))
        .otherwise(F.lit(0.0))
        .alias("confidence"),
        (F.col("_n") == 0).alias("negative"),
        F.when(F.col("_n") > 0, F.lit("PROPOSITIONS")).otherwise(F.lit("NONE")).alias("source"),
        F.col("_n").cast("int").alias("n_grounding"),
        F.when(F.col("_n") > 0, F.col("grounding")).otherwise(F.lit("")).alias("grounding"),
    )
