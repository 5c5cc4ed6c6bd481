"""Knowledge-type classification as pure column expressions.

Ports KnowledgeType (reference:
dice/src/main/kotlin/com/embabel/dice/common/KnowledgeType.kt:23-50 —
SEMANTIC / EPISODIC / PROCEDURAL / WORKING), the
HeuristicKnowledgeTypeClassifier (projection/memory/support/
HeuristicKnowledgeTypeClassifier.kt:24-38: decay > 0.5 -> EPISODIC;
confidence > 0.7 AND decay < 0.3 -> SEMANTIC; else WORKING), and the
RelationBasedKnowledgeTypeClassifier (projection/memory/support/
RelationBasedKnowledgeTypeClassifier.kt:30-48: first declared relation whose
predicate the lowercased text contains wins — declaration order is match
priority, the projector's own rule — else the fallback heuristic).

Each relation carries a knowledgeType (common/Relation.kt:28-33, the
semantic()/procedural()/episodic() factories). Everything here is a CASE
expression — no shuffle, no UDF; it rides whatever scan already touches the
proposition text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNOWLEDGE_TYPES = ("SEMANTIC", "EPISODIC", "PROCEDURAL", "WORKING")


def heuristic_knowledge_type(
    confidence: Column | str = "confidence", decay: Column | str = "decay"
) -> Column:
    """HeuristicKnowledgeTypeClassifier.kt:24-38."""
    conf = F.col(confidence) if isinstance(confidence, str) else confidence
    dec = F.col(decay) if isinstance(decay, str) else decay
    return (
        F.when(dec > 0.5, "EPISODIC")
        .when((conf > 0.7) & (dec < 0.3), "SEMANTIC")
        .otherwise("WORKING")
    )


def relation_knowledge_type(
    relation_types: list[tuple[str, str]],
    text: Column | str = "text",
    confidence: Column | str = "confidence",
    decay: Column | str = "decay",
) -> Column:
    """RelationBasedKnowledgeTypeClassifier.kt:30-48: first predicate
    contained in the lowercased text wins (declaration order); no match
    falls back to the heuristic. ``relation_types`` is the declared
    (predicate, knowledge_type) list."""
    txt = F.lower(F.col(text) if isinstance(text, str) else text)
    expr: Column | None = None
    for predicate, ktype in relation_types:
        if ktype not in KNOWLEDGE_TYPES:
            raise ValueError(f"unknown knowledge type {ktype!r}")
        cond = txt.contains(predicate.lower())
        expr = F.when(cond, ktype) if expr is None else expr.when(cond, ktype)
    fallback = heuristic_knowledge_type(confidence, decay)
    return fallback if expr is None else expr.otherwise(fallback)
