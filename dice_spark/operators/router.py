"""RetrievalRouter: one multi-modal query entry over the constructed KG.

Ports query/discovery/RetrievalRouter.kt: a single DiscoveryQuery routes to
VECTOR / ENTITY / GRAPH_WALK / TEMPORAL / HYBRID retrieval, always scoped to
the bound context (never returns another context's propositions), with the
reference's clamps (topK in [1, 100], depth in [1, 5]) and the HYBRID merge
rule (:158-191): vector hits keep their score at tier 0, graph-only results
fall to tier 1 with a sentinel score, order by (tier, score desc, id asc),
truncate to topK.

The stand-in text-similarity search is the letter-count-cosine embedding used
by the linking vector tier (linking.char_embedding) — a real embedding column
plugs in by replacing ``_text_similarity``.

Capability contract (RetrievalRouter.kt:113-117,140-144,191 /
RetrievalMode.kt:22-24): ``capabilities`` declares which store fragments are
present — "VECTOR" (VectorSearchCapable) and "TEMPORAL"
(TemporalQueryCapable). A mode whose backing fragment is absent returns a
typed-empty result with ``supported=False`` and NEVER falls back to a scan;
ENTITY / GRAPH_WALK need no fragment and are always supported; HYBRID runs
its graph tier regardless but reports ``supported = ("VECTOR" in
capabilities)``, exactly the reference's ``store as? VectorSearchCapable``
outcome. ``capabilities=None`` means a fully-capable store.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dice_spark.operators.graphquery import neighborhood
from dice_spark.operators.linking import char_embedding
from dice_spark.operators.dedup import cosine_expr

MODES = ("VECTOR", "ENTITY", "GRAPH_WALK", "TEMPORAL", "HYBRID")
MIN_DEPTH, MAX_DEPTH = 1, 5
MAX_TOP_K = 100
GRAPH_TIER_SENTINEL = float("-inf")


@dataclass
class DiscoveryQuery:
    """Mirror of DiscoveryQuery: one entry point, mode picks the plan."""

    mode: str = "HYBRID"
    text: str | None = None
    entity_id: str | None = None
    from_ts: str | None = None
    to_ts: str | None = None
    top_k: int = 20
    depth: int = 2
    similarity_threshold: float = 0.0


def _clamp(q: DiscoveryQuery) -> tuple[int, int, float]:
    return (
        max(1, min(q.top_k, MAX_TOP_K)),
        max(MIN_DEPTH, min(q.depth, MAX_DEPTH)),
        min(max(q.similarity_threshold, 0.0), 1.0),
    )


def _scope(props: DataFrame, context_id: str) -> DataFrame:
    return props.filter(F.col("context_id") == context_id)


def _text_similarity(props: DataFrame, text: str, threshold: float) -> DataFrame:
    """findSimilarWithScores stand-in: letter-count cosine vs the query text."""
    sim = F.round(
        cosine_expr(char_embedding(F.lower(F.col("text"))), char_embedding(F.lit(text.lower()))),
        6,
    )
    return props.withColumn("score", sim).filter(
        ~F.isnan("score") & (F.col("score") >= threshold)
    )


def _entity_props(props: DataFrame, prop_entities: DataFrame, entity_id: str) -> DataFrame:
    hit = prop_entities.filter(F.col("resolved_id") == entity_id).select("prop_id").distinct()
    return props.join(hit, "prop_id", "left_semi")


def _graph_walk(
    props: DataFrame, prop_entities: DataFrame, edges: DataFrame, entity_id: str, depth: int
) -> DataFrame:
    near = neighborhood(edges, entity_id, max_depth=depth).select("entity_id")
    hit = (
        prop_entities.join(near, prop_entities.resolved_id == near.entity_id, "left_semi")
        .select("prop_id")
        .distinct()
    )
    return props.join(hit, "prop_id", "left_semi")


CAPABILITIES = frozenset({"VECTOR", "TEMPORAL"})


def retrieve(
    props: DataFrame,
    query: DiscoveryQuery,
    context_id: str,
    prop_entities: DataFrame | None = None,
    edges: DataFrame | None = None,
    capabilities: frozenset[str] | set[str] | None = None,
) -> dict:
    """Route one DiscoveryQuery. Returns {mode, supported, propositions: DataFrame}.

    props: the proposition store (prop_id, context_id, text, created*, ...);
    prop_entities: (prop_id, resolved_id) for ENTITY/GRAPH_WALK/HYBRID;
    edges: the KG edge table for GRAPH_WALK/HYBRID;
    capabilities: present store fragments (subset of {"VECTOR", "TEMPORAL"});
    None = fully capable. An unsupported requested mode returns
    ``supported: False`` with an empty relation — never a fallback scan.
    """
    if query.mode not in MODES:
        raise ValueError(f"unknown retrieval mode {query.mode!r}; one of {MODES}")
    caps = CAPABILITIES if capabilities is None else frozenset(capabilities)
    top_k, depth, threshold = _clamp(query)
    scoped = _scope(props, context_id)
    empty = scoped.limit(0)

    if query.mode == "VECTOR":
        if "VECTOR" not in caps:
            return {"mode": query.mode, "supported": False, "propositions": empty}
        if not query.text:
            return {"mode": query.mode, "supported": True, "propositions": empty}
        out = (
            _text_similarity(scoped, query.text, threshold)
            .orderBy(F.desc("score"), F.asc("prop_id"))
            .limit(top_k)
        )
        return {"mode": query.mode, "supported": True, "propositions": out}

    if query.mode == "ENTITY":
        if not query.entity_id or prop_entities is None:
            return {"mode": query.mode, "supported": True, "propositions": empty}
        out = _entity_props(scoped, prop_entities, query.entity_id).limit(top_k)
        return {"mode": query.mode, "supported": True, "propositions": out}

    if query.mode == "GRAPH_WALK":
        if not query.entity_id or prop_entities is None or edges is None:
            return {"mode": query.mode, "supported": True, "propositions": empty}
        out = _graph_walk(scoped, prop_entities, edges, query.entity_id, depth).limit(top_k)
        return {"mode": query.mode, "supported": True, "propositions": out}

    if query.mode == "TEMPORAL":
        if "TEMPORAL" not in caps:
            return {"mode": query.mode, "supported": False, "propositions": empty}
        if query.from_ts is None or query.to_ts is None or "created" not in scoped.columns:
            return {"mode": query.mode, "supported": True, "propositions": empty}
        out = scoped.filter(
            (F.col("created") >= F.to_timestamp(F.lit(query.from_ts)))
            & (F.col("created") <= F.to_timestamp(F.lit(query.to_ts)))
        ).limit(top_k)
        return {"mode": query.mode, "supported": True, "propositions": out}

    # HYBRID: vector tier 0 keeps its score; graph-only tier 1, sentinel
    # score. A vector-incapable store still runs the graph tier, but the
    # result reports supported=False (RetrievalRouter.kt:191).
    vector_hits = (
        _text_similarity(scoped, query.text, threshold).withColumn("tier", F.lit(0))
        if query.text and "VECTOR" in caps
        else empty.withColumn("score", F.lit(0.0)).withColumn("tier", F.lit(0))
    )
    if query.entity_id and prop_entities is not None and edges is not None:
        graph_hits = (
            _graph_walk(scoped, prop_entities, edges, query.entity_id, depth)
            .join(vector_hits.select("prop_id"), "prop_id", "left_anti")
            .withColumn("score", F.lit(GRAPH_TIER_SENTINEL))
            .withColumn("tier", F.lit(1))
        )
        merged = vector_hits.unionByName(graph_hits)
    else:
        merged = vector_hits
    out = merged.orderBy(F.asc("tier"), F.desc("score"), F.asc("prop_id")).limit(top_k)
    return {"mode": query.mode, "supported": "VECTOR" in caps, "propositions": out}
