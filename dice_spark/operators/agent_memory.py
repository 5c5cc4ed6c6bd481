"""Agent-memory hybrid retrieval: three probes fused with Reciprocal Rank Fusion.

Ports MemoryRetriever.search (reference:
dice/src/main/kotlin/com/embabel/dice/agent/MemoryRetriever.kt:59-215), the
retrieval engine behind the agent Memory tool:

1. **vector** probe — text similarity over the scoped store
   (findSimilarWithScores, threshold 0.0, topK = limit);
2. **keyword** probe — TERM-OVERLAP, not whole-string substring
   (:135-150): tokenize the query (lower-cased runs of letters/digits,
   length >= MIN_TOKEN_LEN, distinct; no stopword list), pool the top
   ``limit * 10`` propositions by effective confidence, score each by how
   many distinct query tokens its text contains, keep the best ``limit``;
3. **related** probe — entity-neighbourhood recall (:152-180), run ONLY when
   the direct probes return fewer than ``limit`` non-eager hits: seed with
   the first MAX_EXPANSION_SEEDS distinct resolved entity ids the direct
   hits mention (hit insertion order), pull the top ``limit * 3``
   propositions mentioning any seed, by effective confidence.

Fusion (:104-117): each probe contributes ``1/(RRF_K + rank)`` (1-based rank
within that probe); a proposition's score sums its contributions, so
consensus hits outrank a single probe's lone hit. Eager ids (propositions
already shown in the system prompt) stay IN the probe rankings but are
filtered from the final result (:75-78). Ties keep probe insertion order —
all vector hits in rank order, then keyword-only hits in rank order, then
related-only hits (:39-44 "stable sort").

Constants RRF_K = 60, MIN_TOKEN_LEN = 3, MAX_EXPANSION_SEEDS = 4
(MemoryRetriever.kt:274-280); DEFAULT_LIMIT = 10 (Memory.kt:428).

Scale shape: every probe is orderBy+limit over the scoped store — Catalyst
compiles each to TakeOrderedAndProject (per-partition top-k + driver-side
merge, never a full sort), and the fusion operates on <= (10 + 3) * limit
rows. The one driver-side action is the reference's own thin-hits gate
(:68-70) — a count over a <= 2*limit-row relation. The seed list is a
<= 4-row broadcast. Nothing here grows with corpus size except the probed
scans, which push their filters down.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dice_spark.functions.decay import effective_confidence
from dice_spark.operators.propquery import PropQuery, apply_prop_query, find_similar_with_scores

RRF_K = 60
MIN_TOKEN_LEN = 3
MAX_EXPANSION_SEEDS = 4
DEFAULT_LIMIT = 10
KEYWORD_POOL_FACTOR = 10
RELATED_POOL_FACTOR = 3

_TOKEN_SPLIT = re.compile(r"[^\w]+|_+", re.UNICODE)


def tokenize(query: str) -> list[str]:
    """Query tokens for the keyword probe (MemoryRetriever.kt:199-210):
    lower-cased runs of Unicode letters/digits, length >= MIN_TOKEN_LEN,
    de-duplicated preserving first occurrence."""
    out: list[str] = []
    for tok in _TOKEN_SPLIT.split(query.lower()):
        if len(tok) >= MIN_TOKEN_LEN and tok not in out:
            out.append(tok)
    return out


def _ranked(df: DataFrame, order: list[Column]) -> DataFrame:
    return df.withColumn("rank", F.row_number().over(Window.orderBy(*order)))


def _mat(df: DataFrame) -> DataFrame:
    """Eagerly materialize a probe (<= pool-factor * limit rows) so the
    thin-hits count and the fusion don't recompute the probe plan."""
    return df.localCheckpoint(eager=True)


def memory_search(
    props: DataFrame,
    query_text: str,
    as_of: Column,
    prop_entities: DataFrame | None = None,
    eager_ids: list[str] | DataFrame | None = None,
    limit: int = DEFAULT_LIMIT,
    base: PropQuery | None = None,
) -> DataFrame:
    """Hybrid memory search -> (prop_id, text, sources, rrf) rows.

    ``sources`` is the sorted comma-joined probe tag set exactly as the
    reference renders it ("[keyword,vector]" lines, MemoryRetriever.kt:190).
    Result order is (rrf desc, insertion order), top ``limit``.
    ``eager_ids`` may be a literal list or a 1-column (prop_id) relation.
    """
    if isinstance(eager_ids, DataFrame):
        eager_rel, eager = F.broadcast(eager_ids.select("prop_id")), None
    else:
        eager_rel, eager = None, list(eager_ids or [])

    def not_eager(df: DataFrame) -> DataFrame:
        if eager_rel is not None:
            return df.join(eager_rel, "prop_id", "left_anti")
        if eager:
            return df.filter(~F.col("prop_id").isin(eager))
        return df

    scoped = apply_prop_query(props, base, prop_entities) if base is not None else props
    scoped = scoped.select(
        "prop_id", "text", "confidence", "decay",
        # optional temporal metadata: null placeholders when the store
        # doesn't carry a column, so the decay expression always resolves
        # (run_pipeline output has valid_from/to + invalidated_at but no
        # content_revised; bare test frames may have none)
        *[
            (F.col(c) if c in scoped.columns else F.lit(None).cast("timestamp")).alias(c)
            for c in ("content_revised", "valid_from", "valid_to", "invalidated_at")
        ],
    )

    # ---- tier 1: vector (threshold 0.0, topK = limit) ------------------
    vector = _mat(
        _ranked(
            find_similar_with_scores(scoped, query_text, threshold=0.0, top_k=limit),
            [F.desc("score"), F.asc("prop_id")],
        ).select("prop_id", "rank")
    )

    # ---- tier 2: keyword term overlap ----------------------------------
    tokens = tokenize(query_text)
    eff = F.round(effective_confidence(as_of=as_of), 6)
    # orderBy+limit FIRST (TakeOrderedAndProject — per-partition top-k, no
    # full sort); the row_number window then ranks only the bounded pool.
    pool = _mat(
        _ranked(
            scoped.withColumn("_eff", eff)
            .orderBy(F.desc("_eff"), F.asc("prop_id"))
            .limit(limit * KEYWORD_POOL_FACTOR),
            [F.desc("_eff"), F.asc("prop_id")],
        ).withColumnRenamed("rank", "_pool_rn")
    )
    if tokens:
        overlap = sum(
            F.when(F.contains(F.lower("text"), F.lit(t)), 1).otherwise(0)
            for t in tokens
        )
        keyword = _mat(
            _ranked(
                pool.withColumn("_overlap", overlap).filter(F.col("_overlap") > 0),
                # Kotlin sortedByDescending is stable: ties keep the
                # effective-confidence pool order.
                [F.desc("_overlap"), F.asc("_pool_rn")],
            )
            .filter(F.col("rank") <= limit)
            .select("prop_id", "rank")
        )
    else:
        keyword = vector.filter(F.lit(False))

    direct = vector.select("prop_id", "rank", F.lit(0).alias("tier")).unionByName(
        keyword.select("prop_id", "rank", F.lit(1).alias("tier"))
    )

    # ---- tier 3: entity expansion, only when direct hits are thin ------
    tiers = [direct]
    thin = not_eager(direct.select("prop_id").distinct()).count() < limit
    if thin and prop_entities is not None:
        # Insertion order of the hit map: vector hits by rank, then
        # keyword-only hits by rank (:66-70); within a hit, mentions in
        # mention order when the relation carries one, else resolved_id
        # (deterministic stand-in for the reference's in-object list order).
        ins = direct.groupBy("prop_id").agg(
            F.min(F.col("tier") * 1000000 + F.col("rank")).alias("_ins")
        )
        pe = prop_entities.select(
            "prop_id",
            "resolved_id",
            (
                F.col("mention_idx")
                if "mention_idx" in prop_entities.columns
                else F.lit(0)
            ).alias("_midx"),
        ).filter(F.col("resolved_id").isNotNull() & (F.col("resolved_id") != ""))
        seeds = (
            ins.join(pe, "prop_id")
            .groupBy("resolved_id")
            .agg(F.min(F.col("_ins") * 1000 + F.col("_midx")).alias("_first"))
        )
        seeds = (
            _ranked(seeds, [F.asc("_first"), F.asc("resolved_id")])
            .filter(F.col("rank") <= MAX_EXPANSION_SEEDS)
            .select("resolved_id")
        )
        hit = (
            pe.join(F.broadcast(seeds), "resolved_id")
            .select("prop_id")
            .distinct()
        )
        related = _mat(
            _ranked(
                scoped.join(hit, "prop_id", "left_semi")
                .withColumn("_eff", eff)
                .orderBy(F.desc("_eff"), F.asc("prop_id"))
                .limit(limit * RELATED_POOL_FACTOR),
                [F.desc("_eff"), F.asc("prop_id")],
            ).select("prop_id", "rank")
        )
        tiers.append(related.select("prop_id", "rank", F.lit(2).alias("tier")))

    allhits = tiers[0]
    for t in tiers[1:]:
        allhits = allhits.unionByName(t)

    tag = F.element_at(
        F.array(F.lit("vector"), F.lit("keyword"), F.lit("related")),
        F.col("tier") + 1,
    )
    fused = (
        allhits.withColumn("_tag", tag)
        .groupBy("prop_id")
        .agg(
            F.round(F.sum(1.0 / (F.lit(RRF_K) + F.col("rank"))), 6).alias("rrf"),
            F.concat_ws(",", F.array_sort(F.collect_set("_tag"))).alias("sources"),
            F.min(F.col("tier") * 1000000 + F.col("rank")).alias("_ins"),
        )
    )
    fused = not_eager(fused)
    # explicit render rank (rrf desc, probe insertion order) — the reference
    # renders hits in fused order (:75-79), and the final text join would
    # otherwise scramble row order
    fused = (
        fused.orderBy(F.desc("rrf"), F.asc("_ins"))
        .limit(limit)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc("_ins"))),
        )
    )
    return (
        fused.join(scoped.select("prop_id", "text"), "prop_id")
        .select("rank", "prop_id", "text", "sources", "rrf")
        .orderBy("rank")
    )


def memory_list_all(
    props: DataFrame,
    as_of: Column,
    eager_ids: list[str] | DataFrame | None = None,
    limit: int = DEFAULT_LIMIT,
    base: PropQuery | None = None,
    prop_entities: DataFrame | None = None,
) -> DataFrame:
    """List all in-scope memories by effective confidence, no query supplied
    (MemoryRetriever.listAll, :83-100): the store query takes the top
    ``limit`` FIRST, then eager ids are filtered — exactly the reference's
    order of operations, so eager memories consume result slots (a caller
    already showing 10 eager memories over a limit of 10 sees none here).
    Returns (rank, prop_id, text, eff_conf)."""
    scoped = apply_prop_query(props, base, prop_entities) if base is not None else props
    for c in ("content_revised", "valid_from", "valid_to", "invalidated_at"):
        if c not in scoped.columns:  # see memory_search: optional metadata
            scoped = scoped.withColumn(c, F.lit(None).cast("timestamp"))
    eff = F.round(effective_confidence(as_of=as_of), 6)
    out = (
        scoped.withColumn("eff_conf", eff)
        .orderBy(F.desc("eff_conf"), F.asc("prop_id"))
        .limit(limit)
    )
    if isinstance(eager_ids, DataFrame):
        out = out.join(F.broadcast(eager_ids.select("prop_id")), "prop_id", "left_anti")
    elif eager_ids:
        out = out.filter(~F.col("prop_id").isin(list(eager_ids)))
    return (
        _ranked(out, [F.desc("eff_conf"), F.asc("prop_id")])
        .filter(F.col("rank") <= limit)
        .select("rank", "prop_id", "text", "eff_conf")
        .orderBy("rank")
    )
