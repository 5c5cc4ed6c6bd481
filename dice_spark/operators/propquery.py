"""Composable proposition query surface: filters + ordering + limit.

Ports PropositionQuery / PropositionStore.matchesFilters (/root/reference/dice/
src/main/kotlin/com/embabel/dice/proposition/PropositionQuery.kt:46-99,
PropositionStore.kt:55-84) as a declarative DataFrame translation — the read
API users touch first. A null field disables that filter, matching the
reference exactly:

* scope: context_id; entity_id / any_entity_ids / all_entity_ids (a
  proposition's entity set = the resolved ids of its mentions);
* status set, level range [min_level, max_level];
* three time ranges: created, revised (last_touched), accessed (last_accessed);
* min_effective_confidence evaluated at one explicit as_of for BOTH filtering
  and ordering (the reference threads a single asOf for the same reason);
* min_importance, min_reinforce_count;
* pinned tristate (True = only pinned, False = only unpinned, None = either);
* min_trust_score FAIL-OPEN: rows with no / non-finite cached trust pass
  (PropositionStore.passesMinTrust:40-44);
* 7 orderings (OrderBy enum) + limit, with prop_id as the deterministic
  tie-break the reference leaves to store iteration order.

Scale notes: everything below is a Catalyst filter/sort/limit — predicate
pushdown reaches the proposition store scan, and limit+order compiles to
TakeOrderedAndProject (a per-partition top-k + driver merge, never a full
sort of 10^12 rows). Entity filters are semi/anti-style joins against the
(prop_id, resolved_id) mention relation, hash-partitioned on prop_id.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dice_spark.functions.decay import DECAY_K, effective_confidence

ORDER_BY_MODES = (
    "NONE",
    "EFFECTIVE_CONFIDENCE_DESC",
    "CREATED_DESC",
    "REVISED_DESC",
    "LAST_ACCESSED_DESC",
    "REINFORCE_COUNT_DESC",
    "IMPORTANCE_DESC",
)

_ORDER_COLS = {
    "EFFECTIVE_CONFIDENCE_DESC": "_eff_conf",
    "CREATED_DESC": "created",
    "REVISED_DESC": "last_touched",
    "LAST_ACCESSED_DESC": "last_accessed",
    "REINFORCE_COUNT_DESC": "reinforce_count",
    "IMPORTANCE_DESC": "importance",
}


@dataclass
class PropQuery:
    """Mirror of PropositionQuery (PropositionQuery.kt:46-99). None = disabled."""

    context_id: str | None = None
    entity_id: str | None = None
    any_entity_ids: list[str] | DataFrame | None = None
    all_entity_ids: list[str] | None = None
    statuses: list[str] | None = None
    min_level: int | None = None
    max_level: int | None = None
    created_after: str | None = None
    created_before: str | None = None
    revised_after: str | None = None
    revised_before: str | None = None
    accessed_after: str | None = None
    accessed_before: str | None = None
    min_effective_confidence: float | None = None
    effective_confidence_as_of: str | None = None
    decay_k: float = DECAY_K
    min_importance: float | None = None
    min_reinforce_count: int | None = None
    min_trust_score: float | None = None
    pinned: bool | None = None
    order_by: str = "NONE"
    limit: int | None = None


def _ts(lit: str) -> Column:
    return F.to_timestamp(F.lit(lit))


def _opt_col(props: DataFrame, name: str) -> Column:
    """Column if present, else a null placeholder (temporal metadata optional).

    Cast to session-tz timestamp so TIMESTAMP_NTZ parquet columns compare
    cleanly against to_timestamp literals.
    """
    return (
        F.col(name).cast("timestamp")
        if name in props.columns
        else F.lit(None).cast("timestamp")
    )


def apply_prop_query(
    props: DataFrame,
    query: PropQuery,
    prop_entities: DataFrame | None = None,
) -> DataFrame:
    """Run ``query`` against a proposition table.

    props columns (nullable/optional marked *): prop_id, context_id, text,
    status, level, confidence, decay, reinforce_count, pinned, importance*,
    created*, last_touched*, last_accessed*, trust_score*, valid_from*,
    valid_to*, invalidated_at*.

    prop_entities: (prop_id, resolved_id) — one row per resolved mention;
    required when any entity filter is set.

    Returns the filtered rows ordered per query.order_by (prop_id tie-break),
    limited, with an ``eff_conf`` column when effective confidence was needed.
    """
    if query.order_by not in ORDER_BY_MODES:
        raise ValueError(f"unknown order_by {query.order_by!r}; one of {ORDER_BY_MODES}")
    out = props
    if query.context_id is not None:
        out = out.filter(F.col("context_id") == query.context_id)
    if query.statuses is not None and len(query.statuses) > 0:
        out = out.filter(F.col("status").isin(list(query.statuses)))
    if query.min_level is not None:
        out = out.filter(F.col("level") >= query.min_level)
    if query.max_level is not None:
        out = out.filter(F.col("level") <= query.max_level)
    for col, after, before in (
        ("created", query.created_after, query.created_before),
        ("last_touched", query.revised_after, query.revised_before),
        ("last_accessed", query.accessed_after, query.accessed_before),
    ):
        # A time filter against a store lacking the column must raise like
        # every other filter does — _opt_col's NULL placeholder would make
        # the comparison filter ALL rows out silently.
        if (after is not None or before is not None) and col not in out.columns:
            raise ValueError(
                f"time filter on {col!r} but the store has no such column"
            )
        if after is not None:
            out = out.filter(_opt_col(out, col) >= _ts(after))
        if before is not None:
            out = out.filter(_opt_col(out, col) <= _ts(before))
    if query.min_importance is not None:
        out = out.filter(F.col("importance") >= query.min_importance)
    if query.min_reinforce_count is not None:
        out = out.filter(F.col("reinforce_count") >= query.min_reinforce_count)
    if query.pinned is not None:
        out = out.filter(F.col("pinned") == bool(query.pinned))
    if query.min_trust_score is not None and "trust_score" in out.columns:
        # Fail-open: null or non-finite cached score passes (passesMinTrust).
        t = F.col("trust_score")
        out = out.filter(t.isNull() | F.isnan(t) | (t >= query.min_trust_score))

    needs_eff = (
        query.min_effective_confidence is not None
        or query.order_by == "EFFECTIVE_CONFIDENCE_DESC"
    )
    if needs_eff:
        if query.effective_confidence_as_of is None:
            raise ValueError(
                "effective_confidence_as_of must be set when filtering/ordering "
                "by effective confidence (determinism: never now())"
            )
        eff = effective_confidence(
            as_of=_ts(query.effective_confidence_as_of),
            content_revised=_opt_col(out, "last_touched"),
            valid_from=_opt_col(out, "valid_from"),
            valid_to=_opt_col(out, "valid_to"),
            invalidated_at=_opt_col(out, "invalidated_at"),
            k=query.decay_k,
        )
        out = out.withColumn("_eff_conf", F.round(eff, 6))
        if query.min_effective_confidence is not None:
            out = out.filter(F.col("_eff_conf") >= query.min_effective_confidence)

    # Entity filters: semi-joins against the mention relation.
    if query.entity_id is not None or query.any_entity_ids is not None or query.all_entity_ids is not None:
        if prop_entities is None:
            raise ValueError("entity filters need the (prop_id, resolved_id) relation")
        pe = prop_entities.select("prop_id", "resolved_id")
        if query.entity_id is not None:
            out = out.join(
                pe.filter(F.col("resolved_id") == query.entity_id).select("prop_id").distinct(),
                "prop_id",
                "left_semi",
            )
        if query.any_entity_ids is not None:
            ids = query.any_entity_ids
            if isinstance(ids, DataFrame):
                wanted = ids.select(F.col(ids.columns[0]).alias("resolved_id"))
                hit = pe.join(wanted, "resolved_id", "left_semi")
            else:
                hit = pe.filter(F.col("resolved_id").isin(list(ids)))
            out = out.join(hit.select("prop_id").distinct(), "prop_id", "left_semi")
        if query.all_entity_ids is not None:
            ids = list(query.all_entity_ids)
            hit = (
                pe.filter(F.col("resolved_id").isin(ids))
                .groupBy("prop_id")
                .agg(F.countDistinct("resolved_id").alias("_n"))
                .filter(F.col("_n") == len(ids))
                .select("prop_id")
            )
            out = out.join(hit, "prop_id", "left_semi")

    if query.order_by != "NONE":
        out = out.orderBy(F.desc(_ORDER_COLS[query.order_by]), F.asc("prop_id"))
    if query.limit is not None:
        out = out.limit(query.limit)
    if needs_eff:
        out = out.withColumnRenamed("_eff_conf", "eff_conf")
    return out


def find_similar_with_scores(
    props: DataFrame,
    text: str,
    threshold: float = 0.0,
    top_k: int = 10,
    query: PropQuery | None = None,
    prop_entities: DataFrame | None = None,
) -> DataFrame:
    """Similarity search over the proposition store, optionally pre-filtered.

    Ports InMemoryPropositionRepository.findSimilarWithScores (:77-127):
    cosine of every proposition's embedding against the query text, >=
    threshold, (score desc, id asc) order, topK. The filtered variant (:105-
    127) applies matchesFilters FIRST — one ``PropQuery`` evaluated at a
    single asOf — so the similarity scan only touches rows that pass, which
    is also the right plan shape (cheap pushed-down filters prune before the
    embedding arithmetic; orderBy+limit compiles to TakeOrderedAndProject).
    The embedding is the deterministic letter-count stand-in shared with the
    linking VECTOR tier and the retrieval router.
    """
    from dice_spark.operators.dedup import cosine_expr
    from dice_spark.operators.linking import char_embedding

    base = (
        apply_prop_query(props, query, prop_entities) if query is not None else props
    )
    sim = F.round(
        cosine_expr(
            char_embedding(F.lower(F.col("text"))),
            char_embedding(F.lit(text.lower())),
        ),
        6,
    )
    return (
        base.withColumn("score", sim)
        .filter(~F.isnan("score") & (F.col("score") >= threshold))
        .orderBy(F.desc("score"), F.asc("prop_id"))
        .limit(top_k)
    )
