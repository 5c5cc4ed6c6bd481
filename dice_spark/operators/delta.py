"""KnowledgeGraphDelta: the per-batch diff a graph build applies to the store.

Reference contract: text2graph/KnowledgeGraphDelta.kt:27-69 — a delta carries
the chunk ids it is based on plus entity merges and relationship merges, with
accessor views newEntities / mergedEntities / newOrModifiedEntities /
newRelationships / mergedRelationships. MultiPassKnowledgeGraphBuilder.kt:31-85
computes it chunk-by-chunk through the resolver; here the same split falls out
of two set-oriented joins over tables the pipeline already produces:

- an entity the resolver matched to the durable registry (by id when the
  registry shares the resolver, or by normalized canonical name + type — the
  KnownEntityResolver.kt name convention) is an ExistingEntity merge; an
  unmatched one is a NewEntity.
- an edge whose edge_ref already exists in the store is a merged relationship
  (the reconciler's ADOPTED lifecycle, Reconciler.kt); an unseen ref is new.

Every output is a lazy DataFrame: computing the delta adds no action, and at
scale each split is one broadcast-or-hash join keyed on registry-sized sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dice_spark.functions.normalize import norm_key


def _entity_matches(entities: DataFrame, existing_entities: DataFrame) -> DataFrame:
    """(entity_id, existing_id) pairs: batch entities the registry resolves.

    Two match clauses, unioned, then min(existing_id) per batch entity for a
    deterministic convergence target:
    - id equality (store and batch share the resolver / minting scheme);
    - normalized canonical name + type key (independent registries — the
      KnownEntityResolver.kt normalized-name convention).
    """
    ex = existing_entities.select(
        F.col("entity_id").alias("existing_id"),
        norm_key("canonical_name").alias("_nk"),
        F.lower("entity_type").alias("_tk"),
    )
    batch = entities.select(
        "entity_id",
        norm_key("canonical_name").alias("_nk"),
        F.lower("entity_type").alias("_tk"),
    )
    by_id = batch.select("entity_id").join(
        ex.select(F.col("existing_id")),
        F.col("entity_id") == F.col("existing_id"),
    ).select("entity_id", "existing_id")
    by_name = batch.join(ex, ["_nk", "_tk"]).select("entity_id", "existing_id")
    return (
        by_id.unionByName(by_name)
        .groupBy("entity_id")
        .agg(F.min("existing_id").alias("existing_id"))
    )


def compute_delta(
    chunks: DataFrame,
    entities: DataFrame,
    edges: DataFrame,
    existing_entities: DataFrame | None = None,
    existing_edges: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Build the KnowledgeGraphDelta views for one batch.

    ``chunks`` needs a chunk_id column; ``entities`` the canonicalizer output
    (entity_id, canonical_name, entity_type, ...); ``edges`` the projector
    output (reconciled or not — an edges input without a lifecycle column is
    reconciled here against ``existing_edges``).

    Returns {chunk_ids, new_entities, merged_entities (+ existing_id),
    new_relationships, merged_relationships} — the five accessor views of
    KnowledgeGraphDelta.kt:40-63.
    """
    if "lifecycle" not in edges.columns:
        from dice_spark.operators.projection import reconcile_edges

        edges = reconcile_edges(edges, existing_edges)

    if existing_entities is None:
        new_entities = entities
        merged_entities = entities.withColumn(
            "existing_id", F.lit(None).cast("string")
        ).filter(F.lit(False))
    else:
        matches = _entity_matches(entities, existing_entities)
        new_entities = entities.join(matches, "entity_id", "left_anti")
        merged_entities = entities.join(matches, "entity_id")

    return {
        "chunk_ids": chunks.select("chunk_id").distinct(),
        "new_entities": new_entities,
        "merged_entities": merged_entities,
        "new_relationships": edges.filter(F.col("lifecycle") == "PROJECTED"),
        "merged_relationships": edges.filter(F.col("lifecycle") == "ADOPTED"),
    }


def new_or_modified_entities(delta: dict[str, DataFrame]) -> DataFrame:
    """KnowledgeGraphDelta.newOrModifiedEntities (KnowledgeGraphDelta.kt:47-56):
    merged entities first, then new, deduplicated by id so a merged entity's
    upgraded view takes precedence. new/merged partition the batch here, so
    the dedup is a disjoint union; precedence is kept for callers that union
    deltas across batches (same id new in batch 1, merged in batch 2)."""
    cols = ["entity_id", "canonical_name", "entity_type"]
    ranked = (
        delta["merged_entities"].select(*cols, F.lit(0).alias("_rank"))
        .unionByName(delta["new_entities"].select(*cols, F.lit(1).alias("_rank")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("entity_id").orderBy("_rank", "canonical_name")
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rank", "_rn")
    )


def delta_summary(delta: dict[str, DataFrame]) -> DataFrame:
    """One (category, n) row per delta view — the batch-change histogram."""
    parts = [
        df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("category"), "n")
        for name, df in delta.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
