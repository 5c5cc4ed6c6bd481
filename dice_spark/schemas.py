"""Table schemas for the KG-construction engine.

Mirrors the reference data model (SURVEY.md §1.1; Proposition at
/root/reference/dice/src/main/kotlin/com/embabel/dice/proposition/Proposition.kt:102-125,
EntityMention at proposition/EntityMention.kt:48-54, ProjectedRelationship at
projection/graph/GraphProjector.kt:37-65) as columnar StructTypes. Everything fits
native Spark SQL types — no custom types needed.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: multi-turn conversation / agent transcripts (the BASELINE input hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Assembled conversation window (reference Chunk, pipeline/PropositionPipeline.kt:386,402).
CHUNKS = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("window_start", T.IntegerType(), False),
        T.StructField("window_end", T.IntegerType(), False),  # exclusive
        T.StructField("text", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
    ]
)

MENTION = T.StructType(
    [
        T.StructField("span", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("resolved_id", T.StringType(), True),
        T.StructField("role", T.StringType(), False),  # SUBJECT | OBJECT | OTHER
    ]
)

PROVENANCE_ENTRY = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # uri|file|content|connector
        T.StructField("key", T.StringType(), False),
        T.StructField("chunk_id", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)

# System of record (reference Proposition).
PROPOSITIONS = T.StructType(
    [
        T.StructField("prop_id", T.StringType(), False),
        T.StructField("context_id", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("predicate", T.StringType(), True),
        T.StructField("mentions", T.ArrayType(MENTION), False),
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("decay", T.DoubleType(), False),
        T.StructField("importance", T.DoubleType(), True),
        T.StructField("status", T.StringType(), False),  # ACTIVE|SUPERSEDED|CONTRADICTED|PROMOTED|STALE
        T.StructField("level", T.IntegerType(), False),
        T.StructField("pinned", T.BooleanType(), False),
        T.StructField("reinforce_count", T.IntegerType(), False),
        T.StructField("grounding", T.ArrayType(T.StringType()), True),
        T.StructField("source_ids", T.ArrayType(T.StringType()), True),
        T.StructField("provenance", T.ArrayType(PROVENANCE_ENTRY), True),
        T.StructField("created", T.TimestampType(), True),
        T.StructField("content_revised", T.TimestampType(), True),
        T.StructField("valid_from", T.TimestampType(), True),
        T.StructField("valid_to", T.TimestampType(), True),
        T.StructField("invalidated_at", T.TimestampType(), True),
    ]
)

ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), True),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("surface_forms", T.ArrayType(T.StringType()), True),
        T.StructField("n_mentions", T.LongType(), True),
    ]
)

# The golden triple output (reference ProjectedRelationship).
EDGES = T.StructType(
    [
        T.StructField("source_id", T.StringType(), False),
        T.StructField("target_id", T.StringType(), False),
        T.StructField("edge_type", T.StringType(), False),  # UPPER_SNAKE predicate
        T.StructField("confidence", T.DoubleType(), False),
        T.StructField("description", T.StringType(), True),
        # capped at projection.MAX_EDGE_SOURCE_IDS; exact count alongside
        T.StructField("source_prop_ids", T.ArrayType(T.StringType()), True),
        T.StructField("n_source_props", T.LongType(), False),
        T.StructField("edge_ref", T.StringType(), False),  # "src-[TYPE]->dst"
    ]
)

# Checkpoint/resume: reference ChunkHistoryStore + IngestionLedger
# (incremental/ChunkHistoryStore.kt, dice-ingestion/.../IngestionLedger.kt:58).
PROCESSED_CHUNKS = T.StructType(
    [
        T.StructField("context_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("window_start", T.IntegerType(), False),
        T.StructField("window_end", T.IntegerType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("processed_at", T.TimestampType(), True),
    ]
)

# Lineage (reference ProjectionRecord / CollectorRecord).
PROJECTION_RECORDS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("prop_id", T.StringType(), False),
        T.StructField("lifecycle", T.StringType(), False),  # PROJECTED|ADOPTED|SKIPPED|FAILED
        T.StructField("target_ref", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
    ]
)
