"""Structured Streaming entry: readStream -> incremental KG construction.

The reference's streaming-ish surface is pull-based incremental analysis
(AbstractIncrementalAnalyzer.analyze, /root/reference/dice/src/main/kotlin/com/
embabel/dice/incremental/AbstractIncrementalAnalyzer.kt:75-162): per-
conversation bookmarks, a trigger threshold, index-based windows, content-hash
re-delivery suppression. This module lifts that exact contract onto Spark
Structured Streaming:

* ``readStream`` over a transcript-turn directory (new files = new turns);
* ``foreachBatch`` — the recommended shape for complex merge sinks — reuses
  the BATCH operator set per micro-batch: triggered_windows + assemble +
  ledger anti-join + process_chunks (extraction -> canonicalize -> project);
* durable state (turns, bookmarks, ledger, propositions, edges) lives in the
  Warehouse's MERGE-by-key tables, not in streaming state stores — matching
  the reference, where the store IS the state. No watermarks are needed: late
  data is impossible by construction (windows are index-based over ordered
  turn lists) and replays are suppressed by the content-hash ledger, so every
  micro-batch is idempotent (exactly-once effects on MERGE keys even under
  at-least-once delivery).

Scale notes: each micro-batch prunes the durable turns table to the
conversations present in the batch (left-semi join on conv_id) before
windowing, so per-batch work is O(affected conversations), not O(history).
Entity identity is stable across batches because node ids are
content-derived (context|type|norm_key); cross-batch cluster refinement is
the consolidation pass's job, as in the reference's dream loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dice_spark.operators.assembly import (
    OVERLAP_SIZE,
    TRIGGER_INTERVAL,
    WINDOW_SIZE,
)
from dice_spark.pipeline import process_chunks
from dice_spark.storage import Warehouse
from dice_spark.streaming.incremental import assemble_triggered, triggered_windows

TURN_SCHEMA = "conv_id string, turn_idx int, role string, text string"


class StreamingPipeline:
    """foreachBatch sink that incrementally grows the KG warehouse."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_root: str,
        context_id: str = "stream",
        window_size: int = WINDOW_SIZE,
        overlap: int = OVERLAP_SIZE,
        trigger: int = TRIGGER_INTERVAL,
        use_udf_extractor: bool = True,
        perspective: str = "ALL",
        additional_grounding: list[str] | None = None,
    ):
        self.spark = spark
        self.wh = Warehouse(warehouse_root, spark)
        self.context_id = context_id
        self.window_size = window_size
        self.overlap = overlap
        self.trigger = trigger
        self.use_udf_extractor = use_udf_extractor
        self.perspective = perspective
        # rememberText's additionalGrounding: extra source-record ids merged
        # into every proposition this stream persists (e.g. the connector
        # feed id behind the stream).
        self.additional_grounding = additional_grounding

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        wh = self.wh
        wh.merge("turns", batch, ["conv_id", "turn_idx"])
        turns = wh.read("turns")
        # Prune history to the conversations this batch touched.
        convs = batch.select("conv_id").distinct()
        active = turns.join(convs, "conv_id", "left_semi")
        bookmarks = wh.read("bookmarks") if wh.exists("bookmarks") else None
        wins = triggered_windows(
            active,
            bookmarks,
            window_size=self.window_size,
            overlap=self.overlap,
            trigger=self.trigger,
        )
        chunks = assemble_triggered(active, wins)
        if wh.exists("ledger"):
            chunks = chunks.join(
                wh.read("ledger"), ["conv_id", "content_hash"], "left_anti"
            )
        chunks = chunks.localCheckpoint(eager=True)
        if chunks.count() == 0:
            return
        run_id = f"batch-{batch_id}"
        out = process_chunks(
            chunks,
            context_id=self.context_id,
            use_udf_extractor=self.use_udf_extractor,
            run_id=run_id,
            perspective=self.perspective,
            additional_grounding=self.additional_grounding,
        )
        # One computation serves both the event emission and the MERGEs:
        # the events must be derived against the PRE-merge store (a lazy
        # anti-join would re-read the table after the merge overwrote it and
        # see nothing new), and the checkpoint keeps the merge from running
        # the extraction pipeline a second time.
        props = out["propositions"].localCheckpoint(eager=True)
        edges = out["edges"].localCheckpoint(eager=True)
        entities = out["entities"].localCheckpoint(eager=True)

        # Domain events (EventEmittingPropositionRepository.kt:81-126): every
        # save of a previously unseen proposition emits PropositionDiscovered;
        # idempotent replays of known prop_ids emit nothing. One batch-level
        # ExtractionBatchCompleted carries the tallies (DiceEvent.kt).
        from dice_spark.operators.events import EVENT_COLUMNS, extraction_batch_event

        new_props = props.select("prop_id")
        if wh.exists("propositions"):
            new_props = new_props.join(
                wh.read("propositions").select("prop_id"), "prop_id", "left_anti"
            )
        discovered = new_props.select(
            F.lit("PropositionDiscovered").alias("event_type"),
            F.lit(run_id).alias("run_id"),
            "prop_id",
            F.lit(None).cast("string").alias("previous_status"),
            F.lit(None).cast("string").alias("new_status"),
            F.lit("stream-save").alias("reason"),
            F.lit(None).cast("string").alias("payload"),
        ).select(*EVENT_COLUMNS)
        stats = self.spark.createDataFrame(
            [(chunks.count(), props.count(), edges.count(), entities.count())],
            "n_chunks long, n_propositions long, n_edges long, n_entities long",
        )
        events = discovered.unionByName(extraction_batch_event(stats, run_id))
        # MERGE (not append) on a minted id so a replayed micro-batch — the
        # retry path where the event write succeeded but a later merge
        # failed — never duplicates event rows (null prop_id on batch-level
        # events would defeat a raw natural-key merge).
        events = events.withColumn(
            "event_id",
            F.md5(
                F.concat_ws(
                    "|", "event_type", "run_id", F.coalesce("prop_id", F.lit(""))
                )
            ),
        )
        wh.merge("events", events, ["event_id"])

        # MERGE keys make replays of a failed micro-batch idempotent.
        wh.merge("propositions", props, ["prop_id"])
        # edge_ref = "src-[TYPE]->dst" already encodes the full MERGE key
        # (GraphProjector.kt:55).
        wh.merge("edges", edges, ["edge_ref"])
        wh.merge("entities", entities, ["entity_id"])
        wh.append("ledger", chunks.select("conv_id", "content_hash"))
        wh.append(
            "bookmarks",
            wins.select("conv_id", F.col("window_end").alias("end_index")),
        )

    def start(
        self,
        input_path: str,
        checkpoint_dir: str,
        schema: str = TURN_SCHEMA,
        available_now: bool = True,
    ):
        """Start the stream. ``available_now`` processes what's there and
        stops (test/backfill mode); False runs continuously."""
        stream = self.spark.readStream.schema(schema).parquet(input_path)
        writer = (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
