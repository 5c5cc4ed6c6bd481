"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "kg_pipeline_turns_per_sec", "value": N, "unit": "sec", ...,
   "queries": {name: seconds}, "sf": ..., "turns": T, "cores": C}

The headline metric is triple-emission throughput (turns/sec) for the full
KG-construction pipeline (assembly -> extraction UDF -> canonicalization ->
edge emission), per BASELINE.json. Scaling-efficiency evidence (same job at
two parallelism levels) is produced by tools/scaling.py and recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from dice_spark.session import get_spark

    spark = get_spark(
        "dice-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "32MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    timings: dict[str, float] = {}

    # SPARK_GRAFT_ONLY="kg_pipeline,linking_ladder,..." restricts the run to a
    # named subset (used by tools/sf1bench.py for the 1M-turn headline, where
    # the documents/embeddings tables don't exist at that scale). Unset = the
    # full driver bench, unchanged.
    only_env = os.environ.get("SPARK_GRAFT_ONLY")
    only = {s.strip() for s in only_env.split(",") if s.strip()} if only_env else None

    def timed(name: str, fn) -> None:
        if only is not None and name not in only:
            return
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    from dice_spark.synth import transcripts_from_events

    transcripts = transcripts_from_events(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).localCheckpoint(eager=True)
    n_turns = transcripts.count()

    # Headline: full KG pipeline, transcripts -> materialized edges.
    # The first Spark job in a fresh JVM pays codegen compilation, Python
    # worker spawn (32 Arrow workers), and whatever the (shared, noisy) host
    # is doing that second — measured swings of 12s..50s for identical work.
    # So: one small warmup run (2% slice) to compile + spawn, then the full
    # pipeline twice; kg_pipeline = best of 2 (per-run values reported too).
    from pyspark.sql import functions as F

    from dice_spark.pipeline import run_pipeline

    warm = transcripts.filter(F.crc32(F.col("conv_id")) % 50 == 0)
    run_pipeline(warm, context_id="warmup", use_udf_extractor=True)["edges"].count()

    runs = []
    n_edges = 0
    if only is None or "kg_pipeline" in only:
        for i in range(2):
            t0 = time.time()
            out = run_pipeline(transcripts, context_id="bench", use_udf_extractor=True)
            n_edges = out["edges"].count()
            runs.append(round(time.time() - t0, 3))
        timings["kg_pipeline"] = min(runs)
    pipeline_sec = min(runs) if runs else 0.0

    # Per-operator timings (each includes its own scan; counts force execution).
    timed("turn_assembly", lambda: entry.q_turn_assembly(spark, sf_dir).count())
    timed("extraction", lambda: entry.q_extraction(spark, sf_dir).count())
    timed("extraction_perspective", lambda: entry.q_extraction_perspective(spark, sf_dir).count())
    timed("propositions", lambda: entry.q_propositions(spark, sf_dir).count())
    timed("entities", lambda: entry.q_entities(spark, sf_dir).count())
    timed("doc_exact_dedup", lambda: entry.q_doc_exact_dedup(spark, sf_dir).count())
    timed("doc_stats", lambda: entry.q_doc_stats(spark, sf_dir).count())
    timed("doc_ngram_dups", lambda: entry.q_doc_ngram_dups(spark, sf_dir).count())
    timed("doc_minhash_dups", lambda: entry.q_doc_minhash_dups(spark, sf_dir).count())
    timed("doc_dup_clusters", lambda: entry.q_doc_dup_clusters(spark, sf_dir).count())
    timed("doc_simhash_dups", lambda: entry.q_doc_simhash_dups(spark, sf_dir).count())
    timed("ann_topk", lambda: entry.q_ann_topk(spark, sf_dir).count())
    timed("ann_ivf_topk", lambda: entry.q_ann_ivf_topk(spark, sf_dir).count())
    timed("prop_query", lambda: entry.q_prop_query(spark, sf_dir).count())
    timed("linking_ladder", lambda: entry.q_linking_ladder(spark, sf_dir).count())
    timed("revision_outcomes", lambda: entry.q_revision_outcomes(spark, sf_dir).count())
    timed("consolidation", lambda: entry.q_consolidation(spark, sf_dir).count())
    timed("retrieval_vector", lambda: entry.q_retrieval_vector(spark, sf_dir).count())
    timed("prop_dup_clusters", lambda: entry.q_prop_dup_clusters(spark, sf_dir).count())
    timed("doc_embedding_dups", lambda: entry.q_doc_embedding_dups(spark, sf_dir).count())
    timed("media_features", lambda: entry.q_media_features(spark, sf_dir).count())
    timed("ann_lsh_topk", lambda: entry.q_ann_lsh_topk(spark, sf_dir).count())
    timed("retrieval_hybrid", lambda: entry.q_retrieval_hybrid(spark, sf_dir).count())
    timed("retrieval_temporal", lambda: entry.q_retrieval_temporal(spark, sf_dir).count())
    timed("structured_report", lambda: entry.q_structured_report(spark, sf_dir).count())
    timed("gate_decisions", lambda: entry.q_gate_decisions(spark, sf_dir).count())
    timed("graph_neighborhood", lambda: entry.q_graph_neighborhood(spark, sf_dir).count())
    timed("frame_plan", lambda: entry.q_frame_plan(spark, sf_dir).count())
    timed("ingestion_outcomes", lambda: entry.q_ingestion_outcomes(spark, sf_dir).count())
    timed("hysteresis", lambda: entry.q_hysteresis(spark, sf_dir).count())
    timed("known_entities", lambda: entry.q_known_entities(spark, sf_dir).count())
    timed("stale_cascade", lambda: entry.q_stale_cascade(spark, sf_dir).count())
    timed("grounding_wiring", lambda: entry.q_grounding_wiring(spark, sf_dir).count())
    timed("path_between", lambda: entry.q_path_between(spark, sf_dir).count())
    timed("reconciler", lambda: entry.q_reconciler(spark, sf_dir).count())
    timed("kg_delta", lambda: entry.q_kg_delta(spark, sf_dir).count())
    timed("edge_descriptions", lambda: entry.q_edge_descriptions(spark, sf_dir).count())
    timed("temporal_revision", lambda: entry.q_temporal_revision(spark, sf_dir).count())
    timed("status_events", lambda: entry.q_status_events(spark, sf_dir).count())
    timed("contrast_pass", lambda: entry.q_contrast(spark, sf_dir).count())
    timed("memory_search", lambda: entry.q_memory_search(spark, sf_dir).count())
    timed("oracle_answers", lambda: entry.q_oracle_answers(spark, sf_dir).count())
    timed("knowledge_types", lambda: entry.q_knowledge_types(spark, sf_dir).count())
    timed("collector_run", lambda: entry.q_collector_run(spark, sf_dir).count())
    timed("revision_fast_path", lambda: entry.q_revision_fast_path(spark, sf_dir).count())
    timed("generalization", lambda: entry.q_generalization(spark, sf_dir).count())
    timed("vector_linking", lambda: entry.q_vector_linking(spark, sf_dir).count())
    timed("prolog_facts", lambda: entry.q_prolog_facts(spark, sf_dir).count())
    timed("prolog_inference", lambda: entry.q_prolog_inference(spark, sf_dir).count())
    # streaming_batch is excluded: it measures the stateful warehouse loop
    # (two full pipeline runs + MERGE I/O into a temp dir), not an operator.
    # memory_consolidation runs the banded-MinHash pair stage
    # (consolidate_session(use_lsh=True)) — bucket-bounded even on this
    # corpus's ~uniform 20% token document frequency, where the shared-word
    # inverted index bottomed out at ~35M candidate pairs (~4 min at sf0.1).
    timed(
        "memory_consolidation",
        lambda: entry.q_memory_consolidation(spark, sf_dir).count(),
    )

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns": n_turns,
        "edges": n_edges,
        "cores": cpus,
        "turns_per_sec": round(n_turns / pipeline_sec, 1) if pipeline_sec else None,
        "kg_pipeline_runs": runs,
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
