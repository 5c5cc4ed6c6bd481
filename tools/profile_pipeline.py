"""Per-stage wall-clock decomposition of the scaling-gate pipeline run.

Same input, warmup, spill protocol as tools/scaling.py measure(), but the
pipeline is driven stage by stage with an action after each materialization,
so the gate's single number decomposes into: assembly+extraction (the
embarrassingly parallel part), canonicalization CC loop (iterative, fixed
rounds), resolution+propositions, and edge emission.

Usage: python tools/profile_pipeline.py <cores> [rep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 80
WORK = os.environ.get("SCALING_WORK_DIR", "/tmp/dice_scaling")


def main() -> int:
    from pyspark.sql import functions as F

    from dice_spark.operators.assembly import assemble_windows, split_turns
    from dice_spark.operators.extraction import extract_triples_udf, triples_to_propositions
    from dice_spark.operators.canonicalize import canonicalize_mentions
    from dice_spark.operators.mention_filter import filter_mention_groups
    from dice_spark.operators.projection import classify_projection, project_edges
    from dice_spark.functions.normalize import norm_key
    from dice_spark.pipeline import run_pipeline
    from dice_spark.session import get_spark
    from dice_spark.synth import relations_df

    spark = get_spark(
        f"profile-{CORES}", master=f"local[{CORES}]", shuffle_partitions=max(CORES, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = spark.read.parquet(f"{WORK}/transcripts_rep{REP}.parquet")
    n = transcripts.count()
    spill = f"{WORK}/profile_spill_{CORES}_{os.getpid()}"

    # same warmup as the gate
    warm = transcripts.filter(F.pmod(F.xxhash64("conv_id"), F.lit(100)) == 0).repartition(
        CORES * 2, "conv_id"
    )
    run_pipeline(warm, context_id="warmup", use_udf_extractor=True,
                 spill_dir=f"{spill}_warm")["edges"].count()
    shutil.rmtree(f"{spill}_warm", ignore_errors=True)

    t: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", flush=True)
        return out

    chunks = assemble_windows(transcripts)

    def write_read(df, name):
        df.write.mode("overwrite").parquet(f"{spill}/{name}.parquet")
        return spark.read.parquet(f"{spill}/{name}.parquet")

    chunk_meta = clock(
        "assembly_meta", lambda: write_read(chunks.select("chunk_id", "content_hash"), "meta")
    )
    triples = clock(
        "extraction",
        lambda: write_read(extract_triples_udf(split_turns(chunks)), "triples"),
    )
    mentions = triples.select(
        F.col("subj_span").alias("span"), F.col("subj_type").alias("entity_type")
    ).unionByName(
        triples.select(F.col("obj_span").alias("span"), F.col("obj_type").alias("entity_type"))
    )

    def canon():
        # mirror process_chunks: count the vocabulary FIRST, filter groups
        counted = mentions.groupBy("span", "entity_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        counted, _ = filter_mention_groups(counted)
        entities, mapping = canonicalize_mentions(counted, "profile", pre_counted=True)
        entities.count()
        return entities, mapping

    entities, mapping = clock("canonicalize_cc", canon)

    def resolve():
        from dice_spark.operators.provenance import with_provenance_metadata

        props = triples_to_propositions(triples, "profile")
        props = with_provenance_metadata(props, chunk_meta, hash_col="content_hash")
        subj_map = mapping.select(
            F.col("norm_key").alias("_sk"), F.col("type_key").alias("_st"),
            F.col("resolved_id").alias("subj_id"),
        )
        obj_map = mapping.select(
            F.col("norm_key").alias("_ok"), F.col("type_key").alias("_ot"),
            F.col("resolved_id").alias("obj_id"),
        )
        props = (
            props.withColumn("_sk", norm_key("subj_span"))
            .withColumn("_st", F.lower("subj_type"))
            .withColumn("_ok", norm_key("obj_span"))
            .withColumn("_ot", F.lower("obj_type"))
            .join(subj_map, ["_sk", "_st"], "left")
            .join(obj_map, ["_ok", "_ot"], "left")
            .drop("_sk", "_st", "_ok", "_ot")
        )
        return write_read(props, "props")

    props = clock("props_resolve", resolve)
    clock(
        "edges",
        lambda: project_edges(
            classify_projection(props, relations_df(spark))
        ).count(),
    )
    total = round(sum(t.values()), 2)
    print({"cores": CORES, "turns": n, "stages": t, "total_sec": total,
           "turns_per_sec": round(n / total, 1)})
    spark.stop()
    shutil.rmtree(spill, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
