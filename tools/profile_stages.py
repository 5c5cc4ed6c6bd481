"""Stage-level attribution for the shared KG pipeline (guide §1: measure first).

Times each shared stage in isolation with the noop sink so downstream
consumers' costs can be attributed. Usage:
  python tools/profile_stages.py [sf_dir] [stage ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dice_spark.operators.assembly import assemble_windows, split_turns
    from dice_spark.operators.canonicalize import (
        canonicalize_mentions,
        connected_components,
        match_edges,
        mention_nodes,
    )
    from dice_spark.operators.extraction import (
        extract_triples_udf,
        triples_to_propositions,
    )
    from dice_spark.session import get_spark
    from dice_spark.synth import transcripts_from_events

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "stage-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "32MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    timings = {}

    def timed(name, fn, n=2):
        if ONLY and name not in ONLY:
            return
        vals = []
        for _ in range(n):
            t0 = time.time()
            fn()
            vals.append(round(time.time() - t0, 3))
        timings[name] = vals
        print(f"{name:30s} {vals}")

    spark.sparkContext.setJobDescription("warmup")
    tr = transcripts_from_events(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    tr.count()

    spark.sparkContext.setJobDescription("transcripts")
    timed("transcripts", lambda: noop(tr))

    chunks = assemble_windows(tr)
    spark.sparkContext.setJobDescription("assemble_windows")
    timed("assemble_windows", lambda: noop(chunks))

    turns = split_turns(chunks)
    spark.sparkContext.setJobDescription("split_turns")
    timed("split_turns", lambda: noop(turns))

    triples = extract_triples_udf(turns)
    spark.sparkContext.setJobDescription("extract_triples_udf")
    timed("extract_triples_udf", lambda: noop(triples))

    spark.sparkContext.setJobDescription("triples_to_propositions")
    timed("props", lambda: noop(triples_to_propositions(triples, "ctx")))

    mentions = entry._mentions(triples)
    spark.sparkContext.setJobDescription("mention_nodes")
    timed("mention_nodes", lambda: noop(mention_nodes(mentions, "ctx")))

    nodes = mention_nodes(mentions, "ctx").localCheckpoint(eager=True)
    print("nodes:", nodes.count())
    spark.sparkContext.setJobDescription("match_edges")
    timed("match_edges", lambda: noop(match_edges(nodes)))
    me = match_edges(nodes).localCheckpoint(eager=True)
    print("match_edges rows:", me.count())

    spark.sparkContext.setJobDescription("connected_components")
    timed("cc", lambda: noop(connected_components(nodes, me, num_partitions=1)))

    spark.sparkContext.setJobDescription("canonicalize_full")
    def canon():
        e, m = canonicalize_mentions(entry._mentions(extract_triples_udf(split_turns(assemble_windows(tr)))), "ctx")
        noop(e)
        noop(m)
    timed("canonicalize_from_scratch", canon)

    spark.sparkContext.setJobDescription("classified")
    timed("classified", lambda: noop(entry._classified(spark, SF_DIR)))

    spark.sparkContext.setJobDescription("edges")
    from dice_spark.operators.projection import project_edges

    timed("edges", lambda: noop(project_edges(entry._classified(spark, SF_DIR))))

    print({k: v for k, v in timings.items()})
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
