"""Warm per-query timing replica of bench.py methodology (count-forced),
with repeats, for optimization iteration. Not the frozen bench.

Usage: python tools/time_queries.py [sf_dir] [n_repeats] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
ONLY = sys.argv[3:]


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from dice_spark.session import get_spark
    from dice_spark.synth import transcripts_from_events

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "time-queries",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "32MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    tr = transcripts_from_events(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    tr.count()
    from dice_spark.pipeline import run_pipeline

    warm = tr.filter(F.crc32(F.col("conv_id")) % 50 == 0)
    run_pipeline(warm, context_id="warmup", use_udf_extractor=True)["edges"].count()

    qs = entry.queries()
    names = ONLY if ONLY else list(qs)
    out = {}
    for name in names:
        fn = qs[name]
        vals = []
        for _ in range(N):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn(spark, SF_DIR).count()
            vals.append(round(time.time() - t0, 3))
        out[name] = vals
        print(f"{name:26s} {vals}", flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
