"""sf1 (1M-turn) bench headline — one scale notch above the driver's sf0.1.

Synthesizes a deterministic 1M-turn events table by replicating sf0.1's
events 10x with disjoint id spaces (offsets divisible by every modulus the
transcript renderer uses — 2520 for event_id, 56 for user_id — so each
replica renders the identical text distribution over fresh conversations),
then runs bench.py restricted to the KG-family queries via SPARK_GRAFT_ONLY.
The documents/embeddings tables have no sf1 counterpart, so the doc/ann/media
queries are out of scope here — the sf0.1 driver bench covers them.

Purpose (VERDICT round-4 ask #4): fixed-cost-dominated queries
(linking_ladder, revision family) should flatten at 10x the data while
per-turn pipeline cost holds; any stage growing superlinearly at sf1 is a
finding the sf0.1 bench cannot see. Results recorded in BASELINE.md round 5.

Usage: python tools/sf1bench.py   # prints bench.py's JSON line at sf=1
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SF1_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SF1_DIR", "/tmp/dice_sf1")
REP = 10
# divisible by lcm(5,10,3,20,8) = 120 and by 2520 = lcm of every event_id
# modulus in synth.py; user offset divisible by 56 = lcm(8,7)
EVENT_OFF = 2520 * 4000
USER_OFF = 56 * 20000

QUERIES = ",".join(
    [
        "kg_pipeline",
        "turn_assembly",
        "extraction",
        "propositions",
        "entities",
        "linking_ladder",
        "revision_outcomes",
        "temporal_revision",
        "prop_dup_clusters",
        "consolidation",
        "memory_consolidation",
    ]
)


def build_events() -> None:
    events_path = f"{DST}/events.parquet"
    if os.path.exists(events_path):
        return
    from pyspark.sql import functions as F

    from dice_spark.session import get_spark

    spark = get_spark("sf1-build", master="local[8]", shuffle_partitions=16)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * EVENT_OFF))
        .withColumn("user_id", F.col("user_id") + F.lit(i * USER_OFF))
        for i in range(REP)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(events_path)
    spark.stop()


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    build_events()
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = DST
    env["SPARK_GRAFT_ONLY"] = QUERIES
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")], env=env, cwd=repo
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
