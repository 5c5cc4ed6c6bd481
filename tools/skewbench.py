"""Zipf-head skew resilience measurement (SURVEY §7 hard-part 1).

One surface form ("Primary User", the reference's first-person -> user
pinning) carries >=35% of all mention occurrences. This script runs the
resolution path on that mix and reports PER-TASK time balance from the Spark
REST API — the evidence a wall-clock number can't give, because a skewed join
can "pass" on wall-clock while one straggler task does 35% of the work.

Why the engine is skew-resilient, mechanism by mechanism:

1. Occurrence dedupe BEFORE any join (linking.resolve_against_entities:
   the ladder works on one row per distinct (span, type_key)). The groupBy
   that collapses occurrences partial-aggregates map-side, so the hot form
   contributes ONE combiner row per input partition to the shuffle — the
   35% head never lands on a single reducer.
2. The ladder's registry joins are salted (mention side pmod(xxhash64, S),
   entity side replicated S ways — linking.py EXACT tier), so even a hot
   key inside the vocabulary-sized join spreads over S reducers.
3. The occurrence fan-out join (m_all JOIN resolved) probes a
   vocabulary-sized relation: AQE plans it as a broadcast join, so the
   35%-hot probe side never shuffles at all.
4. Backstop: spark.sql.adaptive.skewJoin.enabled=true splits any oversized
   post-shuffle partition AQE still sees.

The A/B: the same job with AQE + broadcast + salting disabled
(--undefended) funnels the hot key through single tasks; the defended run
must hold max/median executorRunTime on the heaviest stage under a small
bound. Results recorded in BASELINE.md (round 5).

Usage:
  python tools/skewbench.py            # defended run, prints one JSON line
  python tools/skewbench.py --undefended   # contrast run (no AQE/broadcast/salt)
  python tools/skewbench.py --rows 1500000 # smaller (pytest uses this)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 4_000_000
HEAD_SHARE = 0.35
VOCAB = 5_000


def build_mentions(spark, rows: int):
    """rows mention occurrences; 35% are the head form, rest rotate a
    VOCAB-sized name vocabulary (deterministic, no data files needed)."""
    from pyspark.sql import functions as F

    head_hits = int(HEAD_SHARE * 20)
    r = spark.range(rows).withColumn("_m", F.col("id") % 20)
    tail = F.concat(
        F.lit("Name"), (F.col("id") % VOCAB).cast("string"), F.lit(" Tail")
    )
    return r.select(
        F.when(F.col("_m") < head_hits, F.lit("Primary User"))
        .otherwise(tail)
        .alias("span"),
        F.lit("person").alias("entity_type"),
    )


def build_registry(spark):
    from pyspark.sql import functions as F

    names = spark.range(VOCAB).select(
        F.concat(F.lit("Name"), F.col("id").cast("string"), F.lit(" Tail")).alias(
            "canonical_name"
        )
    ).unionByName(
        spark.createDataFrame([("Primary User",)], "canonical_name string")
    )
    return names.select(
        F.md5("canonical_name").alias("entity_id"),
        "canonical_name",
        F.lit("person").alias("entity_type"),
    )


def rest_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def heaviest_stage_ratio(spark):
    """max/median executorRunTime of the heaviest completed stage (REST API)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = rest_json(f"{base}/api/v1/applications/{app}/stages?status=COMPLETE")
    # heaviest by total executor run time, among stages with enough tasks
    # that a ratio is meaningful
    cands = [s for s in stages if s.get("numCompleteTasks", 0) >= 4]
    cands.sort(key=lambda s: s.get("executorRunTime", 0), reverse=True)
    out = []
    for s in cands[:6]:
        sid, att = s["stageId"], s["attemptId"]
        q = rest_json(
            f"{base}/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
            "?quantiles=0.5,1.0"
        )
        med, mx = q["executorRunTime"]
        out.append(
            {
                "stage": sid,
                "name": s.get("name", "")[:60],
                "tasks": s["numCompleteTasks"],
                "median_ms": med,
                "max_ms": mx,
                "max_over_median": round(mx / med, 2) if med > 0 else None,
            }
        )
    return out


def main() -> int:
    rows = ROWS
    defended = "--undefended" not in sys.argv
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    from dice_spark.session import get_spark

    extra = {"spark.ui.enabled": "true"}
    if not defended:
        extra.update(
            {
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.adaptive.skewJoin.enabled": "false",
                "spark.sql.autoBroadcastJoinThreshold": "-1",
            }
        )
    spark = get_spark(
        "skewbench",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=32,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from dice_spark.operators.linking import resolve_against_entities

    mentions = build_mentions(spark, rows).localCheckpoint(eager=True)
    registry = build_registry(spark).localCheckpoint(eager=True)

    t0 = time.monotonic()
    out = resolve_against_entities(mentions, registry, salt=8 if defended else 1)
    agg = out.groupBy("resolution_level").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("resolved_id").alias("n_entities"),
    )
    levels = {r["resolution_level"]: (r["n"], r["n_entities"]) for r in agg.collect()}
    wall = round(time.monotonic() - t0, 2)

    resolved_rows = sum(n for lvl, (n, _) in levels.items() if lvl != "NO_MATCH")
    head_rows = out.filter(
        (F.col("span") == "Primary User") & F.col("resolved_id").isNotNull()
    ).count()
    stages = heaviest_stage_ratio(spark)
    result = {
        "mode": "defended" if defended else "undefended",
        "rows": rows,
        "head_share": HEAD_SHARE,
        "wall_sec": wall,
        "resolved_rows": resolved_rows,
        "head_rows_resolved": head_rows,
        "levels": {k: v[0] for k, v in levels.items()},
        "heaviest_stages": stages,
        "max_ratio_heaviest": stages[0]["max_over_median"] if stages else None,
        # the straggler metric: the WORST task-time imbalance across the top
        # stages — a skewed join shows up here even when the skewed stage's
        # total runtime is small (at 100 TB that one straggler is hours)
        "worst_ratio": max(
            (s["max_over_median"] for s in stages if s["max_over_median"]),
            default=None,
        ),
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
