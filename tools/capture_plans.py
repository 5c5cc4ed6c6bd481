"""Capture .explain("formatted") for every declared query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [query ...]
  tag     e.g. r06  -> writes plans/r06/<query>_<suffix>.txt
  suffix  "before" (default) or "after"

Note: building some query DataFrames runs Spark jobs (eager checkpoints,
driver-side BFS); this tool is for plan capture, not timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "r06"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "before"
ONLY = set(sys.argv[3:])
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entry
    from dice_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "32MB"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in entry.queries().items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - capture the failure in the file
            plan = f"ERROR building/explaining {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
