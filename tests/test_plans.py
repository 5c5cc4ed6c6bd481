"""Physical-plan assertions — the 100-TB contract, checked in CI.

These pin the plan shapes SCALE.md promises: store queries reach the parquet
scan as pushed filters (a 100-TB store read must prune at the source, not
post-scan), and the hot aggregations reuse one exchange instead of stacking
shuffles.
"""

from pyspark.sql import functions as F

from dice_spark.operators.projection import project_edges
from dice_spark.operators.propquery import PropQuery, apply_prop_query


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_prop_query_filters_push_to_parquet_scan(spark, tmp_path):
    """apply_prop_query predicates (context/status/pinned) must appear as
    PushedFilters on the parquet scan — at 100 TB the scan prunes row groups
    instead of reading the store and filtering after."""
    path = str(tmp_path / "props.parquet")
    spark.createDataFrame(
        [
            ("p1", "ctx", "alice knows bob", 0.9, 0.1, False, "ACTIVE", 0),
            ("p2", "other", "bob knows carol", 0.8, 0.1, True, "STALE", 0),
        ],
        "prop_id string, context_id string, text string, confidence double,"
        " decay double, pinned boolean, status string, level int",
    ).write.parquet(path)
    props = spark.read.parquet(path)
    out = apply_prop_query(
        props, PropQuery(context_id="ctx", statuses=["ACTIVE"], pinned=False)
    )
    plan = _plan(out)
    scan = plan[plan.index("PushedFilters") :].split("]", 1)[0]
    assert "context_id" in scan
    assert "status" in scan
    assert "pinned" in scan
    assert [r.prop_id for r in out.collect()] == ["p1"]


def test_project_edges_reuses_one_exchange(spark):
    """The rank-before-collect cap window partitions on the groupBy key, so
    the whole edge aggregation runs on ONE shuffle — the cap must not add an
    exchange."""
    classified = spark.range(64).select(
        F.lit("PROJECTED").alias("lifecycle"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("subj_id"),
        F.lit("o").alias("obj_id"),
        F.lit("knows").alias("predicate"),
        F.lit(0.9).alias("confidence"),
        F.lit("t").alias("text"),
        F.col("id").cast("string").alias("prop_id"),
    )
    plan = _plan(project_edges(classified))
    assert plan.count("Exchange") == 1
