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


def test_memory_search_probes_compile_to_take_ordered(spark, tmp_path):
    """memory_search's keyword pool is orderBy+limit over the store — it must
    compile to TakeOrderedAndProject (per-partition top-k + driver merge),
    never a global Sort of the corpus."""
    from pyspark.sql import functions as F2

    from dice_spark.functions.decay import effective_confidence

    path = str(tmp_path / "store.parquet")
    spark.createDataFrame(
        [(f"p{i}", f"text {i}", 0.9, 0.1) for i in range(50)],
        "prop_id string, text string, confidence double, decay double",
    ).write.parquet(path)
    store = spark.read.parquet(path).withColumn(
        "content_revised", F2.to_timestamp(F2.lit("2024-06-01 00:00:00"))
    )
    eff = effective_confidence(
        as_of=F2.to_timestamp(F2.lit("2024-12-31 00:00:00")),
        valid_from=F2.lit(None).cast("timestamp"),
        valid_to=F2.lit(None).cast("timestamp"),
        invalidated_at=F2.lit(None).cast("timestamp"),
    )
    pool = store.withColumn("_eff", eff).orderBy(
        F2.desc("_eff"), F2.asc("prop_id")
    ).limit(100)
    plan = _plan(pool)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan  # no global sort node


def test_default_contraster_joins_bounded_sides(spark):
    """The contrast pair join must read rank-capped sides: the executed plan
    carries the rn <= PAIR_CAP filter on BOTH window branches before the
    predicate equi-join."""
    from dice_spark.operators.contrast import PAIR_CAP, default_contraster

    mk = lambda tag: spark.createDataFrame(  # noqa: E731
        [(f"{tag}{i}", "likes", tag, f"{tag}o{i}", 0.5) for i in range(20)],
        "prop_id string, predicate string, subj_span string, obj_span string,"
        " confidence double",
    )
    pairs = default_contraster(mk("a"), mk("b"), "A", "B", target_count=1000)
    plan = _plan(pairs)
    # the rank cap runs BEFORE the join on both sides, and Spark pushes it
    # into a map-side WindowGroupLimit (partial top-k before the exchange)
    assert plan.count("<= 8") >= 2
    assert plan.count("WindowGroupLimit") >= 2
    assert pairs.count() == PAIR_CAP * PAIR_CAP


def test_project_prolog_adds_no_exchange(spark):
    """Prolog emission is string construction over the merged edges table:
    fact/confidence lines are a narrow projection and grounding is one
    bounded explode — the whole emission must not add a shuffle on top of
    the edges input (SCALE.md round-5)."""
    from dice_spark.operators.prolog import project_prolog

    edges = spark.range(32).select(
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("source_id"),
        F.lit("o").alias("target_id"),
        F.lit("WORKS_AT").alias("edge_type"),
        F.lit(0.9).alias("confidence"),
        F.array(F.lit("p1"), F.lit("p2")).alias("source_prop_ids"),
    )
    plan = _plan(project_prolog(edges))
    assert "Exchange" not in plan
    assert "Generate explode" in plan  # the bounded grounding fan-out
