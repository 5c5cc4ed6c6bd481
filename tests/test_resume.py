"""Resumability: checkpoint anti-join + MERGE idempotency (SURVEY.md §2.1/§5).

Simulates a kill between stages: first run processes a prefix of conversations
and records processed_chunks; the rerun over the full input must (a) skip
already-claimed windows, (b) produce no duplicate triples after MERGE.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from dice_spark.operators.assembly import assemble_windows
from dice_spark.pipeline import run_pipeline
from dice_spark.schemas import TRANSCRIPTS
from dice_spark.storage import Warehouse


def _transcripts(spark, convs=4, turns=6):
    rows = []
    for c in range(convs):
        for t in range(turns):
            rows.append(
                (f"conv-{c}", t, "user", f"Agent {c} works with Project Alpha{t}.", None,
                 datetime(2026, 1, 1, c, t, tzinfo=timezone.utc))
            )
    return spark.createDataFrame(rows, TRANSCRIPTS)


def test_resume_skips_processed_and_is_idempotent(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"), spark)
    full = _transcripts(spark)

    # Run 1: only the first two conversations reach the pipeline (the "crash"
    # happens before the rest are processed).
    part1 = full.filter(F.col("conv_id").isin("conv-0", "conv-1"))
    out1 = run_pipeline(part1, context_id="resume", min_confidence=0.5)
    wh.merge("edges", out1["edges"], keys=["edge_ref"])
    chunks1 = out1["chunks"].select(
        F.lit("resume").alias("context_id"), "conv_id", "window_start", "window_end",
        "content_hash", F.current_timestamp().alias("processed_at"),
    )
    wh.merge("processed_chunks", chunks1, keys=["conv_id", "content_hash"])
    n_edges_1 = wh.read("edges").count()
    assert n_edges_1 > 0

    # Run 2: full input, resuming against the checkpoint table.
    processed = wh.read("processed_chunks")
    out2 = run_pipeline(full, context_id="resume", processed_chunks=processed, min_confidence=0.5)
    # claimed windows are skipped -> only conv-2/conv-3 chunks remain
    remaining_convs = {r["conv_id"] for r in out2["chunks"].select("conv_id").distinct().collect()}
    assert remaining_convs == {"conv-2", "conv-3"}

    wh.merge("edges", out2["edges"], keys=["edge_ref"])
    wh.merge(
        "processed_chunks",
        out2["chunks"].select(
            F.lit("resume").alias("context_id"), "conv_id", "window_start", "window_end",
            "content_hash", F.current_timestamp().alias("processed_at"),
        ),
        keys=["conv_id", "content_hash"],
    )
    edges = wh.read("edges")
    assert edges.count() == edges.select("edge_ref").distinct().count()

    # Run 3 (full replay): nothing new to process, edge set unchanged.
    processed = wh.read("processed_chunks")
    out3 = run_pipeline(full, context_id="resume", processed_chunks=processed, min_confidence=0.5)
    assert out3["chunks"].count() == 0
    before = edges.count()
    wh.merge("edges", out3["edges"], keys=["edge_ref"])
    assert wh.read("edges").count() == before


def test_warehouse_merge_semantics(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh2"), spark)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    wh.merge("t", df1, keys=["k"])
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    wh.merge("t", df2, keys=["k"])
    got = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # new rows win on key collision
    assert len(wh.snapshots("t")) == 2


def test_pin_unpin_and_find_pinned(spark, tmp_path):
    """Store-level pinning parity (PinningTest.kt): pin/unpin flip and
    persist the flag via MERGE, a missing id matches nothing, findPinned
    returns only pinned rows in the context, and the pinned query filter
    selects each side."""
    from dice_spark.operators.propquery import PropQuery, apply_prop_query
    from dice_spark.storage import Warehouse, find_pinned, set_pinned

    wh = Warehouse(str(tmp_path / "wh"), spark)
    wh.overwrite(
        "propositions",
        spark.createDataFrame(
            [
                ("p1", "ctx", "a", 0.8, False),
                ("p2", "ctx", "b", 0.8, False),
                ("p3", "other", "c", 0.8, False),
            ],
            "prop_id string, context_id string, text string,"
            " confidence double, pinned boolean",
        ),
    )

    assert set_pinned(wh, ["p1"], True) == 1
    assert {r.prop_id for r in find_pinned(wh, "ctx").collect()} == {"p1"}
    # persisted: a fresh read sees the flag
    assert wh.read("propositions").filter("pinned").count() == 1
    # missing id -> 0 matched (reference returns null), store untouched
    assert set_pinned(wh, ["nope"], True) == 0
    assert wh.read("propositions").count() == 3

    # the pinned query filter selects pinned or unpinned (PinningTest.kt)
    props_ctx = wh.read("propositions")
    got_pinned = apply_prop_query(props_ctx, PropQuery(context_id="ctx", pinned=True))
    got_unpinned = apply_prop_query(props_ctx, PropQuery(context_id="ctx", pinned=False))
    assert {r.prop_id for r in got_pinned.collect()} == {"p1"}
    assert {r.prop_id for r in got_unpinned.collect()} == {"p2"}

    assert set_pinned(wh, ["p1"], False) == 1
    assert find_pinned(wh).count() == 0


def test_json_warehouse_merge_round_trip(spark, tmp_path):
    """JsonFilePropositionRepository-parity backend (proposition/store/
    JsonFilePropositionRepository.kt:51-230): JSON-lines snapshots, atomic
    pointer flip, MERGE semantics identical to the parquet warehouse."""
    from dice_spark.storage import JsonWarehouse, make_warehouse

    wh = make_warehouse(spark, str(tmp_path / "jwh"), backend="json")
    assert isinstance(wh, JsonWarehouse)
    df1 = spark.createDataFrame([("k1", 1), ("k2", 1)], "k string, v int")
    wh.merge("t", df1, keys=["k"])
    df2 = spark.createDataFrame([("k2", 2), ("k3", 2)], "k string, v int")
    wh.merge("t", df2, keys=["k"])
    got = {r["k"]: r["v"] for r in wh.read("t").collect()}
    assert got == {"k1": 1, "k2": 2, "k3": 2}  # new rows win on key
    # the snapshot files are human-inspectable json lines
    import glob
    import json as _json

    import os as _os

    snap_files = [
        f
        for f in glob.glob(str(tmp_path / "jwh" / "t" / "snap-*" / "part-*.json"))
        # 3 rows over 4+ shuffle partitions leave some part files empty;
        # glob order is filesystem-dependent, so pick a non-empty one
        if _os.path.getsize(f) > 0
    ]
    assert snap_files
    line = open(snap_files[0]).readline()
    assert line.strip().startswith("{") and _json.loads(line)


def test_json_warehouse_schema_round_trip(spark, tmp_path):
    """The _current pointer persists df.schema.json(), so a JSON round-trip
    keeps timestamp types (no string coercion on a later merge), keeps
    all-null columns, and can read back a committed EMPTY table — the three
    cases bare spark.read.json inference gets wrong."""
    import datetime

    from pyspark.sql import types as T

    from dice_spark.storage import make_warehouse

    wh = make_warehouse(spark, str(tmp_path / "jwh2"), backend="json")
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("nul", T.DoubleType()),
        ]
    )
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5)
    wh.overwrite("t", spark.createDataFrame([("a", ts, None)], schema))
    back = wh.read("t")
    assert back.schema == schema  # timestamp stays timestamp, null col kept
    assert back.collect()[0]["ts"] == ts
    # merge after round-trip must not union string vs timestamp
    wh.merge("t", spark.createDataFrame([("b", ts, 1.5)], schema), keys=["k"])
    merged = wh.read("t")
    assert merged.schema["ts"].dataType == T.TimestampType()
    assert merged.count() == 2
    # an empty committed table (e.g. a batch with zero edges) reads back
    wh.overwrite("empty", spark.createDataFrame([], schema))
    assert wh.read("empty").count() == 0
    assert wh.read("empty").schema == schema
