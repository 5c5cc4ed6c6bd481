"""spark-submit CLI (dice_spark/cli.py): end-to-end run + resume idempotency.

The real --py-files invocation is exercised out-of-process in CI-less
sandboxes via main(argv) against the active test session — same code path
spark-submit drives (cli.main honors the already-active SparkSession).
"""

from __future__ import annotations

import json

from dice_spark.cli import build_parser, main


def test_parser_defaults():
    args = build_parser().parse_args(
        ["--input", "/x", "--warehouse", "/y"]
    )
    assert args.format == "parquet" and args.backend == "auto"
    assert args.perspective == "ALL" and not args.no_resume


def test_cli_run_and_resume(spark, tmp_path, capsys):
    from datetime import datetime, timezone

    from dice_spark.schemas import TRANSCRIPTS
    from dice_spark.storage import Warehouse

    rows = [
        ("conv-0", t, "user", f"Agent Zero works with Project Alpha{t}.", None,
         datetime(2026, 1, 1, 0, t, tzinfo=timezone.utc))
        for t in range(6)
    ]
    spark.createDataFrame(rows, TRANSCRIPTS).write.mode("overwrite").parquet(
        str(tmp_path / "transcripts")
    )
    argv = [
        "--input", str(tmp_path / "transcripts"),
        "--warehouse", str(tmp_path / "kg"),
        "--context-id", "cli", "--run-id", "r1",
    ]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["n_edges"] > 0 and first["n_chunks"] > 0

    # rerun resumes from processed_chunks: nothing new, warehouse unchanged
    assert main(argv[:-1] + ["r2"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["n_chunks"] == 0 and second["n_edges"] == 0
    wh = Warehouse(str(tmp_path / "kg"), spark)
    assert wh.read("edges").count() == first["n_edges"]
    # per-run stage counters persisted alongside lineage (one row per run)
    counters = wh.read("stage_counters")
    assert counters.count() == 2
    runs = {r["run_id"]: r for r in counters.collect()}
    assert runs["r1"]["n_edges"] == first["n_edges"] and runs["r1"]["n_turns"] == 6
    assert runs["r2"]["n_chunks"] == 0
