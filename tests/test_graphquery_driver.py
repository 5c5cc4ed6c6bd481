"""Driver-BFS fast path must match the distributed frontier loop exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dice_spark.operators.graphquery import neighborhood, path_between


@pytest.fixture()
def edges(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("a", "f"), ("f", "d"), ("g", "h"),  # shortcut + disconnected pair
        ("b", "f"), ("e", "i"), ("i", "j"),
    ]
    return spark.createDataFrame(pairs, "source_id string, target_id string")


def _force(monkeypatch, value):
    monkeypatch.setenv("DICE_BFS_DRIVER_MAX_EDGES", str(value))


def test_neighborhood_paths_agree(spark, edges, monkeypatch):
    _force(monkeypatch, 10_000)
    drv = sorted(map(tuple, neighborhood(edges, "a", max_depth=3).collect()))
    _force(monkeypatch, 0)
    dist = sorted(map(tuple, neighborhood(edges, "a", max_depth=3).collect()))
    assert drv == dist
    assert drv  # non-empty


def test_path_between_paths_agree(spark, edges, monkeypatch):
    for frm, to in [("a", "e"), ("a", "j"), ("a", "g"), ("a", "a")]:
        _force(monkeypatch, 10_000)
        drv = path_between(edges, frm, to, max_depth=5)
        _force(monkeypatch, 0)
        dist = path_between(edges, frm, to, max_depth=5)
        assert drv == dist, (frm, to, drv, dist)


def test_path_between_depth_limit_agrees(spark, edges, monkeypatch):
    _force(monkeypatch, 10_000)
    drv = path_between(edges, "a", "j", max_depth=2)
    _force(monkeypatch, 0)
    dist = path_between(edges, "a", "j", max_depth=2)
    assert drv == dist == None  # noqa: E711 - unreachable within depth
