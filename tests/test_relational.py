"""Skew-handling relational helpers."""

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.relational import salted_join, top_k


def test_salted_join_matches_plain_join(spark):
    # skewed probe: 90% of rows share key 1
    probe = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 12)],
        "k INT, payload INT",
    )
    build = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 12)], "k INT, name STRING")
    plain = {(r["payload"], r["name"]) for r in probe.join(build, "k").collect()}
    salted = {
        (r["payload"], r["name"])
        for r in salted_join(probe, build, "k", n_salts=4).collect()
    }
    assert salted == plain
    assert len(salted) == 100


def test_salted_join_left(spark):
    probe = spark.createDataFrame([(1, "a"), (99, "b")], "k INT, v STRING")
    build = spark.createDataFrame([(1, "dim")], "k INT, name STRING")
    out = {r["v"]: r["name"] for r in salted_join(probe, build, "k", 3, how="left").collect()}
    assert out == {"a": "dim", "b": None}


def test_top_k(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i)) for i in range(10)] + [("g2", i, float(-i)) for i in range(5)],
        "g STRING, id INT, score DOUBLE",
    )
    out = top_k(df, ["g"], "score", k=3, tie_break=["id"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert sorted(by_g["g1"]) == [7, 8, 9]
    assert sorted(by_g["g2"]) == [0, 1, 2]
