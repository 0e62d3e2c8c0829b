"""Mergeable HLL sketch rollups (operators/sketches.py)."""

import os

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.sketches import hll_merge, hll_rollup


@pytest.fixture(scope="module")
def events(spark):
    # 5000 rows, 7 "days", user ids overlapping across days
    return spark.range(5000).selectExpr(
        "id % 7 AS day", "CAST(id % 1100 AS STRING) AS user"
    )


def test_union_of_parts_equals_direct_sketch(events):
    """The load-bearing property: merging per-day sketches answers the
    range query with the IDENTICAL estimate a direct scan would."""
    daily = hll_rollup(events, "user", ["day"])
    merged = hll_merge(daily).collect()[0]["n_distinct_est"]
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert merged == direct


def test_estimate_accuracy_and_subgroup_merge(events):
    daily = hll_rollup(events, "user", ["day"])
    rows = {r["day"]: r["n_distinct_est"] for r in daily.collect()}
    assert set(rows) == set(range(7))
    # lg_k=12 → ~2% RSE; assert a loose 5% band on the global estimate
    est = hll_merge(daily).collect()[0]["n_distinct_est"]
    exact = events.select("user").distinct().count()
    assert abs(est - exact) / exact < 0.05
    # weekend/weekday partial merges are themselves re-mergeable
    tagged = daily.withColumn("is_weekend", F.col("day") >= 5)
    partial = hll_merge(tagged, ["is_weekend"])
    assert partial.count() == 2
    re_merged = hll_merge(partial).collect()[0]["n_distinct_est"]
    assert re_merged == est


def test_sketch_survives_parquet_roundtrip(events, tmp_path):
    daily = hll_rollup(events, "user", ["day"])
    p = os.path.join(str(tmp_path), "sketches.parquet")
    daily.select("day", "sketch").write.parquet(p)
    loaded = events.sparkSession.read.parquet(p)
    est = hll_merge(loaded).collect()[0]["n_distinct_est"]
    assert est == hll_merge(daily).collect()[0]["n_distinct_est"]


def test_partition_invariance(events):
    a = hll_merge(hll_rollup(events, "user", ["day"])).collect()[0][
        "n_distinct_est"
    ]
    b = hll_merge(
        hll_rollup(events.repartition(13), "user", ["day"])
    ).collect()[0]["n_distinct_est"]
    assert a == b
