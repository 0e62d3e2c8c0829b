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


def test_heavy_hitters_exact_matches_groupby(spark):
    """MG candidates + exact verify must equal the exact definition
    (every key with count > N/k) computed by a plain groupBy."""
    import random

    from pyspark.sql import functions as F

    from time_series_loader_spark.operators.sketches import heavy_hitters

    rng = random.Random(7)
    # zipf-ish skew: a few hot keys over a large cold tail
    rows = (
        [("hot_a",)] * 900
        + [("hot_b",)] * 500
        + [("warm",)] * 120
        + [(f"cold_{rng.randrange(5000)}",) for _ in range(3000)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k"]).repartition(13)
    got = {
        r["k"]: (r["n"], r["n_total"])
        for r in heavy_hitters(df, "k", k=20).collect()
    }
    n_total = len(rows)
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
        if r["n"] > n_total / 20
    }
    assert {k: v[0] for k, v in got.items()} == exact
    assert all(v[1] == n_total for v in got.values())
    # partition invariance: a different physical layout, same answer
    re = {
        r["k"]: r["n"]
        for r in heavy_hitters(df.repartition(3), "k", k=20).collect()
    }
    assert re == exact


def test_heavy_hitters_approximate_mode_bounds(spark):
    from time_series_loader_spark.operators.sketches import heavy_hitters

    rows = [("x",)] * 1000 + [(f"c{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, ["k"]).repartition(7)
    out = {r["k"]: r["n"] for r in heavy_hitters(df, "k", k=10, exact_verify=False).collect()}
    # the overwhelming hitter always survives the single-scan mode, and
    # its MG count is a lower bound within the merged-summary band
    assert "x" in out
    n_total = len(rows)
    assert 1000 - n_total / 11 <= out["x"] <= 1000
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "k", k=1)


def test_heavy_hitters_review_regressions(spark):
    """r8 review findings, both reproduced against the old code: (1) a
    plan the optimizer folds to zero partitions raised a bare
    StopIteration; (2) a real data key equal to the old in-band string
    sentinel was silently swallowed into the row total."""
    from pyspark.sql import functions as F

    from time_series_loader_spark.operators.sketches import heavy_hitters

    rows = [("x",)] * 10 + [("y",)] * 2
    df = spark.createDataFrame(rows, ["k"])
    # optimizer-emptied plan: empty result, not StopIteration
    assert heavy_hitters(df.where(F.lit(False)), "k", k=5).collect() == []
    # a hot key that equals the OLD sentinel literal must be found
    evil = "\x00__rows__"
    df2 = spark.createDataFrame([(evil,)] * 10 + [("y",)] * 2, ["k"])
    got = {r["k"]: (r["n"], r["n_total"]) for r in heavy_hitters(df2, "k", k=5).collect()}
    assert got.get(evil) == (10, 12), got
