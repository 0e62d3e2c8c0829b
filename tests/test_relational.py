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


def test_salted_join_hot_matches_plain_join(spark):
    """Partial salting (r11): identical rows out, with explicit hot keys."""
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(k, 1000 + k) for k in range(2, 12)],
        "k INT, payload INT",
    )
    build = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 12)], "k INT, name STRING"
    )
    plain = {(r["payload"], r["name"]) for r in probe.join(build, "k").collect()}
    got = {
        (r["payload"], r["name"])
        for r in salted_join_hot(probe, build, "k", hot_keys=[1], n_salts=4).collect()
    }
    assert got == plain
    assert len(got) == 100


def test_salted_join_hot_detects_hot_keys(spark):
    """With hot_keys=None the Misra-Gries detector finds the dominant
    key(s); result must still equal the plain join."""
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame(
        [(7, i) for i in range(200)] + [(k % 20, 10_000 + k) for k in range(100)],
        "k INT, payload INT",
    )
    build = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 21)], "k INT, name STRING"
    )
    plain = {(r["payload"], r["name"]) for r in probe.join(build, "k").collect()}
    got = {
        (r["payload"], r["name"])
        for r in salted_join_hot(probe, build, "k", n_salts=4, detect_k=10).collect()
    }
    assert got == plain


def test_salted_join_hot_left_and_nulls(spark):
    """Left join semantics survive partial salting: unmatched and
    null-key probe rows keep NULL dim columns; cold build rows are not
    replicated and not dropped."""
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame(
        [(1, "hot1"), (1, "hot2"), (2, "cold"), (None, "nullk"), (99, "miss")],
        "k INT, v STRING",
    )
    build = spark.createDataFrame([(1, "d1"), (2, "d2")], "k INT, name STRING")
    out = {
        r["v"]: r["name"]
        for r in salted_join_hot(
            probe, build, "k", hot_keys=[1], n_salts=3, how="left"
        ).collect()
    }
    assert out == {"hot1": "d1", "hot2": "d1", "cold": "d2", "nullk": None, "miss": None}


def test_salted_join_hot_empty_hot_list_degrades_to_plain(spark):
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    build = spark.createDataFrame([(1, "d")], "k INT, name STRING")
    out = salted_join_hot(probe, build, "k", hot_keys=[]).collect()
    assert [(r["v"], r["name"]) for r in out] == [("a", "d")]


def test_salted_join_hot_replicates_only_hot_build_rows(spark):
    """The point of the partial form: cold build rows appear once in the
    pre-join build frame, hot rows n_salts times."""
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame([(1, 1), (2, 2)], "k INT, payload INT")
    build = spark.createDataFrame([(1, "hot"), (2, "cold")], "k INT, name STRING")
    # inspect the internal build union by reproducing it: the public
    # contract is row-multiplicity of the JOIN output, which collapses
    # multiplicity; so assert on the plan instead — the explode branch
    # must be filtered to the hot keys
    out = salted_join_hot(probe, build, "k", hot_keys=[1], n_salts=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "k#" in plan  # sanity: plan materialized
    # correctness of multiplicity: each probe row exactly once
    rows = out.collect()
    assert sorted((r["payload"], r["name"]) for r in rows) == [(1, "hot"), (2, "cold")]


def test_salted_joins_reject_build_preserving_how(spark):
    """r11 guard: the build side is replicated per salt, so right/full
    joins would emit n_salts copies of unmatched build rows — both
    salted forms must refuse loudly instead of silently corrupting
    multiplicity."""
    from time_series_loader_spark.operators.relational import salted_join_hot

    probe = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    build = spark.createDataFrame([(1, "d"), (2, "unmatched")], "k INT, name STRING")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(probe, build, "k", 4, how=how)
        with pytest.raises(ValueError):
            salted_join_hot(probe, build, "k", hot_keys=[1], how=how)
    # probe-preserving spellings still accepted
    assert salted_join(probe, build, "k", 4, how="left_semi").count() == 1
    assert salted_join_hot(probe, build, "k", hot_keys=[1], how="leftanti").count() == 0
