"""Physical-plan regression guards.

Correctness tests can't see a lost filter pushdown or a broadcast that
became a sort-merge join — these assert the plan shapes SCALING.md claims.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(entry.q_tpch_q6_like(spark, SF))
    assert "PushedFilters: [" in plan
    # the shipdate range predicate must be in the scan, not a post-filter
    assert "l_shipdate" in plan.split("PushedFilters")[1][:300]


def test_column_pruning(spark):
    plan = _plan(entry.q_tpch_q6_like(spark, SF))
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "l_extendedprice" in read_schema
    assert "l_partkey" not in read_schema  # unused columns pruned


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(entry.q_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3  # customer/nation/region
    assert "SortMergeJoin" not in plan


def test_asof_single_sort_single_window(spark):
    plan = _plan(entry.q_asof_nearest_1h(spark, SF))
    # one Window operator evaluates both neighbor frames over one Sort of
    # the unioned timeline (per bucket)
    window_sorts = [
        l for l in plan.split("\n") if l.strip().startswith("+- Sort") or "- Sort [" in l
    ]
    assert len([l for l in plan.split("\n") if "Window [" in l]) <= 2
    assert len(window_sorts) <= 3  # bucket window sort + tiny bounds sorts


def test_resample_partial_aggregation(spark):
    plan = _plan(entry.q_resample_1h_mean(spark, SF))
    assert "partial_sum" in plan or "partial" in plan.lower()
    assert plan.count("Exchange") <= 2  # one agg shuffle (+AQE reuse)


def test_grouped_window_partitions_by_key(spark):
    plan = _plan(entry.q_sessionize(spark, SF))
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" not in plan


def test_partitioned_sink_prunes(spark, tmp_path):
    """Date-partitioned layout: a date filter must become a PartitionFilter
    (directory pruning), not a data filter."""
    from datetime import datetime, timedelta

    from time_series_loader_spark.sources.sink import (
        read_time_partitioned,
        write_time_partitioned,
    )

    rows = [
        (datetime(2024, 1, 1 + d, h), float(d * 24 + h))
        for d in range(3)
        for h in range(4)
    ]
    df = spark.createDataFrame(rows, "ts TIMESTAMP, value DOUBLE")
    path = str(tmp_path / "events_parted")
    write_time_partitioned(df, path, "ts", granularity="day")

    back = read_time_partitioned(spark, path)
    filtered = back.where(F.col("p_date") == "2024-01-02")
    assert filtered.count() == 4
    plan = _plan(filtered)
    pf = plan.split("PartitionFilters:")[1][:200]
    assert "p_date" in pf

    # dynamic overwrite: rewriting one day leaves the others intact
    day2 = spark.createDataFrame(
        [(datetime(2024, 1, 2, 12), 999.0)], "ts TIMESTAMP, value DOUBLE"
    )
    write_time_partitioned(day2, path, "ts", granularity="day")
    again = read_time_partitioned(spark, path)
    assert again.where(F.col("p_date") == "2024-01-01").count() == 4  # untouched
    assert again.where(F.col("p_date") == "2024-01-02").count() == 1  # replaced
    # r13 regression pin: dynamic mode must ride the WRITE, never the
    # session conf — the leaked session conf suppressed _SUCCESS markers
    # for every later partitioned overwrite and broke the dedup-store
    # compaction's completeness protocol two modules away
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static").lower()
        == "static"
    )


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed identically on the join key must join with NO
    shuffle exchange on either side (write-time clustering is reused)."""
    from time_series_loader_spark.sources.sink import colocated_join, write_bucketed

    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    write_bucketed(facts, "t_facts_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "f"))
    write_bucketed(dims, "t_dims_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "d"))
    try:
        # disable auto-broadcast so the test exercises the SMJ path a big-big
        # join would take; bucketing must remove BOTH exchanges
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "t_facts_b", "t_dims_b", ["k"])
        assert joined.count() == 100
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # groupBy on the bucket key also reuses the clustering: no exchange
        agg = spark.table("t_facts_b").groupBy("k").agg(F.sum("v").alias("s"))
        agg.count()
        assert "Exchange" not in _plan(agg)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_min_parallelism_fanout_is_opt_in(spark):
    """The r5 kernel fan-out must be surgical: absent by default (a real
    corpus must never be reshuffled just to run a kernel), present as a
    round-robin exchange when requested on an under-partitioned source."""
    from time_series_loader_spark.operators.text import text_profile

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert docs.rdd.getNumPartitions() == 1  # the premise: single-file scan

    default_plan = _plan(text_profile(docs, "text", "doc_id"))
    assert "RoundRobinPartitioning" not in default_plan  # no silent reshuffle

    fanned = text_profile(docs, "text", "doc_id", min_parallelism=8)
    assert "RoundRobinPartitioning" in _plan(fanned)
    # already-parallel input: fan-out is a no-op even when requested
    wide = docs.repartition(16)
    assert "16" in str(wide.rdd.getNumPartitions())
    noop = text_profile(wide, "text", "doc_id", min_parallelism=8)
    assert _plan(noop).count("RoundRobinPartitioning") == 1  # only the explicit 16


def test_ewm_keyed_one_wide_exchange_no_single_partition(spark):
    """EWMA keyed plan (SCALING.md r5 row): the (key, block) prefix
    window must reuse the (key) exchange (subset-key clustering), the
    block-summary stitch must come back as a broadcast, and nothing may
    collapse to a single partition."""
    from time_series_loader_spark.operators.ewm import ewm_mean
    from time_series_loader_spark.session import read_table

    ev = read_table(spark, SF, "events").select("user_id", "ts", "value")
    plan = _plan(ewm_mean(ev, "ts", "value", 0.3, group_cols=["user_id"]))
    assert "Exchange SinglePartition" not in plan
    # main pass + summary re-scan pass: at most 2 hash exchanges
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "BroadcastHashJoin" in plan  # summary stitch broadcast, not SMJ
    assert "SortMergeJoin" not in plan


def test_ewm_unkeyed_stays_bucketed(spark):
    """Unkeyed EWMA must take the time-bucket + carry-table path: no
    single-partition window over the whole timeline."""
    from time_series_loader_spark.operators.ewm import ewm_mean
    from time_series_loader_spark.session import read_table

    ev = (
        read_table(spark, SF, "events")
        .where(F.col("user_id") == 1)
        .select("ts", "value")
    )
    plan = _plan(ewm_mean(ev, "ts", "value", 0.3, num_buckets=4))
    assert "Exchange SinglePartition" not in plan


def test_incremental_dedup_store_side_stays_narrow(spark):
    """The batch-vs-store band probe must not wide-shuffle the batch
    frame itself: drop lists are increment-sized (broadcast by AQE) and
    the store side is consumed as signatures only."""
    from time_series_loader_spark.operators.dedup import (
        doc_signatures,
        incremental_dedup,
    )
    from time_series_loader_spark.session import read_table

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    store = doc_signatures(
        docs.where(F.col("doc_id") % 4 != 3), "text", "doc_id"
    ).localCheckpoint(eager=True)
    out = incremental_dedup(
        docs.where(F.col("doc_id") % 4 == 3), store, "text", "doc_id"
    )
    # AQE sizes the drop list at runtime; collect() executes THIS df's
    # QueryExecution (count() would plan a separate one) so the adaptive
    # FINAL plan is inspectable afterwards
    out.collect()
    plan = _plan(out)
    assert "isFinalPlan=true" in plan
    # final survivors = checkpointed batch anti-joined against the
    # increment-sized drop list — AQE must have broadcast it, never SMJ
    assert any(
        "BroadcastHashJoin" in line and "LeftAnti" in line
        for line in plan.splitlines()
    )
