"""Sinks: time-partitioned parquet layout.

The reference's only sink is the in-memory frame (``get_dataframe``,
reference ``load_file.py:1886-1907``). At 100 TB the canonical layout is
date-partitioned parquet: one directory level per day (or hour), so time-
range queries prune partitions at planning time and incremental jobs
overwrite only the slices they touch (dynamic partition overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write ``df`` as parquet partitioned by a derived date column.

    ``granularity``: 'day' → one partition per date; 'hour' → nested
    date/hour partitions. ``dynamic=True`` only replaces partitions present
    in ``df`` (incremental re-loads don't clobber history).
    """
    out = df.withColumn("p_date", F.to_date(ts_col))
    parts = ["p_date"]
    if granularity == "hour":
        out = out.withColumn("p_hour", F.hour(ts_col))
        parts.append("p_hour")
    elif granularity != "day":
        raise ValueError("granularity must be 'day' or 'hour'")
    writer = out.write.mode(mode).partitionBy(*parts)
    if dynamic:
        # per-WRITE option, never the session conf: the r13 full-suite
        # run caught the old `spark.conf.set(...)` leaking dynamic mode
        # into every later partitioned overwrite in the session — under
        # which Spark writes no _SUCCESS marker and only replaces
        # partitions present in the new data (it silently broke the
        # dedup-store compaction's completeness protocol two modules away)
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def read_time_partitioned(spark, path: str) -> DataFrame:
    """Read a partitioned layout; time filters on ``p_date``/``p_hour``
    prune directories at planning time (PartitionFilters in the scan)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a BUCKETED parquet table (hash-clustered by
    ``bucket_cols`` into ``num_buckets`` files per partition).

    The 100 TB join strategy for repeated joins on the same key: two
    tables bucketed identically join with NO shuffle exchange on either
    side (Spark trusts the write-time hash clustering), and with
    ``sort_cols`` = join key the sort-merge join can skip its sorts too.
    One shuffle at write time buys every subsequent join/groupBy on the
    key. Bucketing metadata lives in the session catalog (saveAsTable —
    plain ``.parquet(path)`` writes can't carry it).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_packed_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    order_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize :func:`~time_series_loader_spark.operators.sampling.shard_pack`
    output as one parquet file per shard — the layout a training-data
    loader consumes (shard = one reader unit of ~budget tokens).

    Plan shape: ONE hash repartition on ``shard_col`` puts each shard's
    rows in a single task, and ``partitionBy(shard_col)`` routes them to
    `shard_id=N/` directories — so every shard directory holds exactly
    one file, regardless of how many shards share a task (the writer
    splits per partition value). ``order_col`` sorts rows WITHIN each
    task before writing, giving byte-deterministic shard files (same
    rows → same file), which makes reruns diffable and caches stable.

    Returns a manifest DataFrame (shard_id, n_rows, file count) computed
    from the WRITTEN data — what landed on disk, not what was planned —
    by scanning only parquet footers plus the partition listing.
    """
    spark = df.sparkSession
    out = df.repartition(F.col(shard_col))
    if order_col is not None:
        out = out.sortWithinPartitions(shard_col, order_col)
    out.write.mode(mode).partitionBy(shard_col).parquet(path)

    try:
        written = spark.read.parquet(path)
    except Exception:
        # an EMPTY input writes only _SUCCESS — no part files, nothing to
        # infer a schema from. A legitimately-filtered-to-zero corpus is
        # not an error: return an empty manifest with the right shape.
        return spark.createDataFrame(
            [],
            f"{shard_col} {df.schema[shard_col].dataType.simpleString()}, "
            "n_rows BIGINT, n_files BIGINT",
        )
    return (
        written.withColumn("_file", F.input_file_name())
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
    )


def read_shard(spark, path: str, shard_id: int) -> DataFrame:
    """Read ONE shard from a packed layout. The equality filter on the
    partition column prunes to the single `shard_id=N/` directory at
    planning time — a reader fleet pulling shard i each touches one
    file, never the whole dataset."""
    return spark.read.parquet(path).where(F.col("shard_id") == shard_id)


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
    mode: str = "error",
) -> dict:
    """Compact a small-file parquet layout into ~``target_bytes`` files.

    The 100 TB maintenance op: streaming/incremental writers leave
    thousands of KB-sized files per table, and every later scan pays one
    task + one footer read per file (plus NameNode/liststore pressure).
    This rewrites ``path`` into ``ceil(total_bytes / target_bytes)``
    files via ONE round-robin repartition — the shuffle is the
    unavoidable price of re-binning bytes; schedule it off-peak and
    partition-slice big tables (compact each `date=…/` directory
    separately) rather than compacting 100 TB in one job.

    Sizes come from the filesystem listing (Hadoop FS API — works for
    file://, hdfs://, s3a://), so the plan is sized by BYTES, not rows.
    Writes to ``out_path`` (refusing to overwrite unless
    ``mode='overwrite'``) — swapping the new layout in place belongs to
    the table catalog / a rename, never to a live rewrite of the input.
    Returns {in_files, in_bytes, out_files}.
    """
    import math

    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    in_files = in_bytes = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        in_files += 1
        in_bytes += st.getLen()
    if in_files == 0:
        # a directory holding only markers (_SUCCESS, dotfiles) has no
        # schema to infer — mirror write_packed_shards' empty-write path
        return {"in_files": 0, "in_bytes": 0, "out_files": 0}
    n_out = max(1, math.ceil(in_bytes / target_bytes))
    spark.read.parquet(path).repartition(n_out).write.mode(mode).parquet(out_path)
    return {"in_files": in_files, "in_bytes": in_bytes, "out_files": n_out}


def colocated_join(
    spark, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket key.

    With matching bucket specs the physical plan contains no shuffle
    Exchange (guarded in tests/test_plans.py) — each task joins bucket i
    of both sides; at 1000 executors this is the only join shape whose
    network cost is ZERO regardless of fact-table size.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
