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
    spark = df.sparkSession
    if dynamic:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    out = df.withColumn("p_date", F.to_date(ts_col))
    parts = ["p_date"]
    if granularity == "hour":
        out = out.withColumn("p_hour", F.hour(ts_col))
        parts.append("p_hour")
    elif granularity != "day":
        raise ValueError("granularity must be 'day' or 'hour'")
    out.write.mode(mode).partitionBy(*parts).parquet(path)


def read_time_partitioned(spark, path: str) -> DataFrame:
    """Read a partitioned layout; time filters on ``p_date``/``p_hour``
    prune directories at planning time (PartitionFilters in the scan)."""
    return spark.read.parquet(path)
