"""Guard against driver-testdata physical-type drift.

The driver has shipped timestamps in two parquet forms across rounds:
TIMESTAMP(NANOS) (bigint under the legacy conf) and naive TIMESTAMP(MICROS)
(TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default). Round 2's
correctness run failed wholesale because ``cast(ts as double)`` is illegal on
NTZ. These tests read the REAL testdata through ``read_table`` and pin the
invariant every operator assumes: TimestampType (LTZ) after the scan
boundary, epoch arithmetic legal, values identical to the raw wall-clock.
"""

import os

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.session import normalize_timestamps, read_table

SF_DIR = os.environ.get("TSL_TEST_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

_TS_COLS = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}


@pytest.mark.parametrize("table,col", sorted(_TS_COLS.items()))
def test_read_table_yields_ltz_timestamp(spark, table, col):
    df = read_table(spark, SF_DIR, table)
    assert dict(df.dtypes)[col] == "timestamp"
    # the idiom the whole engine relies on must resolve
    row = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    assert row["lo"] is not None and row["hi"] >= row["lo"]


def test_normalize_timestamps_is_wallclock_identity(spark):
    # NTZ -> LTZ under a UTC session must preserve the displayed instant.
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-03-01 12:34:56.789' AS t_ntz, "
        "TIMESTAMP '2024-03-01 12:34:56.789' AS t_ltz"
    )
    out = normalize_timestamps(df)
    assert dict(out.dtypes) == {"t_ntz": "timestamp", "t_ltz": "timestamp"}
    r = out.select(
        F.date_format("t_ntz", "yyyy-MM-dd HH:mm:ss.SSS").alias("a"),
        F.date_format("t_ltz", "yyyy-MM-dd HH:mm:ss.SSS").alias("b"),
    ).collect()[0]
    assert r["a"] == r["b"] == "2024-03-01 12:34:56.789"


def test_stream_events_normalizes_ts(spark):
    import __spark_entry__ as entrymod

    sdf = entrymod._stream_events(spark, SF_DIR)
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    assert sdf.isStreaming
