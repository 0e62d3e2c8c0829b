"""SparkSession construction with scale-appropriate defaults.

Centralizes the configs every operator in this engine assumes:

- **UTC session timezone** — deterministic timestamp semantics and parity
  with the DuckDB oracle (DuckDB timestamps are UTC-naive).
- **AQE on** (coalesce partitions + skew-join) — runtime re-planning is the
  first line of defense against skewed keys at 100 TB.
- **Arrow enabled** — every Pandas-UDF escape hatch transfers columnar.

Tests/local runs use ``local[*]`` with shuffle partitions ≈ cores; on a real
cluster callers pass ``master=None`` and size ``shuffle_partitions`` to the
data (or leave AQE to coalesce).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Single source of truth for local data locations used by tests/bench.
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOCAL_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "time_series_loader_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master=None`` keeps whatever the environment provides (cluster mode);
    tests pass ``local[N]`` explicitly or rely on the local default.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{LOCAL_CPUS}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = LOCAL_CPUS

    conf = {
        # local mode: driver JVM IS the executor — size it for the machine
        # (only effective at JVM launch; harmless if session already exists)
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Files: 128 MiB splits is the right default for parquet at scale.
        "spark.sql.files.maxPartitionBytes": "134217728",
        # Keep driver results bounded; operators must not collect data paths.
        "spark.driver.maxResultSize": "2g",
        "spark.ui.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


# The driver's testdata has shipped timestamps in two physical forms across
# rounds: parquet TIMESTAMP(NANOS) (read as bigint via the legacy conf) and
# plain naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ by Spark 4's
# inferTimestampNTZ default). Every operator in this engine assumes
# TimestampType (LTZ) with a UTC session timezone — identical wall-clock
# values either way, and the form the DuckDB oracle's naive timestamps
# hash-match. ``read_table`` normalizes both forms at the scan boundary.
_NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def normalize_timestamps(df):
    """Cast any TIMESTAMP_NTZ column to TimestampType (UTC session tz).

    A zero-cost reinterpretation under UTC; keeps the whole engine on one
    timestamp type so epoch arithmetic (``cast("double")``) stays legal.
    """
    from pyspark.sql import functions as F

    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


_READ_CONFS = (
    # TIMESTAMP(NANOS) → bigint instead of an illegal-type error
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    # naive TIMESTAMP(MICROS) → TimestampType directly (no cast node);
    # normalize_timestamps below stays as the fallback
    ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver parquet table, normalizing timestamp physical types.

    The two parquet confs are pinned only around the ``spark.read`` call
    (schema conversion happens there; execution uses the schema baked into
    the plan — verified with a NANOS file) and restored after, so reading
    a table does not silently change parquet semantics for unrelated
    subsequent reads in a shared session. Neither conf is honored as a
    per-DataFrameReader option, or this would be scoped that way.
    """
    from pyspark.sql import functions as F

    prev: dict[str, str | None] = {}
    for k, v in _READ_CONFS:
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    for c in _NANO_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # integer DIV keeps full precision (double division would not)
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
    return normalize_timestamps(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Load the driver's parquet tables from ``sf_dir`` as lazy DataFrames."""
    return {t: read_table(spark, sf_dir, t) for t in TABLES}
