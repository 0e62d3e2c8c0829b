"""Streaming incremental dedup: each micro-batch adjudicated against a
persistent signature store — the streaming embodiment of
``operators.dedup.incremental_dedup`` (the daily-crawl pattern run
continuously).

Shape: a file-source stream → ``foreachBatch``. Per micro-batch:

1. read the signature store (all batches appended so far — id + digest
   + k minhashes per retained doc, NO text);
2. ``incremental_dedup(batch, store)``;
3. write survivors AND their signature rows, each into a
   ``batch_id=N`` subdirectory with ``mode=overwrite``.

Step 3 is the standard idempotent-``foreachBatch`` contract: Structured
Streaming guarantees at-least-once execution of a batch id, so a
replayed batch OVERWRITES its own subdirectory instead of double-
appending — the (store, survivors) state is exactly-once as long as
writes are keyed by batch id. Batch ids are processed sequentially, so
the store a batch sees always contains exactly the survivors of all
prior batches (the restart test pins this).

Scale: the store is signature-width (≈ id + 17×32 B per doc); at 100 TB
corpus scale persist it bucketed by digest (see ``doc_signatures``) and
compact the per-batch subdirectories periodically — both are plain
parquet-table maintenance, orthogonal to the streaming logic here.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _read_store(
    spark: SparkSession,
    store_path: str,
    id_field,
    num_hashes: int,
    before_batch_id: int,
) -> DataFrame:
    """Signatures of every batch STRICTLY BEFORE ``before_batch_id``.

    The filter is load-bearing for exactly-once: a micro-batch that
    crashed after its store write and is REPLAYED would otherwise read
    its own previous partial output, self-dedup to empty, and overwrite
    its survivors away. Only a genuinely-missing store path takes the
    bootstrap branch — any other read failure must surface, because
    deduping against a silently-empty store admits duplicates
    irreversibly."""
    from pyspark.errors import AnalysisException

    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    try:
        return (
            spark.read.parquet(store_path)
            .where(F.col("batch_id") < before_batch_id)
            .select(id_field.name, "digest", *mh_cols)
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        schema = StructType([id_field])
        empty = spark.createDataFrame([], schema)
        out = empty.withColumn("digest", F.lit(None).cast("string"))
        for c in mh_cols:
            out = out.withColumn(c, F.lit(None).cast("string"))
        return out


def incremental_dedup_stream(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    store_path: str,
    survivors_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Start the stream; returns the StreamingQuery.

    ``available_now=True`` drains everything pending then stops (the
    batch-backfill trigger); ``False`` runs continuously.
    ``max_files_per_trigger`` bounds batch size (and, in tests, forces
    one micro-batch per input file so cross-batch semantics are real).
    """
    from time_series_loader_spark.operators.dedup import incremental_dedup

    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    id_field = schema[id_col]

    def process(bdf: DataFrame, batch_id: int) -> None:
        store = _read_store(spark, store_path, id_field, num_hashes, batch_id)
        surv = incremental_dedup(
            bdf, store, text_col, id_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
        ).localCheckpoint(eager=True)  # consumed by BOTH writes below
        surv.drop("digest", *mh_cols).write.mode("overwrite").parquet(
            f"{survivors_path}/batch_id={batch_id}"
        )
        surv.select(id_col, "digest", *mh_cols).write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}"
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(input_path)
    writer = (
        sdf.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .queryName(f"tsl_incr_dedup_{uuid.uuid4().hex[:12]}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
