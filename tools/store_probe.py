"""Incremental-dedup probe at the store ≫ batch operating point
(VERDICT r10 directive #4).

Every prior probe grew the BATCH; the daily 100 TB mode is the
opposite: a huge persisted signature store probed by a small increment.
The design claims (operators/dedup.py::incremental_dedup, 'Join shapes
at scale'):

1. batch-side cost is flat in store size — nothing scans store TEXT,
   only signatures; the band probe's store side carries
   (band_id, band_key, k BIGINTs);
2. the exact digest anti-join is SHUFFLE-FREE on the store side when
   the store is persisted bucketed by digest
   (`sources.sink.write_bucketed`).

This probe measures both: incremental_dedup wall at store sizes
1x/10x/100x of the sf0.1 corpus with a FIXED sf0.1 batch, with the
store persisted two ways — plain parquet and digest-bucketed table —
and additionally counts Exchange operators on the store→anti-join path
from the optimized plan.

Store synthesis reuses scale_probe's suffixed-token recipe (disjoint
per-copy vocabularies) so near-dup collision structure stays linear.
The store is built ONCE per factor (signature computation is ingest
cost, paid when each historical batch arrived — not probe cost) and
read back from disk like production state.

Usage: python tools/store_probe.py [factor ...]    # default 1 10 100
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.dedup import (
    doc_signatures,
    incremental_dedup,
)
from time_series_loader_spark.session import get_spark, read_table
from time_series_loader_spark.sources.sink import write_bucketed

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_BUCKETS = 32


def synth_store(spark, factor: int, out_path: str) -> None:
    """N-times signature store persisted as plain parquet: per-copy
    suffixed tokens (scale_probe recipe) so signatures differ across
    copies; copy 0 keeps the original text so the fixed batch still has
    realistic exact/near hits against every store size."""
    docs = read_table(spark, SRC, "documents")
    past = docs.where(F.col("doc_id") % 4 != 3).select("doc_id", "text")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = spark.range(factor).withColumnRenamed("id", "_copy")
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_c"), F.col("_copy").cast("string")),
        ),
        " ",
    )
    big = past.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_copy") * n_docs).alias("doc_id"),
        F.when(F.col("_copy") == 0, F.col("text")).otherwise(suffixed).alias("text"),
    )
    if big.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        big = big.repartition(spark.sparkContext.defaultParallelism)
    sig = doc_signatures(big, "text", "doc_id", n=3, num_hashes=16)
    sig.write.mode("overwrite").parquet(out_path)


def count_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange hashpartitioning", plan))


def probe(spark, store_df, batch, label: str) -> None:
    surv = incremental_dedup(
        batch, store_df, "text", "doc_id", n=3, num_hashes=16, bands=4,
        threshold=0.5, min_parallelism=spark.sparkContext.defaultParallelism,
    )
    surv.count()  # discarded warm-up (also builds batch-side checkpoints)
    best, rows = None, 0
    for _ in range(2):
        t0 = time.time()
        rows = incremental_dedup(
            batch, store_df, "text", "doc_id", n=3, num_hashes=16, bands=4,
            threshold=0.5,
            min_parallelism=spark.sparkContext.defaultParallelism,
        ).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"{label:28s} {best:6.2f}s  ({rows} survivors)")


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-store-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, SRC, "documents")
    batch = (
        docs.where(F.col("doc_id") % 4 == 3)
        .select("doc_id", "text")
        .localCheckpoint(eager=True)  # pin the batch: probe times the adjudication
    )
    print(f"# fixed batch: {batch.count()} docs from {SRC}")

    for factor in factors:
        path = f"/tmp/tsl_store_{factor}x"
        marker = os.path.join(path, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth_store(spark, factor, path)
            open(marker, "w").close()
            print(f"# store synth {factor}x: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        store = spark.read.parquet(path)
        n = store.count()
        probe(spark, store, batch, f"plain-parquet store {factor}x ({n})")

        # digest-bucketed persisted store: the documented shuffle-free
        # exact-anti-join shape — count store-side exchanges in the plan
        table = f"tsl_store_b{factor}x"
        if not spark.catalog.tableExists(table):
            t0 = time.time()
            write_bucketed(
                spark.read.parquet(path), table, ["digest"],
                num_buckets=NUM_BUCKETS, sort_cols=["digest"],
            )
            print(f"# bucketed write {factor}x: {time.time() - t0:.1f}s",
                  file=sys.stderr)
        bstore = spark.table(table)
        # plan evidence: exchanges in the digest anti-join alone
        anti_plain = batch.select(
            F.md5(F.coalesce(F.col("text"), F.lit(" "))).alias("digest")
        ).join(store.select("digest"), "digest", "left_anti")
        anti_bucket = batch.select(
            F.md5(F.coalesce(F.col("text"), F.lit(" "))).alias("digest")
        ).join(bstore.select("digest"), "digest", "left_anti")
        print(
            f"# anti-join exchanges: plain={count_exchanges(anti_plain)} "
            f"bucketed={count_exchanges(anti_bucket)}"
        )
        probe(spark, bstore, batch, f"bucketed store {factor}x ({n})")
    spark.stop()


if __name__ == "__main__":
    main()
