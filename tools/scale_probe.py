"""Scaling-slope probe for the steep families (SCALING.md).

Synthesizes N-times documents/events from sf0.1 — same recipe as the r4
10x probe (distinct per-copy token universes so no cross-copy near-dups;
shifted timelines + disjoint user ranges for events) — and times the two
families whose 10x slopes were steepest because their shuffles carry
data-proportional volume: `minhash_lsh` (signature + band-join shuffles)
and `gaps` (distributed time-sort).

Usage:
    python tools/scale_probe.py [factor ...]     # default: 1 10 100

Prints one line per (query, factor): best-of-2 wall seconds after a
discarded warm-up run, same discipline as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from time_series_loader_spark.session import get_spark, read_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def synth(spark, factor: int, out_dir: str) -> None:
    """N-times corpus with non-degenerate structure (see module doc)."""
    docs = read_table(spark, SRC, "documents")
    ev = read_table(spark, SRC, "events")
    copies = spark.range(factor).withColumnRenamed("id", "_copy")

    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    # suffix every token with the copy id (copy 0 keeps the original
    # text verbatim): token universes are disjoint across copies, so
    # near-dup pair counts scale linearly instead of quadratically
    suffixed = F.array_join(
        F.transform(
            F.split(F.col("text"), r"\s+"),
            lambda t: F.concat(t, F.lit("_c"), F.col("_copy").cast("string")),
        ),
        " ",
    )
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_copy") * n_docs).alias("doc_id"),
            F.when(F.col("_copy") == 0, F.col("text"))
            .otherwise(suffixed)
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )

    span = ev.agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")) + 3600)
    ).collect()[0][0]
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    big_ev = (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_copy") * n_events).alias("event_id"),
            F.timestamp_seconds(
                F.unix_timestamp("ts") + F.col("_copy") * span
            ).alias("ts"),
            (F.col("user_id") + F.col("_copy") * n_users).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )

    # embeddings ×N: copy 0 verbatim; later copies get a deterministic
    # per-copy rotation (cyclic shift of the vector by copy index) — far
    # from the originals in cosine terms, so ANN candidate counts scale
    # linearly instead of every copy colliding into one neighborhood.
    # Shift = ((copy-1) % (dim-1)) + 1 ∈ [1, dim-1]: NEVER 0 for copy>0
    # (a plain copy%dim shift would make copies dim, 2·dim, … identical
    # to the originals and silently break the linear-scaling invariant).
    emb = read_table(spark, SRC, "embeddings")
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").first()[0])
    shift = ((F.col("_copy") - 1) % (dim - 1)) + 1
    shifted = F.concat(
        F.slice(F.col("embedding"), shift + 1, dim),
        F.slice(F.col("embedding"), 1, shift),
    )
    big_emb = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("_copy") * n_vecs).alias("vec_id"),
        F.when(F.col("_copy") == 0, F.col("embedding"))
        .otherwise(shifted)
        .alias("embedding"),
    )

    big_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    big_emb.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # bench sections are probe-able too (r11: the lsh/verified
    # composition is a section of the minhash_lsh composite)
    qs = {**entrymod.queries(), **entrymod.bench_sections()}
    for factor in factors:
        out_dir = f"/tmp/tsl_scale_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth(spark, factor, out_dir)
            open(marker, "w").close()
            print(f"# synth {factor}x: {time.time() - t0:.1f}s", file=sys.stderr)
        probe_qs = tuple(
            name.strip()
            for name in os.environ.get(
                "SPARK_GRAFT_PROBE_QUERIES",
                "minhash_lsh,gaps_report,text_profile,corpus_filter",
            ).split(",")
            if name.strip()
        )
        unknown = [name for name in probe_qs if name not in qs]
        if unknown:
            raise SystemExit(
                f"unknown probe queries {unknown}; declared: {sorted(qs)}"
            )
        for qname in probe_qs:
            fn = qs[qname]
            fn(spark, out_dir).count()  # discarded warm-up
            best, rows = None, 0
            for _ in range(2):
                t0 = time.time()
                rows = fn(spark, out_dir).count()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            print(f"{qname:12s} {factor:>4}x  {best:6.2f}s  ({rows} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
