"""Scale shape of the distributed BPE trainer
(functions/bpe.py::train_bpe_merges).

The trainer's claim: the CORPUS term appears exactly once (the initial
word-frequency aggregation); every per-merge iteration is
VOCABULARY-sized. This probe separates the two terms by timing
``n_merges=0`` (vocab build + checkpoint only) against ``n_merges=10``
on the same input — per-merge cost = (T10 − T0) / 10 — across two
independent axes:

- **vocab axis**: every token suffixed per copy id (the scale_probe
  disjoint-vocabulary recipe), so V copies give V× the vocabulary AND
  V× the corpus. Per-merge cost should grow ~linearly in V.
- **corpus axis**: plain row duplication (same 31-word vocabulary,
  C× the corpus). Per-merge cost should stay FLAT — only T0 grows.

Usage: python tools/bpe_train_probe.py [factors ...]   # default 1 10 100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N_MERGES = 10


def synth(spark, factor: int, vocab_axis: bool):
    from time_series_loader_spark.session import read_table

    docs = read_table(spark, SRC, "documents").select("text")
    if factor == 1:
        return docs
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    out = docs.crossJoin(copies)
    if vocab_axis:
        # per-copy token suffix: "word" -> "word_<copy>" for every
        # token (disjoint per-copy vocabularies, the scale_probe recipe)
        out = out.select(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_"), F.col("copy").cast("string")),
            ).alias("text")
        )
    return out.select("text")


def time_train(spark, df, n_merges: int) -> float:
    from time_series_loader_spark.functions.bpe import train_bpe_merges

    t0 = time.time()
    train_bpe_merges(df, "text", n_merges=n_merges, min_count=2)
    return time.time() - t0


def main():
    from time_series_loader_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'axis':>7} {'V/C':>5} {'vocab':>9} {'T0 (corpus pass)':>17} "
          f"{'T10':>8} {'per-merge':>10}")
    for axis, vocab_axis in (("vocab", True), ("corpus", False)):
        for f in factors:
            df = synth(spark, f, vocab_axis).localCheckpoint(eager=True)
            n_vocab = (
                df.select(F.explode(F.split("text", " ")).alias("w"))
                .where(F.col("w") != "")
                .agg(F.countDistinct("w"))
                .collect()[0][0]
            )
            time_train(spark, df, 0)  # warm-up
            t0 = min(time_train(spark, df, 0) for _ in range(2))
            t10 = min(time_train(spark, df, N_MERGES) for _ in range(2))
            print(
                f"{axis:>7} {f:>5} {n_vocab:>9} {t0:>16.2f}s {t10:>7.2f}s "
                f"{(t10 - t0) / N_MERGES:>9.3f}s",
                flush=True,
            )
            df.unpersist()


if __name__ == "__main__":
    main()
