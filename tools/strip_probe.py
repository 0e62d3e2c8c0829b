"""Scale shape of surgical decontamination
(decontam.py::strip_contamination).

The claim (SCALING.md r12): positional windows are corpus-sized, but
non-hit windows die map-side against the broadcast benchmark, so the
position explode/distinct and the whole rebuild run on
CONTAMINATION-sized data. Two axes:

- **corpus axis**: corpus ×{1,10,100} with a FIXED absolute number of
  contaminated docs. Wall should scale like one corpus projection
  (window build + broadcast probe), with the rebuild share constant.
- **contamination axis**: fixed corpus, contaminated-doc fraction
  ×{1%, 10%, 50%}. Wall growth here isolates the contamination-sized
  stages (position explode, touched-doc posexplode + anti-join +
  groupBy rebuild).

Corpus synthesis (deterministic): base docs of 120 unique-namespace
tokens; a contaminated doc embeds the 12-token benchmark sentence
mid-document. The benchmark is the one sentence's 8-grams (5 grams) —
eval-suite-sized, always broadcast.

The r12 baseline run of this probe (pre-anchor-prefilter: 5.8 / 45 /
537 s on the corpus axis) exposed the window-string build as the
dominant term and forced `contaminated_positions`' anchor prefilter;
the probe now measures the anchored form (2.1 / 6.8 / 43.3 s — best
case: this rig's clean docs share no tokens with the benchmark). Both
sets of numbers are recorded in SCALING.md r12.

Usage: python tools/strip_probe.py   # runs both axes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_DOCS = 20_000
BENCH_SENT = "the secret eval answer is forty two exactly so there now"


def synth(spark, n_docs: int, n_contam: int):
    bench_mid = F.lit(" " + BENCH_SENT + " ")
    body_a = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.concat(F.lit("d"), F.col("id"), F.lit("w"), i),
        ),
    )
    body_b = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(61), F.lit(120)),
            lambda i: F.concat(F.lit("d"), F.col("id"), F.lit("w"), i),
        ),
    )
    # first n_contam ids get the benchmark sentence spliced mid-doc
    text = F.when(
        F.col("id") < n_contam, F.concat(body_a, bench_mid, body_b)
    ).otherwise(F.concat(body_a, F.lit(" "), body_b))
    return (
        spark.range(n_docs, numPartitions=32)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
    )


def run(spark, n_docs: int, n_contam: int) -> tuple[float, int]:
    from time_series_loader_spark.operators.decontam import (
        ngram_set,
        strip_contamination,
    )

    bench = ngram_set([BENCH_SENT], 8)
    docs = synth(spark, n_docs, n_contam).localCheckpoint(eager=True)
    out = strip_contamination(docs, "text", "doc_id", bench, n=8, margin=1)
    t0 = time.time()
    n = out.count()
    el = time.time() - t0
    docs.unpersist()
    assert n == n_docs, (n, n_docs)
    return el, n


def main():
    from time_series_loader_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'axis':>8} {'docs':>9} {'contam':>8} {'wall':>8}")
    # corpus axis: fixed 200 contaminated docs
    for f in (1, 10, 100):
        n = BASE_DOCS * f
        run(spark, n, 200)  # warm-up
        el = min(run(spark, n, 200)[0] for _ in range(2))
        print(f"{'corpus':>8} {n:>9} {200:>8} {el:>7.2f}s", flush=True)
    # contamination axis: fixed 200k docs
    n = BASE_DOCS * 10
    for frac, n_c in (("1%", n // 100), ("10%", n // 10), ("50%", n // 2)):
        run(spark, n, n_c)
        el = min(run(spark, n, n_c)[0] for _ in range(2))
        print(f"{'contam':>8} {n:>9} {n_c:>8} {el:>7.2f}s", flush=True)


if __name__ == "__main__":
    main()
