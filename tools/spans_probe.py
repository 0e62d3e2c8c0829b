"""10× scaling probe for the exact-substring span-dedup family
(`operators/spans.py`) — the one operator whose shuffle volume is
data-proportional in TOKENS (one positional digest per token), flagged
in round 5 as lacking a measured slope.

Reuses scale_probe.py's synthesized corpora (disjoint per-copy token
universes — cross-copy spans can't collide, so flagged-span counts
scale linearly and the measurement isolates shuffle growth, not
output-quadratic growth). Also reports the max-tokens-per-doc skew
figure: the largest single document bounds the per-task explode width.

Usage: python tools/spans_probe.py [factor ...]   # default: 1 10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.spans import repeated_spans
from time_series_loader_spark.operators.text import tokens
from time_series_loader_spark.session import get_spark
from tools.scale_probe import synth


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("tsl-spans-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        out_dir = f"/tmp/tsl_scale_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth(spark, factor, out_dir)
            open(marker, "w").close()
            print(f"# synth {factor}x: {time.time() - t0:.1f}s", file=sys.stderr)
        docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))
        stats = docs.select(F.size(tokens("text")).alias("n")).agg(
            F.sum("n").alias("total"), F.max("n").alias("mx")
        ).collect()[0]

        from time_series_loader_spark.operators.spans import repeated_spans_winnowed

        variants = {
            "spans(n=20)": lambda: repeated_spans(
                docs, "text", "doc_id", n=20, min_docs=2
            ).count(),
            "winnow(n=20,w=16)": lambda: repeated_spans_winnowed(
                docs, "text", "doc_id", n=20, w=16, min_docs=2
            ).count(),
        }
        for vname, vrun in variants.items():
            def run():
                t0 = time.time()
                n = vrun()
                return time.time() - t0, n

            run()  # discarded warm-up
            best, rows = None, 0
            for _ in range(2):
                el, rows = run()
                best = el if best is None else min(best, el)
            print(
                f"{vname:18s} {factor:>4}x  {best:6.2f}s  ({rows} flagged rows, "
                f"{stats['total']} tokens, max_doc_tokens={stats['mx']})"
            )
    spark.stop()


if __name__ == "__main__":
    main()
