"""Heavy-hitters scale probe: Misra-Gries vs groupBy().count() under
key skew (VERDICT r8 directive #3 / r9 #5 — "the case Misra-Gries
exists for").

Corpus shape: 50% of rows land on 5 hot keys (10% each), the other 50%
are each a UNIQUE cold key — so the distinct-key count is ~N/2 + 5.
That is the hot-key-detection regime (URLs / user ids / n-grams):
a full ``groupBy().count()`` shuffles one row per distinct key —
data-proportional — while the MG path shuffles numPartitions·k summary
rows regardless of N, then exact-verifies only the ≤ numPartitions·k
candidates through a broadcast semi-join.

Both paths compute the same answer (asserted: the 5 hot keys with
exact counts); the probe times them at 1×/10×/100× of a 1M-row base.

Usage:
    python tools/hitters_probe.py [factor ...]   # default: 1 10 100

Prints one line per (path, factor): best-of-2 wall seconds after a
discarded warm-up, the scale_probe.py discipline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.sketches import heavy_hitters
from time_series_loader_spark.session import get_spark

BASE_ROWS = 1_000_000
K = 10  # threshold N/k = 10% — exactly the 5 hot keys qualify


def synth(spark, factor: int, out_dir: str) -> None:
    n = BASE_ROWS * factor
    df = spark.range(n, numPartitions=32).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("hot_"), (F.col("id") % 10 / 2).cast("long")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("id")))
        .alias("key")
    )
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "keys.parquet"))


def exact_groupby(spark, path: str):
    """The naive definition: full distinct-key-sized shuffle."""
    df = spark.read.parquet(path)
    total = df.count()
    return (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > F.lit(total) / K)
    )


def mg(spark, path: str):
    return heavy_hitters(spark.read.parquet(path), "key", k=K)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-hitters-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        out_dir = f"/tmp/tsl_hitters_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth(spark, factor, out_dir)
            open(marker, "w").close()
            print(f"# synth {factor}x: {time.time() - t0:.1f}s", file=sys.stderr)
        path = os.path.join(out_dir, "keys.parquet")
        answers = {}
        for name, fn in (("mg", mg), ("groupby", exact_groupby)):
            fn(spark, path).count()  # discarded warm-up
            best, rows = None, None
            for _ in range(2):
                t0 = time.time()
                rows = {
                    r["key"]: r["n"] for r in fn(spark, path).collect()
                }
                el = time.time() - t0
                best = el if best is None else min(best, el)
            answers[name] = rows
            print(
                f"hitters_{name:8s} {factor:>4}x  {best:6.2f}s  "
                f"({len(rows)} hitters)"
            )
        assert answers["mg"] == answers["groupby"], (
            f"MG != definition at {factor}x: {answers}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
