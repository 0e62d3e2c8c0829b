"""Heavy-hitters scale probe: Misra-Gries vs groupBy().count() under
key skew (VERDICT r8 directive #3 / r9 #5 — "the case Misra-Gries
exists for").

Corpus shape: 60% of rows land on 5 hot keys (12% each — strictly above
the N/k = 10% threshold at k=10), the other 40% are each a UNIQUE cold
key — so the distinct-key count is ~0.4·N + 5. That is the
hot-key-detection regime (URLs / user ids / n-grams): a full
``groupBy().count()`` shuffles one row per distinct key —
data-proportional — while the MG path shuffles numPartitions·k summary
rows regardless of N, then exact-verifies only the ≤ numPartitions·k
candidates through a broadcast semi-join.

Two metrics per (path, factor):

- wall seconds (best-of-2 after a discarded warm-up, the scale_probe.py
  discipline). NOTE: on local[32] the shuffle fabric is memcpy, so
  wall-clock measures single-node CPU, where whole-stage-codegen hash
  aggregation is very hard to beat from Python — the wall numbers are
  the honest single-node story, not the cluster story.
- SHUFFLE WRITE BYTES of one timed run (UI REST API, stage-delta) —
  the quantity that DOES transfer to a 1000-executor cluster, where
  shuffle crosses a network and a distinct-key-sized exchange is the
  bottleneck MG exists to remove.

Both paths must return the same answer (asserted: the 5 hot keys with
exact counts).

Usage:
    python tools/hitters_probe.py [factor ...]   # default: 1 10 100
"""

from __future__ import annotations

import json as _json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.sketches import heavy_hitters
from time_series_loader_spark.session import get_spark

BASE_ROWS = 1_000_000
K = 10  # threshold N/k = 10%; the 5 hot keys sit at 12% each


def synth(spark, factor: int, out_dir: str) -> None:
    n = BASE_ROWS * factor
    # hot/cold decision (last digit) and hot-key choice (second digit)
    # use INDEPENDENT digits — id%10<6 with key id%5 correlates (ids
    # ending 0 and 5 both map to hot_0) and yields 20/10/10/10/10
    # shares, only one of which clears the strict > threshold
    df = spark.range(n, numPartitions=32).select(
        F.when(
            F.col("id") % 10 < 6,
            F.concat(
                F.lit("hot_"), ((F.col("id") / 10).cast("long") % 5)
            ),
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


def shuffle_write_bytes(spark) -> int:
    app_id = spark.sparkContext.applicationId
    url = (
        f"http://localhost:4040/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    stages = _json.load(urllib.request.urlopen(url))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(
        "tsl-hitters-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for factor in factors:
        out_dir = f"/tmp/tsl_hitters_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE_V3")
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
            sh0 = shuffle_write_bytes(spark)
            for i in range(2):
                t0 = time.time()
                rows = {
                    r["key"]: r["n"] for r in fn(spark, path).collect()
                }
                el = time.time() - t0
                if i == 0:
                    sh = shuffle_write_bytes(spark) - sh0
                best = el if best is None else min(best, el)
            answers[name] = rows
            print(
                f"hitters_{name:8s} {factor:>4}x  {best:6.2f}s  "
                f"shuffle={sh / 1e6:10.3f} MB  ({len(rows)} hitters)"
            )
        assert answers["mg"] == answers["groupby"], (
            f"MG != definition at {factor}x: {answers}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
