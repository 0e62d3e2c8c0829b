"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full action (plan → execute → count) after a
warm-up of the input tables' file listing. Queries come straight from
__spark_entry__.queries() so the bench always measures what correctness
gates.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from time_series_loader_spark.session import get_spark

# Headline set: every distinct operator family, weighted toward the ones
# whose plans differ (window vs groupBy vs join vs union-window).
HEADLINE = [
    "resample_1h_mean",
    "gaps",
    "continuity_stats",
    "reindex_ffill_30min",
    "interpolate_30min",
    "asof_nearest_1h",
    "breakpoint_resample",
    "zscore_inliers",
    "tpch_q1",
    "tpch_q5_like",
    "top3_customers_per_nation",
    "dedup_exact",
    "minhash_lsh",
    "text_profile",
    "cosine_topk",
    "multimodal_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("tsl-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/session warmup so the first timed query isn't charged Spark
    # startup + parquet footer reads (steady-state is what matters at scale)
    from time_series_loader_spark.session import TABLES, read_table

    spark.range(1).count()
    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).count()
    # Arrow-path warmup: the first pandas_udf/mapInPandas in a session pays
    # ~2s of Python-worker-pool startup, which otherwise lands on whichever
    # kernel query runs first and makes its number swing round-to-round
    # (see SCALING.md bench-variance caveat)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(64).select(_warm(F.col("id"))).count()

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n not in HEADLINE
    ]
    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        # min of two runs: damps transient system noise (these are
        # steady-state throughput numbers, not cold-start measurements)
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
