"""Skew-join probe: salted join vs AQE skew-split vs plain SMJ
(VERDICT r8 stretch #7 / r9 #6).

Scenario: a fact table whose join key is pathologically skewed — ONE
key owns 50% of the rows, the rest spread uniformly over 1,000 keys —
equi-joined to a 1,001-key dimension. Broadcast is DISABLED for the
probe (autoBroadcastJoinThreshold=-1): at 100 TB the interesting case
is a dimension too big to broadcast, and with broadcast on Spark would
(correctly) just broadcast this one and hide the skew.

Three physical strategies over the identical logical join:
  plain   — sort-merge join, AQE skew-split OFF: the hot key's entire
            50% lands on one reducer task (the straggler this probe
            exists to show).
  aqe     — AQE skewJoin ON (spark.sql.adaptive.skewJoin.enabled):
            runtime splits the oversized partition; zero code changes.
  salted  — operators/relational.py::salted_join, n_salts=32: the
            probe side hashes onto 32 subkeys, the dimension replicates
            ×32; works on ANY Spark (no AQE required) and also covers
            aggregations-after-join where AQE's split can re-merge.
  partial — operators/relational.py::salted_join_hot (r11): Misra-Gries
            detects the hot key(s) (detection cost INSIDE the timed
            region), only those salt, only the hot dimension rows
            replicate — the production pattern when the build side is
            too large to replicate wholesale.

All three must return the same row count (asserted). Timed at
1×/10×/100× of a 1M-row base, scale_probe.py discipline.

Usage:
    python tools/skew_probe.py [factor ...]     # default: 1 10 100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.relational import (
    salted_join,
    salted_join_hot,
)
from time_series_loader_spark.session import get_spark

BASE_ROWS = 1_000_000
# r11: dimension cardinality is env-tunable — the 1,001-key default
# makes full salting's build replication nearly free and understates
# the partial form's structural advantage; SPARK_GRAFT_SKEW_KEYS=1000000
# is the large-dimension variant recorded in SCALING.md r11.
N_KEYS = int(os.environ.get("SPARK_GRAFT_SKEW_KEYS", "1000"))


def synth(spark, factor: int, out_dir: str) -> None:
    n = BASE_ROWS * factor
    facts = spark.range(n, numPartitions=32).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % N_KEYS + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )
    dim = spark.range(N_KEYS + 1).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("label"),
    )
    facts.write.mode("overwrite").parquet(os.path.join(out_dir, "facts.parquet"))
    dim.write.mode("overwrite").parquet(os.path.join(out_dir, "dim.parquet"))


def run(spark, out_dir: str, mode: str, prod: bool = False) -> tuple[float, int]:
    """``prod=True`` (r12, VERDICT r11 directive #6) measures under the
    PRODUCTION posture — autoBroadcastJoinThreshold at the 10MB default
    and AQE skew-split ON for every strategy — so the bare-rig salting
    wins can be checked against what AQE would do anyway when it is
    free to elect broadcast or split the hot partition at runtime."""
    if prod:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    else:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled",
            "true" if mode == "aqe" else "false",
        )
    facts = spark.read.parquet(os.path.join(out_dir, "facts.parquet"))
    dim = spark.read.parquet(os.path.join(out_dir, "dim.parquet"))
    if mode == "salted":
        joined = salted_join(facts, dim, on="k", n_salts=32)
    elif mode == "partial":
        # r11: salt ONLY the detected hot key(s) — Misra-Gries detection
        # included in the timed region (it is part of the strategy's cost)
        joined = salted_join_hot(facts, dim, on="k", n_salts=32, detect_k=8)
    else:
        joined = facts.join(dim, "k")
    # an agg that forces every joined row through the reducer
    t0 = time.time()
    n = joined.agg(F.count(F.lit(1))).collect()[0][0]
    return time.time() - t0, n


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for factor in factors:
            out_dir = f"/tmp/tsl_skew_{factor}x_k{N_KEYS}" if N_KEYS != 1000 else f"/tmp/tsl_skew_{factor}x"
            marker = os.path.join(out_dir, "_SYNTH_DONE")
            if not os.path.exists(marker):
                t0 = time.time()
                synth(spark, factor, out_dir)
                open(marker, "w").close()
                print(
                    f"# synth {factor}x: {time.time() - t0:.1f}s",
                    file=sys.stderr,
                )
            counts = {}
            for mode in ("plain", "aqe", "salted", "partial"):
                run(spark, out_dir, mode)  # discarded warm-up
                best, n = None, None
                for _ in range(2):
                    el, n = run(spark, out_dir, mode)
                    best = el if best is None else min(best, el)
                counts[mode] = n
                print(f"skewjoin_{mode:7s} {factor:>4}x  {best:6.2f}s  ({n} rows)")
            assert len(set(counts.values())) == 1, counts
            # production posture (r12): broadcast + AQE skew-split free
            # to act on the SAME rig — does partial salting still win?
            for mode in ("plain", "salted", "partial"):
                run(spark, out_dir, mode, prod=True)  # warm-up
                best, n = None, None
                for _ in range(2):
                    el, n = run(spark, out_dir, mode, prod=True)
                    best = el if best is None else min(best, el)
                counts[f"prod_{mode}"] = n
                print(f"skewjoin_{mode:7s} {factor:>4}x  {best:6.2f}s  ({n} rows)  [prod: AQE+bcast ON]")
            assert len(set(counts.values())) == 1, counts
    finally:
        # restore session defaults for any later user of this JVM
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
        spark.stop()


if __name__ == "__main__":
    main()
