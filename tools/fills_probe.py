"""Scaling probe for the fill/interpolate/as-of family under a series
key (VERDICT r10 directive #6).

SURVEY §7(d) documents the single-timeline caveat: the gate slots run
these operators UNKEYED over one global timeline (testdata is one
sensor), where `ffill`/`bfill` take the two-pass bucketed distributed
path and `asof_nearest` range-buckets. The keyed form
(`group_cols=[...]`) hash-partitions windows by series key — the shape
a 100 TB fleet of series actually runs — but had no recorded scaling
row. This probe measures, at events x1/x10/x100 (scale_probe's synth
recipe: shifted timelines + disjoint user ranges, so keys grow with
volume — the realistic axis):

- keyed ffill(limit=None) over (user_id) series;
- keyed linear interpolation over (user_id) series;
- keyed as-of join: each user's events joined to that user's own
  hourly grid (build cost included — the grid is probe scaffolding
  either way);
- the unkeyed DISTRIBUTED ffill (bucket + carry) on the same volume,
  for the boundary comparison the directive asks to document.

Forced with noop writes (count() would let Catalyst prune the filled
columns — the r10 'count() cannot time expression work' lesson).

Usage: python tools/fills_probe.py [factor ...]   # default 1 10 100
(reuses /tmp/tsl_scale_{N}x dirs if scale_probe already synthesized them)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.asof import asof_nearest
from time_series_loader_spark.operators.fill import ffill
from time_series_loader_spark.operators.interpolate import interpolate_time
from time_series_loader_spark.session import get_spark, read_table
from tools.scale_probe import synth

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def _timed(build) -> float:
    build()  # discarded warm-up
    best = None
    for _ in range(2):
        t0 = time.time()
        build()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-fills-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        out_dir = f"/tmp/tsl_scale_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth(spark, factor, out_dir)
            open(marker, "w").close()
            print(f"# synth {factor}x: {time.time() - t0:.1f}s", file=sys.stderr)
        ev = read_table(spark, out_dir, "events").select("ts", "user_id", "value")
        n = ev.count()
        # null out ~30% of values deterministically so fills do real work
        ev = ev.withColumn(
            "value", F.when(F.col("user_id") % 3 == 0, None).otherwise(F.col("value"))
        )

        t = _timed(lambda: _noop(
            ffill(ev, "ts", ["value"], group_cols=["user_id"])
        ))
        print(f"ffill keyed      {factor:>4}x  {t:6.2f}s  ({n} rows)")

        t = _timed(lambda: _noop(
            interpolate_time(ev, "ts", ["value"], group_cols=["user_id"])
        ))
        print(f"interp keyed     {factor:>4}x  {t:6.2f}s  ({n} rows)")

        # keyed as-of: per-user hourly grid points matched to that
        # user's nearest event within 1h
        grid = ev.groupBy("user_id").agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("ts"),
        )
        t = _timed(lambda: _noop(
            asof_nearest(
                grid, ev.select("ts", "user_id", "value"), "ts",
                value_cols=["value"], group_cols=["user_id"],
                tolerance_seconds=3600.0,
            )
        ))
        print(f"asof keyed       {factor:>4}x  {t:6.2f}s  ({n} rows)")

        # unkeyed distributed fill on the same volume (global timeline):
        # the documented boundary form — bucket fill + driver carry scan
        t = _timed(lambda: _noop(ffill(ev.select("ts", "value"), "ts", ["value"])))
        print(f"ffill unkeyed    {factor:>4}x  {t:6.2f}s  ({n} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
