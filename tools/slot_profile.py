"""Per-slot empirical decomposition (guide §1: measure first).

For each named query/section: builds the DataFrame (driver-side fit +
plan construction), then times the noop-sink execution, and reports how
many Spark jobs/stages/tasks the steady-state run scheduled. At bench SF
the data is tiny, so wall time is mostly scheduling rounds + the Python
boundary — job/stage counts localize WHERE, which `bench.py`'s single
number cannot.

Usage:
    python tools/slot_profile.py [sf_dir] [query ...]

Each slot is measured with the bench discipline: bench_reset, one
discarded warm-up, then the best of two steady runs. `build` is the
queries()[name](spark, sf_dir) call alone (includes any memoized fit on
the warm-up; steady build = plan construction + analysis), `exec` is
`df.write.format("noop")` (guide §1.4 — forces every column, unlike the
bench's historical `.count()`), and jobs/stages/tasks are deltas from
the status tracker across the steady run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from time_series_loader_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    wanted = sys.argv[2:]
    spark = get_spark("tsl-slot-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    qs = dict(entrymod.queries())
    secs = getattr(entrymod, "bench_sections", dict)()
    qs.update({k: v for k, v in secs.items()})
    names = wanted or list(qs)

    # session warmups mirroring bench.py so the first profiled slot is
    # not charged JVM/Arrow startup
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from time_series_loader_spark.session import TABLES, read_table

    spark.range(1).count()
    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).count()

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(64).select(_warm(F.col("id"))).count()

    print(f"{'slot':34s} {'build':>7s} {'exec':>7s} {'total':>7s} "
          f"{'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}")
            continue
        getattr(entrymod, "bench_reset", lambda s: None)(spark)
        sc.setJobDescription(f"profile:{name}")

        def one_run():
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            return t1 - t0, t2 - t1

        try:
            one_run()  # discarded warm-up (memo fills, codegen warms)
            runs = []
            for _ in range(2):
                j0 = len(tracker.getJobIdsForGroup(None) or [])
                jall0 = set(tracker.getJobIdsForGroup())
                b, e = one_run()
                runs.append((b, e))
            b, e = min(runs, key=lambda r: r[0] + r[1])
            # job/stage/task deltas for ONE more steady run
            jobs_before = set(tracker.getJobIdsForGroup())
            b2, e2 = one_run()
            jobs_after = set(tracker.getJobIdsForGroup())
            new_jobs = sorted(jobs_after - jobs_before)
            n_stages = 0
            n_tasks = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is None:
                    continue
                for s in info.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numTasks
            print(f"{name:34s} {b:7.3f} {e:7.3f} {b + e:7.3f} "
                  f"{len(new_jobs):5d} {n_stages:6d} {n_tasks:6d}")
        except Exception as exc:  # noqa: BLE001 — profile must list, not die
            print(f"{name:34s} ERROR: {exc}")
        finally:
            sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
