"""Dump `.explain("formatted")` for declared queries to files.

Captures the PRE-execution formatted physical plan of each
`__spark_entry__.queries()` (and optionally `bench_sections()`) DataFrame
so optimization rounds can commit before/after plan evidence
(`plans/rNN/<query>_<tag>.txt`) that a reviewer can diff without running
Spark.

Usage:
    python tools/plan_dump.py <out_dir> <tag> [sf_dir] [query ...]
    python tools/plan_dump.py --final <out_dir> <tag> [sf_dir] [query ...]

With no query names, dumps every declared query. `tag` is the filename
suffix (e.g. `before`, `after`).

`--final`: execute each query through the noop sink FIRST, then dump the
plan — with AQE the pre-execution plan hides runtime decisions
(ReusedExchange, SMJ→BHJ conversions, coalesced reads), so claims about
exchange reuse are only provable from the post-execution plan
(isFinalPlan=true).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from time_series_loader_spark.session import get_spark


def main() -> None:
    args = list(sys.argv[1:])
    final = "--final" in args
    if final:
        args.remove("--final")
    out_dir = args[0]
    tag = args[1]
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    wanted = args[3:]
    os.makedirs(out_dir, exist_ok=True)
    # same flag as plan_audit: skip result-localCheckpoints so the dumped
    # plan is the real compute plan, not `Scan ExistingRDD`
    os.environ["SPARK_GRAFT_PLAN_AUDIT"] = "1"
    spark = get_spark("tsl-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    qs = dict(entrymod.queries())
    secs = getattr(entrymod, "bench_sections", dict)()
    qs.update({k.replace("/", "__"): v for k, v in secs.items()})
    names = wanted or list(qs)
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"SKIP {name}: not a declared query/section", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            if final:
                # r14 fix: a .write executes a DIFFERENT QueryExecution
                # (the write command wraps the query), so the dataframe's
                # own QE stayed isFinalPlan=false and the dump showed the
                # PRE-execution plan — hiding AQE runtime decisions
                # (ReusedExchange, BHJ conversions). collect() runs the
                # dataframe's own QE; gate results are small by contract.
                df.collect()
                plan = df._jdf.queryExecution().executedPlan().toString()
            else:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
        except Exception as exc:  # noqa: BLE001 — dump must list, not die
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n\n{plan}\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
