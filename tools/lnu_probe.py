"""Open-scale probe for the CCNet perplexity partition's engine-ln path
(VERDICT r10 directive #5).

`corpus_filter`'s gate form uses the PINNED log table
(resources/ln_u_micro.parquet, domain N+V ≤ 8e6) and REFUSES loudly
beyond it — correct oracle-certification behavior, but the engine-ln
path (`unigram_logprob(pinned_ln=False)`: F.log quantized to BIGINT
micro-units before accumulation) is the stated unbounded-scale tool and
had no measured 100x row. This probe:

1. times the engine-ln CCNet partition (unigram_logprob → exact
   decile quantile_bucket → decile histogram) at corpus x1/x10/x100
   (scale_probe synth — suffixed vocabularies, so V grows ~linearly:
   the axis that breaks the pinned domain);
2. at every factor still inside the pinned domain, measures the
   pinned-vs-engine equivalence band: per-term logp micro-units may
   differ by ≤1 (two roundings vs one — see unigram_logprob docstring),
   so per-doc |Δcontrib_u| ≤ n_tokens; the probe records the max
   OBSERVED per-token band and the number of decile flips.

Usage: python tools/lnu_probe.py [factor ...]    # default 1 10 100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from time_series_loader_spark.operators.ln_pinned import LN_U_MAX_K
from time_series_loader_spark.operators.sampling import quantile_bucket
from time_series_loader_spark.operators.text import unigram_logprob
from time_series_loader_spark.session import get_spark, read_table
from tools.scale_probe import synth

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def deciles(docs, pinned: bool):
    lp = unigram_logprob(
        docs, "text", "doc_id", k=1.0, pinned_ln=pinned, integer_outputs=True
    )
    scored = lp.select(
        "doc_id",
        "contrib_u",
        "n_tokens",
        (F.col("contrib_u").cast("double") / 1e6 / F.col("n_tokens")).alias(
            "mean_logprob"
        ),
    )
    return quantile_bucket(scored, "mean_logprob", 10, out_col="ppl_decile")


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("tsl-lnu-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for factor in factors:
        out_dir = f"/tmp/tsl_scale_{factor}x"
        marker = os.path.join(out_dir, "_SYNTH_DONE")
        if not os.path.exists(marker):
            t0 = time.time()
            synth(spark, factor, out_dir)
            open(marker, "w").close()
            print(f"# synth {factor}x: {time.time() - t0:.1f}s", file=sys.stderr)
        docs = read_table(spark, out_dir, "documents").select("doc_id", "text")
        if docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
            docs = docs.repartition(spark.sparkContext.defaultParallelism)
        n_docs = docs.count()

        def run_engine():
            return deciles(docs, pinned=False).groupBy("ppl_decile").count().collect()

        run_engine()  # discarded warm-up
        best = None
        for _ in range(2):
            t0 = time.time()
            hist = run_engine()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(f"engine-ln deciles {factor:>4}x  {best:6.2f}s  ({n_docs} docs, "
              f"{len(hist)} buckets)")

        # equivalence band vs the pinned table, where the domain allows
        toks = docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        nv = toks.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("t").alias("v")
        ).collect()[0]
        if int(nv["n"]) + int(nv["v"]) > LN_U_MAX_K:
            print(f"  pinned-ln: domain N+V={int(nv['n']) + int(nv['v'])} exceeds "
                  f"{LN_U_MAX_K} — refused by contract (engine-ln is the open-scale path)")
            continue
        e = deciles(docs, pinned=False).select(
            "doc_id", F.col("contrib_u").alias("cu_e"),
            F.col("n_tokens").alias("nt"), F.col("ppl_decile").alias("d_e"),
        )
        p = deciles(docs, pinned=True).select(
            "doc_id", F.col("contrib_u").alias("cu_p"),
            F.col("ppl_decile").alias("d_p"),
        )
        j = e.join(p, "doc_id")
        band = j.agg(
            F.max(F.abs(F.col("cu_e") - F.col("cu_p")) / F.col("nt")).alias("max_per_tok"),
            F.sum(F.when(F.col("d_e") != F.col("d_p"), 1).otherwise(0)).alias("flips"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        print(f"  pinned-vs-engine band: max |Δcontrib_u|/token = "
              f"{band['max_per_tok']:.3f} µunits (contract ≤ 1), decile flips = "
              f"{band['flips']}/{band['n']}")
    spark.stop()


if __name__ == "__main__":
    main()
