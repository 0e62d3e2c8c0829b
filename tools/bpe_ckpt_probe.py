"""Long-horizon checkpoint hygiene of the distributed BPE trainer
(VERDICT r12 stretch #8 + ADVICE r12 on localCheckpoint block release).

The r12 trainer relied on ContextCleaner GC to release superseded
localCheckpoint blocks — at 32k merges that is thousands of checkpoint
generations held hostage to driver GC timing. The r13 trainer frees
each superseded generation EXPLICITLY via its RDD handles
(`functions/bpe.py::_CkptTracker`). This probe runs a ≥200-merge
training (min_count=1 so the corpus never saturates), samples the
block manager after every checkpoint call, and reports storage-memory
and persistent-RDD-count over the run — both must stay FLAT (bounded
by the live generations: vocab + pairs + touched), not grow with merge
count.

Usage: python tools/bpe_ckpt_probe.py [n_merges]   # default 200
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    import time_series_loader_spark.functions.bpe as bpe
    from time_series_loader_spark.session import get_spark, read_table

    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    jsc_sc = spark.sparkContext._jsc.sc()

    samples: list[tuple[int, int, int]] = []
    orig = bpe._CkptTracker.checkpoint

    def sampled(self, df, key, eager=True):
        out = orig(self, df, key, eager=eager)
        info = jsc_sc.getRDDStorageInfo()
        samples.append(
            (len(samples), sum(i.memSize() for i in info), len(info))
        )
        return out

    bpe._CkptTracker.checkpoint = sampled
    try:
        docs = read_table(spark, SRC, "documents").select("text")
        merges = bpe.train_bpe_merges(
            docs, "text", n_merges=n_merges, min_count=1
        )
    finally:
        bpe._CkptTracker.checkpoint = orig

    print(f"{len(merges)} merges, {len(samples)} checkpoint calls")
    print(f"{'ckpt#':>7} {'storage MiB':>12} {'persistent RDDs':>16}")
    step = max(1, len(samples) // 10)
    for i in range(0, len(samples), step):
        k, mem, nrdd = samples[i]
        print(f"{k:>7} {mem / 2**20:>11.1f} {nrdd:>16}")
    k, mem, nrdd = samples[-1]
    print(f"{k:>7} {mem / 2**20:>11.1f} {nrdd:>16}  (final)")
    peak = max(s[1] for s in samples)
    first_q = max(s[1] for s in samples[: max(1, len(samples) // 4)])
    print(
        f"peak storage {peak / 2**20:.1f} MiB; "
        f"first-quartile peak {first_q / 2**20:.1f} MiB; "
        f"growth {peak / max(first_q, 1):.2f}x"
    )
    leftover = jsc_sc.getRDDStorageInfo()
    print(
        f"after release_all: {len(leftover)} persistent RDDs, "
        f"{sum(i.memSize() for i in leftover) / 2**20:.1f} MiB"
    )


if __name__ == "__main__":
    main()
