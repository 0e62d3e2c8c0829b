"""Mergeable distinct-count sketches — the pre-aggregation pattern that
makes interactive analytics on 100 TB possible.

A raw `COUNT(DISTINCT user)` over an arbitrary date range re-shuffles the
raw corpus every time. The sketch pattern materializes one small HLL
(Apache DataSketches, exposed by Spark's ``hll_sketch_agg`` family) per
(bucket, dimension) ONCE, persists the binary column to parquet, and
answers any later rollup by unioning sketches — register-wise max, so
``union(sketch(A), sketch(B)) ≡ sketch(A ∪ B)`` EXACTLY (same lg_k and
hash): merging per-day sketches gives the identical estimate a direct
scan would, at zero raw-data cost (test-pinned in test_sketches).

Scale shape: building is one groupBy with map-side partial sketches
(each partition folds its rows into a local sketch; the shuffle carries
lg_k-sized binaries, not rows). Merging is an aggregate over
bucket-count-many small binaries — dashboard-cheap. Estimates are
DataSketches-deterministic: partition- and order-independent for a
fixed input multiset.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketches of ``key_col``'s distinct values.

    Output: ``group_cols`` + ``sketch`` (BINARY — persistable to
    parquet) + ``n_distinct_est`` (BIGINT estimate for direct use).
    ``lg_k`` trades size for accuracy (2^lg_k registers; 12 → ~1.6 KB,
    ~2% relative standard error). All downstream merges must use the
    same ``lg_k`` family (DataSketches unions downgrade mixed
    precisions to the coarsest — keep one value pipeline-wide).
    """
    sk = F.hll_sketch_agg(F.col(key_col), F.lit(lg_k))
    return df.groupBy(*group_cols).agg(
        sk.alias("sketch"),
        F.hll_sketch_estimate(sk).alias("n_distinct_est"),
    )


def hll_merge(
    sketches: DataFrame,
    group_cols: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union previously-materialized sketches into coarser groups (or
    one global row when ``group_cols`` is empty) and estimate.

    Output: ``group_cols`` + ``sketch`` (the merged binary — itself
    re-mergeable, so rollup hierarchies compose) + ``n_distinct_est``.
    """
    merged = F.hll_union_agg(F.col(sketch_col))
    aggs = [
        merged.alias("sketch"),
        F.hll_sketch_estimate(merged).alias("n_distinct_est"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def mg_summaries(
    keyed: DataFrame, key_col: str, k: int, dtype: str = "string"
) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``key_col`` (already
    ``dtype``-typed, null-free): ≤ k (key, lower-bound count) rows per
    partition plus one NULL-key sentinel row carrying the partition's
    exact row count — so the caller gets N with no second corpus scan.
    NULL is the one value that provably cannot collide with data (the
    caller null-filters the key column; an in-band string sentinel
    could always be forged by real keys — r8 review finding, reproduced:
    a hot key equal to the old "\\x00__rows__" literal was silently
    swallowed into the total). Output: (key_col, ``_mg`` BIGINT).

    ``dtype`` is ``"string"`` (real keys) or ``"long"`` (pre-hashed
    keys — :func:`heavy_hitters`' exact-verify path hashes JVM-side so
    the Arrow transfer ships 8-byte ints and ``value_counts`` runs over
    int64 instead of Python strings; measured ~4x kernel speedup on a
    100M-row probe).

    Each Arrow chunk is folded via vectorized ``value_counts`` — an
    exact (error-0) frequency summary — then merged into the running
    counters with :func:`mg_merge_prune`. By the mergeable-summaries
    theorem the running summary keeps the standard ≤ n_so_far/(k+1)
    error bound, identical guarantee to the textbook per-row recurrence
    at a fraction of the Python cost (the per-row dict loop paid O(k)
    decrement cascades per cold-tail miss — ~100 dict ops/row at k=100).
    The building block of :func:`heavy_hitters` and the streaming dual
    (`streaming/incremental.py::heavy_hitters_stream`)."""
    import pandas as pd

    pd_dtype = "Int64" if dtype == "long" else "string"

    def mg_summary(pdf_iter):
        counters: dict = {}
        n_rows = 0
        for pdf in pdf_iter:
            n_rows += len(pdf)
            for key, n in pdf[key_col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(n)
            counters = mg_merge_prune(counters, k)
        yield pd.DataFrame(
            {
                key_col: pd.array(list(counters) + [None], dtype=pd_dtype),
                "_mg": list(counters.values()) + [n_rows],
            }
        )

    return keyed.mapInPandas(mg_summary, f"{key_col} {dtype}, _mg long")


def mg_merge_prune(counts: dict[str, int], k: int) -> dict[str, int]:
    """The MERGE step of mergeable MG summaries (Agarwal et al. 2013,
    "Mergeable Summaries"): given summed counters from any number of
    summaries, keep the k largest after subtracting the (k+1)-th largest
    count from everything. The result is itself an MG summary of the
    combined stream with the combined error bound ≤ N_total/(k+1) — so
    summaries can be merged batch-after-batch forever with BOUNDED
    state, which is what the streaming dual does per micro-batch."""
    if len(counts) <= k:
        return dict(counts)
    by_n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cut = by_n[k][1]
    return {key: n - cut for key, n in by_n[:k] if n - cut > 0}


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 100,
    exact_verify: bool = True,
) -> DataFrame:
    """Misra-Gries heavy hitters: every value of ``key_col`` whose
    frequency exceeds N/k, found WITHOUT shuffling the full distinct-key
    set (Misra & Gries 1982; the SpaceSaving/Metwally 2005 family —
    the standard trending-items / hot-key detector).

    Output: (``key_col``, ``n`` BIGINT exact count, ``n_total`` BIGINT)
    for every key with ``n > n_total / k``, exact and deterministic.

    Scale shape — why not just groupBy().count()?  A full groupBy
    shuffles one row PER DISTINCT KEY; for hot-key detection over
    high-cardinality keys (URLs, user ids, n-grams) at 100 TB that is
    the single largest shuffle in the pipeline, almost all of it keys
    that cannot possibly qualify. Misra-Gries bounds the intermediate
    state instead:

    1. per-partition pass (``mapPartitions``-style via
       ``applyInPandas`` over a partition id): each partition folds its
       rows through a k-counter MG summary — at most ``k`` (key, count)
       rows survive per partition, with the classic guarantee that any
       key whose PARTITION frequency exceeds n_part/k is present;
    2. the per-partition summaries (numPartitions·k rows, tiny) are
       merged with one small groupBy — summed MG counts lower-bound
       true counts, and the MG guarantee composes under merge (Agarwal
       et al. 2013, mergeable summaries): every key with global
       frequency > N/k survives to the candidate set;
    3. ``exact_verify``: one more scan counts ONLY the candidates
       (broadcast semi-join — candidate set ≤ numPartitions·k rows) and
       filters by the exact threshold, eliminating MG's false
       positives. Two narrow scans + a k-sized shuffle replace one
       distinct-key-sized shuffle.

    With ``exact_verify=False`` the output carries MG lower-bound
    counts (``n >= true_count - N/(k+1)``, the textbook merged-summary
    bound) and the threshold filter applies to those lower bounds — so
    keys whose true frequency sits within N/(k+1) above the threshold
    MAY be missed. That is the documented trade of the single-scan
    approximate mode; hot keys far above the threshold (the ones skew
    mitigation cares about) always survive.

    Why a key can never be missed by the candidate set: a key absent
    from one partition's MG summary has local frequency ≤ n_part/(k+1)
    (the MG decrement bound); absent from ALL summaries would need
    global frequency ≤ Σ n_part/(k+1) = N/(k+1) < N/k. So every true
    heavy hitter appears in at least one summary, and the verify pass
    never prunes before counting.
    """
    if k <= 1:
        raise ValueError(f"heavy_hitters: k must be > 1, got {k}")
    keyed = df.select(F.col(key_col).cast("string").alias("_key")).where(
        F.col("_key").isNotNull()
    )
    # merged MG counts: still lower bounds, still guarantee-preserving.
    # localCheckpoint materializes the bounded summary (≤ numPartitions·k
    # + sentinels rows) ONCE on the executors — the candidate keys never
    # leave the cluster (r8 advisor: a full .collect() here is a
    # multi-10M-row driver materialization at 100 TB partition counts);
    # only the 1-row exact total crosses to the driver, for the
    # threshold scalar both paths need. A plan the optimizer folds to
    # ZERO partitions (e.g. a filter that constant-folds to false)
    # yields no sentinel rows — coalesce defaults total to 0 and the
    # result is empty, instead of the bare StopIteration the old next()
    # raised (r8 review finding, reproduced).
    #
    # exact_verify runs the MG pass over xxhash64(key) instead of the
    # key itself (r10): the Arrow transfer ships 8-byte ints, not
    # strings, and the value_counts kernel runs over int64 — ~4x less
    # Python wall on a 100M-row probe. Guarantee-preserving: a hash's
    # count is the SUM of its preimage keys' counts ≥ any one key's
    # count, so every true hitter's hash survives the merged summaries;
    # collisions only ADD false candidates, which the exact verify pass
    # counts by REAL key and prunes. Only exact_verify can hash — the
    # approximate mode must return real keys straight from the summary.
    mg_key, mg_dtype = ("_h", "long") if exact_verify else ("_key", "string")
    mg_in = (
        keyed.select(F.xxhash64("_key").alias("_h"))
        if exact_verify
        else keyed
    )
    merged = (
        mg_summaries(mg_in, mg_key, k, dtype=mg_dtype)
        .groupBy(mg_key)
        .agg(F.sum("_mg").alias("_mg"))
        .localCheckpoint(eager=True)
    )
    total = merged.where(F.col(mg_key).isNull()).agg(
        F.coalesce(F.sum("_mg"), F.lit(0)).alias("t")
    ).first()["t"]
    cand_df = merged.where(F.col(mg_key).isNotNull())
    if not exact_verify:
        out = cand_df.where(F.col("_mg") > F.lit(total) / k).select(
            "_key", F.col("_mg").alias("n")
        )
    else:
        out = (
            keyed.withColumn("_h", F.xxhash64("_key"))
            .join(F.broadcast(cand_df.select("_h")), "_h")
            .groupBy("_key")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > F.lit(total) / k)
        )
    return out.select(
        F.col("_key").alias(key_col),
        F.col("n").cast("long").alias("n"),
        F.lit(total).cast("long").alias("n_total"),
    )
