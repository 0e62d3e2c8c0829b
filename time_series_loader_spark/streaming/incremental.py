"""Streaming incremental dedup: each micro-batch adjudicated against a
persistent signature store — the streaming embodiment of
``operators.dedup.incremental_dedup`` (the daily-crawl pattern run
continuously).

Shape: a file-source stream → ``foreachBatch``. Per micro-batch:

1. read the signature store (all batches appended so far — id + digest
   + k minhashes per retained doc, NO text);
2. ``incremental_dedup(batch, store)``;
3. write survivors AND their signature rows, each into a
   ``batch_id=N`` subdirectory with ``mode=overwrite``.

Step 3 is the standard idempotent-``foreachBatch`` contract: Structured
Streaming guarantees at-least-once execution of a batch id, so a
replayed batch OVERWRITES its own subdirectory instead of double-
appending — the (store, survivors) state is exactly-once as long as
writes are keyed by batch id. Batch ids are processed sequentially, so
the store a batch sees always contains exactly the survivors of all
prior batches (the restart test pins this).

Scale: the store is signature-width (≈ id + 17×32 B per doc). r13
(VERDICT r12 directive #4) builds the table maintenance IN: every
``compact_every`` batches the accumulated per-batch delta directories
are folded into one digest-prefix-partitioned snapshot
(``_compacted/upto=M``, partitioned by ``dp = digest[:1]``; production
would widen to 2 hex chars = 256 buckets), so a batch's store scan
reads ONE compacted snapshot plus at most ``compact_every`` recent
deltas instead of every prior batch directory — the r12 drain probe's
1.39× per-batch creep at B=100 was exactly this file-count share.

Compaction is TIERED (r14, VERDICT r13 directive #2 — the LSM shape
the r13 module sketched): every ``compact_every`` pending deltas fold
into one bounded RUN (``_runs/run=<lo>_<hi>`` — cost = those deltas'
bytes, NEVER the store's), and only when ``runs_per_major`` complete
runs have accumulated does a rare MAJOR fold rewrite them (plus the
previous snapshot) into ``_compacted/upto=M``. A drain of B batches
therefore pays O(B) total run bytes plus O(B²/(compact_every ×
runs_per_major)) major-fold bytes — the r13 posture's O(store)-per-
fold term is now paid once per ``runs_per_major`` folds instead of
every fold (the store_probe drain records the per-fold byte split).
Readers union the newest complete snapshot + the complete runs above
it + the uncovered deltas: ≤ 1 + runs_per_major + compact_every
directories, file count bounded forever.

Compaction replay-safety (the same strict-before discipline as the
reads, per TIER): a batch compacts only batches STRICTLY BEFORE
ITSELF (``≤ N-1``), writes each run/snapshot COMPLETELY (marked
complete by a driver-written ``_TSL_COMPLETE`` file —
committer-agnostic; an existing complete generation is never
rewritten) before any deletion starts, and readers prefer complete
runs/snapshots while ignoring the deltas (or runs) they cover — so a
crash between a fold's marker and its input deletes double-covers
rows harmlessly (the reader never reads both), and a crash mid-write
leaves an ignored marker-less directory that the sweep phase deletes
(always safe: no marker ⇒ invisible to every reader by
construction). Run ranges never overlap: each new run starts at the
current coverage high-water + 1, whatever ``compact_every`` was when
older runs were written. The underscore prefixes keep both trees
invisible to the root partition-discovery read the deltas use.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from time_series_loader_spark import fsutil


_COMPACT_ROOT = "_compacted"
_RUNS_ROOT = "_runs"
# the driver-written completion marker and its rationale live in
# `time_series_loader_spark.fsutil` (shared with the BPE trainer's
# restartable state since r13): a snapshot without the marker is
# ALWAYS invisible and its inputs always intact.
_COMPLETE_MARK = fsutil.COMPLETE_MARK


def _compacted_uptos(spark: SparkSession, store_path: str) -> list[int]:
    """``upto`` ids of COMPLETE (marker-carrying) compacted snapshots.
    Incomplete snapshots (crash mid-write, or written-but-unmarked) are
    invisible — the replay overwrites them."""
    return fsutil.complete_generations(
        spark, os.path.join(store_path, _COMPACT_ROOT), "upto"
    )


def _run_ranges(spark: SparkSession, store_path: str) -> dict[tuple[int, int], bool]:
    """(lo, hi) → marker-complete? of every ``_runs/run=<lo>_<hi>``
    directory. Incomplete runs (crash mid-write) are invisible to
    readers and swept by the next maintenance pass."""
    root = os.path.join(store_path, _RUNS_ROOT)
    fs, hpath = fsutil.hadoop_fs(spark, root)
    if not fs.exists(hpath):
        return {}
    out: dict[tuple[int, int], bool] = {}
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith("run="):
            continue
        try:
            lo, hi = (int(x) for x in name.split("=", 1)[1].split("_", 1))
        except ValueError:
            continue
        out[(lo, hi)] = fs.exists(
            fsutil.jpath(spark, os.path.join(root, name, _COMPLETE_MARK))
        )
    return out


def _live_runs(
    spark: SparkSession, store_path: str, m_star: int, upper: int
) -> list[tuple[int, int]]:
    """Complete runs strictly above snapshot ``m_star`` and entirely at
    or below ``upper``, ascending (they are disjoint by construction)."""
    return sorted(
        r
        for r, done in _run_ranges(spark, store_path).items()
        if done and r[0] > m_star and r[1] <= upper
    )


def _read_store(
    spark: SparkSession,
    store_path: str,
    id_field,
    num_hashes: int,
    before_batch_id: int,
) -> DataFrame:
    """Signatures of every batch STRICTLY BEFORE ``before_batch_id``:
    the newest complete compacted snapshot below it (if any), plus the
    complete runs above that snapshot, plus the delta directories
    nothing covers — ≤ 1 + runs_per_major + compact_every directories
    (the tiered-store reader, r14).

    The strict-before filter is load-bearing for exactly-once: a
    micro-batch that crashed after its store write and is REPLAYED
    would otherwise read its own previous partial output, self-dedup
    to empty, and overwrite its survivors away. Deltas a run or
    snapshot covers are NEVER read even if a crashed fold left them
    behind — that is what makes the write-completely-then-delete
    protocol double-cover-safe at every tier. Listing failures on a
    present store must surface: deduping against a silently-empty
    store admits duplicates irreversibly (only a genuinely-missing
    path bootstraps)."""
    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    cols = [id_field.name, "digest", *mh_cols]
    uptos = [m for m in _compacted_uptos(spark, store_path) if m < before_batch_id]
    m_star = max(uptos) if uptos else -1
    runs = _live_runs(spark, store_path, m_star, before_batch_id - 1)
    covered = max([m_star] + [hi for _, hi in runs])
    frames = []
    if m_star >= 0:
        frames.append(
            spark.read.parquet(
                os.path.join(store_path, _COMPACT_ROOT, f"upto={m_star}")
            ).select(*cols)
        )
    for lo, hi in runs:
        frames.append(
            spark.read.parquet(
                os.path.join(store_path, _RUNS_ROOT, f"run={lo}_{hi}")
            ).select(*cols)
        )
    deltas = [
        b
        for b in _mg_batch_dirs(spark, store_path)
        if covered < b < before_batch_id
    ]
    if deltas:
        frames.append(
            spark.read.parquet(store_path)
            .where(
                (F.col("batch_id") > covered)
                & (F.col("batch_id") < before_batch_id)
            )
            .select(*cols)
        )
    if frames:
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out
    schema = StructType([id_field])
    empty = spark.createDataFrame([], schema)
    out = empty.withColumn("digest", F.lit(None).cast("string"))
    for c in mh_cols:
        out = out.withColumn(c, F.lit(None).cast("long"))
    return out


def _compact_store(
    spark: SparkSession,
    store_path: str,
    batch_id: int,
    id_field,
    num_hashes: int,
    compact_every: int,
    dp_chars: int = 1,
    runs_per_major: int = 8,
    force_major: bool = False,
) -> None:
    """Tiered store maintenance over batches ≤ ``batch_id − 1`` (r14):

    - **minor fold** — when ``compact_every`` uncovered deltas are
      pending, rewrite exactly THOSE deltas into one run
      (``_runs/run=<lo>_<hi>``). Cost is the deltas' own bytes; the
      store is not touched.
    - **major fold** — when ``runs_per_major`` complete runs have
      accumulated (or ``force_major``), rewrite snapshot + runs (+ any
      uncovered deltas when forced) into one digest-prefix-partitioned
      snapshot (``_compacted/upto=M``). This is the only O(store) fold
      and it runs once per ``runs_per_major`` minors.
    - **sweep** — always: delete every delta/run/snapshot that a
      complete generation now covers, plus marker-less fold orphans
      (invisible to every reader by construction, so removal is
      always safe — a crashed fold whose range never recurs would
      otherwise leak forever).

    Runs inside the batch's ``foreachBatch`` after its own writes; see
    the module docstring for the crash-window argument. The target is
    strictly before the CURRENT batch so a replay of this batch id can
    still read everything it needs whatever this function got through
    last time. Each fold writes completely → driver marker → (sweep
    deletes inputs), so a crash at any point leaves a readable store;
    a replayed fold lands on the same directory name and overwrites."""
    target = batch_id - 1
    uptos = _compacted_uptos(spark, store_path)
    m_star = max((m for m in uptos if m <= target), default=-1)
    runs = _live_runs(spark, store_path, m_star, target)
    covered = max([m_star] + [hi for _, hi in runs])
    pending = [
        b for b in _mg_batch_dirs(spark, store_path) if covered < b <= target
    ]
    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    cols = [id_field.name, "digest", *mh_cols]
    if not force_major and len(pending) >= compact_every:
        lo, hi = covered + 1, target
        run_dir = os.path.join(store_path, _RUNS_ROOT, f"run={lo}_{hi}")
        (
            spark.read.parquet(store_path)
            .where((F.col("batch_id") >= lo) & (F.col("batch_id") <= hi))
            .select(*cols)
            .write.mode("overwrite")
            .parquet(run_dir)
        )
        fsutil.write_complete_marker(spark, run_dir)
        runs.append((lo, hi))
        covered = hi
    if force_major or len(runs) >= runs_per_major:
        # force_major also folds uncovered deltas (public full
        # maintenance); the cadence-triggered major folds exactly the
        # accumulated runs + previous snapshot
        m_new = target if force_major else covered
        if m_new > m_star or (force_major and len(uptos) > 1):
            if m_new not in uptos:
                snap = _read_store(
                    spark, store_path, id_field, num_hashes,
                    before_batch_id=m_new + 1,
                )
                snap_dir = os.path.join(
                    store_path, _COMPACT_ROOT, f"upto={m_new}"
                )
                (
                    # dp_chars hex chars of the digest: 16^dp_chars
                    # buckets (1 → 16 for local scale; production uses
                    # 2 → 256 so each bucket stays executor-memory-
                    # sized at a 10^10-doc store)
                    snap.withColumn("dp", F.substring("digest", 1, dp_chars))
                    .repartition(16 ** dp_chars, "dp")
                    .write.partitionBy("dp")
                    .mode("overwrite")
                    # pin static overwrite per-write: under (possibly
                    # session-leaked) dynamic mode an overwrite only
                    # replaces partitions present in the new data,
                    # which is not the replace-the-whole-snapshot
                    # semantics this protocol needs
                    .option("partitionOverwriteMode", "static")
                    .parquet(snap_dir)
                )
                # the driver's own completion marker — see fsutil
                fsutil.write_complete_marker(spark, snap_dir)
            m_star = m_new
    # sweep phase — always runs, so crash leftovers from ANY earlier
    # fold are reclaimed by the next maintenance pass, not only by a
    # replay landing on the same name (r13 review finding generalized
    # to tiers). Re-list coverage: everything below it is unreachable
    # by every future or replayed reader.
    uptos = _compacted_uptos(spark, store_path)
    m_star = max((m for m in uptos if m <= target), default=m_star)
    live = set(_live_runs(spark, store_path, m_star, target))
    cov_hi = max([m_star] + [hi for _, hi in live])
    for b in _mg_batch_dirs(spark, store_path):
        if b <= cov_hi:
            fsutil.delete_dir(spark, os.path.join(store_path, f"batch_id={b}"))
    for (lo, hi), done in _run_ranges(spark, store_path).items():
        # complete runs the snapshot covers are superseded; marker-less
        # runs are crash orphans — invisible to readers, always safe
        if (done and hi <= m_star) or not done:
            fsutil.delete_dir(
                spark, os.path.join(store_path, _RUNS_ROOT, f"run={lo}_{hi}")
            )
    for m in uptos:
        if m < m_star:
            fsutil.delete_dir(
                spark, os.path.join(store_path, _COMPACT_ROOT, f"upto={m}")
            )


def compact_signature_store(
    spark: SparkSession,
    store_path: str,
    id_field,
    num_hashes: int = 16,
    dp_chars: int = 1,
) -> None:
    """PUBLIC batch-mode store maintenance (the daily operating mode:
    callers running `operators.dedup.incremental_dedup` themselves and
    appending ``batch_id=N`` delta directories): fold everything
    currently in the store into one digest-prefix-partitioned complete
    snapshot, exactly the stream's `_compact_store` protocol (write
    completely → driver marker → delete covered inputs), so the next
    increment scans one snapshot instead of every prior delta.
    Safe to run any time no batch is concurrently writing; a crash at
    any point leaves a readable store (the marker discipline)."""
    deltas = _mg_batch_dirs(spark, store_path)
    uptos = _compacted_uptos(spark, store_path)
    run_his = [hi for (_, hi), done in _run_ranges(spark, store_path).items() if done]
    if not deltas and not run_his and len(uptos) <= 1:
        return  # nothing to fold
    newest = max(deltas + uptos + run_his)
    _compact_store(
        spark, store_path, newest + 1, id_field, num_hashes,
        compact_every=1, dp_chars=dp_chars, force_major=True,
    )


def incremental_dedup_stream(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    store_path: str,
    survivors_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    compact_every: int | None = 16,
    runs_per_major: int = 8,
):
    """Start the stream; returns the StreamingQuery.

    ``available_now=True`` drains everything pending then stops (the
    batch-backfill trigger); ``False`` runs continuously.
    ``max_files_per_trigger`` bounds batch size (and, in tests, forces
    one micro-batch per input file so cross-batch semantics are real).
    ``compact_every`` folds that many pending delta directories into
    one bounded run, and every ``runs_per_major`` runs a major fold
    rewrites them into the digest-prefix-partitioned snapshot
    (`_compact_store` — r13/r14 tiered maintenance: bounds the store's
    file count and the per-batch scan creep, with the O(store) rewrite
    paid only on majors); ``None``/0 disables all compaction.
    """
    from time_series_loader_spark.operators.dedup import incremental_dedup

    mh_cols = [f"mh{i}" for i in range(num_hashes)]
    id_field = schema[id_col]

    def process(bdf: DataFrame, batch_id: int) -> None:
        store = _read_store(spark, store_path, id_field, num_hashes, batch_id)
        surv = incremental_dedup(
            bdf, store, text_col, id_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
        ).localCheckpoint(eager=True)  # consumed by BOTH writes below
        surv.drop("digest", *mh_cols).write.mode("overwrite").parquet(
            f"{survivors_path}/batch_id={batch_id}"
        )
        surv.select(id_col, "digest", *mh_cols).write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}"
        )
        if compact_every:
            _compact_store(
                spark, store_path, batch_id, id_field, num_hashes,
                compact_every, runs_per_major=runs_per_major,
            )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(input_path)
    writer = (
        sdf.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .queryName(f"tsl_incr_dedup_{uuid.uuid4().hex[:12]}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_mg_store(
    spark: SparkSession, store_path: str, before_batch_id: int
) -> dict[str, int]:
    """MG counters of the LATEST batch STRICTLY BEFORE
    ``before_batch_id``. Unlike the dedup store (per-batch DELTAS,
    union-all semantics), each heavy-hitters batch directory holds the
    full CUMULATIVE summary — so exactly one directory is read: the
    newest one a replayed batch is allowed to see (the strict < filter
    is the same replay-safety rule: never read your own partial
    output)."""
    from pyspark.errors import AnalysisException

    try:
        # directory listing, not a data scan: the pruning in
        # heavy_hitters_stream keeps at most two live batch_id=N
        # directories, and only the newest eligible one is READ
        dirs = _mg_batch_dirs(spark, store_path)
        eligible = [b for b in dirs if b < before_batch_id]
        if not eligible:
            return {}
        rows = spark.read.parquet(
            os.path.join(store_path, f"batch_id={max(eligible)}")
        ).collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        return {}
    return {r["_key"]: r["_mg"] for r in rows}


def _store_fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path``, resolved through Spark's
    OWN filesystem layer — NOT the driver's local FS. An os.listdir here
    would silently return [] when the store lives on HDFS/S3/file:// in
    cluster mode, so every micro-batch would read an empty prior summary
    and the cumulative MG counts would reset per batch without any error
    (r8 advisor finding: silent corruption, not a loud failure). The
    Hadoop API gives the same listing/delete semantics on every scheme
    Spark itself can write to."""
    return fsutil.hadoop_fs(spark, path)


def _mg_batch_dirs(spark: SparkSession, store_path: str) -> list[int]:
    """batch ids present under ``store_path`` (Hadoop-FS listing — the
    store is a handful of k-row parquet directories, on whatever
    filesystem Spark's writes actually landed on)."""
    fs, hpath = _store_fs(spark, store_path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith("batch_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return out


def heavy_hitters_stream(
    spark: SparkSession,
    input_path: str,
    schema: StructType,
    key_col: str,
    store_path: str,
    checkpoint_path: str,
    k: int = 100,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming heavy hitters: a bounded Misra-Gries summary maintained
    across micro-batches — the trending-items / hot-key detector run
    continuously over an event stream, O(k) state forever.

    Per micro-batch (``foreachBatch``, the same idempotent batch-id-keyed
    store contract as :func:`incremental_dedup_stream`):

    1. read the merged MG store of all prior batches (≤ k+1 rows);
    2. summarize THIS batch with the per-partition MG pass
       (`operators/sketches.py::mg_summaries`) and sum the partition
       summaries;
    3. merge store + batch counters and prune back to k with the
       mergeable-summaries MERGE step (`mg_merge_prune` — subtract the
       (k+1)-th largest, drop ≤ 0): the result is itself an MG summary
       of the ENTIRE stream so far, with the textbook bound
       ``true_count − N/(k+1) ≤ count ≤ true_count``;
    4. overwrite ``store_path/batch_id=N`` with the merged summary plus
       the running exact row total (the NULL-key sentinel row — NULL is
       the one value real keys can never take, the caller null-filters
       them), then PRUNE every directory older than the one step 1
       read: each batch directory is a complete cumulative summary, so
       older snapshots are dead weight, and a replayed batch id only
       ever needs the newest directory strictly before itself — which
       the prune, running strictly below what was just read, always
       preserves. The store therefore holds at most two k-row
       directories forever (the O(k)-state claim made literal).

    The LATEST batch_id subdirectory is always a complete, bounded
    summary of the whole stream: any key with overall frequency
    > N/(k+1) is present (pinned stream==batch in
    test_streaming_incremental), and an exact-verify pass over the
    retained corpus (as in batch ``heavy_hitters``) can be run on its
    key set at any time.
    """
    from time_series_loader_spark.operators.sketches import (
        mg_merge_prune,
        mg_summaries,
    )

    def process(bdf: DataFrame, batch_id: int) -> None:
        prior_dirs = [
            b for b in _mg_batch_dirs(spark, store_path) if b < batch_id
        ]
        prior = _read_mg_store(spark, store_path, batch_id)
        n_prior = prior.pop(None, 0)
        keyed = bdf.select(
            F.col(key_col).cast("string").alias("_key")
        ).where(F.col("_key").isNotNull())
        batch_rows = (
            mg_summaries(keyed, "_key", k)
            .groupBy("_key")
            .agg(F.sum("_mg").alias("_mg"))
            .collect()
        )
        counts = dict(prior)
        n_batch = 0
        for r in batch_rows:
            if r["_key"] is None:
                n_batch = r["_mg"]
            else:
                counts[r["_key"]] = counts.get(r["_key"], 0) + r["_mg"]
        merged = mg_merge_prune(counts, k)
        rows = [(key, n) for key, n in merged.items()] + [
            (None, n_prior + n_batch)
        ]
        spark.createDataFrame(
            rows, "_key string, _mg long"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{store_path}/batch_id={batch_id}"
        )
        # prune: anything OLDER than the directory this batch read is
        # unreachable by any future or replayed batch id (a replay of
        # THIS batch re-reads max(dirs < batch_id), which is kept)
        keep = max(prior_dirs) if prior_dirs else None
        if keep is not None:
            fs, _ = _store_fs(spark, store_path)
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path
            for b in prior_dirs:
                if b < keep:
                    fs.delete(
                        jvm_path(
                            os.path.join(store_path, f"batch_id={b}")
                        ),
                        True,  # recursive
                    )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(input_path)
    writer = (
        sdf.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .queryName(f"tsl_heavy_hitters_{uuid.uuid4().hex[:12]}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
