"""Streaming incremental dedup: per-micro-batch store growth, restart
with checkpoint, idempotent batch-keyed writes."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from time_series_loader_spark.streaming.incremental import incremental_dedup_stream

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

B0 = [
    (1, "pack my box with five dozen liquor jugs today friend"),
    (2, "pack my box with five dozen liquor jugs today friend"),  # in-batch dup
]
B1 = [
    (10, "pack my box with five dozen liquor jugs today friend"),  # dup of store 1
    (11, "the quick brown fox jumps over the lazy dog today"),
]
B2 = [
    (20, "the quick brown fox jumps over the lazy cat today"),  # near-dup of 11
    (21, "one more genuinely novel document body for batch two"),
]
B3 = [
    (30, "one more genuinely novel document body for batch two"),  # dup of 21
    (31, "the final fresh document of the restart increment run"),
]


def _write_file(path, rows, mtime):
    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _drain(spark, inp, store, surv, ckpt):
    q = incremental_dedup_stream(
        spark, inp, SCHEMA, store, surv, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()


def _surv_ids(spark, surv):
    df = spark.read.parquet(surv)
    return {
        r["batch_id"]: set()
        for r in df.select("batch_id").distinct().collect()
    } | {
        b: {r["doc_id"] for r in df.where(df.batch_id == b).collect()}
        for b in [r["batch_id"] for r in df.select("batch_id").distinct().collect()]
    }


def test_stream_dedups_against_growing_store_and_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    surv = str(tmp_path / "surv")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(inp)

    t0 = 1_700_000_000
    for i, rows in enumerate((B0, B1, B2)):
        _write_file(f"{inp}/f{i}.parquet", rows, t0 + i)
    _drain(spark, inp, store, surv, ckpt)

    got = _surv_ids(spark, surv)
    assert got == {0: {1}, 1: {11}, 2: {21}}

    # store = exactly the survivors' signatures, one row each
    st = spark.read.parquet(store)
    assert {r["doc_id"] for r in st.select("doc_id").collect()} == {1, 11, 21}
    assert st.where(st.mh0.isNull()).count() == 0

    # RESTART with the same checkpoint: only the new file is processed,
    # prior batch outputs are untouched, and the new batch dedups
    # against the full accumulated store (30 is a dup of batch-2's 21)
    _write_file(f"{inp}/f3.parquet", B3, t0 + 3)
    _drain(spark, inp, store, surv, ckpt)
    got = _surv_ids(spark, surv)
    assert got == {0: {1}, 1: {11}, 2: {21}, 3: {31}}
    st = spark.read.parquet(store)
    assert {r["doc_id"] for r in st.select("doc_id").collect()} == {1, 11, 21, 31}


def test_first_batch_bootstrap_empty_store(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    _write_file(f"{inp}/f0.parquet", B0, 1_700_000_000)
    store = str(tmp_path / "store")
    surv = str(tmp_path / "surv")
    _drain(spark, inp, store, surv, str(tmp_path / "ckpt"))
    df = spark.read.parquet(surv)
    assert {r["doc_id"] for r in df.collect()} == {1}


def test_replayed_batch_does_not_self_dedup(spark, tmp_path):
    """Exactly-once under at-least-once replay: if batch 0 crashed AFTER
    its store write but before the checkpoint committed, the replay must
    not read its own partial output (it would self-dedup to empty and
    overwrite its survivors away). _read_store filters batch_id < N."""
    inp = str(tmp_path / "in")
    store = str(tmp_path / "store")
    surv = str(tmp_path / "surv")
    os.makedirs(inp)
    _write_file(f"{inp}/f0.parquet", B0, 1_700_000_000)

    # simulate the crashed batch-0 store write: its survivors' signature
    # rows are already on disk under batch_id=0, checkpoint is fresh
    from time_series_loader_spark.operators.dedup import doc_signatures

    b0 = spark.createDataFrame(B0, "doc_id BIGINT, text STRING").where("doc_id = 1")
    doc_signatures(b0, "text", "doc_id").write.mode("overwrite").parquet(
        f"{store}/batch_id=0"
    )

    _drain(spark, inp, store, surv, str(tmp_path / "ckpt"))
    df = spark.read.parquet(surv)
    assert {r["doc_id"] for r in df.collect()} == {1}  # NOT empty


def test_heavy_hitters_stream_matches_batch_bounds(spark, tmp_path):
    """The streaming MG summary after draining N micro-batches must
    (a) contain every key whose TOTAL stream frequency exceeds
    N_total/(k+1) — the mergeable-summaries guarantee — with lower-bound
    counts within N_total/(k+1) of truth, and (b) carry the exact
    running row total in the sentinel row."""
    import random

    from time_series_loader_spark.streaming.incremental import (
        heavy_hitters_stream,
    )

    kschema = StructType([StructField("k", StringType())])
    rng = random.Random(11)
    k = 8
    inp = tmp_path / "hh_in"
    inp.mkdir()
    truth: dict[str, int] = {}
    for b in range(4):
        rows = (
            [("hot",)] * 150
            + [(f"warm{b % 2}",)] * 60
            + [(f"cold_{rng.randrange(300)}",) for _ in range(200)]
        )
        rng.shuffle(rows)
        for (key,) in rows:
            truth[key] = truth.get(key, 0) + 1
        tbl = pa.table({"k": pa.array([r[0] for r in rows], pa.string())})
        pq.write_table(tbl, str(inp / f"b{b}.parquet"))
        os.utime(str(inp / f"b{b}.parquet"), (1_700_000_000 + b, 1_700_000_000 + b))
    store = str(tmp_path / "hh_store")
    q = heavy_hitters_stream(
        spark,
        str(inp),
        kschema,
        "k",
        store,
        str(tmp_path / "hh_ckpt"),
        k=k,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    df = spark.read.parquet(store)
    latest = df.agg({"batch_id": "max"}).collect()[0][0]
    final = {
        r["_key"]: r["_mg"]
        for r in df.where(df.batch_id == latest).collect()
    }
    n_total = final.pop(None)  # the NULL-key sentinel carries exact N
    assert n_total == sum(truth.values())
    # bounded state: at most k counters survive, and the store itself is
    # pruned to at most two cumulative snapshot directories
    assert len(final) <= k
    dirs = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(dirs) <= 2, dirs
    band = n_total / (k + 1)
    # guarantee: every key with true frequency > band is present...
    for key, n in truth.items():
        if n > band:
            assert key in final, (key, n, band)
    # ...with lower-bound counts inside the band
    for key, n in final.items():
        assert truth[key] - band <= n <= truth[key], (key, n, truth[key])


def test_heavy_hitters_stream_restart_recovery(spark, tmp_path):
    """Stop -> append -> restart contract for the MG dual: a NEW query
    started from the same checkpoint must resume batch ids where the
    first run stopped, read the surviving cumulative store directory
    (not reset to empty), not re-count committed files, and end with
    the same sentinel total and counters as one uninterrupted run."""
    from time_series_loader_spark.streaming.incremental import (
        heavy_hitters_stream,
    )

    kschema = StructType([StructField("k", StringType())])
    k = 8

    def write_batch(inp, b, rows):
        tbl = pa.table({"k": pa.array([r for r in rows], pa.string())})
        pq.write_table(tbl, str(inp / f"b{b}.parquet"))
        os.utime(
            str(inp / f"b{b}.parquet"),
            (1_700_000_000 + b, 1_700_000_000 + b),
        )

    def run(inp, store, ckpt):
        q = heavy_hitters_stream(
            spark, str(inp), kschema, "k", store, ckpt,
            k=k, max_files_per_trigger=1,
        )
        q.awaitTermination()

    def final_counts(store):
        df = spark.read.parquet(store)
        latest = df.agg({"batch_id": "max"}).collect()[0][0]
        out = {
            r["_key"]: r["_mg"]
            for r in df.where(df.batch_id == latest).collect()
        }
        return out.pop(None), out

    batches = [
        ["hot"] * 100 + ["warm"] * 40 + [f"c{i}" for i in range(80)],
        ["hot"] * 80 + ["warm"] * 50 + [f"d{i}" for i in range(60)],
        ["hot"] * 120 + [f"e{i}" for i in range(90)],
    ]

    # interrupted run: two batches, STOP (availableNow drains and
    # terminates), third batch appears, NEW query from same checkpoint
    inp = tmp_path / "rr_in"
    inp.mkdir()
    store = str(tmp_path / "rr_store")
    ckpt = str(tmp_path / "rr_ckpt")
    write_batch(inp, 0, batches[0])
    write_batch(inp, 1, batches[1])
    run(inp, store, ckpt)
    total_mid, _ = final_counts(store)
    assert total_mid == len(batches[0]) + len(batches[1])
    write_batch(inp, 2, batches[2])
    run(inp, store, ckpt)
    total_rr, counts_rr = final_counts(store)

    # uninterrupted reference over the same three files
    inp1 = tmp_path / "one_in"
    inp1.mkdir()
    for b, rows in enumerate(batches):
        write_batch(inp1, b, rows)
    store1 = str(tmp_path / "one_store")
    run(inp1, store1, str(tmp_path / "one_ckpt"))
    total_one, counts_one = final_counts(store1)

    assert total_rr == total_one == sum(len(b) for b in batches)
    assert counts_rr == counts_one  # counters carried, nothing re-read
    assert counts_rr["hot"] >= 300 - total_rr // (k + 1)


def _gen_batches(inp, n_batches, t0=1_700_000_000):
    """n_batches files; 1 dup-of-batch-0 doc per later batch, rest fresh."""
    for b in range(n_batches):
        rows = []
        for i in range(4):
            doc_id = b * 10 + i
            if b > 0 and i == 0:  # exact dup of batch 0's doc 0
                body = "batch zero words w0 w1 w2 w3 w4 w5 w6"
            else:
                body = f"batch {b} doc {i} " + " ".join(
                    f"b{b}d{i}t{t}" for t in range(7)
                )
            rows.append((doc_id, body))
        _write_file(f"{inp}/f{b}.parquet", rows, t0 + b)


def _drain_compact(spark, inp, store, surv, ckpt, compact_every,
                   runs_per_major=8):
    q = incremental_dedup_stream(
        spark, inp, SCHEMA, store, surv, ckpt,
        max_files_per_trigger=1, compact_every=compact_every,
        runs_per_major=runs_per_major,
    )
    q.awaitTermination()


def test_store_compaction_preserves_semantics_and_bounds_dirs(spark, tmp_path):
    """r13/r14 (VERDICT r12 #4, r13 #2): with compact_every=3 and
    runs_per_major=2 over 10 batches — so the drain exercises minor
    folds (deltas→run) AND a cadence-triggered major (runs→snapshot) —
    the survivor sets and final store CONTENT are identical to the
    uncompacted run; the store ends bounded: ≤3 deltas, one complete
    digest-prefix-partitioned snapshot, one complete run above it. A
    restart after the drain keeps deduping correctly against the
    tiered store."""
    base = tmp_path / "plain"
    comp = tmp_path / "compact"
    results = {}
    for name, root, every in (("plain", base, None), ("compact", comp, 3)):
        inp, store, surv, ckpt = (str(root / d) for d in ("in", "st", "sv", "ck"))
        os.makedirs(inp)
        _gen_batches(inp, 10)
        _drain_compact(spark, inp, store, surv, ckpt, every, runs_per_major=2)
        results[name] = {
            "surv": {
                (r["batch_id"], r["doc_id"])
                for r in spark.read.parquet(surv).select("batch_id", "doc_id").collect()
            },
        }
    assert results["plain"]["surv"] == results["compact"]["surv"]

    store = str(comp / "st")
    deltas = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    assert len(deltas) <= 3  # bounded by cadence, not by 10 batches
    # minor folds at batches 3/6/9 → runs 0_2, 3_5, 6_8; the second
    # reaches runs_per_major=2 → major fold to upto=5; run 6_8 remains
    snaps = os.listdir(os.path.join(store, "_compacted"))
    assert snaps == ["upto=5"]
    snap_dir = os.path.join(store, "_compacted", snaps[0])
    assert os.path.exists(os.path.join(snap_dir, "_TSL_COMPLETE"))
    assert any(d.startswith("dp=") for d in os.listdir(snap_dir))
    runs = os.listdir(os.path.join(store, "_runs"))
    assert runs == ["run=6_8"]
    assert os.path.exists(os.path.join(store, "_runs", runs[0], "_TSL_COMPLETE"))

    # store CONTENT equals the uncompacted store's
    from time_series_loader_spark.streaming.incremental import _read_store

    def store_ids(st):
        return {
            r["doc_id"]
            for r in _read_store(spark, st, SCHEMA["doc_id"], 16, 10**6).collect()
        }

    assert store_ids(store) == store_ids(str(base / "st"))

    # restart: new batch deduping against the compacted store
    inp = str(comp / "in")
    _write_file(
        f"{inp}/f10.parquet",
        [(100, "batch zero words w0 w1 w2 w3 w4 w5 w6"),  # dup vs snapshot
         (101, "a genuinely new post-compaction document body here")],
        1_700_000_020,
    )
    _drain_compact(spark, inp, store, str(comp / "sv"), str(comp / "ck"), 3)
    surv10 = {
        r["doc_id"]
        for r in spark.read.parquet(str(comp / "sv"))
        .where(F.col("batch_id") == 10).collect()
    }
    assert surv10 == {101}


def test_compaction_ignores_covered_leftover_deltas(spark, tmp_path):
    """Crash-window double cover at the RUN tier: a delta directory a
    complete run already covers (delete crashed halfway) must be
    INVISIBLE to readers — no duplicate store rows, and the next
    maintenance pass sweeps it away."""
    inp, store, surv, ckpt = (str(tmp_path / d) for d in ("in", "st", "sv", "ck"))
    os.makedirs(inp)
    _gen_batches(inp, 7)
    _drain_compact(spark, inp, store, surv, ckpt, 3)

    from time_series_loader_spark.streaming.incremental import (
        _read_store,
        _run_ranges,
    )

    runs = [r for r, done in _run_ranges(spark, store).items() if done]
    assert sorted(runs) == [(0, 2), (3, 5)]  # minors at batches 3 and 6
    covered = max(hi for _, hi in runs)
    # resurrect a covered delta, as if the post-snapshot delete crashed
    from time_series_loader_spark.operators.dedup import doc_signatures

    ghost = spark.createDataFrame(
        [(covered * 10, "batch zero words w0 w1 w2 w3 w4 w5 w6")],
        "doc_id BIGINT, text STRING",
    )
    doc_signatures(ghost, "text", "doc_id").write.mode("overwrite").parquet(
        f"{store}/batch_id={covered}"
    )
    st = _read_store(spark, store, SCHEMA["doc_id"], 16, 10**6)
    ids = [r["doc_id"] for r in st.select("doc_id").collect()]
    assert len(ids) == len(set(ids))  # the ghost delta contributed nothing
    # ... and the next maintenance pass SWEEPS it (r13 review finding:
    # the deletion phase must cover ALL deltas <= target, not only the
    # replay's empty pending set, or crash leftovers orphan forever)
    from time_series_loader_spark.streaming.incremental import (
        compact_signature_store,
    )

    compact_signature_store(spark, store, SCHEMA["doc_id"], 16)
    leftover = [
        d for d in os.listdir(store)
        if d.startswith("batch_id=") and int(d.split("=")[1]) <= covered
    ]
    assert leftover == []


def test_incomplete_run_is_invisible_and_swept(spark, tmp_path):
    """A marker-less run directory (crash mid-minor-fold) must be
    ignored by readers — the deltas it was folding are still read
    directly — and deleted by the next maintenance pass even though no
    future fold lands on its range name (the r13 orphan advisory,
    generalized to tiers)."""
    inp, store, surv, ckpt = (str(tmp_path / d) for d in ("in", "st", "sv", "ck"))
    os.makedirs(inp)
    _gen_batches(inp, 4)
    _drain_compact(spark, inp, store, surv, ckpt, None)  # deltas only

    from time_series_loader_spark.streaming.incremental import (
        _read_store,
        compact_signature_store,
    )

    # fake a crashed minor fold: a run dir with data but NO marker,
    # on a range (0..1) no future fold will ever target again
    ghost_dir = os.path.join(store, "_runs", "run=0_1")
    spark.read.parquet(store).where(F.col("batch_id") <= 1).drop(
        "batch_id"
    ).write.parquet(ghost_dir)
    st = _read_store(spark, store, SCHEMA["doc_id"], 16, 10**6)
    ids = [r["doc_id"] for r in st.select("doc_id").collect()]
    assert len(ids) == len(set(ids))  # deltas read once, ghost ignored

    compact_signature_store(spark, store, SCHEMA["doc_id"], 16)
    assert not os.path.exists(ghost_dir)
    assert store_content_ids(spark, store) == set(ids)


def store_content_ids(spark, store):
    from time_series_loader_spark.streaming.incremental import _read_store

    return {
        r["doc_id"]
        for r in _read_store(spark, store, SCHEMA["doc_id"], 16, 10**6)
        .select("doc_id")
        .collect()
    }


def test_public_compact_signature_store(spark, tmp_path):
    """Batch-mode maintenance entry: fold whatever the store holds into
    one complete snapshot, content-identical, idempotent, and still
    correct for the next increment."""
    from time_series_loader_spark.streaming.incremental import (
        _read_store,
        compact_signature_store,
    )

    inp, store, surv, ckpt = (str(tmp_path / d) for d in ("in", "st", "sv", "ck"))
    os.makedirs(inp)
    _gen_batches(inp, 5)
    _drain_compact(spark, inp, store, surv, ckpt, None)  # no auto-compaction

    def store_ids():
        return {
            r["doc_id"]
            for r in _read_store(spark, store, SCHEMA["doc_id"], 16, 10**6).collect()
        }

    before = store_ids()
    compact_signature_store(spark, store, SCHEMA["doc_id"], 16)
    assert store_ids() == before
    assert [d for d in os.listdir(store) if d.startswith("batch_id=")] == []
    snaps = os.listdir(os.path.join(store, "_compacted"))
    assert len(snaps) == 1
    compact_signature_store(spark, store, SCHEMA["doc_id"], 16)  # idempotent
    assert store_ids() == before
    # the next stream increment dedups against the compacted store
    _write_file(
        f"{inp}/f5.parquet",
        [(50, "batch zero words w0 w1 w2 w3 w4 w5 w6"),
         (51, "a post-maintenance genuinely fresh document body")],
        1_700_000_010,
    )
    _drain_compact(spark, inp, store, surv, ckpt, None)
    surv5 = {
        r["doc_id"]
        for r in spark.read.parquet(surv).where(F.col("batch_id") == 5).collect()
    }
    assert surv5 == {51}
