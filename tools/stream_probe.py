"""Sustained-drain shape of the streaming family (VERDICT r11
directive #5).

The streaming slots are certified for correctness (emitted set ==
batch SQL) and restart recovery, but the 100 TB daily mode is HOURS of
micro-batches against `heavy_hitters_stream` / `incremental_dedup_stream`
state. Claims this probe measures, batches × {10, 100} with a fixed
per-batch payload:

1. **Flat per-batch cost** — per-micro-batch trigger wall (from the
   StreamingQuery progress events, `durationMs.triggerExecution`) must
   not trend upward as the drain ages: the mean of the last 5 batches
   of the 100-batch drain vs the mean of its batches 3-7 is the
   headline ratio (batches 0-2 absorb JIT/codegen warmup).
2. **O(k) heavy-hitters state** — at most TWO `batch_id=` directories
   exist after ANY number of batches (the prune contract made
   literal), and the live summary holds ≤ k+1 rows.
3. **O(store) dedup state** — the signature store holds exactly one
   row per retained doc and is signature-width (id + digest + 16×
   bigint ≈ 170 B/row in parquet); bytes grow linearly in retained
   docs, never with text bytes. Per-batch cost DOES include a scan of
   all prior signatures (store_probe r11: flat to 10× store, +68% at
   100× — signature-width, not text-width), so a mild late-drain creep
   on the dedup family is the measured store-scan share, not state
   bloat.

Payloads (deterministic, no RNG):
- hitters: 2 000 events/batch; 5 hot keys take half the rows, the tail
  is batch-unique keys (worst case for MG candidate churn).
- dedup: 200 docs/batch, ~25 tokens each; 10% exact dups of batch 0
  docs, 90% fresh (per-batch token namespace) — every batch exercises
  store hits AND store growth.

Usage: python tools/stream_probe.py [batch_counts ...]  # default 10 100
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql.types import LongType, StringType, StructField, StructType

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
EVT_SCHEMA = StructType(
    [StructField("event_id", LongType()), StructField("key", StringType())]
)

HH_ROWS = 2_000
DD_ROWS = 200
K = 100


def _write(path, names, cols, mtime):
    pq.write_table(pa.table(dict(zip(names, cols))), path)
    os.utime(path, (mtime, mtime))


def gen_hitters_batches(inp: str, n_batches: int) -> None:
    t0 = 1_700_000_000
    for b in range(n_batches):
        keys, ids = [], []
        for i in range(HH_ROWS):
            if i % 2 == 0:
                keys.append(f"hot{i % 10 // 2}")  # 5 hot keys, half the rows
            else:
                keys.append(f"b{b}tail{i}")  # batch-unique tail
            ids.append(b * HH_ROWS + i)
        _write(
            os.path.join(inp, f"b{b:04d}.parquet"),
            ["event_id", "key"],
            [pa.array(ids, pa.int64()), pa.array(keys, pa.string())],
            t0 + b,
        )


def gen_dedup_batches(inp: str, n_batches: int) -> None:
    t0 = 1_700_000_000

    def text(ns: str, i: int) -> str:
        return " ".join(f"{ns}w{i}x{t}" for t in range(25))

    for b in range(n_batches):
        ids, texts = [], []
        for i in range(DD_ROWS):
            ids.append(b * DD_ROWS + i)
            if b > 0 and i % 10 == 0:  # 10% exact dups of batch 0
                texts.append(text("b0", i))
            else:
                texts.append(text(f"b{b}", i))
        _write(
            os.path.join(inp, f"b{b:04d}.parquet"),
            ["doc_id", "text"],
            [pa.array(ids, pa.int64()), pa.array(texts, pa.string())],
            t0 + b,
        )


def _batch_walls(q) -> list[float]:
    """Per-micro-batch triggerExecution seconds, batchId-ordered, data
    batches only (availableNow can emit a trailing no-data trigger)."""
    out = {}
    for p in q.recentProgress:
        if p is None:
            continue
        if p["numInputRows"] > 0:
            out[p["batchId"]] = p["durationMs"]["triggerExecution"] / 1000.0
    return [out[b] for b in sorted(out)]


def _dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def drain_hitters(spark, n_batches: int) -> dict:
    from time_series_loader_spark.streaming.incremental import heavy_hitters_stream

    work = tempfile.mkdtemp(prefix=f"hh{n_batches}_")
    inp, store, ckpt = (os.path.join(work, d) for d in ("in", "store", "ckpt"))
    os.makedirs(inp)
    gen_hitters_batches(inp, n_batches)
    t0 = time.time()
    q = heavy_hitters_stream(
        spark, inp, EVT_SCHEMA, "key", store, ckpt, k=K,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    wall = time.time() - t0
    walls = _batch_walls(q)
    dirs = [d for d in os.listdir(store) if d.startswith("batch_id=")]
    latest = max(int(d.split("=")[1]) for d in dirs)
    import duckdb

    n_rows = duckdb.sql(
        f"SELECT count(*) FROM '{store}/batch_id={latest}/*.parquet'"
    ).fetchone()[0]
    res = {
        "family": "heavy_hitters",
        "batches": n_batches,
        "wall": wall,
        "batch_walls": walls,
        "state_dirs": len(dirs),
        "state_rows": n_rows,
        "state_bytes": _dir_size(store),
    }
    shutil.rmtree(work, ignore_errors=True)
    return res


def drain_dedup(spark, n_batches: int) -> dict:
    from time_series_loader_spark.streaming.incremental import (
        incremental_dedup_stream,
    )

    work = tempfile.mkdtemp(prefix=f"dd{n_batches}_")
    inp, store, surv, ckpt = (
        os.path.join(work, d) for d in ("in", "store", "surv", "ckpt")
    )
    os.makedirs(inp)
    gen_dedup_batches(inp, n_batches)
    t0 = time.time()
    q = incremental_dedup_stream(
        spark, inp, DOC_SCHEMA, store, surv, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination()
    wall = time.time() - t0
    walls = _batch_walls(q)
    import duckdb

    n_store = duckdb.sql(
        f"SELECT count(*) FROM '{store}/**/*.parquet'"
    ).fetchone()[0]
    n_surv = duckdb.sql(
        f"SELECT count(*) FROM '{surv}/*/*.parquet'"
    ).fetchone()[0]
    store_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _r, _d, files in os.walk(store)
    )
    delta_dirs = len(
        [d for d in os.listdir(store) if d.startswith("batch_id=")]
    )
    res = {
        "family": "incremental_dedup",
        "batches": n_batches,
        "wall": wall,
        "batch_walls": walls,
        "store_rows": n_store,
        "survivor_rows": n_surv,
        "store_bytes": _dir_size(store),
        "store_files": store_files,
        "delta_dirs": delta_dirs,
    }
    shutil.rmtree(work, ignore_errors=True)
    return res


def summarize(res: dict) -> str:
    walls = res["batch_walls"]
    early = walls[3:8] if len(walls) >= 8 else walls[: max(1, len(walls) // 2)]
    late = walls[-5:]
    e, l = sum(early) / len(early), sum(late) / len(late)
    extra = {
        k: v
        for k, v in res.items()
        if k not in ("family", "batches", "wall", "batch_walls")
    }
    return (
        f"{res['family']:>18} B={res['batches']:<4} wall={res['wall']:6.1f}s "
        f"early/batch={e:5.2f}s late/batch={l:5.2f}s late/early={l / e:4.2f}x "
        f"{extra}"
    )


def main():
    from time_series_loader_spark.session import get_spark

    counts = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    # keep every batch's progress event (default retention is 100)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(max(counts) + 8)
    )
    for n in counts:
        print(summarize(drain_hitters(spark, n)), flush=True)
    for n in counts:
        print(summarize(drain_dedup(spark, n)), flush=True)


if __name__ == "__main__":
    main()
