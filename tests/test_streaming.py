"""Structured Streaming ingestion: incremental files, watermark semantics,
late-data drops (SURVEY.md §2.9)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.streaming.ingest import (
    run_available_now,
    stream_csv_directory,
    windowed_resample_stream,
)

SCHEMA = "ts TIMESTAMP, value DOUBLE"


def _write(dirpath, name, rows, mtime):
    import os

    p = dirpath / name
    lines = ["ts;value"] + [f"{ts};{v}" for ts, v in rows]
    p.write_text("\n".join(lines) + "\n")
    os.utime(p, (mtime, mtime))
    return p


def test_windowed_stream_with_late_data(spark, tmp_path):
    # Three arrival batches (maxFilesPerTrigger=1):
    #   A: hours 00..05            → watermark after A = 04:00
    #   B: hours 06..08            → windows 00..03 EMITTED and evicted;
    #                                 watermark after B = 07:00
    #   C: late row 01:30 + 09:00  → 01:30 is older than the watermark AND
    #                                 its window state is gone → DROPPED
    _write(
        tmp_path,
        "a.csv",
        [(f"2023-01-01 0{h}:00:00", float(h)) for h in range(6)],
        mtime=1_700_000_000,
    )
    _write(
        tmp_path,
        "b.csv",
        [("2023-01-01 06:00:00", 6.0), ("2023-01-01 07:00:00", 7.0),
         ("2023-01-01 08:00:00", 8.0)],
        mtime=1_700_000_100,
    )
    _write(
        tmp_path,
        "c.csv",
        [("2023-01-01 01:30:00", 99.0), ("2023-01-01 09:00:00", 9.0)],
        mtime=1_700_000_200,
    )
    sdf = stream_csv_directory(
        spark, str(tmp_path), SCHEMA, delimiter=";", max_files_per_trigger=1
    )
    res = windowed_resample_stream(sdf, "ts", "1 hour", "value", watermark="1 hour")
    out = run_available_now(res, spark, shuffle_partitions=8)
    rows = out.collect()
    by_start = {}
    for r in rows:
        by_start.setdefault(r["window_start"], []).append(r)

    # append mode: each window emitted exactly once
    assert all(len(v) == 1 for v in by_start.values())
    # final watermark = 09:00 - 1h = 08:00 → windows ending ≤ 08:00
    assert set(by_start) == {datetime(2023, 1, 1, h) for h in range(8)}
    # the late 01:30 row arrived after window [01:00, 02:00) was emitted
    # and evicted → dropped, count stays 1 and mean untouched
    w1 = by_start[datetime(2023, 1, 1, 1)][0]
    assert w1["n"] == 1
    assert w1["value_mean"] == pytest.approx(1.0)


def test_stream_equals_batch_when_single_batch(spark, tmp_path):
    _write(
        tmp_path,
        "a.csv",
        [(f"2023-01-01 {h:02d}:{m:02d}:00", float(h * 60 + m)) for h in range(4) for m in (0, 30)],
        mtime=1_700_000_000,
    )
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    res = windowed_resample_stream(sdf, "ts", "1 hour", "value", watermark="0 seconds")
    out = run_available_now(res, spark, shuffle_partitions=8).collect()
    # watermark = max ts (03:30) → windows ending ≤ 03:30: hours 0,1,2
    assert len(out) == 3
    by_start = {r["window_start"]: r for r in out}
    assert by_start[datetime(2023, 1, 1, 0)]["n"] == 2
    assert by_start[datetime(2023, 1, 1, 0)]["value_mean"] == pytest.approx(15.0)


def test_permissive_bad_records(spark, tmp_path):
    from time_series_loader_spark.sources.csv import load_csv_with_bad_records

    p = tmp_path / "data.csv"
    p.write_text(
        "a;b;t\n"
        "1;2.5;2023-01-01 10:00:00\n"
        "oops;not_a_number;also_not_a_time\n"
        "3;4.5;2023-01-01 11:00:00\n"
    )
    df = load_csv_with_bad_records(
        spark, [str(p)], "a INT, b DOUBLE, t TIMESTAMP"
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert bad[0]["_corrupt_record"].startswith("oops")
    assert {r["a"] for r in good} == {1, 3}


def test_stateful_gap_detector_across_batches(spark, tmp_path):
    """applyInPandasWithState: state (last ts per user) must persist across
    micro-batches so a gap spanning two files is still detected."""
    from time_series_loader_spark.streaming.ingest import run_available_now
    from time_series_loader_spark.streaming.stateful import streaming_gap_detector

    _write(
        tmp_path,
        "a.csv",
        [("2023-01-01 00:00:00", 1.0), ("2023-01-01 00:10:00", 1.0)],
        mtime=1_700_000_000,
    )
    # second file: user continues 3h later → the gap crosses the batch line
    _write(
        tmp_path,
        "b.csv",
        [("2023-01-01 03:10:00", 1.0), ("2023-01-01 03:20:00", 1.0)],
        mtime=1_700_000_100,
    )
    sdf = stream_csv_directory(
        spark, str(tmp_path), "ts TIMESTAMP, value DOUBLE", max_files_per_trigger=1
    )
    from pyspark.sql import functions as F

    sdf = sdf.withColumn("user_id", F.lit(7).cast("bigint"))
    gaps = streaming_gap_detector(sdf, gap_seconds=3600.0)
    out = run_available_now(gaps, spark, shuffle_partitions=8).collect()
    assert len(out) == 1
    g = out[0]
    assert g["user_id"] == 7
    assert g["gap_start"] == datetime(2023, 1, 1, 0, 10)
    assert g["gap_end"] == datetime(2023, 1, 1, 3, 10)
    assert g["gap_seconds"] == pytest.approx(3 * 3600.0)


def test_stateful_gap_detector_restart_recovery(spark, tmp_path):
    """Checkpoint restart contract: stop the stream, add data, restart a
    NEW query from the same checkpoint — per-key state (last ts) must
    recover, so a gap whose two sides straddle the restart is still
    detected, already-processed files are not re-emitted, and the union
    of the two drains equals a single uninterrupted run."""
    from time_series_loader_spark.streaming.stateful import streaming_gap_detector

    data = tmp_path / "data"
    data.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def gaps_stream():
        sdf = stream_csv_directory(
            spark, str(data), "ts TIMESTAMP, value DOUBLE", max_files_per_trigger=1
        )
        sdf = sdf.withColumn("user_id", F.lit(7).cast("bigint"))
        return streaming_gap_detector(sdf, gap_seconds=3600.0)

    def drain(ckpt_dir, out_dir):
        # durable file sink: the memory sink rejects checkpoint recovery
        # ("does not support recovering"), and restart-recovery is the
        # very contract under test. Returns only THIS drain's new rows.
        import glob
        import json as jsonlib

        before = set(glob.glob(f"{out_dir}/*.json"))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                gaps_stream()
                .writeStream.format("json")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt_dir)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        rows = []
        for f in sorted(set(glob.glob(f"{out_dir}/*.json")) - before):
            with open(f) as fh:
                rows += [jsonlib.loads(ln) for ln in fh if ln.strip()]
        return rows

    def emitted(rows):
        return sorted(
            (r["user_id"], r["gap_start"][:19], r["gap_end"][:19]) for r in rows
        )

    def iso(h, m):
        return f"2023-01-01T{h:02d}:{m:02d}:00"

    # drain 1: one in-batch gap (00:10 → 02:00) ends at the last event
    _write(
        data,
        "a.csv",
        [("2023-01-01 00:00:00", 1.0), ("2023-01-01 00:10:00", 1.0),
         ("2023-01-01 02:00:00", 1.0)],
        mtime=1_700_000_000,
    )
    out_dir = str(tmp_path / "out")
    first = emitted(drain(ckpt, out_dir))
    assert first == [(7, iso(0, 10), iso(2, 0))]

    # restart: new file whose first event is 3h after drain 1's last —
    # detectable only if last_ts state survived the restart
    _write(
        data,
        "b.csv",
        [("2023-01-01 05:00:00", 1.0), ("2023-01-01 05:10:00", 1.0)],
        mtime=1_700_000_100,
    )
    second = emitted(drain(ckpt, out_dir))
    # only the NEW gap: a.csv's offsets are committed, nothing re-emitted
    assert second == [(7, iso(2, 0), iso(5, 0))]

    # equivalence: one uninterrupted run over the same files (fresh
    # checkpoint) emits exactly the union of the two drains
    single = emitted(
        drain(str(tmp_path / "ckpt_single"), str(tmp_path / "out_single"))
    )
    assert single == sorted(first + second)


def test_stream_static_dimension_join(spark, tmp_path):
    """Stream-static join: enrich a stream with a broadcast dimension table
    (the standard streaming enrichment shape — no state, map-side)."""
    from pyspark.sql import functions as F

    from time_series_loader_spark.streaming.ingest import run_available_now

    _write(
        tmp_path,
        "a.csv",
        [("2023-01-01 00:00:00", 1.0), ("2023-01-01 01:00:00", 2.0)],
        mtime=1_700_000_000,
    )
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    sdf = sdf.withColumn("k", F.col("value").cast("int"))
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k INT, name STRING")
    enriched = sdf.join(F.broadcast(dim), "k", "left").select("ts", "value", "name")
    out = {r["value"]: r["name"] for r in run_available_now(enriched, spark, shuffle_partitions=8).collect()}
    assert out == {1.0: "one", 2.0: "two"}


def test_session_window_stream(spark, tmp_path):
    """Streaming sessionize: sessions split on >gap inactivity; a session
    is emitted only once the watermark passes its close (last event +
    gap); the still-open tail session is NOT emitted."""
    from time_series_loader_spark.streaming.ingest import session_window_stream

    _write(
        tmp_path,
        "a.csv",
        [
            ("2023-01-01 00:00:00", 1.0),
            ("2023-01-01 00:10:00", 2.0),   # same session (10 min < 30 min gap)
            ("2023-01-01 02:00:00", 3.0),   # new session after 110-min silence
            ("2023-01-01 02:05:00", 4.0),
            ("2023-01-01 09:00:00", 5.0),   # tail session, still open at drain
        ],
        mtime=1_700_000_000,
    )
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    sdf = sdf.withColumn("user", F.lit("u1"))
    res = session_window_stream(
        sdf, "ts", ["user"], gap="30 minutes", watermark="10 minutes", value_col="value"
    )
    out = run_available_now(res, spark, shuffle_partitions=8).collect()
    # final watermark = 09:00 - 10 min = 08:50 → sessions closing 00:40 and
    # 02:35 are emitted; the 09:00 session (close 09:30) is still open
    sess = sorted((r["session_start"], r["session_end"], r["n_events"], r["value_sum"]) for r in out)
    assert sess == [
        (datetime(2023, 1, 1, 0, 0), datetime(2023, 1, 1, 0, 40), 2, 3.0),
        (datetime(2023, 1, 1, 2, 0), datetime(2023, 1, 1, 2, 35), 2, 7.0),
    ]


def test_dedup_stream_drops_replayed_rows(spark, tmp_path):
    """Streaming dedup: a replayed (key, ts) row in a later batch is
    dropped; distinct timestamps for the same key survive."""
    from time_series_loader_spark.streaming.ingest import dedup_stream

    _write(
        tmp_path,
        "a.csv",
        [("2023-01-01 00:00:00", 1.0), ("2023-01-01 01:00:00", 2.0)],
        mtime=1_700_000_000,
    )
    _write(
        tmp_path,
        "b.csv",  # replay of the 00:00 row + one genuinely new row
        [("2023-01-01 00:00:00", 1.0), ("2023-01-01 02:00:00", 3.0)],
        mtime=1_700_000_100,
    )
    sdf = stream_csv_directory(
        spark, str(tmp_path), SCHEMA, delimiter=";", max_files_per_trigger=1
    )
    sdf = sdf.withColumn("k", F.lit("series1"))
    out = run_available_now(dedup_stream(sdf, ["k"], "ts", watermark="10 minutes"), spark, shuffle_partitions=8)
    vals = sorted(r["value"] for r in out.collect())
    assert vals == [1.0, 2.0, 3.0]


def test_windowed_m4_stream_matches_batch_m4(spark, tmp_path):
    """Streaming M4 over a drained file stream == batch m4_downsample
    over the same rows (same struct-aggregate tie rules), and an
    all-null-value window emits nothing."""
    from datetime import datetime as dt

    from time_series_loader_spark.operators.resample import m4_downsample
    from time_series_loader_spark.streaming.ingest import windowed_m4_stream

    rows = [
        ("2023-01-01 00:05:00", 3.0),
        ("2023-01-01 00:10:00", 9.0),
        ("2023-01-01 00:20:00", 1.0),
        ("2023-01-01 00:50:00", 5.0),
        ("2023-01-01 01:15:00", 2.0),
        ("2023-01-01 02:30:00", ""),  # null value → its window is empty
    ]
    _write(tmp_path, "m4.csv", rows, mtime=1_700_000_000)
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA, delimiter=";")
    m4 = windowed_m4_stream(sdf, "ts", "1 hour", "value", watermark="0 seconds")
    out = run_available_now(m4, spark, shuffle_partitions=8)
    got = {
        (r["window_start"], r["role"]): (r["ts"], r["value"]) for r in out.collect()
    }

    batch = spark.createDataFrame(
        [(dt.strptime(ts, "%Y-%m-%d %H:%M:%S"), float(v)) for ts, v in rows if v != ""],
        SCHEMA,
    )
    want = {
        (r["bucket_ts"], r["role"]): (r["ts"], r["value"])
        for r in m4_downsample(batch, "ts", "value", "1h").collect()
    }
    assert got == want
    assert len({b for b, _ in got}) == 2  # the null-only 02:00 window absent
