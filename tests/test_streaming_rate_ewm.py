"""Streaming duals of counter_increase and ewm_mean: cross-batch state
continuity + batch==stream differentials (the same discipline the M4,
sessionize, and dedup duals follow)."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.streaming.ingest import (
    run_available_now,
    stream_csv_directory,
)
from time_series_loader_spark.streaming.stateful import (
    streaming_counter_rate,
    streaming_ewm_mean,
)

SCHEMA = "ts TIMESTAMP, value DOUBLE"


def _write(dirpath, name, rows, mtime):
    p = dirpath / name
    lines = ["ts;value"] + [f"{ts};{v}" for ts, v in rows]
    p.write_text("\n".join(lines) + "\n")
    os.utime(p, (mtime, mtime))
    return p


def _keyed_stream(spark, tmp_path, key=7):
    sdf = stream_csv_directory(
        spark, str(tmp_path), SCHEMA, max_files_per_trigger=1
    )
    return sdf.withColumn("user_id", F.lit(key).cast("bigint"))


def test_counter_rate_delta_spans_batches(spark, tmp_path):
    """The delta between the last sample of batch 1 and the first of
    batch 2 must be counted exactly once, from carried state — and a
    counter RESET across the batch line must be detected."""
    _write(
        tmp_path,
        "a.csv",
        [("2023-01-01 00:00:00", 10.0), ("2023-01-01 00:10:00", 14.0)],
        mtime=1_700_000_000,
    )
    _write(
        tmp_path,
        "b.csv",
        [("2023-01-01 00:20:00", 20.0), ("2023-01-01 00:30:00", 3.0)],
        mtime=1_700_000_100,
    )
    out = run_available_now(
        streaming_counter_rate(_keyed_stream(spark, tmp_path), 3600.0),
        spark,
        shuffle_partitions=8,
    ).collect()
    # one bucket (hour 0), possibly one partial per batch — total them
    inc = sum(r["increase"] for r in out)
    resets = sum(r["n_resets"] for r in out)
    # deltas: +4 (batch a), +6 (ACROSS the line), reset→+3
    assert inc == pytest.approx(4.0 + 6.0 + 3.0)
    assert resets == 1
    assert all(r["bucket_ts"] == datetime(2023, 1, 1) for r in out)
    assert all(r["rate"] == pytest.approx(r["increase"] / 3600.0) for r in out)


def test_counter_rate_single_batch_equals_batch_operator(spark, tmp_path):
    """With all files in ONE trigger the stream emits complete buckets —
    row-for-row equal to operators/rate.py::counter_increase."""
    from time_series_loader_spark.operators.rate import counter_increase

    rows = [
        ("2023-01-01 00:05:00", 1.25),
        ("2023-01-01 00:25:00", 7.5),
        ("2023-01-01 01:05:00", 2.0),   # reset
        ("2023-01-01 01:45:00", 9.0),
        ("2023-01-01 02:30:00", 11.5),
    ]
    _write(tmp_path, "a.csv", rows, mtime=1_700_000_000)
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)  # one batch
    stream_out = {
        r["bucket_ts"]: (r["increase"], r["rate"], r["n_resets"])
        for r in run_available_now(
            streaming_counter_rate(
                sdf.withColumn("user_id", F.lit(1).cast("bigint")), 3600.0
            ),
            spark,
            shuffle_partitions=8,
        ).collect()
    }
    batch_df = spark.createDataFrame(
        [(1, datetime.fromisoformat(ts), v) for ts, v in rows],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    batch_out = {
        r["ts"]: (r["increase"], r["rate"], r["n_resets"])
        for r in counter_increase(
            batch_df, "ts", "value", 3600, group_cols=["user_id"]
        ).collect()
    }
    assert set(stream_out) == set(batch_out)
    for k, (inc, rate, nr) in batch_out.items():
        s_inc, s_rate, s_nr = stream_out[k]
        assert s_inc == pytest.approx(inc, abs=0)   # exact integer-µ parity
        assert s_rate == pytest.approx(rate)
        assert s_nr == nr


def test_counter_rate_late_sample_dropped(spark, tmp_path):
    """A sample older than the carried state must not produce a
    (negative or reset) delta — monotone-ingest contract."""
    _write(tmp_path, "a.csv", [("2023-01-01 00:10:00", 5.0)], mtime=1_700_000_000)
    _write(tmp_path, "b.csv", [("2023-01-01 00:05:00", 100.0),
                               ("2023-01-01 00:20:00", 8.0)], mtime=1_700_000_100)
    out = run_available_now(
        streaming_counter_rate(_keyed_stream(spark, tmp_path), 3600.0),
        spark,
        shuffle_partitions=8,
    ).collect()
    assert sum(r["increase"] for r in out) == pytest.approx(3.0)
    assert sum(r["n_resets"] for r in out) == 0


@pytest.mark.parametrize("adjust", [False, True])
def test_streaming_ewm_matches_batch(spark, tmp_path, adjust):
    """Multi-batch stream == batch ewm_mean over the same rows (to the
    batch closed form's documented ~1e-13 truncation)."""
    from time_series_loader_spark.operators.ewm import ewm_mean

    rows_a = [(f"2023-01-01 00:{m:02d}:00", float(v))
              for m, v in ((0, 3.0), (10, 1.0), (20, 4.0))]
    rows_b = [(f"2023-01-01 00:{m:02d}:00", float(v))
              for m, v in ((30, 1.5), (40, 5.0), (50, 9.0))]
    _write(tmp_path, "a.csv", rows_a, mtime=1_700_000_000)
    _write(tmp_path, "b.csv", rows_b, mtime=1_700_000_100)
    got = {
        r["ts"]: r["ewm"]
        for r in run_available_now(
            streaming_ewm_mean(
                _keyed_stream(spark, tmp_path), 0.3, adjust=adjust
            ),
            spark,
            shuffle_partitions=8,
        ).collect()
    }
    batch_df = spark.createDataFrame(
        [(7, datetime.fromisoformat(ts), v) for ts, v in rows_a + rows_b],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    exp = {
        r["ts"]: r["_ewm"]
        for r in ewm_mean(
            batch_df, "ts", "value", 0.3, group_cols=["user_id"],
            adjust=adjust, out_col="_ewm",
        ).collect()
    }
    assert set(got) == set(exp)
    for ts, y in exp.items():
        assert got[ts] == pytest.approx(y, abs=1e-12), ts


def test_streaming_ewm_null_semantics_mirror_batch(spark, tmp_path):
    """adjust=True: decay advances over the null, row emits the carried
    mean; adjust=False: the null poisons every later row — both exactly
    the batch operator's contract (checked against it, not pandas)."""
    from time_series_loader_spark.operators.ewm import ewm_mean

    rows = [("2023-01-01 00:00:00", "1.0"),
            ("2023-01-01 00:10:00", ""),
            ("2023-01-01 00:20:00", "3.0")]
    _write(tmp_path, "a.csv", rows, mtime=1_700_000_000)
    batch_df = spark.createDataFrame(
        [(7, datetime.fromisoformat(ts), float(v) if v else None)
         for ts, v in rows],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    for adjust in (True, False):
        got = {
            r["ts"]: r["ewm"]
            for r in run_available_now(
                streaming_ewm_mean(
                    _keyed_stream(spark, tmp_path), 0.3, adjust=adjust
                ),
                spark,
                shuffle_partitions=8,
            ).collect()
        }
        exp = {
            r["ts"]: r["_ewm"]
            for r in ewm_mean(
                batch_df, "ts", "value", 0.3, group_cols=["user_id"],
                adjust=adjust, out_col="_ewm",
            ).collect()
        }
        assert set(got) == set(exp), adjust
        for ts in exp:
            if exp[ts] is None:
                assert got[ts] is None, (adjust, ts)
            else:
                assert got[ts] == pytest.approx(exp[ts], abs=1e-12), (adjust, ts)


def test_counter_rate_multichunk_group(spark, tmp_path):
    """Regression (r6 review): applyInPandasWithState splits a group's
    micro-batch into multiple Arrow chunks at arrow.maxRecordsPerBatch
    with NO cross-chunk time order — the operator must concat before
    sorting or later-chunk rows behind an earlier chunk's max are
    silently dropped. Force 2-row chunks and feed a batch whose global
    order interleaves across chunks."""
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    spark.conf.set(conf, "2")
    try:
        # one file = one batch; 7 rows -> 4 chunks; values strictly
        # increasing in TIME but written in ts-shuffled file order so
        # chunk boundaries interleave
        rows_time_order = [
            (f"2023-01-01 00:{m:02d}:00", float(10 + m)) for m in range(0, 35, 5)
        ]
        import random

        shuffled = rows_time_order[:]
        random.Random(3).shuffle(shuffled)
        _write(tmp_path, "a.csv", shuffled, mtime=1_700_000_000)
        sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
        out = run_available_now(
            streaming_counter_rate(
                sdf.withColumn("user_id", F.lit(1).cast("bigint")), 3600.0
            ),
            spark,
            shuffle_partitions=8,
        ).collect()
        # all 6 deltas of 5.0 must be counted: 30.0 total, zero resets
        assert sum(r["increase"] for r in out) == pytest.approx(30.0)
        assert sum(r["n_resets"] for r in out) == 0
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)


def test_counter_rate_restart_recovery(spark, tmp_path):
    """Checkpoint restart contract for the rate dual: stop, add a file,
    restart a NEW query from the same checkpoint — the carried
    (last ts, reading) state must recover so the delta straddling the
    restart is counted exactly once and already-processed files are not
    re-emitted."""
    import glob
    import json as jsonlib

    data = tmp_path / "data"
    data.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def rate_stream():
        sdf = stream_csv_directory(
            spark, str(data), SCHEMA, max_files_per_trigger=1
        )
        return streaming_counter_rate(
            sdf.withColumn("user_id", F.lit(7).cast("bigint")), 3600.0
        )

    def drain():
        before = set(glob.glob(f"{out_dir}/*.json"))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                rate_stream()
                .writeStream.format("json")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
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

    _write(data, "a.csv", [("2023-01-01 00:00:00", 10.0),
                           ("2023-01-01 00:10:00", 16.0)], mtime=1_700_000_000)
    first = drain()
    assert sum(r["increase"] for r in first) == pytest.approx(6.0)

    # restart: the next sample's delta (16 -> 21 = +5) must come from
    # RECOVERED state, and batch a must not re-emit
    _write(data, "b.csv", [("2023-01-01 00:20:00", 21.0)], mtime=1_700_000_100)
    second = drain()
    assert sum(r["increase"] for r in second) == pytest.approx(5.0)
    assert sum(r["n_resets"] for r in second) == 0


def test_counter_rate_negative_readings_match_batch(spark, tmp_path):
    """Sign-aware µunit quantization (ADVICE r6): negative readings must
    round half-AWAY-FROM-ZERO like the batch operator's DECIMAL(27,6)
    HALF_UP cast, including an exact -.5-µunit boundary value."""
    from time_series_loader_spark.operators.rate import counter_increase

    boundary = -1000000.5 / 1e6  # round-trips to exactly -1000000.5 µunits
    rows = [
        ("2023-01-01 00:05:00", repr(boundary)),
        ("2023-01-01 00:25:00", "-0.3"),
        ("2023-01-01 01:05:00", "-7.25"),   # decrease → reset semantics
        ("2023-01-01 01:45:00", "2.5"),
    ]
    _write(tmp_path, "a.csv", rows, mtime=1_700_000_000)
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    stream_out = {
        r["bucket_ts"]: (r["increase"], r["n_resets"])
        for r in run_available_now(
            streaming_counter_rate(
                sdf.withColumn("user_id", F.lit(1).cast("bigint")), 3600.0
            ),
            spark,
            shuffle_partitions=8,
        ).collect()
    }
    batch_df = spark.createDataFrame(
        [(1, datetime.fromisoformat(ts), float(v)) for ts, v in rows],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    batch_out = {
        r["ts"]: (r["increase"], r["n_resets"])
        for r in counter_increase(
            batch_df, "ts", "value", 3600, group_cols=["user_id"]
        ).collect()
    }
    assert stream_out == batch_out


def test_streaming_ewm_alpha_one_null_after_valid(spark, tmp_path):
    """alpha=1.0 + adjust=True decays num=den to exactly 0 on a null row;
    the stream must emit a null ewm there (batch/pandas yield NaN), not
    crash with ZeroDivisionError (ADVICE r6)."""
    rows = [
        ("2023-01-01 00:00:00", "5.0"),
        ("2023-01-01 00:01:00", ""),      # null reading
        ("2023-01-01 00:02:00", "7.0"),
    ]
    _write(tmp_path, "a.csv", rows, mtime=1_700_000_000)
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    out = run_available_now(
        streaming_ewm_mean(
            sdf.withColumn("user_id", F.lit(1).cast("bigint")),
            alpha=1.0,
            adjust=True,
        ),
        spark,
        shuffle_partitions=8,
    ).orderBy("ts").collect()
    assert [r["ewm"] for r in out] == [5.0, None, 7.0]


def test_counter_rate_infinite_reading_matches_batch(spark, tmp_path):
    """A ±Inf reading must not crash the stream (int(np.floor(inf)) used
    to raise OverflowError) and both engines must apply the shared
    unusable-reading rule: Inf is not a sample — skipped, deltas span
    across it (10→12 and 12→13 survive). Before the r7 self-audit fix,
    batch emitted a junk bucket row with NULL increase/resets here."""
    from time_series_loader_spark.operators.rate import counter_increase

    rows = [
        ("2023-01-01 00:05:00", "10.0"),
        ("2023-01-01 00:25:00", "Infinity"),  # skipped: not a sample
        ("2023-01-01 00:45:00", "12.0"),      # delta 2 vs the 10 reading
        ("2023-01-01 01:05:00", "13.0"),      # delta 1
    ]
    _write(tmp_path, "a.csv", rows, mtime=1_700_000_000)
    sdf = stream_csv_directory(spark, str(tmp_path), SCHEMA)
    stream_out = {
        r["bucket_ts"]: (r["increase"], r["n_resets"])
        for r in run_available_now(
            streaming_counter_rate(
                sdf.withColumn("user_id", F.lit(1).cast("bigint")), 3600.0
            ),
            spark,
            shuffle_partitions=8,
        ).collect()
    }
    batch_df = spark.createDataFrame(
        [(1, datetime.fromisoformat(ts), float(v)) for ts, v in rows],
        "user_id BIGINT, ts TIMESTAMP, value DOUBLE",
    )
    batch_out = {
        r["ts"]: (r["increase"], r["n_resets"])
        for r in counter_increase(
            batch_df, "ts", "value", 3600, group_cols=["user_id"]
        ).collect()
    }
    assert stream_out == batch_out
    assert sum(inc for inc, _ in stream_out.values()) == pytest.approx(3.0)
    assert all(inc is not None for inc, _ in batch_out.values())


def test_streaming_cusum_state_spans_batches_and_matches_batch(spark, tmp_path):
    """The CUSUM accumulators must carry across the micro-batch line,
    and the final cumulative row must equal the batch operator's
    fixed-target mode BIT-FOR-BIT."""
    from time_series_loader_spark.operators.trend import cusum_stats
    from time_series_loader_spark.streaming.stateful import streaming_cusum

    d = tmp_path / "cusum"
    d.mkdir()
    rows_a = [
        ("2023-01-01 00:00:00", 10.0),
        ("2023-01-01 00:01:00", 10.4),
        ("2023-01-01 00:02:00", 9.8),
    ]
    rows_b = [
        ("2023-01-01 00:03:00", 12.5),
        ("2023-01-01 00:04:00", 13.1),
        ("2023-01-01 00:05:00", float("nan")),  # unusable: skipped
        ("2023-01-01 00:06:00", 12.9),
    ]
    _write(d, "a.csv", rows_a, mtime=1_700_000_000)
    _write(d, "b.csv", rows_b, mtime=1_700_000_100)
    out = run_available_now(
        streaming_cusum(_keyed_stream(spark, d), target=10.0, threshold=2.0),
        spark,
        shuffle_partitions=8,
    ).collect()
    # one cumulative row per batch; the LAST is the detector state
    assert len(out) == 2
    final = max(out, key=lambda r: r["n"])
    assert final["n"] == 6  # NaN skipped

    batch_rows = [
        (7, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v)
        for ts, v in rows_a + rows_b
    ]
    bdf = spark.createDataFrame(batch_rows, ["user_id", "ts", "value"])
    b = cusum_stats(
        bdf, "ts", "value", ["user_id"], threshold=2.0, target=10.0
    ).collect()[0]
    assert (
        final["n"],
        final["n_flags_pos"],
        final["n_flags_neg"],
        final["max_cusum_pos_u"],
        final["max_cusum_neg_u"],
    ) == (
        b["n"],
        b["n_flags_pos"],
        b["n_flags_neg"],
        b["max_cusum_pos_u"],
        b["max_cusum_neg_u"],
    )
    # the upward drift must actually have fired
    assert final["n_flags_pos"] > 0 and final["n_flags_neg"] == 0


def test_streaming_trend_matches_batch_across_batches(spark, tmp_path):
    """Moments carried across the micro-batch line; the final cumulative
    (n, slope_nano) equals the batch operator bit-for-bit."""
    from time_series_loader_spark.operators.trend import trend_slope
    from time_series_loader_spark.streaming.stateful import (
        streaming_trend_slope,
    )

    d = tmp_path / "trend"
    d.mkdir()
    rows_a = [
        ("2023-01-01 00:00:00", 1.0),
        ("2023-01-01 00:00:10", 26.0),
    ]
    rows_b = [
        ("2023-01-01 00:00:20", 51.0),
        ("2023-01-01 00:00:30", 76.0),  # exact line v = 2.5x + 1
    ]
    _write(d, "a.csv", rows_a, mtime=1_700_000_000)
    _write(d, "b.csv", rows_b, mtime=1_700_000_100)
    out = run_available_now(
        streaming_trend_slope(_keyed_stream(spark, d)),
        spark,
        shuffle_partitions=8,
    ).collect()
    assert len(out) == 2
    final = max(out, key=lambda r: r["n"])
    assert (final["n"], final["slope_nano"]) == (4, 2_500_000_000)
    # first batch alone: 2 points, exact slope too
    first = min(out, key=lambda r: r["n"])
    assert (first["n"], first["slope_nano"]) == (2, 2_500_000_000)

    batch_rows = [
        (7, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v)
        for ts, v in rows_a + rows_b
    ]
    bdf = spark.createDataFrame(batch_rows, ["user_id", "ts", "value"])
    b = trend_slope(bdf, "ts", "value", ["user_id"]).collect()[0]
    assert (final["n"], final["slope_nano"]) == (b["n"], b["slope_nano"])


def test_streaming_funnel_matches_batch_counts(spark, tmp_path):
    """Live funnel transitions across micro-batches: distinct users per
    step in the stream == the batch funnel's step counts, on the exact
    fixture test_behavior pins (simultaneous / out-of-order / repeat
    cases included)."""
    from time_series_loader_spark.operators.behavior import funnel_steps
    from time_series_loader_spark.streaming.ingest import (
        run_available_now,
        stream_csv_directory,
    )
    from time_series_loader_spark.streaming.stateful import streaming_funnel

    d = tmp_path / "funnel"
    d.mkdir()
    ev = [  # (user, type, ts) — mirror of test_behavior.EVENTS
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "view", "2024-01-02 00:00:00"),
        (2, "purchase", "2024-01-01 00:00:00"),
        (2, "signup", "2024-01-02 00:00:00"),
        (3, "signup", "2024-01-01 00:00:00"),
        (3, "view", "2024-01-01 12:00:00"),
        (4, "view", "2024-01-01 00:00:00"),
        (5, "signup", "2024-01-04 00:00:00"),
        (5, "view", "2024-01-04 00:00:00"),  # simultaneous: no advance
        (6, "signup", "2024-01-01 00:00:00"),
        (6, "view", "2024-01-02 00:00:00"),
    ]
    ev2 = [  # second batch: later events, including cross-batch advances
        (1, "purchase", "2024-01-03 00:00:00"),
        (4, "purchase", "2024-01-02 00:00:00"),
        (6, "signup", "2024-01-05 00:00:00"),
        (6, "purchase", "2024-01-02 12:00:00"),
    ]

    def _w(name, rows, mtime):
        p = d / name
        lines = ["user_id;event_type;ts"] + [
            f"{u};{t};{ts}" for u, t, ts in rows
        ]
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (mtime, mtime))

    _w("a.csv", ev, 1_700_000_000)
    _w("b.csv", ev2, 1_700_000_100)
    sdf = stream_csv_directory(
        spark,
        str(d),
        "user_id BIGINT, event_type STRING, ts TIMESTAMP",
        max_files_per_trigger=1,
    )
    steps = ["signup", "view", "purchase"]
    out = run_available_now(
        streaming_funnel(sdf, steps), spark, shuffle_partitions=8
    ).collect()
    stream_counts = {
        i: len({r["user_id"] for r in out if r["step"] == i})
        for i in (1, 2, 3)
    }

    rows = [
        (u, t, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"))
        for u, t, ts in ev + ev2
    ]
    bdf = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    batch_counts = {
        r["step"]: r["n_users"]
        for r in funnel_steps(bdf, "ts", "user_id", "event_type", steps).collect()
    }
    assert stream_counts == batch_counts
    # cross-batch advance actually happened (user 1 purchased in batch 2)
    assert any(r["user_id"] == 1 and r["step"] == 3 for r in out)


def test_streaming_cusum_restart_recovery(spark, tmp_path):
    """Checkpoint restart contract for the CUSUM dual (same shape as
    test_stateful_gap_detector_restart_recovery): stop the stream, add
    data, restart a NEW query from the same checkpoint — the per-key
    accumulators (S+, S-, n, flags, maxima, last_ts) must recover, the
    already-processed file must not re-emit, and the restarted run's
    final row must equal the batch operator over the FULL series
    bit-for-bit."""
    import glob
    import json as jsonlib

    from time_series_loader_spark.operators.trend import cusum_stats
    from time_series_loader_spark.streaming.stateful import streaming_cusum

    d = tmp_path / "cusum_rr"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def drain():
        before = set(glob.glob(f"{out_dir}/*.json"))
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                streaming_cusum(
                    _keyed_stream(spark, d), target=10.0, threshold=2.0
                )
                .writeStream.format("json")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
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

    rows_a = [
        ("2023-01-01 00:00:00", 10.0),
        ("2023-01-01 00:01:00", 10.4),
        ("2023-01-01 00:02:00", 9.8),
    ]
    rows_b = [
        ("2023-01-01 00:03:00", 12.5),
        ("2023-01-01 00:04:00", 13.1),
        ("2023-01-01 00:05:00", 12.9),
    ]
    _write(d, "a.csv", rows_a, mtime=1_700_000_000)
    first = drain()
    assert len(first) == 1 and first[0]["n"] == 3

    _write(d, "b.csv", rows_b, mtime=1_700_000_100)
    second = drain()
    # only the NEW batch's cumulative row: a.csv's offsets are committed
    assert len(second) == 1
    final = second[0]
    assert final["n"] == 6  # state (incl. n) carried across the restart

    batch_rows = [
        (7, datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v)
        for ts, v in rows_a + rows_b
    ]
    bdf = spark.createDataFrame(batch_rows, ["user_id", "ts", "value"])
    b = cusum_stats(
        bdf, "ts", "value", ["user_id"], threshold=2.0, target=10.0
    ).collect()[0]
    assert (
        final["n"],
        final["n_flags_pos"],
        final["n_flags_neg"],
        final["max_cusum_pos_u"],
        final["max_cusum_neg_u"],
    ) == (
        b["n"],
        b["n_flags_pos"],
        b["n_flags_neg"],
        b["max_cusum_pos_u"],
        b["max_cusum_neg_u"],
    )
