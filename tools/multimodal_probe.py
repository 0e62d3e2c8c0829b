"""Multimodal kernel scaling probe (VERDICT r11 directive #4).

`multimodal_decode` was one of two gate families with no 10x/100x
record. The kernels (decode_features, transform_payloads) are
Arrow-batched mapInPandas with ZERO shuffle, so the expectation is
flat bytes/sec as payload bytes grow — this probe measures it and
records the sustained throughput.

Two scaling axes, separated because the kernels have distinct cost
terms (per-ROW header walk + hashing vs per-BYTE numpy slicing):

- **bytes axis** (the 100 TB axis): fixed 8 192 payloads, payload SIZE
  x1/x10/x100 (BMP pixel area / WAV frame count scaled so bytes track
  the factor). A flat MB/s row here means the kernel is byte-bound and
  scale-out is purely horizontal.
- **rows axis**: fixed base payload size, COUNT x10 — exposes per-row
  overhead (Arrow batch assembly, header parse, RIFF walk).

Method: payloads are synthesized ONCE per scale and persisted to
parquet (generation is ingest cost, not kernel cost), then each
kernel is timed reading from that parquet with a noop-sink action
(`write.format("noop")` — count() would let Catalyst prune the
payload column and time the scan, r10 lesson). Input is repartitioned
to defaultParallelism first (single parquet file = one partition =
one core otherwise; real multimodal corpora arrive as many shards).

ops timed: decode (real BMP/WAV header parse), resize (BMP
nearest-neighbor to 16x16), frame_sample (WAV keep-every-4th),
feature extract (stub digest kernel — the sha256 is the cost).

Usage: python tools/multimodal_probe.py [factor ...]   # default 1 10 100
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_PAYLOADS = 8_192
BASE_SIDE = 26  # BMP ~26x26x3 ≈ 2 KB; x10 → 82, x100 → 260


def synth_scaled(spark, n_rows: int, factor: int, out_path: str) -> int:
    """Write n_rows payloads with byte size ~factor x base to parquet;
    returns total payload bytes. Even ids → 24bpp BMP, odd → 16-bit PCM
    WAV (the two real-parser formats), sizes deterministic in the id."""
    from typing import Iterator

    import pandas as pd

    from time_series_loader_spark.operators.multimodal import make_bmp, make_wav

    side = round(BASE_SIDE * factor**0.5)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    payloads.append(make_bmp(side + i % 7, side + i % 5))
                else:
                    # frames sized so WAV bytes ≈ BMP bytes at each factor
                    n_frames = (side * side * 3) // 4 + i % 11
                    payloads.append(make_wav(16000, 2, n_frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    (
        spark.range(n_rows)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(batches, "doc_id BIGINT, payload BINARY")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return (
        spark.read.parquet(out_path)
        .agg(F.sum(F.length("payload")))
        .collect()[0][0]
    )


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_ops(spark, path: str) -> dict[str, float]:
    from time_series_loader_spark.operators.multimodal import (
        decode_features,
        extract_features,
        transform_payloads,
    )

    src = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism
    )
    walls = {}
    walls["decode"] = _noop(decode_features(src))
    walls["resize"] = _noop(transform_payloads(src, "resize", out_w=16, out_h=16))
    walls["frame_sample"] = _noop(transform_payloads(src, "frame_sample", every=4))
    stub_src = src.withColumn("modality", F.lit("image"))
    walls["extract_stub"] = _noop(extract_features(stub_src, decode_stub=True))
    return walls


def main():
    from time_series_loader_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark()
    # r13: the decode/resize kernels slot PIL in when installed
    # (multimodal.py::_pil_image); the recorded byte rates are
    # codec-dependent, so stamp which codec path this run measured
    import importlib.util

    pil = importlib.util.find_spec("PIL") is not None
    print(
        "codec path: "
        + ("PIL installed (JPEG/PNG decode+resize active)" if pil
           else "pure-Python BMP/WAV only (PIL absent)")
    )
    print(f"{'factor':>6} {'rows':>7} {'MB':>8} " + " ".join(
        f"{op:>14}" for op in ("decode", "resize", "frame_sample", "extract_stub")
    ))
    for mode, factor_rows in (
        ("bytes", [(f, N_PAYLOADS) for f in factors]),
        ("rows", [(1, N_PAYLOADS * 10)]),
    ):
        for factor, n_rows in factor_rows:
            work = tempfile.mkdtemp(prefix=f"mm{factor}_")
            path = os.path.join(work, "payloads")
            total = synth_scaled(spark, n_rows, factor, path)
            mb = total / 1e6
            # warm-up once (JIT/codegen), then two timed runs, best kept
            run_ops(spark, path)
            r1, r2 = run_ops(spark, path), run_ops(spark, path)
            best = {op: min(r1[op], r2[op]) for op in r1}
            cells = " ".join(
                f"{best[op]:6.2f}s {mb / best[op] / 1000:4.2f}GB/s" for op in best
            )
            print(f"{mode}x{factor:<4} {n_rows:>7} {mb:>8.1f} {cells}", flush=True)
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
