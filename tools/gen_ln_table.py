"""Regeneration recipe for the pinned natural-log micro-unit table.

Writes ``time_series_loader_spark/resources/ln_u_micro.parquet`` with one
row per integer ``k`` in [1, MAX_K]: ``ln_u = floor(ln(k)*1e6 + 0.5)``
(half-up micro-units), evaluated by CPython's ``math.log`` in a single
pass so the table is ONE libm's answer, frozen.

Why pinned (round-7, VERDICT.md r6 directive #1): ``ln`` is a
transcendental — JVM intrinsics, DuckDB's libm, and numpy can disagree in
the last ulp, and the disagreement is build/CPU-dependent. Every
oracle-gated query that needs a logarithm (tfidf idf, unigram-LM logp)
must therefore look the value up from THIS table on BOTH sides (Spark
reads the parquet / builds literals from it; the DuckDB oracle SQL reads
the same parquet), so no engine ever evaluates ``ln`` at query time and
the two sides cannot drift — by construction, not by tolerance.

MAX_K sizing: the largest argument ever looked up is DSIR's
``n_raw_features + n_buckets`` (unigrams + bigrams over the corpus,
~537k at sf0.1) — ~5.4M in the 10× scale probe over the synthesized
corpus, which overflowed the original 4,000,000 ceiling exactly as
designed (the lookup raised loudly, r8). 8,000,000 restores probe
headroom; the helpers still raise beyond it (at true 100 TB scale the
engine-side quantized-``ln`` path in operators/text.py is the right tool;
the pinned table is the bit-certification tool for oracle-gated scales).

Usage: python tools/gen_ln_table.py
"""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq

MAX_K = 8_000_000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "time_series_loader_spark",
    "resources",
    "ln_u_micro.parquet",
)


def ln_u(k: int) -> int:
    """floor(ln(k)*1e6 + 0.5) — half-up micro-units of ln(k)."""
    return math.floor(math.log(k) * 1e6 + 0.5)


def main() -> None:
    ks = list(range(1, MAX_K + 1))
    vals = [ln_u(k) for k in ks]
    table = pa.table(
        {"k": pa.array(ks, pa.int64()), "ln_u": pa.array(vals, pa.int64())}
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {len(ks)} rows, {os.path.getsize(OUT)} bytes")


if __name__ == "__main__":
    main()
