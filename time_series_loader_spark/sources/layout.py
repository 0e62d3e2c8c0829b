"""Z-order (Morton curve) data layout for multi-column data skipping.

The lakehouse write-side optimization (public technique — Morton 1966;
Delta/Iceberg `OPTIMIZE ZORDER BY`): a table range-partitioned and
sorted by ONE column prunes scans on that column only; interleaving the
bits of SEVERAL columns into one sort key clusters rows that are close
in ALL of them, so every file's per-column min/max footer stats cover a
narrow hyper-rectangle and a multi-column predicate skips most files at
planning time (`spark.read.parquet(...).where(x BETWEEN … AND y …)`
reads only the overlapping files/row-groups).

Scale shape: one tiny min/max aggregate (broadcast scalars folded into
the expression), one `repartitionByRange` on the z-key (the same single
range exchange any sorted write pays), sort WITHIN partitions, write.
Nothing driver-sized except the 2·k min/max scalars.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits_per_col: int = 8,
    out_col: str = "_zorder",
) -> DataFrame:
    """Append a Morton z-curve key interleaving ``bits_per_col`` bits of
    each column in ``cols`` (numeric or timestamp).

    Each column is min-max scaled to [0, 2^bits) — one aggregate over
    the frame computes the 2·k bounds, which fold into the expression as
    literals (no join). Equi-width scaling is deterministic and cheap;
    heavily skewed columns cluster poorly under it — pre-transform
    (log/rank-bucket) upstream if a dimension is Zipfian. Null values
    scale to bucket 0 (they sort first, as in an ascending sort).

    ``bits_per_col`` · len(cols) must fit a BIGINT (≤ 62 bits total).
    """
    if not cols:
        raise ValueError("need at least one column to z-order by")
    total_bits = bits_per_col * len(cols)
    if total_bits > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits_per_col} bits = {total_bits} > 62 bits"
        )
    buckets = 1 << bits_per_col

    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]

    def scaled(c: str) -> Column:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        if lo is None or hi is None or hi == lo:
            return F.lit(0).cast("long")
        v = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        b = F.floor(v * buckets).cast("long")
        clamped = F.least(F.greatest(b, F.lit(0)), F.lit(buckets - 1))
        return F.coalesce(clamped, F.lit(0))

    m = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        s = scaled(c)
        for i in range(bits_per_col):
            # bit i of column j lands at interleaved position i*m + j
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1).cast("long")), i * m + j
            )
    return df.withColumn(out_col, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits_per_col: int = 8,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet clustered along the z-curve of ``cols``:
    range-partition on the z-key into ``n_files`` slices, sort within
    each, drop the key, write. Every output file then holds one compact
    z-range, i.e. a narrow min/max hyper-rectangle in all ``cols`` —
    the layout multi-column predicates prune against (verified against
    real parquet footer statistics in test_layout)."""
    keyed = zorder_key(df, cols, bits_per_col)
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )
