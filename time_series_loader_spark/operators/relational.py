"""Relational helpers for skewed data at scale.

AQE's skew-join splitting handles most skew automatically (enabled in
session defaults); these utilities cover the cases AQE can't:

- ``salted_join`` — explicit key salting for a *shuffle* join where one key
  dominates (AQE splits partitions, but a single monster key still lands in
  one task per split boundary); salting spreads one key over N subkeys by
  replicating the build side.
- ``top_k`` — per-group top-k without a global sort (window + filter).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: the probe side gets a random-ish salt
    (deterministic hash of its row content modulo n_salts), the build side
    is replicated once per salt — a skewed probe key now spreads over
    ``n_salts`` reducers.

    Use when the probe side has a dominant hot key and the build side is
    too big to broadcast but small enough to replicate ×n_salts.
    """
    salt = F.pmod(F.xxhash64(*probe.columns), F.lit(n_salts))
    p = probe.withColumn("_salt", salt)
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(b, [on, "_salt"], how)
    return out.drop("_salt")


def top_k(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str | Column,
    k: int,
    descending: bool = True,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows per group via a rank window — no global sort, one
    hash-partitioned shuffle on the group key."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc() if descending else oc.asc()] + [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
