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


_PROBE_PRESERVING = {
    "inner", "cross", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
}


def _check_probe_preserving(how: str) -> None:
    if how.lower().replace(" ", "") not in _PROBE_PRESERVING:
        raise ValueError(
            f"salted joins replicate the build side; how={how!r} would "
            "emit one row per salt for unmatched build rows — use a "
            "probe-preserving join type or salt the other side"
        )


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

    ``how`` is restricted to probe-preserving joins (inner / left /
    left_semi / left_anti / cross): the build side is REPLICATED, so a
    right/full join would emit ``n_salts`` copies of every unmatched
    build row — wrong multiplicity by construction (r11 guard; salt the
    other side instead).
    """
    _check_probe_preserving(how)
    salt = F.pmod(F.xxhash64(*probe.columns), F.lit(n_salts))
    p = probe.withColumn("_salt", salt)
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = p.join(b, [on, "_salt"], how)
    return out.drop("_salt")


def salted_join_hot(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    hot_keys: Sequence | None = None,
    n_salts: int = 8,
    how: str = "inner",
    detect_k: int = 100,
) -> DataFrame:
    """PARTIAL salting — the production skew-join pattern: salt ONLY the
    hot keys, so the build side replicates only its hot rows ×n_salts
    instead of wholesale (:func:`salted_join` replicates everything,
    which at a 10⁹-row build is n_salts× the shuffle for keys that were
    never skewed).

    ``hot_keys``: the keys to salt. When None they are DETECTED with
    the Misra-Gries heavy-hitter sketch (`sketches.heavy_hitters`,
    ``k=detect_k`` — every key owning > 1/detect_k of the probe rows),
    which finds them WITHOUT shuffling the distinct-key set: at 100 TB
    the detection pass is a map-side sketch merge, and the hot list is
    by construction ≤ detect_k entries — driver-safe, folded into the
    plan as literals. Pass an explicit list when the hot set is known
    (e.g. from yesterday's run) to skip the detection action.

    Plan shape (ONE join, no union-of-joins split): probe rows with a
    hot key get ``salt = xxhash64(row) % n_salts``, cold rows salt 0;
    build rows with a hot key replicate over all salts, cold build rows
    carry salt 0. Cold traffic is byte-for-byte the plain shuffle join;
    hot traffic spreads over n_salts reducers. Equivalent rows out.

    When to reach for this (measured, SCALING.md r12 production-posture
    probe — AQE + broadcast ON): ONLY when BOTH hold — (1) the build
    side cannot broadcast at any threshold you can afford (memory, not
    the 10 MB default, is the real limit), and (2) a probe key owns
    enough of the table that one reducer staggers. If the build side
    broadcasts, do NOTHING: a broadcast hash join has no shuffle, so
    there is no hot reducer to fix — plain-under-AQE ran 100M skewed
    facts in 0.66 s while this operator cost 8.4 s (its MG detection
    scan) and FULL salting cost 31 s (the ×n_salts-replicated build is
    what AQE then joins — 50× worse than doing nothing). In the
    no-broadcast regime this operator holds its win: 6.1 s vs plain
    21.8 s / AQE skew-split 19.4 s at 100M facts (3.5×), 1.7× over
    full :func:`salted_join` — AQE's split also re-merges for a
    following aggregation, which salting's key rewrite avoids. ``how``
    restricted to probe-preserving joins — see :func:`salted_join`.
    """
    _check_probe_preserving(how)
    if hot_keys is None:
        from time_series_loader_spark.operators.sketches import heavy_hitters

        hot_keys = [
            r[on]
            for r in heavy_hitters(probe, on, k=detect_k).collect()
            if r[on] is not None
        ]
    hot_keys = list(hot_keys)
    if not hot_keys:
        return probe.join(build, on, how)
    is_hot = F.col(on).isin(hot_keys)
    p = probe.withColumn(
        "_salt",
        F.when(is_hot, F.pmod(F.xxhash64(*probe.columns), F.lit(n_salts)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    b_hot = build.where(is_hot).withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    b_cold = build.where(~is_hot | F.col(on).isNull()).withColumn(
        "_salt", F.lit(0)
    )
    out = p.join(b_hot.unionByName(b_cold), [on, "_salt"], how)
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
