"""LSH recall vs the banding S-curve prediction, per true-Jaccard band
(VERDICT r11 directive #7).

r11 quantified the recall contract analytically
(`operators/dedup.py::lsh_collision_probability`, the standard
1-(1-j^r)^b banding S-curve) and measured 99.85% AGGREGATE recall at
the dense 100x near-dup probe. This probe certifies the helpers'
practical accuracy where tuning decisions actually use them: recall
per TRUE-Jaccard band, measured against a corpus of pairs with
CONSTRUCTED exact shingle Jaccard.

Construction (deterministic, no RNG): pair i gets its own token
namespace (p{i}t{k} — namespaces are disjoint, so no cross-pair band
collisions and every pair is an independent Bernoulli trial of the
banding process). doc_a = L fresh tokens; doc_b = the first m tokens
of doc_a + (L-m) fresh tokens. With w-shingles (w=3) the shared
shingle count is m-w+1 and the union is 2(L-w+1)-(m-w+1), so

    true_j(m) = (m - w + 1) / (2L - m - w + 1)

is EXACT by construction, and m is chosen per target band midpoint by
inverting that formula. MinHash sees md5-hashed shingle strings, so
the construction's determinism does not correlate the hash draws.

Measured recall per band = fraction of constructed pairs surfaced by
`minhash_lsh_pairs(threshold=0.0)` — the exact candidate set
`near_dup_pairs` verifies (verification never drops a pair above the
exact threshold, so candidate recall IS near_dup_pairs recall).
Predicted = mean of lsh_collision_probability(true_j) over the band's
pairs. The probe also cross-checks the `jaccard` column
near_dup_pairs reports for found pairs against the constructed value
(precision-of-score certification).

Usage: python tools/recall_probe.py [pairs_per_band]   # default 400
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_loader_spark.operators.dedup import (
    lsh_collision_probability,
    minhash_lsh_pairs,
    near_dup_pairs,
)

L = 100  # tokens per doc
W = 3  # shingle width
BANDS = [(0.5, 0.6), (0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.0)]


def m_for_jaccard(j: float, length: int = L, w: int = W) -> int:
    """Invert true_j(m) = (m-w+1)/(2*length-m-w+1) for the shared
    prefix length m (rounded to nearest integer)."""
    s = length - w + 1  # shingles per doc
    # shared c = m-w+1 solves j = c/(2s-c)  =>  c = 2sj/(1+j)
    m = 2 * s * j / (1 + j) + w - 1
    return max(w, min(length, round(m)))


def true_jaccard(m: int, length: int = L, w: int = W) -> float:
    s = length - w + 1
    shared = m - w + 1
    return shared / (2 * s - shared)


def build_pairs(pairs_per_band: int):
    """[(pair_id, band_idx, m, true_j)] and the (doc_id, text) rows.
    doc ids: pair i -> docs 2i (a) and 2i+1 (b)."""
    meta, rows = [], []
    pid = 0
    for bi, (lo, hi) in enumerate(BANDS):
        for k in range(pairs_per_band):
            # spread targets across the band, not just its midpoint
            tgt = lo + (hi - lo) * (k + 0.5) / pairs_per_band
            m = m_for_jaccard(tgt)
            tj = true_jaccard(m)
            a_toks = [f"p{pid}t{t}" for t in range(L)]
            b_toks = a_toks[:m] + [f"p{pid}u{t}" for t in range(L - m)]
            rows.append((2 * pid, " ".join(a_toks)))
            rows.append((2 * pid + 1, " ".join(b_toks)))
            meta.append((pid, bi, m, tj))
            pid += 1
    return meta, rows


def measure_band_recall(
    spark, pairs_per_band: int = 400, num_hashes: int = 16, bands: int = 4
):
    """Returns per-band dicts: lo, hi, n, found, measured, predicted —
    plus the score-agreement max error for found pairs."""
    meta, rows = build_pairs(pairs_per_band)
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(
        spark.sparkContext.defaultParallelism
    )
    t0 = time.time()
    cand = minhash_lsh_pairs(
        docs, "text", "doc_id", n=W, num_hashes=num_hashes, bands=bands,
        threshold=0.0,
    )
    found_ids = {
        r["id_a"] // 2
        for r in cand.collect()
        if r["id_b"] == r["id_a"] + 1 and r["id_a"] % 2 == 0
    }
    lsh_wall = time.time() - t0
    out = []
    for bi, (lo, hi) in enumerate(BANDS):
        band_pairs = [m for m in meta if m[1] == bi]
        n = len(band_pairs)
        found = sum(1 for p in band_pairs if p[0] in found_ids)
        pred = sum(
            lsh_collision_probability(p[3], num_hashes, bands) for p in band_pairs
        ) / n
        out.append(
            {
                "lo": lo,
                "hi": hi,
                "n": n,
                "found": found,
                "measured": found / n,
                "predicted": pred,
            }
        )
    # score agreement: the exact jaccard near_dup_pairs reports must
    # equal the constructed truth for every found constructed pair
    ver = near_dup_pairs(
        docs, "text", "doc_id", n=W, num_hashes=num_hashes, bands=bands,
        threshold=0.0,
    )
    by_pid = {m[0]: m[3] for m in meta}
    max_err = 0.0
    for r in ver.collect():
        if r["id_b"] == r["id_a"] + 1 and r["id_a"] % 2 == 0:
            pid = r["id_a"] // 2
            max_err = max(max_err, abs(r["jaccard"] - by_pid[pid]))
    return out, max_err, lsh_wall


def main():
    from time_series_loader_spark.session import get_spark

    ppb = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    spark = get_spark()
    res, max_err, wall = measure_band_recall(spark, ppb)
    print(f"pairs/band={ppb}  lsh wall={wall:.1f}s  score max|err|={max_err:.2e}")
    print(f"{'band':>10} {'n':>5} {'found':>5} {'measured':>9} {'predicted':>9} {'delta':>7}")
    for r in res:
        print(
            f"{r['lo']:.1f}-{r['hi']:.1f} {r['n']:>5} {r['found']:>5} "
            f"{r['measured']:>9.4f} {r['predicted']:>9.4f} "
            f"{r['measured'] - r['predicted']:>+7.4f}"
        )


if __name__ == "__main__":
    main()
