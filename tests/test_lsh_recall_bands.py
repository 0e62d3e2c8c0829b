"""Per-band LSH recall must track the banding S-curve prediction
(VERDICT r11 directive #7): `lsh_collision_probability` is the tuning
tool SCALING.md tells users to reach for, so its predictions are
pinned against measured recall on a constructed-Jaccard corpus —
per TRUE-Jaccard band, not just in aggregate.

Statistical contract: each constructed pair is an independent
Bernoulli trial of the banding process (disjoint token namespaces →
independent minhash draws), so measured recall in a band of n pairs
sits within ~3 binomial standard errors of the predicted mean unless
the helper is wrong. The full probe (tools/recall_probe.py, 400
pairs/band) is the SCALING.md record; this test runs a lighter corpus
with the same machinery."""

import math

from tools.recall_probe import BANDS, build_pairs, measure_band_recall, true_jaccard

PAIRS_PER_BAND = 120


def test_constructed_jaccard_is_exact_by_formula():
    meta, rows = build_pairs(4)
    texts = dict(rows)
    for pid, bi, m, tj in meta:
        toks_a = texts[2 * pid].split()
        toks_b = texts[2 * pid + 1].split()
        sh_a = {" ".join(toks_a[i : i + 3]) for i in range(len(toks_a) - 2)}
        sh_b = {" ".join(toks_b[i : i + 3]) for i in range(len(toks_b) - 2)}
        j = len(sh_a & sh_b) / len(sh_a | sh_b)
        assert abs(j - tj) < 1e-12, (pid, j, tj)
        assert abs(j - true_jaccard(m)) < 1e-12
        lo, hi = BANDS[bi]
        assert lo <= j < hi + 1e-9


def test_measured_recall_tracks_s_curve_per_band(spark):
    res, max_err, _wall = measure_band_recall(spark, PAIRS_PER_BAND)
    for r in res:
        p, n = r["predicted"], r["n"]
        tol = max(3.0 * math.sqrt(p * (1 - p) / n), 0.02)
        assert abs(r["measured"] - p) <= tol, (
            f"band {r['lo']}-{r['hi']}: measured {r['measured']:.3f} vs "
            f"predicted {p:.3f} (tol {tol:.3f}, n={n})"
        )
    # monotone: recall must not decrease across bands
    meas = [r["measured"] for r in res]
    assert all(b >= a - 0.05 for a, b in zip(meas, meas[1:]))
    # the jaccard column near_dup_pairs reports equals constructed truth
    assert max_err < 1e-9
