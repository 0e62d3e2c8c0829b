"""Build the frozen BPE merge table (resources/bpe_merges.parquet).

Standard BPE training (Sennrich et al. 2016) over the sf0.001
``documents`` word-frequency vocabulary, fully deterministic:

- pair counts weighted by word frequency;
- best pair = highest count, ties broken by lexicographically smallest
  (a, b) — NO hash/dict order dependence;
- stop at N_MERGES merges or when the best count drops below 2.

Run once; the output is a pinned package resource (same contract as
``ln_u_micro.parquet`` — regenerating with the same inputs must be
byte-stable, and the gate certifies against the SHIPPED file, so a
retrain is a deliberate, versioned act).

Usage: python tools/gen_bpe_merges.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_loader_spark.functions.bpe import MERGES_PATH, merge_fold

# the sf0.001 trainer saturates at 89 merges (best pair count < 2);
# 128 is the cap that lets it run to saturation reproducibly
N_MERGES = 128


def train(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    seqs: dict[str, list[str]] = {w: list(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        for w in word_freq:
            seqs[w] = merge_fold(seqs[w], *best)
    return merges


def main() -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else N_MERGES
    rows = duckdb.sql(
        "SELECT w, count(*) AS c FROM (SELECT unnest(string_split(text, ' ')) AS w "
        f"FROM '{sf_dir}/documents.parquet') WHERE w <> '' GROUP BY w ORDER BY w"
    ).fetchall()
    word_freq = {w: int(c) for w, c in rows}
    merges = train(word_freq, n_merges)
    tbl = pa.table(
        {
            "rank": pa.array(range(len(merges)), pa.int32()),
            "a": pa.array([a for a, _ in merges], pa.string()),
            "b": pa.array([b for _, b in merges], pa.string()),
        }
    )
    pq.write_table(tbl, MERGES_PATH)
    print(f"{len(merges)} merges over {len(word_freq)}-word vocab -> {MERGES_PATH}")
    print("first 10:", merges[:10])


if __name__ == "__main__":
    main()
