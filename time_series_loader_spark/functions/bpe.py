"""Pinned-vocab byte-pair-encoding tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Token budgets, shard packing, and chunking elsewhere in this engine
count WHITESPACE tokens; production corpus work budgets in real
tokenizer tokens (a 2048-token context is 2048 BPE tokens, not 2048
words). This module supplies that counter with the same cross-engine
certification discipline as the pinned-ln table
(``resources/ln_u_micro.parquet``): the merge table is a FROZEN package
resource (``resources/bpe_merges.parquet``, built once by
``tools/gen_bpe_merges.py`` with deterministic tie-breaking), so token
counts are a pure function of (text, resource) — reproducible on any
engine, any partitioning, any round.

Semantics (the exact contract the DuckDB oracle replays in SQL):

- pre-tokenization: split on single spaces; empty pieces drop. No case
  folding, no Unicode normalization — engine-native ``lower()`` is a
  known cross-engine divergence (envpins), and normalization is its own
  certified operator (``normalize_text``).
- per word: start from the character sequence; repeatedly find the
  LOWEST-RANKED merge whose pair occurs adjacently, and merge ALL its
  occurrences leftmost-first non-overlapping (a left fold: "aaa" under
  ("a","a") → ["aa","a"]); stop when no merge applies. Characters never
  seen in training remain single-character tokens — every string
  tokenizes, there is no OOV.
- doc token count = Σ over its words of the word's BPE token count.

Scale shape: the Python-side work is VOCAB-sized, never corpus-sized —
distinct words go through one Arrow batch kernel, then a word-keyed
join (AQE-broadcast at real vocab/corpus ratios) carries the counts
back to the corpus rows. The corpus-sized operations (split, explode,
groupBy) all stay JVM-side in whole-stage codegen. At 100 TB the
distinct-word set is the same Heaps-law vocabulary any LM pipeline
materializes, orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "bpe_merges.parquet",
)


@lru_cache(maxsize=1)
def load_merges(path: str | None = None) -> tuple[tuple[str, str], ...]:
    """The frozen merge list, rank order. Tuple so the lru_cache value
    is immutable; a few hundred entries, trivially closure-shippable."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path or MERGES_PATH)
    ranks = tbl.column("rank").to_pylist()
    a = tbl.column("a").to_pylist()
    b = tbl.column("b").to_pylist()
    order = sorted(range(len(ranks)), key=lambda i: ranks[i])
    return tuple((a[i], b[i]) for i in order)


def merge_fold(toks: list[str], a: str, b: str) -> list[str]:
    """ONE merge step: fuse every adjacent (a, b) leftmost-first,
    non-overlapping — the canonical fold shared by the trainer, the
    encoder, and the tests (and mirrored by the oracle's
    ``replace(s, '␟a␟␟b␟', '␟ab␟')``, whose left-to-right non-overlap
    semantics are identical)."""
    out: list[str] = []
    for t in toks:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


def encode_word(
    word: str, merges: tuple[tuple[str, str], ...]
) -> list[str]:
    """BPE-encode one word: apply the lowest-ranked applicable merge,
    all occurrences at once, until none applies."""
    toks = list(word)
    ranks = _ranks_of(merges)
    while len(toks) > 1:
        best = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        toks = merge_fold(toks, *merges[best])
    return toks


@lru_cache(maxsize=4)
def _ranks_of(merges: tuple[tuple[str, str], ...]) -> dict:
    return {pair: i for i, pair in enumerate(merges)}


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | list[str] = "doc_id",
    out_col: str = "n_bpe_tokens",
    merges_path: str | None = None,
) -> DataFrame:
    """Append ``out_col`` = the document's pinned-vocab BPE token count.

    Plan: explode the space-split words (JVM), reduce to DISTINCT words,
    encode only those in one Arrow kernel (vocab-sized Python), join the
    per-word counts back (word-keyed, AQE-broadcast for real vocabs) and
    sum per document. Documents with no words count 0. ``id_col`` may be
    a list for composite keys (e.g. ``["doc_id", "chunk_id"]`` for
    per-chunk counts from ``chunk_documents``).

    The counts column is the drop-in real-tokenizer weight for
    ``shard_pack`` / ``sequence_pack`` budgets
    (``shard_pack(counts, id_col, out_col, budget)``) — pinned by
    ``tests/test_bpe.py::test_shard_pack_budgets_in_bpe_tokens``.
    """
    merges = load_merges(merges_path)
    ids = [id_col] if isinstance(id_col, str) else list(id_col)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ntok(words: pd.Series) -> pd.Series:
        return words.map(lambda w: len(encode_word(w, merges)))

    toks = F.split(F.col(text_col), " ")
    words = df.select(
        *[F.col(c) for c in ids], F.explode(toks).alias("_w")
    ).where(F.col("_w") != "")
    vocab = words.select("_w").distinct().withColumn("_ntok", _ntok("_w"))
    counts = (
        words.join(vocab, "_w")
        .groupBy(*ids)
        .agg(F.sum("_ntok").cast("long").alias(out_col))
    )
    return df.join(counts, ids, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )
