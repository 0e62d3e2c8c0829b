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


def _merge_fold_expr(seq, a: str, b: str):
    """JVM expression form of :func:`merge_fold` — leftmost-first
    non-overlapping merge of adjacent (a, b) into a+b, as a single
    ``aggregate`` HOF over the token array (no Python hop).

    Equivalence argument (pinned by test_bpe_train's differential):
    merge_fold scans the ORIGINAL sequence left-to-right, merging
    non-overlapping occurrences greedily; this fold appends each token
    unless the accumulator's LAST element equals ``a`` and the incoming
    token equals ``b``, in which case it replaces that last element
    with ``a+b``. The two agree because a just-merged tail element is
    ``a+b``, which can never equal ``a`` (``b`` is non-empty, BPE
    tokens are non-empty strings), so a merge output can never be
    consumed as the left side of another merge in the SAME pass —
    exactly the non-overlap rule."""
    return F.aggregate(
        seq,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 128,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """DISTRIBUTED BPE training (Sennrich et al. 2016) — learn the merge
    table from a corpus, bit-identical to the sequential reference
    trainer (`tools/gen_bpe_merges.py::train`, the one that built the
    frozen ``resources/bpe_merges.parquet``): pair counts weighted by
    word frequency, best pair = highest count with ties broken by
    lexicographically smallest (a, b), stop when the best count drops
    below ``min_count`` or after ``n_merges`` merges.

    The existing trainer collects the whole word-frequency vocabulary
    to the driver — fine for a gate corpus, impossible at 100 TB where
    the Heaps-law vocabulary is itself a distributed table (10⁸+
    distinct words). Here the vocabulary NEVER leaves the executors:

    - one corpus-sized aggregation builds (word, freq, seq) — the only
      pass over the corpus; everything after is vocabulary-sized;
    - per merge: adjacent pairs via ``arrays_zip`` of shifted slices
      (JVM), weighted groupBy-sum, and the argmax reduced to ONE driver
      row via ``min(struct(-count, a, b))`` — the deterministic
      tie-break as a struct ordering, no pair list ever collected;
    - the winning merge is applied with :func:`_merge_fold_expr` — a
      pure JVM fold, no Arrow hop — to only the words that CONTAIN the
      pair (an ``exists`` filter; untouched words pass through);
    - merges are inherently SEQUENTIAL (each changes the pair counts
      the next one sees — same data dependence every BPE trainer has),
      so the driver loop runs one vocabulary-sized Spark job per merge;
      ``checkpoint_every`` bounds lineage growth by materializing the
      (vocabulary-sized) state frame every k merges.

    Returns the learned merge list in rank order. Driver-side memory is
    O(n_merges) — the merge table itself, which is the artifact being
    learned and is small by construction (32k entries for a production
    tokenizer).

    Scale shape: after the first pass, per-merge cost is vocabulary-
    sized and embarrassingly parallel; the 100 TB corpus term appears
    exactly once. For real tokenizer training (32k merges) the same
    loop applies; production would persist the state frame to a table
    every few hundred merges instead of localCheckpoint (same contract,
    restartable).
    """
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("seq", F.split(F.col("w"), ""))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    since_ckpt = 0
    try:
        for _ in range(n_merges):
            zipped = F.arrays_zip(
                F.slice("seq", 1, F.size("seq") - 1).alias("a"),
                F.slice("seq", 2, F.size("seq") - 1).alias("b"),
            )
            best = (
                vocab.where(F.size("seq") >= 2)
                .select("freq", F.explode(zipped).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("cnt"))
                .agg(F.min(F.struct((-F.col("cnt")).alias("negcnt"), "a", "b")).alias("m"))
                .collect()[0]["m"]
            )
            if best is None or -best["negcnt"] < min_count:
                break
            a, b = best["a"], best["b"]
            merges.append((a, b))
            # size guard first: slice(seq, 2, size-1) underflows on
            # single-char words (length -1) if evaluated, and `when`
            # short-circuits per-row
            has_pair = (F.size("seq") >= 2) & F.exists(
                zipped, lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b))
            )
            vocab = vocab.withColumn(
                "seq",
                F.when(has_pair, _merge_fold_expr(F.col("seq"), a, b)).otherwise(
                    F.col("seq")
                ),
            )
            since_ckpt += 1
            if since_ckpt >= checkpoint_every:
                vocab = vocab.localCheckpoint(eager=True)
                since_ckpt = 0
    finally:
        # the state frame is working memory, not a result — drop the
        # final checkpoint's blocks (earlier ones are released when
        # their DataFrame is superseded and GC'd)
        try:
            vocab.unpersist()
        except Exception:
            pass
    return merges
