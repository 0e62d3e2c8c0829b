"""Concatenate-and-chunk sequence packing (pre-training batch prep).

Public technique: the GPT-2/3 training-data recipe, HF ``group_texts``
(the `run_clm.py` example's canonical preprocessing) — concatenate every
document's token stream in a deterministic order into one global stream
and split it every ``context_len`` tokens. Unlike shard packing
(`sampling.shard_pack` — whole docs into ~budget shards), a document
CROSSES bin boundaries: it contributes a segment to every context
window its token interval overlaps, and every bin except the last is
exactly full (packing efficiency 1 by construction — the property that
makes this the default recipe when document boundaries don't matter).

The emitted plan is position-only — (doc, bin, doc_off, bin_off,
seg_len) — so it is exact-integer end to end: certifiable against a SQL
oracle with zero float channels, and composable with `chunking.
chunk_documents`-style token slicing for materializing the text.

Scale shape: the global exclusive prefix sum comes from
`sampling.shard_pack`'s distributed range-bucketed scan (per-bucket
partial sums + broadcast offsets + within-bucket window — no
single-partition funnel); the segment fan-out is a map-side
``sequence``+``explode`` (≤ n/context_len + 1 rows per doc), so the
whole operator is one light corpus pass, one bucket-panel collect, and
zero corpus-wide exchanges beyond the bucketed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import shard_pack
from .text import tokens

__all__ = ["pack_concat"]


def pack_concat(
    df: DataFrame,
    id_col: str,
    context_len: int,
    text_col: str | None = "text",
    tok_col: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Concatenate-and-chunk packing plan over documents in ``id_col``
    order: (``id_col``, n_tokens, bin_id, doc_off, bin_off, seg_len) —
    one row per (document, context window) overlap.

    Global token stream = the documents' token streams concatenated in
    ascending ``id_col`` order; bin ``k`` covers stream positions
    [k·C, (k+1)·C). A document occupying [s, s+n) emits one segment per
    overlapped bin: ``doc_off`` = segment start within the document,
    ``bin_off`` = segment start within the bin, ``seg_len`` ≥ 1. Docs
    with 0 tokens (or NULL weight) emit no rows; every bin except the
    last holds exactly C tokens.

    Token counts come from ``weight_col`` (precomputed) or ``tok_col``
    (array length) or ``text_col`` (whitespace tokenizer). ``id_col``
    must be numeric/timestamp and SHOULD be unique (`shard_pack`'s
    range-bucketed prefix scan inherits both contracts). A NEGATIVE
    ``weight_col`` value is invalid and NOT checked (same contract as
    `shard_pack`) — it would misalign every later prefix sum; validate
    upstream if the weight source is untrusted.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be > 0, got {context_len}")
    if weight_col is not None:
        n: Column = F.col(weight_col).cast("long")
    elif tok_col is not None:
        n = F.size(F.col(tok_col)).cast("long")
    elif text_col is not None:
        n = F.size(tokens(text_col)).cast("long")
    else:
        raise ValueError("one of weight_col / tok_col / text_col is required")

    base = df.select(F.col(id_col), F.coalesce(n, F.lit(0)).alias("n_tokens"))
    packed = shard_pack(base, id_col, "n_tokens", budget=context_len)
    c = F.lit(int(context_len))
    s = (F.col("cum_weight") - F.col("n_tokens")).alias("_s")
    fan = packed.select(
        id_col,
        "n_tokens",
        s,
    ).withColumn(
        "bin_id",
        F.explode(
            F.when(
                F.col("n_tokens") > 0,
                # first overlapped bin .. last overlapped bin, exact
                # integer division (`div`, not `/` — no double rounding
                # channel even at 10^15-token streams)
                F.sequence(
                    F.expr(f"_s div {int(context_len)}"),
                    F.expr(f"(_s + n_tokens - 1) div {int(context_len)}"),
                ),
            )
        ),
    )
    seg_start = F.greatest(F.col("bin_id") * c, F.col("_s"))
    seg_end = F.least((F.col("bin_id") + 1) * c, F.col("_s") + F.col("n_tokens"))
    return fan.select(
        id_col,
        "n_tokens",
        "bin_id",
        (seg_start - F.col("_s")).alias("doc_off"),
        (seg_start - F.col("bin_id") * c).alias("bin_off"),
        (seg_end - seg_start).alias("seg_len"),
    )
