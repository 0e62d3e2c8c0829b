"""Overlapping token-window document chunking (context-window prep).

Public technique: the fixed-size sliding-window split every LM data
pipeline applies before packing — HuggingFace tokenizers'
``return_overflowing_tokens``/``stride`` semantics (windows of
``chunk_tokens`` starting every ``chunk_tokens − overlap_tokens``
tokens, stopping with the first window that reaches the document end),
also the standard RAG chunking recipe. The reference engine has no
corpus surface at all; this extends the LLM-pipeline layer
(SURVEY.md §8) alongside `operators/sampling.py` shard packing.

Determinism: everything is exact integer arithmetic over the token
array — window count ``1 + ceil(max(0, n−C)/S)``, starts ``i·S``,
lengths ``min(C, n−i·S)`` — plus substring-by-token-slice text, so the
emitted chunk set is bit-identical across engines/reruns/partition
orders and certifiable against a SQL oracle with zero float channels.

Scale shape: ZERO shuffle. One scan computes the token array, a
``sequence``+``explode`` fans each doc out to its windows, and the
chunk text is an `array_join(slice(...))` projection — all inside one
whole-stage-codegen'd map stage. Output cardinality ≈ n_tokens/S rows
per doc; the fan-out is map-side, so 100 TB chunks exactly like 100 MB
(no key skew exists — there is no key). Downstream packing
(`sampling.pack_shards`) is where the first exchange appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    text_col: str | None = "text",
    tok_col: str | None = None,
    bpe_counts: bool = False,
    bpe_merges_path: str | None = None,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Output: (``id_col``, chunk_id, start_tok, n_chunk_tok, chunk_text)
    — one row per window, HF-stride semantics: windows of
    ``chunk_tokens`` every ``stride = chunk_tokens − overlap_tokens``
    tokens; the FIRST window that reaches the end of the document is
    the last (so a short tail is never emitted as a redundant
    fully-overlapped window). Empty documents emit no rows.

    ``tok_col`` (array<string>) bypasses tokenization when the caller
    already holds token arrays; otherwise ``text_col`` is tokenized
    with the engine-standard whitespace rule (`text.tokens`).

    ``bpe_counts=True`` appends ``n_chunk_bpe_tok`` — the chunk's
    pinned-vocab BPE token count (`functions.bpe.bpe_token_counts` over
    chunk_text, keyed on (id, chunk_id)) — so downstream packing can
    budget in real tokenizer tokens instead of whitespace words
    (``tests/test_bpe.py::test_chunk_documents_optin_bpe_counter``).
    The extra cost is vocab-sized Python + one word-keyed join; the
    whitespace chunking itself stays pure-JVM.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            "overlap_tokens must satisfy 0 <= overlap < chunk_tokens, "
            f"got overlap={overlap_tokens} chunk={chunk_tokens}"
        )
    if bpe_counts:
        from ..functions.bpe import bpe_token_counts

        base = chunk_documents(
            df, id_col, chunk_tokens, overlap_tokens, text_col, tok_col
        )
        return bpe_token_counts(
            base,
            text_col="chunk_text",
            id_col=[id_col, "chunk_id"],
            out_col="n_chunk_bpe_tok",
            merges_path=bpe_merges_path,
        )
    c, s = chunk_tokens, chunk_tokens - overlap_tokens
    t: Column = F.col(tok_col) if tok_col is not None else tokens(text_col)
    n = F.col("_n")
    # 1 + ceil(max(0, n-c)/s) in exact int arithmetic; the double
    # division is exact for any real token count (n < 2^52)
    n_chunks = (
        F.lit(1)
        + F.floor((F.greatest(n - c, F.lit(0)) + (s - 1)) / F.lit(s))
    ).cast("long")
    start = (F.col("chunk_id") * s).cast("long")
    return (
        df.select(F.col(id_col), t.alias("_t"))
        .withColumn("_n", F.size("_t").cast("long"))
        .withColumn(
            "chunk_id",
            F.explode(
                F.when(n > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1))
            ),
        )
        .select(
            id_col,
            "chunk_id",
            start.alias("start_tok"),
            F.least(F.lit(c).cast("long"), n - start).alias("n_chunk_tok"),
            F.array_join(
                F.slice(F.col("_t"), start + 1, F.lit(c)), " "
            ).alias("chunk_text"),
        )
    )
