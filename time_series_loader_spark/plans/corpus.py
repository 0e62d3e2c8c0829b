"""CorpusPipeline: the end-to-end training-corpus recipe as one builder.

Every step maps to an operator this engine already oracle-checks —
this module adds NO new semantics, only the composition a 100 TB corpus
job actually runs:

    scrub PII → quality filter (score + Gopher rules + language)
    → exact dedup → near-dup dedup (MinHash-LSH clusters)
    → benchmark decontamination → sampling → shard packing → write

Design rules:

- **Lazy until the narrow waist.** Scrub/quality/language/decontam are
  pure projections and filters that fuse into ONE scan under Catalyst;
  the pipeline only forces computation where an operator inherently
  does (dedup's pair joins, shard packing's prefix scan, the write).
- **Filters first, joins later.** Cheap row-level filters run before
  the dedup joins, so the expensive stages see the smallest corpus.
- **Determinism end to end.** Every selection is hash-bucket or
  min-id based (no rand()), so the same input yields byte-identical
  shards (see `sources/sink.py::write_packed_shards`).

`steps_applied` records what ran, in order — a manifest for audit logs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CorpusPipeline:
    """Fluent corpus-curation pipeline over (id, text) document frames.

    Example::

        out = (
            CorpusPipeline(docs, "doc_id", "text")
            .scrub_pii()
            .quality_filter(min_score=0.3, gopher=False)
            .keep_languages(["en", "de"])
            .dedup_exact()
            .dedup_near(threshold=0.7)
            .decontaminate(bench_texts)
            .sample_weighted(fraction=0.5)
            .df()
        )

    Each builder method returns ``self``; ``df()`` yields the current
    lazy frame, ``pack_and_write(path, budget)`` materializes shards.
    """

    def __init__(self, df: DataFrame, id_col: str, text_col: str) -> None:
        self._df = df
        self.id_col = id_col
        self.text_col = text_col
        self.steps_applied: list[str] = []

    # -- projections / filters (fuse into one scan) --------------------

    def normalize(
        self,
        form: str = "NFC",
        strip_controls: bool = True,
        collapse_whitespace: bool = False,
    ) -> "CorpusPipeline":
        """Unicode-normalize the text column
        (`operators/text.py::normalize_text`) — run FIRST: every
        downstream hash (exact dedup, shingles, spans, fingerprints)
        sees one canonical byte form, so composed-vs-combining
        sequences and zero-width-disguised duplicates collapse."""
        from time_series_loader_spark.operators.text import normalize_text

        self._df = normalize_text(
            self._df,
            self.text_col,
            form=form,
            strip_controls=strip_controls,
            collapse_whitespace=collapse_whitespace,
        )
        self.steps_applied.append(f"normalize({form})")
        return self

    def scrub_pii(self) -> "CorpusPipeline":
        """Replace emails/IPs/phones with <TAG> markers IN the text
        column (`operators/text.py::redact_pii`); keeps an ``n_pii``
        count column for downstream density filters."""
        from time_series_loader_spark.operators.text import redact_pii

        out = redact_pii(self._df, self.text_col, out_col="__scrubbed")
        self._df = out.withColumn(self.text_col, F.col("__scrubbed")).drop("__scrubbed")
        self.steps_applied.append("scrub_pii")
        return self

    def quality_filter(
        self, min_score: float | None = 0.3, gopher: bool = True
    ) -> "CorpusPipeline":
        """Drop rows below ``min_score`` (composite quality score in
        [0,1]) and/or failing the Gopher rule battery. Both are pure
        expressions — this step adds zero passes."""
        from time_series_loader_spark.operators.text import (
            gopher_pass_expr,
            quality_score_expr,
        )

        df = self._df
        if min_score is not None:
            df = df.where(quality_score_expr(self.text_col) >= F.lit(min_score))
            self.steps_applied.append(f"quality_score>={min_score}")
        if gopher:
            df = df.where(gopher_pass_expr(self.text_col))
            self.steps_applied.append("gopher_rules")
        self._df = df
        return self

    def keep_languages(self, langs: Sequence[str]) -> "CorpusPipeline":
        """Keep rows whose heuristic language ID is in ``langs``."""
        from time_series_loader_spark.operators.text import langid_pred_expr

        self._df = self._df.where(langid_pred_expr(self.text_col).isin(*langs))
        self.steps_applied.append(f"lang in {sorted(langs)}")
        return self

    def decontaminate(
        self,
        benchmark_texts: Sequence[str] | DataFrame,
        n: int = 8,
        max_hits: int = 0,
        bench_text_col: str = "text",
    ) -> "CorpusPipeline":
        """Drop documents sharing more than ``max_hits`` word n-grams
        with the benchmark suite (`operators/decontam.py::decontaminate`
        — dispatches literal-expression vs broadcast-join form on
        benchmark size). ``benchmark_texts`` may be a DataFrame of
        benchmark TEXTS (column ``text``) — real eval suites are
        tables; the DataFrame path is the broadcast semi-join form
        (`decontam.contamination`), never a driver-side collect (r13);
        ``bench_text_col`` names the suite frame's text column."""
        from time_series_loader_spark.operators.decontam import (
            contamination,
            decontaminate,
            ngram_set,
        )

        if isinstance(benchmark_texts, DataFrame):
            bdf = benchmark_texts
            if self.id_col not in bdf.columns:
                bdf = bdf.withColumn(
                    self.id_col, F.monotonically_increasing_id()
                )
            scored = contamination(
                self._df, self.text_col, self.id_col, bdf,
                bench_text_col=bench_text_col, bench_id_col=self.id_col, n=n,
            )
        else:
            bench = ngram_set(benchmark_texts, n)
            scored = decontaminate(
                self._df, self.text_col, self.id_col, bench, n=n
            )
        self._df = scored.where(F.col("n_contam") <= max_hits).drop("n_contam")
        self.steps_applied.append(f"decontam({n}-gram)")
        return self

    def decontaminate_strip(
        self,
        benchmark_texts: Sequence[str] | DataFrame,
        n: int = 8,
        margin: int = 0,
        bench_text_col: str = "text",
    ) -> "CorpusPipeline":
        """SURGICAL decontamination (r12): remove only the contaminated
        spans (benchmark-colliding word n-grams ± ``margin`` tokens)
        and KEEP the documents — the Dolma/RefinedWeb alternative to
        :meth:`decontaminate`'s doc-level drop, for corpora where eval
        text is embedded in otherwise-good documents. Fully-stripped
        documents survive as empty strings; follow with
        ``quality_filter`` (their length score is 0) or filter
        ``length(text) > 0``. Rewritten docs come back
        whitespace-normalized (`decontam.strip_contamination` rebuild
        contract); untouched docs byte-identical.

        ``benchmark_texts`` may be a DataFrame of benchmark TEXTS
        (column ``text``, or pass through a pre-built suite with
        `decontam.benchmark_ngrams` yourself) — real eval suites are
        tables, and the DataFrame path always takes the broadcast-
        joined anchor prefilter (r13)."""
        from time_series_loader_spark.operators.decontam import (
            ngram_set,
            strip_contamination,
        )

        if isinstance(benchmark_texts, DataFrame):
            bdf = benchmark_texts
            if self.id_col not in bdf.columns:
                # the shingler keys by id; suite row identity is
                # irrelevant post-distinct, any unique id serves
                bdf = bdf.withColumn(
                    self.id_col, F.monotonically_increasing_id()
                )
            cleaned = strip_contamination(
                self._df.select(self.id_col, self.text_col),
                self.text_col, self.id_col, n=n, margin=margin,
                bench_df=bdf, bench_text_col=bench_text_col,
                bench_id_col=self.id_col,
            )
        else:
            bench = ngram_set(benchmark_texts, n)
            cleaned = strip_contamination(
                self._df.select(self.id_col, self.text_col),
                self.text_col, self.id_col, bench, n=n, margin=margin,
            )
        self._df = self._df.drop(self.text_col).join(cleaned, self.id_col)
        self.steps_applied.append(f"decontam_strip({n}-gram,±{margin})")
        return self

    # -- dedup (pair joins; run after filters) --------------------------

    def dedup_exact(self) -> "CorpusPipeline":
        """Keep one representative (min id) per exact text duplicate
        group (`operators/dedup.py::dedup_exact` digest groupBy)."""
        from time_series_loader_spark.operators.dedup import dedup_exact

        reps = dedup_exact(self._df, [self.text_col], self.id_col).select(self.id_col)
        self._df = self._df.join(reps, self.id_col, "left_semi")
        self.steps_applied.append("dedup_exact")
        return self

    def dedup_near(
        self,
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
        threshold: float = 0.5,
        verify: bool = True,
        candidate_threshold: float = 0.0,
    ) -> "CorpusPipeline":
        """Keep one representative (min id) per near-dup CLUSTER
        (`graph.py::keep_representatives` over the pair graph —
        transitive closure, not just pairwise drops).

        ``verify=True`` (default) is the engine's prescribed 100 TB
        path (`operators/dedup.py::near_dup_pairs`, SCALING.md
        'verified near-dup'): MinHash-LSH bands PREFILTER candidates
        (``candidate_threshold`` applies to the estimate; 0.0 = banding
        alone prunes), then exact n-gram Jaccard — computed only on
        candidate documents via semi-join pushdown — decides
        ``threshold``. Precision is 1.0 w.r.t. the threshold on the
        EXACT score; recall is the LSH banding S-curve
        (`lsh_collision_probability`). Measured 2.7× faster than
        all-candidates exact at the dense 100× probe.

        ``verify=False`` thresholds the MinHash ESTIMATE instead
        (`minhash_lsh_pairs`) — one fewer join pass, but borderline
        pairs are kept/dropped on a ±1/num_hashes-granular estimate;
        use only when approximate thresholding is acceptable."""
        from time_series_loader_spark.operators.dedup import near_dup_pairs
        from time_series_loader_spark.operators.graph import keep_representatives

        pairs = near_dup_pairs(
            self._df, self.text_col, self.id_col,
            n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
            candidate_threshold=candidate_threshold, verify=verify,
        )
        self._df = keep_representatives(self._df, pairs, self.id_col)
        tag = "exact_j" if verify else "est_j"
        self.steps_applied.append(f"dedup_near({tag}>={threshold})")
        return self

    def dedup_spans(
        self, n: int = 50, min_docs: int = 2, keep_first: bool = True
    ) -> "CorpusPipeline":
        """Remove VERBATIM spans of ≥ ``n`` tokens repeated across
        ≥ ``min_docs`` documents (`operators/spans.py` — Lee et al. 2022
        exact-substring dedup; boilerplate/license/template passages).
        Heavy (positional-digest shuffle ≈ 20-30× token bytes) — run it
        AFTER the cheap filters and whole-doc dedup stages, which this
        builder's ordering encourages. Rewrites ``text_col``
        whitespace-normalized."""
        from time_series_loader_spark.operators.spans import remove_repeated_spans

        cleaned = remove_repeated_spans(
            # text+id only: the rewrite machinery never needs the other
            # columns, and the single reattach join below restores them
            self._df.select(self.id_col, self.text_col),
            self.text_col, self.id_col, n=n, min_docs=min_docs,
            keep_first=keep_first,
        )
        self._df = self._df.drop(self.text_col).join(cleaned, self.id_col)
        self.steps_applied.append(f"dedup_spans(n={n})")
        return self

    # -- sampling -------------------------------------------------------

    def sample_weighted(
        self, fraction: float, weight: str | None = None
    ) -> "CorpusPipeline":
        """Deterministic weighted Bernoulli sample at ``fraction``;
        default weight = whitespace token count (token-budget-aware)."""
        from time_series_loader_spark.operators.sampling import weighted_sample

        df = self._df
        wcol = weight
        if wcol is None:
            wcol = "__w"
            from time_series_loader_spark.operators.text import tokens

            df = df.withColumn(wcol, F.size(tokens(self.text_col)))
        out = weighted_sample(df, self.id_col, wcol, fraction)
        drop = ["sample_bucket"] + ([] if weight else [wcol])
        self._df = out.drop(*drop)
        self.steps_applied.append(f"sample_weighted({fraction})")
        return self

    def chunk(
        self, chunk_tokens: int, overlap_tokens: int = 0
    ) -> "CorpusPipeline":
        """Split every document into overlapping token windows
        (`operators/chunking.py::chunk_documents`, HF-stride semantics).
        AFTER this step the unit of the pipeline is the CHUNK: the frame
        becomes (id, chunk_id, start_tok, n_chunk_tok, chunk_text) and
        ``text_col`` re-points at ``chunk_text``. ``id_col`` is NO
        LONGER UNIQUE (one row per window) — id-keyed deterministic
        steps downstream would tie-break arbitrarily, so this is a LATE
        stage: run filters/dedup/sampling first, then chunk. Zero
        shuffle. Chunking and ``pack_sequences`` are ALTERNATIVE
        context-window preparations (stride windows vs concatenate-and-
        split) — combining them raises."""
        from time_series_loader_spark.operators.chunking import chunk_documents

        if any(s.startswith("chunk(") for s in self.steps_applied):
            raise ValueError("chunk() already applied — ids are per-window now")
        self._df = chunk_documents(
            self._df, self.id_col, chunk_tokens, overlap_tokens,
            text_col=self.text_col,
        )
        self.text_col = "chunk_text"
        self.steps_applied.append(
            f"chunk({chunk_tokens}, overlap={overlap_tokens})"
        )
        return self

    # -- terminal steps -------------------------------------------------

    def df(self) -> DataFrame:
        """The current (lazy) frame."""
        return self._df

    def pack_sequences(self, context_len: int) -> DataFrame:
        """Concatenate-and-chunk packing plan
        (`operators/packing.py::pack_concat`, GPT / HF ``group_texts``):
        the surviving corpus's token streams concatenated in id order
        and split every ``context_len`` tokens — one row per
        (doc, context-window) overlap with exact integer offsets.
        Terminal: returns the packing plan, does not mutate the
        pipeline. Raises after ``chunk()`` — the two are alternative
        context-window preparations, and post-chunk ids are non-unique
        (`shard_pack`'s determinism contract needs a unique order key)."""
        from time_series_loader_spark.operators.packing import pack_concat

        if any(s.startswith("chunk(") for s in self.steps_applied):
            raise ValueError(
                "pack_sequences after chunk(): pick ONE context-window "
                "preparation — stride windows (chunk) or concatenate-and-"
                "split (pack_sequences)"
            )
        self.steps_applied.append(f"pack_sequences({context_len})")
        return pack_concat(
            self._df, self.id_col, context_len, text_col=self.text_col
        )

    def pack_and_write(
        self, path: str, budget: int, weight: str | None = None
    ) -> DataFrame:
        """Token-budget shard packing + one-file-per-shard write
        (`sampling.py::shard_pack` → `sink.py::write_packed_shards`).
        Returns the written-shard manifest."""
        from time_series_loader_spark.operators.sampling import shard_pack
        from time_series_loader_spark.sources.sink import write_packed_shards

        df = self._df
        wcol = weight
        if wcol is None:
            wcol = "__w"
            from time_series_loader_spark.operators.text import tokens

            df = df.withColumn(wcol, F.size(tokens(self.text_col)))
        packed = shard_pack(df, self.id_col, wcol, budget)
        if weight is None:
            packed = packed.drop(wcol)
        self.steps_applied.append(f"pack_and_write(budget={budget})")
        return write_packed_shards(packed, path, order_col=self.id_col)
