"""Okapi BM25 relevance scoring and inverted-index construction.

Beyond-reference capability (BASELINE.json north star): the retrieval
half of a training-data pipeline — score documents against a query-term
set with BM25 (Robertson & Zaragoza 2009, public) and build the
posting-list index a search layer needs. Both are expressed with
built-in ``pyspark.sql.functions`` only (explode → groupBy → broadcast
join), so the hot path stays inside whole-stage codegen.

INTEGER-PURE option (round-7 oracle discipline): with the default
``k1 = 1.2``, ``b = 0.75`` the BM25 score is an exact ratio of
integers once the idf comes from the pinned log table
(``operators/ln_pinned.py``) —

    idf   = ln((N - df + 0.5)/(df + 0.5) + 1) = ln(2(N+1)) - ln(2·df+1)
    tf'   = tf·(k1+1)/(tf + k1·(1-b + b·dl·D/T))
          = 22·tf·T / (10·tf·T + 3·T + 9·dl·D)        (k1=6/5, b=3/4)

so ``score_u = Σ_terms (idf_u · 22·tf·T) div (10·tf·T + 3·T + 9·dl·D)``
is BIGINT arithmetic end-to-end: both idf lookups are frozen-table
integers (no engine evaluates ``ln``), the products are computed in
DECIMAL(38,0) (exact, overflow-proof), and ``div`` is integral
division — bit-identical on every engine, platform, and partition
order. The per-term floor loses < 1 µunit per matched term — noise for
a ranking signal, and a *shared deterministic* quantization.

The engine-``ln`` float path (``pinned_ln=False``) is the unbounded
100 TB tool; the pinned path is the certification fixture (domain
2(N+1) ≤ 8e6 → N ≤ 4e6 docs; the driver-side lookup raises loudly
beyond it).

Scale shape: one corpus scan → explode → (doc,term) tf groupBy with
map-side combine; doc lengths ride the SAME scan (size(tokens) computed
before the explode); the query-term filter lands right after the
explode so only matching postings shuffle; df and the (T, D) scalars
are query-vocabulary-sized aggregates broadcast back. No corpus×corpus
join anywhere. The inverted index is the same explode + two groupBys
with the postings serialized as a deterministic string.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: pinned-path constants — k1 = 6/5, b = 3/4 reduced to the integer form
#: above. Other (k1, b) need the float path.
_K1_TENTHS = 12
_B_QUARTERS = 3


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    pinned_ln: bool = False,
    top_k: int | None = None,
) -> DataFrame:
    """Per-document BM25 score against ``query_terms``.

    Output: (``id_col``, ``n_terms_matched`` BIGINT, and ``score_u``
    BIGINT µunits when ``pinned_ln`` else ``score`` DOUBLE), documents
    with at least one matching term only. ``top_k`` keeps the global
    best k rows ordered by (score desc, id asc) — a deterministic total
    order (integer scores under ``pinned_ln``).

    ``query_terms`` are matched against the shared whitespace tokenizer's
    output (lowercased), and must be non-empty.
    """
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    if pinned_ln and (k1 != 1.2 or b != 0.75):
        raise ValueError(
            "pinned_ln BM25 is derived for k1=1.2, b=0.75 exactly; "
            "use the float path for other parameters"
        )

    spark = df.sparkSession
    # doc lengths from the same logical scan that feeds the explode —
    # Catalyst collapses the two projections into one parquet read.
    # dl counts REAL tokens: the shared tokenizer yields [''] for empty
    # text (split semantics), and that phantom token must not inflate
    # document length or the corpus total
    base = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).withColumn("_dl", F.size(F.filter("_toks", lambda x: x != F.lit(""))))
    # two tiny scalars: corpus size D and total token count T
    row = base.agg(
        F.count(F.lit(1)).alias("d"), F.sum("_dl").alias("t")
    ).collect()[0]
    n_docs, total_tokens = int(row["d"]), int(row["t"] or 0)
    if total_tokens == 0:
        raise ValueError("bm25_scores: corpus has no tokens")

    # postings for the query vocabulary only — the IN filter sits
    # directly on the exploded term so nothing else shuffles
    tf = (
        base.select(F.col(id_col), "_dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("_dl").alias("dl"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    if pinned_ln:
        from .ln_pinned import ln_u_df, ln_u_lookup

        # raises loudly when 2(N+1) exceeds the pinned domain;
        # 2·df+1 < 2(N+1), so the inner join can never drop a term
        base_u = ln_u_lookup(2 * (n_docs + 1))
        lnu = ln_u_df(spark)
        idf = lnu.join(
            F.broadcast(docfreq), lnu["k"] == docfreq["df"] * 2 + 1
        ).select("term", (F.lit(base_u) - F.col("ln_u")).alias("_idf_u"))
        # exact integral arithmetic: products in DECIMAL(38,0), then
        # integral `div` — both engines floor the same exact rational
        d38 = "decimal(38,0)"
        num = (
            F.col("_idf_u").cast(d38)
            * F.lit(22).cast(d38)
            * F.col("tf").cast(d38)
            * F.lit(total_tokens).cast(d38)
        )
        den = (
            F.lit(10).cast(d38) * F.col("tf").cast(d38) * F.lit(total_tokens).cast(d38)
            + F.lit(3 * total_tokens).cast(d38)
            + F.lit(9 * n_docs).cast(d38) * F.col("dl").cast(d38)
        )
        part = F.expr("CAST(_num div _den AS BIGINT)")
        scored = (
            tf.join(F.broadcast(idf), "term")
            .withColumn("_num", num)
            .withColumn("_den", den)
            .select(id_col, part.alias("_part_u"))
            .groupBy(id_col)
            .agg(
                F.sum("_part_u").cast("long").alias("score_u"),
                F.count(F.lit(1)).alias("n_terms_matched"),
            )
        )
        order = [F.col("score_u").desc(), F.col(id_col).asc()]
    else:
        avgdl = total_tokens / n_docs
        idf = docfreq.select(
            "term",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("_idf"),
        )
        tf_term = (F.col("tf") * (k1 + 1.0)) / (
            F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        )
        scored = (
            tf.join(F.broadcast(idf), "term")
            .select(id_col, (F.col("_idf") * tf_term).alias("_part"))
            .groupBy(id_col)
            .agg(
                F.sum("_part").alias("score"),
                F.count(F.lit(1)).alias("n_terms_matched"),
            )
        )
        order = [F.col("score").desc(), F.col(id_col).asc()]
    if top_k is not None:
        # global top-k: Spark plans TakeOrderedAndProject (no full sort)
        scored = scored.orderBy(*order).limit(top_k)
    return scored


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    positional: bool | str = False,
) -> DataFrame:
    """Posting-list construction: one row per term with its document
    frequency, corpus frequency, and the postings serialized as the
    deterministic string ``"doc:tf,doc:tf,..."`` ordered by doc id.

    Output: (term, df BIGINT, ct BIGINT, postings STRING). A string —
    not an array<struct> — so the result is hash-stable across engines
    and driver normalizations (integer-pure discipline: every output is
    a string or BIGINT).

    ``positional=True`` emits ``"doc:p1|p2|...,doc:p1|..."`` instead —
    0-based token positions in ascending order (posexplode), the form a
    phrase/proximity query needs (positions of adjacent query terms
    differing by 1 = a phrase hit; see test_bm25 for the two-term
    phrase-match recipe).

    ``min_df`` drops hapax/rare terms (df < min_df) — the standard index
    pruning knob; the filter runs on the term-level aggregate so pruning
    never re-scans the corpus.

    ``positional="both"`` (r14, guide §2.4) emits ONE row per term with
    BOTH serializations — (term, df, ct, postings, postings_pos) — from
    a single posexplode + (doc, term) aggregate + term aggregate.
    Callers that need the two forms (the retrieval gate slot) previously
    called this twice, and Spark shares no work between union branches
    (runtime-reuse audit, OPTIMIZATION_r14.md), so the corpus explode
    and both shuffles ran twice; the combined frame is vocabulary-sized
    and cheap to fan back out. Both posting strings sort by the same
    unique doc id, so each form is bit-identical to its standalone
    output.

    Scale shape: explode → (doc,term) tf groupBy → term-level groupBy
    whose postings aggregate is ``array_sort(collect_list(...))``:
    collect_list order is partition-dependent, so the sort inside the
    aggregate restores a total (doc-id) order before serialization —
    bit-stable under any partitioning. The positional form sorts
    integer position arrays inside the (doc,term) aggregate the same
    way. Posting lists for stop-word-like
    terms can be huge; at 100 TB the term-level groupBy is the skew
    point — AQE skew-join handles the shuffle, and ``min_df`` plus a
    stopword cut upstream (quality_features) bound the worst lists.
    """
    if positional:
        toks = df.select(
            F.col(id_col).alias("_doc"),
            F.posexplode(tokens(text_col)).alias("_pos", "term"),
        ).where(F.col("term") != "")
        tf = toks.groupBy("_doc", "term").agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_pos")),
                    lambda p: p.cast("string"),
                ),
                "|",
            ).alias("_positions"),
        )
        posting = F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_doc"), F.col("_positions")))
            ),
            lambda s: F.concat_ws(":", s["_doc"].cast("string"), s["_positions"]),
        )
        aggs = [
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").cast("long").alias("ct"),
        ]
        if positional == "both":
            # ONE collect_list + ONE sort feeds BOTH serializations
            # (r15): the aggregate emits the doc-sorted combined list as
            # a column, and the next projection derives the two strings
            # from that materialized attribute — the struct sorts by
            # _doc first and doc ids are unique within a term group, so
            # the order (hence each emitted string) is bit-identical to
            # the two-collect r14 form, at half the per-term
            # collect/sort work (the term groupBy is the index's skew
            # point at scale).
            aggs.append(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_doc"), F.col("tf"), F.col("_positions"))
                    )
                ).alias("_plist")
            )
            out = tf.groupBy("term").agg(*aggs)
            out = out.select(
                "term",
                "df",
                "ct",
                F.array_join(
                    F.transform(
                        F.col("_plist"),
                        lambda s: F.concat_ws(
                            ":", s["_doc"].cast("string"), s["tf"].cast("string")
                        ),
                    ),
                    ",",
                ).alias("postings"),
                F.array_join(
                    F.transform(
                        F.col("_plist"),
                        lambda s: F.concat_ws(
                            ":", s["_doc"].cast("string"), s["_positions"]
                        ),
                    ),
                    ",",
                ).alias("postings_pos"),
            )
        else:
            aggs.append(F.array_join(posting, ",").alias("postings"))
            out = tf.groupBy("term").agg(*aggs)
        if min_df > 1:
            out = out.where(F.col("df") >= min_df)
        return out
    toks = df.select(
        F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term")
    ).where(F.col("term") != "")  # drop the tokenizer's phantom ''-for-empty-text
    tf = toks.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    # zero-pad doc ids inside the sort struct? Not needed: sort on the
    # BIGINT doc id itself, serialize after ordering
    posting = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_doc"), F.col("tf")))),
        lambda s: F.concat_ws(":", s["_doc"].cast("string"), s["tf"].cast("string")),
    )
    out = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").cast("long").alias("ct"),
        F.array_join(posting, ",").alias("postings"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def phrase_match(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrase: str,
) -> DataFrame:
    """Exact phrase search: documents containing the consecutive token
    sequence ``phrase`` (whitespace tokenizer, lowercased), with the
    occurrence count. Output: (``id_col``, ``n_hits`` BIGINT).

    The positional-index join recipe: anchor on the first term's
    positions, then for term i require a (doc, pos−i) match — n−1
    equi-joins on (doc, position) keys. Every join side is filtered to
    the query's terms immediately after the posexplode, so only
    query-term positions shuffle (the bm25_scores discipline); for a
    k-term phrase over a 100 TB corpus that is k tiny co-partitioned
    joins, never a corpus×corpus product.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase_match: phrase must contain a token")
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokens(text_col)).alias("_pos", "term"),
    ).where(F.col("term").isin(list(set(terms))))
    base = toks.where(F.col("term") == terms[0]).select("_doc", "_pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = toks.where(F.col("term") == t).select(
            F.col("_doc").alias("_d2"), (F.col("_pos") - i).alias("_p2")
        )
        base = base.join(
            nxt,
            (base["_doc"] == nxt["_d2"]) & (base["_pos"] == nxt["_p2"]),
        ).select("_doc", "_pos")
    return base.groupBy(F.col("_doc").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def update_inverted_index(
    index: DataFrame,
    new_docs: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Incremental index maintenance — the daily operating mode at
    100 TB (same rationale as the incremental dedup store,
    ``streaming/incremental.py``): index ONLY the new document batch
    and merge it into the standing index, instead of re-scanning the
    whole corpus.

    Preconditions (the append-only contract):

    - ``new_docs`` ids are all STRICTLY GREATER than every id already
      indexed (monotone ingest ids — the normal case for an
      append-only corpus). Postings concatenation then preserves the
      by-doc-id order without re-parsing the stored strings; violating
      this silently breaks posting order.
    - ``index`` is UNPRUNED (built with ``min_df=1``). Pruning must
      happen at read time (``WHERE df >= k``): a term pruned from the
      stored index would lose its old postings on the next merge.

    Result is exactly ``inverted_index(old ∪ new)`` (test-pinned
    equivalence). Scale shape: the new batch pays explode + two
    groupBys on ITS OWN size only; the merge is one full-outer join on
    term — vocabulary-sized, not corpus-sized — and the standing
    index's postings strings move through the join untouched.
    """
    delta = inverted_index(new_docs, text_col, id_col, min_df=1)
    old = index.select(
        F.col("term"),
        F.col("df").alias("_df_o"),
        F.col("ct").alias("_ct_o"),
        F.col("postings").alias("_p_o"),
    )
    new = delta.select(
        F.col("term"),
        F.col("df").alias("_df_n"),
        F.col("ct").alias("_ct_n"),
        F.col("postings").alias("_p_n"),
    )
    merged = old.join(new, "term", "full_outer")
    return merged.select(
        "term",
        (F.coalesce("_df_o", F.lit(0)) + F.coalesce("_df_n", F.lit(0))).alias("df"),
        (F.coalesce("_ct_o", F.lit(0)) + F.coalesce("_ct_n", F.lit(0)))
        .cast("long")
        .alias("ct"),
        F.concat_ws(
            ",", F.col("_p_o"), F.col("_p_n")
        ).alias("postings"),  # concat_ws skips NULL sides; append-only ids keep order
    )
