"""DSIR-style importance weighting for pre-training data selection.

Public technique: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" (arXiv:2302.03169). Documents are scored by
the log importance ratio of two bag-of-hashed-n-gram unigram models —
a TARGET distribution (the data you want more of, e.g. a high-quality
subset) and the RAW distribution (the corpus as it comes):

    log w(x) = Σ_buckets c_b(x) · ( log p_target(b) − log p_raw(b) )

with add-1 smoothing on both models. High scores = documents whose
hashed-n-gram profile looks like the target; selection = top-k by
score (the paper resamples with Gumbel noise; the deterministic top-k
variant here keeps the engine rerun/engine-reproducible — no rand()).

Features are unigrams + bigrams of the shared whitespace tokenizer
(`operators/text.py::tokens`), hashed to ``n_buckets`` buckets via the
first 4 hex digits of md5 — the same engine-reproducible md5-bucket
trick as `operators/sampling.py` (no engine-specific hash functions).

Scale shape (the whole point at 100 TB): ONE explode of the feature
stream into a (doc, bucket) count aggregate with map-side combine —
this is the only corpus-sized shuffle, and it carries (id, bucket,
count), not text. BOTH models then derive from that same frame by a
``n_buckets``-sized second aggregate (no second corpus scan: the
target flag rides the rows as a boolean and the two models are two
conditional sums). The per-bucket log-ratio table is ``n_buckets``
rows — broadcast back, one per-doc integer sum. N_target/N_raw come
from a LIGHT tokenizer scan (closed-form per-doc feature count
``n + max(n−1, 0)`` — no explode, no shuffle, one 1-row agg), so the
expensive explode lineage is never evaluated just for the totals; in
pinned mode λ joins the cached pinned-ln table IN-PLAN, keeping the
bucket model inside the same action as the doc scores (shared exchange
reused, not replayed).

``pinned_ln=True`` (oracle-certification mode, same contract as
`text.py::tfidf`): every logarithm is a lookup in the frozen
``resources/ln_u_micro.parquet`` table —

    lam_u(b) = (ln_u(ct_b+1) − ln_u(N_t+B)) − (ln_u(cr_b+1) − ln_u(N_r+B))

all-integer arguments, and the doc score ``score_u = Σ c_b·lam_u(b)``
is an exact BIGINT: bit-identical across engines, platforms, and
partition orders. The engine-``ln`` path (micro-quantized, same
rationale as tfidf) is the unbounded-scale tool.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["hashed_ngram_counts", "dsir_score"]


def _bigrams(t: Column) -> Column:
    """Adjacent-token bigrams ('a b') of a token array, [] when <2
    tokens. Guarded: Spark ``sequence(1, 0)`` DESCENDS (returns [1, 0])
    rather than yielding an empty array, so the <2 case must short-
    circuit before sequence sees it."""
    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat(
                F.element_at(t, i), F.lit(" "), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def feature_bucket(feat: Column, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets): 16-bit value from the
    first 4 hex digits of md5(feature), mod n_buckets. Reproducible in
    any engine with md5 + substring (cf. the `_SQL_HEXD` oracle form)."""
    return (
        F.conv(F.substring(F.md5(feat), 1, 4), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_ngram_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
    carry_cols: tuple[str, ...] = (),
    min_parallelism: int | None = None,
) -> DataFrame:
    """Per-document hashed-n-gram bucket counts:
    (``id_col``, *carry_cols, bucket, c). The one corpus-sized shuffle
    of the DSIR pipeline; everything downstream is bucket- or doc-sized.

    ``min_parallelism``: the per-feature md5 work sits BELOW the first
    exchange and inherits source partitioning — a single-file input
    serializes it (the text_profile caveat, SCALING.md); opt-in round-
    robin fan-out, because an unconditional repartition would reshuffle
    a real corpus that already arrives multi-file."""
    if min_parallelism and df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism)
    t = tokens(text_col)
    feats = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.explode(F.concat(t, _bigrams(t))).alias("_feat"),
    )
    return feats.groupBy(
        id_col, *carry_cols, feature_bucket(F.col("_feat"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def dsir_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    n_buckets: int = 4096,
    pinned_ln: bool = False,
    integer_outputs: bool = False,
    min_parallelism: int | None = None,
) -> DataFrame:
    """DSIR log importance-ratio score per document.

    ``target``: boolean Column marking the documents that DEFINE the
    target distribution (they are scored too — the paper fits the
    target LM on target data and scores the full raw corpus).

    Output: (``id_col``, n_feats, score_u BIGINT µunits) with
    ``integer_outputs=True``, else (``id_col``, n_feats, score double).
    ``score = Σ_b c_b · (logp_target(b) − logp_raw(b))`` with add-1
    smoothing; buckets absent from the corpus contribute nothing.
    """
    # Model totals N_t/N_r from a LIGHT tokenizer scan — no explode, no
    # shuffle (one 1-row agg): per-doc feature count is closed-form,
    # n + max(n−1, 0) unigrams+bigrams, and equals the model's column
    # sums by construction. The previous shape collected the bucket
    # model itself for the totals, which evaluated the full explode
    # lineage as a separate action (⅓ of the slot's r7 bench cost).
    t = tokens(text_col)
    nf = (F.size(t) + F.greatest(F.size(t) - F.lit(1), F.lit(0))).cast("long")
    tot = (
        df.select(target.alias("_tgt"), nf.alias("_nf"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_tgt"), F.col("_nf")).otherwise(F.lit(0))),
                F.lit(0),
            ).alias("nt"),
            F.coalesce(F.sum("_nf"), F.lit(0)).alias("nr"),
        )
        .collect()[0]
    )
    nt, nr = int(tot["nt"]), int(tot["nr"])
    d2 = df.withColumn("_tgt", target)
    if min_parallelism and d2.rdd.getNumPartitions() < min_parallelism:
        d2 = d2.repartition(min_parallelism)
    feats = d2.select(
        F.col(id_col),
        F.col("_tgt"),
        F.explode(F.concat(t, _bigrams(t))).alias("_feat"),
    ).select(
        id_col, "_tgt", feature_bucket(F.col("_feat"), n_buckets).alias("bucket")
    )
    dbc = feats.groupBy(id_col, "_tgt", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    # The bucket model aggregates the exploded stream DIRECTLY (4096
    # distinct keys → map-side combine collapses the exchange to
    # ~n_buckets rows per partition) instead of stacking a second
    # exchange on the (doc, bucket) aggregate: Spark 4's AQE does not
    # reuse the shared sub-exchange across the model and score branches
    # (verified empirically on the minimal agg-rejoin repro), so each
    # branch pays its own corpus pass and the model branch should be
    # the cheap straight-pipeline one.
    model = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), F.lit(1)).otherwise(F.lit(0))).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    if pinned_ln:
        from .ln_pinned import ln_u_df, ln_u_lookup

        # Driver-side lookups of the DOMAIN MAXIMA are the loud
        # out-of-range guard: every per-bucket key satisfies
        # ct+1 ≤ nt+B and cr+1 ≤ nr+B, so if these two succeed the
        # in-plan inner joins below cannot drop a bucket.
        base_t = ln_u_lookup(nt + n_buckets)
        base_r = ln_u_lookup(nr + n_buckets)
        # λ stays IN-PLAN: the bucket model (≤ n_buckets rows) joins the
        # cached pinned table twice (broadcast model side) instead of
        # being collected — so the corpus explode lineage is evaluated
        # inside the same action as the scores, where the shared
        # (id, bucket) aggregate exchange is reused, not replayed.
        lnu = ln_u_df(df.sparkSession)
        keyed = model.select(
            "bucket",
            (F.col("ct") + 1).alias("_kt"),
            (F.col("cr") + 1).alias("_kr"),
        )
        j1 = (
            lnu.select(F.col("k").alias("_kt"), F.col("ln_u").alias("_lt"))
            .join(F.broadcast(keyed), "_kt")
            .select("bucket", "_kr", "_lt")
        )
        lam = (
            lnu.select(F.col("k").alias("_kr"), F.col("ln_u").alias("_lr"))
            .join(F.broadcast(j1), "_kr")
            .select(
                "bucket",
                (
                    (F.col("_lt") - F.lit(base_t))
                    - (F.col("_lr") - F.lit(base_r))
                ).alias("_lam_u"),
            )
        )
    else:
        lam = model.select(
            "bucket",
            F.floor(
                (
                    F.log((F.col("ct") + 1.0) / F.lit(float(nt + n_buckets)))
                    - F.log((F.col("cr") + 1.0) / F.lit(float(nr + n_buckets)))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            ).alias("_lam_u"),
        )
    scored = (
        dbc.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.col("_lam_u")).cast("long").alias("score_u"),
        )
    )
    if integer_outputs:
        return scored
    return scored.withColumn(
        "score", F.col("score_u").cast("double") / F.lit(1e6)
    ).drop("score_u")
