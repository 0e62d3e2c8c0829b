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
rows — broadcast back, one per-doc integer sum. N_target/N_raw are two
driver scalars (one tiny action, sanctioned query-shaping scalars).

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
    dbc = hashed_ngram_counts(
        df.withColumn("_tgt", target), text_col, id_col, n_buckets, ("_tgt",),
        min_parallelism=min_parallelism,
    )
    model = dbc.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), F.col("c")).otherwise(F.lit(0))).alias("ct"),
        F.sum("c").alias("cr"),
    )
    if pinned_ln:
        from .ln_pinned import ln_u_lookup

        # the model is BOUNDED by n_buckets (a config constant — the
        # paper uses ~1e4), so collecting it is a driver-safe panel
        # (same sanctioned pattern as corpus_filter's decile
        # boundaries), and λ comes from driver-side pinned lookups —
        # no 4M-row pinned-table join in the plan, and the totals fall
        # out of the same collect instead of a second action. Lookups
        # raise loudly if N+B leaves the pinned domain.
        rows = model.collect()
        nt = sum(int(r["ct"]) for r in rows)
        nr = sum(int(r["cr"]) for r in rows)
        base_t = ln_u_lookup(nt + n_buckets)
        base_r = ln_u_lookup(nr + n_buckets)
        lam = df.sparkSession.createDataFrame(
            [
                (
                    int(r["bucket"]),
                    (ln_u_lookup(int(r["ct"]) + 1) - base_t)
                    - (ln_u_lookup(int(r["cr"]) + 1) - base_r),
                )
                for r in rows
            ],
            "bucket long, _lam_u long",
        )
    else:
        tot = model.agg(
            F.coalesce(F.sum("ct"), F.lit(0)).alias("nt"),
            F.coalesce(F.sum("cr"), F.lit(0)).alias("nr"),
        ).collect()[0]
        nt, nr = int(tot["nt"]), int(tot["nr"])
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
