from time_series_loader_spark.operators.resample import (
    m4_downsample,
    resample,
    resample_with_dates,
)
from time_series_loader_spark.operators.continuity import (
    infer_frequency_seconds,
    find_gaps,
    continuity_stats,
)
from time_series_loader_spark.operators.grid import time_grid, reindex_to_grid
from time_series_loader_spark.operators.fill import ffill, bfill
from time_series_loader_spark.operators.interpolate import interpolate_time
from time_series_loader_spark.operators.asof import asof_nearest
from time_series_loader_spark.operators.outliers import (
    hampel_flags,
    remove_outliers_mad,
    seasonal_baseline,
    remove_outliers_zscore,
)
from time_series_loader_spark.operators.dedup import (
    dedup_exact,
    doc_signatures,
    incremental_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from time_series_loader_spark.operators.ewm import ewm_mean
from time_series_loader_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    keep_representatives,
)
from time_series_loader_spark.operators.pq import (
    ivfpq_search,
    pq_encode,
    pq_search,
    pq_train,
)
from time_series_loader_spark.operators.profile import profile_table
from time_series_loader_spark.operators.rate import counter_increase
from time_series_loader_spark.operators.spans import (
    remove_repeated_spans,
    repeated_spans,
    repeated_spans_winnowed,
)
from time_series_loader_spark.operators.twa import time_weighted_mean
from time_series_loader_spark.operators.text import (
    fingerprint,
    gopher_quality_flags,
    language_id,
    quality_features,
    simhash_bits,
    normalize_text,
    token_entropy,
    unigram_logprob,
    token_stats,
)
from time_series_loader_spark.operators.bm25 import (
    bm25_scores,
    inverted_index,
    phrase_match,
    update_inverted_index,
)
from time_series_loader_spark.operators.sketches import heavy_hitters, hll_merge, hll_rollup
from time_series_loader_spark.operators.behavior import (
    cohort_retention,
    funnel_steps,
)
from time_series_loader_spark.operators.trend import (
    cusum_stats,
    trend_cusum_stats,
    trend_slope,
)
from time_series_loader_spark.operators.similarity import (
    cosine_topk,
    hard_negatives,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_dup_pairs,
)
from time_series_loader_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    transform_payloads,
)
from time_series_loader_spark.operators.relational import salted_join, top_k

__all__ = [
    "dedup_exact",
    "doc_signatures",
    "incremental_dedup",
    "ewm_mean",
    "connected_components",
    "dedup_clusters",
    "keep_representatives",
    "ivfpq_search",
    "pq_encode",
    "pq_search",
    "pq_train",
    "profile_table",
    "counter_increase",
    "remove_repeated_spans",
    "repeated_spans",
    "repeated_spans_winnowed",
    "time_weighted_mean",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_near_dup_pairs",
    "fingerprint",
    "gopher_quality_flags",
    "language_id",
    "quality_features",
    "simhash_bits",
    "normalize_text",
    "unigram_logprob",
    "token_stats",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "embedding_near_dup_pairs",
    "attach_payload",
    "extract_features",
    "transform_payloads",
    "salted_join",
    "top_k",
    "m4_downsample",
    "resample",
    "resample_with_dates",
    "infer_frequency_seconds",
    "find_gaps",
    "continuity_stats",
    "time_grid",
    "reindex_to_grid",
    "ffill",
    "bfill",
    "interpolate_time",
    "asof_nearest",
    "hampel_flags",
    "seasonal_baseline",
    "remove_outliers_mad",
    "remove_outliers_zscore",
    "token_entropy",
    "bm25_scores",
    "inverted_index",
    "phrase_match",
    "update_inverted_index",
    "heavy_hitters",
    "hll_merge",
    "hll_rollup",
    "cohort_retention",
    "funnel_steps",
    "trend_slope",
    "cusum_stats",
    "trend_cusum_stats",
    "hard_negatives",
]
