"""Product quantization (PQ) for embedding search at corpus scale.

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011, public): split each d-dim vector into ``m`` subvectors,
k-means each subspace into ``ksub`` centroids, store each vector as m
small codes (here m=8 × 4 bits = 4 bytes vs 256 bytes of float32 — a
64× memory/IO compression). Search is ADC (asymmetric distance): the
query precomputes an m × ksub table of subspace distances, and scoring
a corpus vector is m table lookups + a sum — no float vector is ever
read from the corpus again.

This is the missing piece between the IVF coarse quantizer
(`similarity.py::ivf_search`, which prunes WHICH vectors to score) and
brute-force scoring (which reads full vectors): at 100 TB the corpus
codes table is ~1/64 the corpus size, scans of it are pure
narrow-kernel passes, and the ADC score is rank-equivalent to L2 on the
quantized vectors.

Determinism/oracle discipline (same as `ivf_pinned`): distances rank by
``|c|² − 2·v·c`` (the |v|² term is constant within a subspace's argmin
and within a query's ranking, so it cancels); with ``fold=True`` every
dot product is a sequential left fold (np.cumsum ≡ DuckDB list_reduce ≡
F.aggregate), making codes and ADC scores bit-identical to a SQL oracle
generated from the same pinned codebook literals.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from time_series_loader_spark.operators.similarity import fold_sq_norms


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Fit PQ codebooks: independent deterministic k-means per subspace
    (init = subvectors of the ``ksub`` smallest ids, Lloyd iterations
    with map-side-only partial sums — `similarity.py::kmeans_cells` on
    the sliced vectors). Returns ``codebooks[m][ksub][d/m]``.

    Fit cost is ``m × iters`` corpus scans — an offline, sampled step in
    production (fit on a slice, pin the books, search many; see
    `pq_pinned.py` for the pinned instance the oracle checks).
    """
    from time_series_loader_spark.operators.similarity import kmeans_cells

    row = corpus.select(vec_col).first()
    if row is None:
        raise ValueError("pq_train: empty corpus — nothing to fit codebooks on")
    dim = len(row[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for j in range(m):
        sliced = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("_sub")
        )
        books.append(kmeans_cells(sliced, id_col, "_sub", ksub, iters))
    return books


def _codes_udf(codebooks: list[list[list[float]]], fold: bool):
    """Arrow-batched PQ encoder: per subspace, nearest centroid by
    ``|c|² − 2·v·c``; ties → smallest code (stable argsort)."""
    import pandas as pd

    C = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = C.shape
    c2 = (
        np.asarray([fold_sq_norms(list(C[j])) for j in range(m)])
        if fold
        else (C * C).sum(axis=2)
    )  # (m, ksub)

    def encode(vecs):
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(V), m), dtype=np.int32)
        for j in range(m):
            S = V[:, j * dsub : (j + 1) * dsub]  # (n, dsub)
            if fold:
                d = np.empty((len(V), ksub))
                for c in range(ksub):
                    d[:, c] = c2[j, c] - 2.0 * np.cumsum(S * C[j, c][None, :], axis=1)[:, -1]
            else:
                d = c2[j][None, :] - 2.0 * (S @ C[j].T)
            out[:, j] = np.argsort(d, axis=1, kind="stable")[:, 0]
        return pd.Series(list(out))

    return F.pandas_udf(encode, "array<int>")


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    fold: bool = False,
) -> DataFrame:
    """(id, codes) for every vector — the persistent PQ index table.
    One narrow Arrow-kernel pass, zero shuffle; append-only as the
    corpus grows (codes are a pure function of vector + codebooks)."""
    enc = _codes_udf(codebooks, fold)
    return df.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def _query_tables(panel, codebooks, fold: bool):
    """(qids, tables, raw_vectors): each query's m × ksub ADC lookup
    table of ``|c|² − 2·q_j·c`` pseudo-distances, built with matmul or
    (``fold=True``) the oracle-parity sequential fold."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = C.shape
    c2 = (
        np.asarray([fold_sq_norms(list(C[j])) for j in range(m)])
        if fold
        else (C * C).sum(axis=2)
    )
    qids, tables, vecs = [], [], []
    for r in panel:
        q = np.asarray(r[1], dtype=np.float64)
        t = np.empty((m, ksub))
        for j in range(m):
            s = q[j * dsub : (j + 1) * dsub]
            if fold:
                for c in range(ksub):
                    t[j, c] = c2[j, c] - 2.0 * np.cumsum(s * C[j, c])[-1]
            else:
                t[j] = c2[j] - 2.0 * (C[j] @ s)
        qids.append(r[0])
        tables.append(t)
        vecs.append(q)
    return qids, tables, vecs


def _adc_search(
    queries: DataFrame,
    corpus_codes: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int,
    fold: bool,
    centroids: list[list[float]] | None = None,
    n_probe: int = 0,
) -> DataFrame:
    """Shared ADC top-k engine for :func:`pq_search` (``centroids=None``
    — every corpus code scored) and :func:`ivfpq_search` (each query
    scores only the codes in its ``n_probe`` nearest coarse cells; the
    code table must carry a ``cell`` column). One implementation so the
    tie-break/fold arithmetic can never drift between the two paths."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    m = len(codebooks)
    panel = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids, tables, qvecs = _query_tables(panel, codebooks, fold)

    probes: list[set] | None = None
    if centroids is not None:
        CC = np.asarray(centroids, dtype=np.float64)
        cc2 = np.asarray(fold_sq_norms(centroids)) if fold else (CC * CC).sum(axis=1)
        probes = []
        for q in qvecs:
            # probe cells by the same |c|² − 2·q·c rank as ivf_search
            if fold:
                d = np.array(
                    [cc2[j] - 2.0 * np.cumsum(q * CC[j])[-1] for j in range(len(CC))]
                )
            else:
                d = cc2 - 2.0 * (CC @ q)
            probes.append(set(np.argsort(d, kind="stable")[:n_probe].tolist()))

    id_type = corpus_codes.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("neighbor_id", id_type),
            StructField("adist", DoubleType()),
        ]
    )
    j_idx = np.arange(m)
    in_cols = [id_col, "codes"] + (["cell"] if probes is not None else [])

    def kernel(batches):
        for pdf in batches:
            if not len(pdf) or not qids:
                continue
            codes = np.stack([np.asarray(c) for c in pdf["codes"]])  # (n, m)
            ids = pdf[id_col].to_numpy()
            cells = pdf["cell"].to_numpy() if probes is not None else None
            frames = []
            for qi, (qid, t) in enumerate(zip(qids, tables)):
                sub_codes, sub_ids = codes, ids
                if probes is not None:
                    mask = np.isin(cells, list(probes[qi]))
                    if not mask.any():
                        continue
                    sub_codes, sub_ids = codes[mask], ids[mask]
                looked = t[j_idx[None, :], sub_codes]  # (n, m)
                # left-fold sum over j (cumsum ≡ the oracle's ordered
                # list_reduce) so adist is bit-stable across engines
                scores = np.cumsum(looked, axis=1)[:, -1]
                take = min(k, len(sub_ids))
                # select by the FULL (score, id) order, not score alone:
                # quantized corpora tie constantly (same-cluster rows
                # share codes), and a score-only local top-k could drop
                # a smaller-id tie that the global (score, id) ranking
                # keeps — making results partitioning-dependent
                part = np.lexsort((sub_ids, scores))[:take]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": sub_ids[part],
                            "adist": scores[part],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = corpus_codes.select(*in_cols).mapInPandas(kernel, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adist", "rank")
    )


def pq_search(
    queries: DataFrame,
    corpus_codes: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    fold: bool = False,
) -> DataFrame:
    """ADC top-k over a PQ code table.

    The query panel is collected (panels are human-sized by contract —
    same stance as `cosine_topk`'s broadcast) and each query's m × ksub
    distance table ships to executors inside the kernel closure; the
    corpus CODES table — the only corpus-sized input, already 64×
    smaller than the vectors — streams through ONE `mapInPandas` that
    emits each partition's (score, id)-ordered local top-k per query,
    and a final window reduces ``partitions × k`` candidate rows
    globally. No full-vector reads, no corpus shuffle.

    Output: (query_id, neighbor_id, adist, rank) — ``adist`` =
    Σ_j (|c|² − 2·q_j·c_{code_j}), rank-equivalent to ADC L2 (the
    per-query |q_j|² terms cancel); rank 1..k ascending adist, ties →
    smaller neighbor id.
    """
    return _adc_search(queries, corpus_codes, id_col, vec_col, codebooks, k, fold)


def ivfpq_search(
    queries: DataFrame,
    corpus_codes: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    fold: bool = False,
) -> DataFrame:
    """IVF-PQ (the FAISS IVFPQ composition): the coarse quantizer prunes
    WHICH vectors to score (only docs in each query's ``n_probe``
    nearest cells), and PQ codes make scoring them ~64× cheaper IO —
    the two legs this module and `similarity.py::ivf_search` provide
    separately, composed.

    ``corpus_codes`` must carry a ``cell`` column (nearest coarse
    centroid, e.g. built once alongside `pq_encode` with
    `similarity._nearest_cells_udf` — see tests) — on disk this is the
    classic layout: the code table partitioned by cell, so a probe
    reads only its cells' files. Here the kernel filters by each
    query's probe set (shipped in the closure), which prunes COMPUTE;
    partition-by-cell at write time additionally prunes IO.

    Same engine as :func:`pq_search` (`_adc_search` — one tie-break/
    fold implementation for both paths); ``n_probe = n_cells`` reduces
    exactly to `pq_search` (equality-tested in test_pq).
    """
    return _adc_search(
        queries, corpus_codes, id_col, vec_col, codebooks, k, fold,
        centroids=centroids, n_probe=n_probe,
    )
