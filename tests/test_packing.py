"""Concatenate-and-chunk packing (operators/packing.py) vs a sequential
pure-Python reference of the HF group_texts recipe."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from time_series_loader_spark.operators.packing import pack_concat
from time_series_loader_spark.session import get_spark, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("test-packing")


def py_pack(rows, C):
    """rows: [(id, n_tokens)] in id order → [(id, n, bin, doc_off,
    bin_off, seg_len)] by walking the concatenated stream."""
    out, pos = [], 0
    for i, n in sorted(rows):
        s = pos
        off = 0
        while off < n:
            b = (s + off) // C
            take = min(C - (s + off) % C, n - off)
            out.append((i, n, b, off, (s + off) % C, take))
            off += take
        pos += n
    return sorted(out)


WEIGHTED = [(0, 5), (1, 12), (2, 0), (3, 7), (4, 31), (5, 1), (6, 8)]


def spark_pack(spark, rows, C):
    df = spark.createDataFrame(rows, "doc_id long, w long")
    return sorted(
        tuple(r) for r in pack_concat(
            df, "doc_id", C, text_col=None, weight_col="w"
        ).collect()
    )


def test_matches_python_reference(spark):
    for C in (4, 10, 64):
        assert spark_pack(spark, WEIGHTED, C) == py_pack(WEIGHTED, C), C


def test_bins_exactly_full_except_last(spark):
    got = spark_pack(spark, WEIGHTED, 10)
    per_bin: dict = {}
    for _, _, b, _, _, ln in got:
        per_bin[b] = per_bin.get(b, 0) + ln
    total = sum(n for _, n in WEIGHTED)
    last = max(per_bin)
    assert set(per_bin) == set(range(last + 1))  # no gaps
    for b, ln in per_bin.items():
        assert ln == (10 if b < last else total - 10 * last)


def test_segments_reassemble_documents(spark):
    got = spark_pack(spark, WEIGHTED, 7)
    per_doc: dict = {}
    for i, n, _, doc_off, _, ln in got:
        per_doc.setdefault(i, []).append((doc_off, ln, n))
    for i, n in WEIGHTED:
        if n == 0:
            assert i not in per_doc  # zero-token docs emit nothing
            continue
        segs = sorted(per_doc[i])
        assert segs[0][0] == 0
        assert sum(ln for _, ln, _ in segs) == n
        # contiguous, non-overlapping
        pos = 0
        for off, ln, _ in segs:
            assert off == pos
            pos += ln


def test_null_weight_counts_as_zero(spark):
    rows = [(0, 5), (1, None), (2, 9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        tuple(r)
        for r in pack_concat(df, "doc_id", 4, text_col=None, weight_col="w").collect()
    )
    assert got == py_pack([(0, 5), (1, 0), (2, 9)], 4)


def test_partition_order_invariance(spark):
    df = spark.createDataFrame(WEIGHTED, "doc_id long, w long")
    a = sorted(
        tuple(r)
        for r in pack_concat(df, "doc_id", 9, text_col=None, weight_col="w").collect()
    )
    b = sorted(
        tuple(r)
        for r in pack_concat(
            df.repartition(13), "doc_id", 9, text_col=None, weight_col="w"
        ).collect()
    )
    assert a == b


def test_tokenizer_path_on_documents(spark):
    docs = read_table(spark, SF, "documents").limit(50)
    ref = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"),
        ).collect()
    }
    got = pack_concat(docs, "doc_id", 64).collect()
    per_doc: dict = {}
    for r in got:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["seg_len"]
    assert per_doc == {i: n for i, n in ref.items() if n > 0}


def test_validation(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, w long")
    with pytest.raises(ValueError, match="context_len"):
        pack_concat(df, "doc_id", 0, weight_col="w")
    with pytest.raises(ValueError, match="required"):
        pack_concat(df, "doc_id", 4, text_col=None)


@given(
    weights=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    C=st.integers(min_value=1, max_value=17),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_property_matches_python(spark, weights, C):
    rows = [(i, w) for i, w in enumerate(weights)]
    assert spark_pack(spark, rows, C) == py_pack(rows, C)
