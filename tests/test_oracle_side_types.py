"""Driver-normalization invariance for the two historically contested
slots (`continuity_stats`, `tfidf_top3`).

Rounds 5-6 proved the float math locally bit-identical yet driver-red, so
round 7 removed every engine-evaluated float from both slots. These tests
certify the resulting claim DIRECTLY, on BOTH engines:

1. the DuckDB oracle SQL (the exact string the driver runs) and the Spark
   plan each return ONLY int / str / None Python values — types whose
   textual form is identical under any plausible hash normalization
   (repr, str, json, f-string: all yield the same bytes for ints and
   strings, and floats/Decimals/datetimes — the types normalizations
   disagree on — are simply absent);
2. the two engines' outputs are equal as exact multisets (no hashing, no
   rounding, no tolerance), which is strictly stronger than any
   normalize-then-hash comparison the driver can apply.

Also exercises the oracle's `read_parquet` on the pinned ln table
(resources/ln_u_micro.parquet) under a default DuckDB connection — the one
external-file dependency in the gate surface.
"""

import pytest

duckdb = pytest.importorskip("duckdb")

import __spark_entry__ as entry
from time_series_loader_spark.session import TABLES

CONTESTED = ["continuity_stats", "tfidf_top3", "unigram_entropy"]
# the integer/string-pure slots of the r8 50-slot surface — certify them
# under the same normalization-proof test so a future float column can't
# silently creep in (zorder's INTERMEDIATE scaling is IEEE float, but its
# output is a BIGINT key; embedding_near_dup/cosine slots are excluded:
# their cos columns are sanctioned 6dp-floored doubles)
INTEGER_PURE = CONTESTED + [
    "corpus_prep",   # chunk + pack + mix + dsir + normtext sections
    "layout_pack",   # shard_pack + zorder sections
    "stratified_sample",
    "retrieval",     # bm25 + inverted-index + recall sections
    "series_models", # trend + cusum + funnel + retention sections
    "env_fingerprint",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # None-safe total order (mixed null/int columns, e.g. sample_bucket)
    def key(t):
        return tuple((v is None, str(type(v).__name__), v) for v in t)

    return sorted((tuple(r[i] for i in order) for r in rows), key=key)


@pytest.mark.parametrize("name", INTEGER_PURE)
def test_contested_slot_values_are_normalization_proof(
    spark, sf_dir, duck, name
):
    sdf = entry.queries()[name](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns

    cur = duck.execute(entry.oracle_sql()[name])
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    for engine, rows in (("spark", s_rows), ("duckdb", d_rows)):
        for row in rows:
            for v in row:
                assert v is None or isinstance(v, (int, str)), (
                    f"{name}/{engine}: non-integer-pure value "
                    f"{v!r} ({type(v).__name__})"
                )
                # bool is an int subclass but str(True) != repr(1)
                assert not isinstance(v, bool)

    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in d_cols
    )
    assert _multiset(s_cols, s_rows) == _multiset(d_cols, d_rows)


# result-set REPRESENTATION contract (round 8). The r5-r7 tfidf_top3
# hash red — which survived full value-level integer purification — was
# traced to the gate's single HUGEINT output column (an uncast SUM in
# the old unigram section): HUGEINT is value-identical to the BIGINT the
# Spark side emits, but pandas/arrow fetch paths materialize it as
# float64/decimal ("2215.0" vs "2215"), a channel invisible to every
# value-level purity test above. No oracle may emit a non-standard
# column type again, for ANY slot.
_STANDARD_DUCK_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "VARCHAR",
    "DOUBLE",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
}


@pytest.mark.parametrize("name", sorted(entry.oracle_sql()))
def test_every_oracle_output_column_is_standard_typed(duck, name):
    desc = duck.execute(
        f"DESCRIBE (\n{entry.oracle_sql()[name]}\n)"
    ).fetchall()
    odd = [(c, t) for c, t, *_ in desc if t not in _STANDARD_DUCK_TYPES]
    assert not odd, (
        f"{name}: oracle emits non-standard column type(s) {odd} — "
        "HUGEINT/DECIMAL/UBIGINT round-trip differently through "
        "pandas/arrow fetch paths than through fetchall(), which is "
        "exactly the representation channel that kept tfidf_top3 "
        "driver-red for three rounds. CAST the column."
    )


def test_gate_surface_is_exactly_50_fully_oracled_slots():
    """Driver contract (VERDICT r7 #1): the correctness gate records the
    FIRST 50 queries() entries — r1, r2, and r7 all truncated at exactly
    50, silently un-recording everything later in dict order. The
    surface must therefore be EXACTLY 50 slots, every one of them with
    an oracle, so nothing ships uncertified and nothing falls off the
    record."""
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) == 50, f"queries() has {len(q)} entries, contract is 50"
    assert set(q) == set(o), (
        f"oracle coverage mismatch: missing={sorted(set(q) - set(o))} "
        f"extra={sorted(set(o) - set(q))}"
    )
