"""Gopher-rule quality flags (operators/text.py::gopher_quality_flags).

The driver testdata corpus is single-line word-salad (no bullets, no
ellipses, ≤1 required stopword), so the line-level rules get zero
exercise from the oracle query — these fixtures put every rule on both
sides of its threshold. Parity with the DuckDB oracle expression set is
checked in-process too, so the entry-file SQL and the Spark expressions
can't drift apart on the rules the corpus never triggers.
"""

import duckdb
import pytest

from time_series_loader_spark.operators.text import (
    REQUIRED_STOPWORDS,
    gopher_quality_flags,
    text_profile,
)

# A base paragraph that passes every rule: >50 words, normal word
# length, ≥2 required stopwords, alphabetic, no bullets/ellipses/dups.
GOOD = (
    "the quick brown fox jumps over that lazy dog and keeps running with\n"
    "steady pace through the forest to find some food and water for the\n"
    "long winter that is coming soon and everyone must have enough stored\n"
    "away before the first snow falls on the quiet valley floor tonight\n"
    "while the wind blows gently across the open meadow near the river"
)

FIXTURES = {
    # doc_id: (text, expect_pass, reason)
    0: (GOOD, True, "baseline good document"),
    1: ("the cat and dog", False, "word count < 50"),
    2: (GOOD + " ###### " + "# " * 20, False, "symbol ratio > 0.1"),
    3: (
        "\n".join("- bullet item %d with the and that" % i for i in range(10)),
        False,
        "all lines bullet-initial (and short)",
    ),
    4: (
        GOOD + "\n" + "\n".join("this line trails off and so..." for _ in range(5)),
        False,
        "ellipsis-terminated lines > 0.3",
    ),
    5: (
        "42 17 9000 3.14 " * 20 + "the and of that",
        False,
        "alpha word fraction < 0.8",
    ),
    6: (
        " ".join("word%d" % i for i in range(60)),
        False,
        "no required stopwords",
    ),
    7: (
        GOOD + "\n" + "\n".join("the same repeated line here" for _ in range(6)),
        False,
        "duplicate-line fraction > 0.3",
    ),
    8: (
        "a b c d e " * 15 + "the of and that have",
        False,
        "mean word length < 3",
    ),
}


@pytest.fixture(scope="module")
def gdocs(spark):
    rows = [(i, t) for i, (t, _, _) in FIXTURES.items()]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_pass_flag_per_rule(spark, gdocs):
    out = {r["doc_id"]: r for r in gopher_quality_flags(gdocs, "text", "doc_id").collect()}
    assert len(out) == len(FIXTURES)
    for i, (_, expect, reason) in FIXTURES.items():
        assert out[i]["pass_gopher"] is expect, f"doc {i}: {reason}"


def test_fraction_columns(spark, gdocs):
    out = {r["doc_id"]: r for r in gopher_quality_flags(gdocs, "text", "doc_id").collect()}
    # bullet doc: every line bullet-initial
    assert out[3]["bullet_line_frac"] == 1.0
    # ellipsis doc: 5 of 10 lines end with '...'
    assert abs(out[4]["ellipsis_line_frac"] - 5 / 10) < 1e-12
    # dup-line doc: 6 identical lines after 5 distinct ones → 5/11 dup
    assert abs(out[7]["dup_line_frac"] - 5 / 11) < 1e-12
    # numeric doc: required stopwords all present exactly once
    assert out[5]["n_req_stopwords"] == 4
    # good doc: zero special fractions, all 1.0 alpha
    g = out[0]
    assert g["symbol_token_ratio"] == 0.0
    assert g["bullet_line_frac"] == 0.0
    assert g["ellipsis_line_frac"] == 0.0
    assert g["dup_line_frac"] == 0.0
    assert g["alpha_word_frac"] == 1.0
    assert g["n_req_stopwords"] >= 2


def test_required_stopwords_is_distinct_count(spark):
    # repeating 'the' 50 times still counts as ONE required stopword
    df = spark.createDataFrame([(0, "the " * 60)], "doc_id LONG, text STRING")
    row = gopher_quality_flags(df, "text", "doc_id").collect()[0]
    assert row["n_req_stopwords"] == 1
    assert row["pass_gopher"] is False


def test_profile_carries_gopher_columns(spark, gdocs):
    prof = {r["doc_id"]: r for r in text_profile(gdocs, "text", "doc_id").collect()}
    flags = {r["doc_id"]: r for r in gopher_quality_flags(gdocs, "text", "doc_id").collect()}
    for i in FIXTURES:
        for c in (
            "symbol_token_ratio",
            "bullet_line_frac",
            "ellipsis_line_frac",
            "dup_line_frac",
            "alpha_word_frac",
            "n_req_stopwords",
            "pass_gopher",
        ):
            assert prof[i][c] == flags[i][c], (i, c)


def test_duckdb_parity_on_rule_exercising_fixtures(spark, gdocs):
    """The same rules rebuilt in DuckDB SQL (the oracle dialect) agree on
    fixtures that actually trigger the line-level rules."""
    pdf = gdocs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    req = ", ".join(f"'{w}'" for w in REQUIRED_STOPWORDS)
    sql = f"""
    WITH gln AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS t,
      list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                  l -> l <> '') AS lines FROM documents)
    SELECT doc_id,
      (len(t) BETWEEN 50 AND 100000)
      AND (length(regexp_replace(lower(text), '\\s+', '', 'g')) / len(t) BETWEEN 3.0 AND 10.0)
      AND (((length(text) - length(replace(text, '#', '')))
            + (length(text) - length(replace(text, '...', '')))/3) / len(t) <= 0.1)
      AND (CASE WHEN len(lines) > 0
           THEN CAST(len(list_filter(lines, l -> substr(l,1,1) IN ('-','*','•'))) AS DOUBLE)/len(lines)
           ELSE 0.0 END <= 0.9)
      AND (CASE WHEN len(lines) > 0
           THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS DOUBLE)/len(lines)
           ELSE 0.0 END <= 0.3)
      AND (CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)/len(t) >= 0.8)
      AND (len(list_intersect(list_distinct(t), [{req}])) >= 2)
      AND (CASE WHEN len(lines) > 0
           THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)/len(lines)
           ELSE 0.0 END <= 0.3) AS pass_gopher
    FROM gln
    """
    duck = dict(con.execute(sql).fetchall())
    sp = {
        r["doc_id"]: r["pass_gopher"]
        for r in gopher_quality_flags(gdocs, "text", "doc_id").collect()
    }
    assert duck == sp


def test_normalize_text_nfc_matches_duckdb(spark):
    """Stdlib unicodedata NFC == DuckDB nfc_normalize on tricky strings
    (cross-engine differential — both implement the frozen Unicode
    normalization algorithm)."""
    import duckdb

    from time_series_loader_spark.operators.text import normalize_text

    texts = [
        "café olé",          # combining accents -> composed
        "éèê",            # already composed
        "Ångström",          # ring + diaeresis
        "３４５",            # full-width digits (NFC keeps)
        "plain ascii",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id LONG, text STRING"
    )
    got = {
        r["id"]: r["text"]
        for r in normalize_text(df, "text", strip_controls=False).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        exp = con.execute("SELECT nfc_normalize(?)", [t]).fetchone()[0]
        assert got[i] == exp, (i, t)


def test_normalize_text_strips_invisibles_and_modes(spark):
    from time_series_loader_spark.operators.text import normalize_text
    from time_series_loader_spark.operators.dedup import dedup_exact

    sneaky = "same​text"      # zero-width space
    plain = "sametext"
    df = spark.createDataFrame(
        [(0, sneaky), (1, plain), (2, None), (3, "a\x00b\tc\nd")],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r["text"] for r in normalize_text(df, "text").collect()}
    assert out[0] == plain          # ZWSP stripped -> exact-dup now visible
    assert out[2] is None           # null passthrough
    assert out[3] == "ab\tc\nd"     # NUL stripped, tab/LF kept
    # the motivating composition: normalization BEFORE exact dedup
    groups = dedup_exact(
        normalize_text(df.where("text IS NOT NULL"), "text"), ["text"], "doc_id"
    ).collect()
    by_digest = {r["key_digest"]: r["n_dups"] for r in groups}
    assert 2 in by_digest.values()  # sneaky+plain collapsed to one group

    # NFKC folds full-width; collapse_whitespace squashes runs
    df2 = spark.createDataFrame([(0, "ａ  ｂ　x")], "id LONG, text STRING")
    out2 = normalize_text(
        df2, "text", form="NFKC", collapse_whitespace=True
    ).collect()[0]["text"]
    assert out2 == "a b x"

    import pytest

    with pytest.raises(ValueError):
        normalize_text(df, "text", form="NFX")


def test_mojibake_hits(spark):
    """Classic UTF-8-as-Latin-1 artifacts counted; clean text (ASCII or
    properly-encoded accents) scores 0; DuckDB mirror agrees."""
    from time_series_loader_spark.operators.text import (
        MOJIBAKE_PATTERN,
        mojibake_hits,
    )

    rows = [
        (0, "cafÃ© costs Â£5"),   # A-tilde+cont, stray A-circ -> 2
        (1, "said â€œyesâ€™"),  # a-circ euro pairs -> 2
        (2, "plain ascii text with no corruption"),   # 0
        (3, "proper café and naïve text"),  # clean accents -> 0
        (4, "broken � char"),                    # replacement char -> 1
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["m"]
        for r in df.select("doc_id", mojibake_hits("text").alias("m")).collect()
    }
    assert got == {0: 2, 1: 2, 2: 0, 3: 0, 4: 1, 5: None}

    con = duckdb.connect()
    for i, txt in rows:
        if txt is None:
            continue
        d = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [txt, MOJIBAKE_PATTERN]
        ).fetchone()[0]
        assert d == got[i], (i, txt)


def test_bpeish_kernel_equals_expression(spark):
    """text_profile computes n_tokens_bpeish in its Arrow kernel
    (vectorized codepoint classes, both the per-row and whole-batch
    forms) — it must be bit-identical to the public Java-regex
    expression `token_count_bpeish` on Unicode hazards (case-expansion
    İ→i̇, combining accents, ZWSP, tabs/newlines) and on real corpora
    (pinned here at sf0.001; SCALING.md r10 documents the 6.6 s→kernel
    move at the 500k-doc probe)."""
    from time_series_loader_spark.operators.text import (
        _bpeish_count,
        _bpeish_counts_batch,
        text_profile,
        token_count_bpeish,
    )

    fix = ["", None, "  ", "a1! b2?", "ÀÉü 123..x", "İstanbul iı",
           "café​ x", "aaaaa999!@#", "tab\tnl\nmix 42", None]
    assert _bpeish_counts_batch(fix) == [_bpeish_count(s) for s in fix]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(fix) if s is not None],
        "doc_id long, text string",
    )
    expr = {r["doc_id"]: r["e"] for r in
            df.select("doc_id", token_count_bpeish("text").alias("e")).collect()}
    kern = {r["doc_id"]: r["n_tokens_bpeish"] for r in
            text_profile(df, "text", "doc_id").collect()}
    assert kern == expr
    from pyspark.sql import functions as F

    from time_series_loader_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    both = text_profile(docs, "text", "doc_id", min_parallelism=4).select(
        "doc_id", "n_tokens_bpeish"
    ).join(docs.select("doc_id", token_count_bpeish("text").alias("e")), "doc_id")
    assert both.where(F.col("n_tokens_bpeish") != F.col("e")).count() == 0


def test_bpeish_kernel_equals_expression_casemap_sweep(spark):
    """ADVICE r10: the kernel's `str.lower()` must match the JVM's
    `lower()` — but the two runtimes' Unicode tables can diverge by
    Unicode version for codepoints OUTSIDE a fixed fixture list. Sweep
    the case-mapping-affected ranges (where lower() actually rewrites
    characters) so a JRE/CPython Unicode-version split in THIS
    environment fails loudly instead of drifting silently: Latin-1
    Supplement/Extended-A/B, Greek, Cyrillic, Armenian, Georgian
    (incl. Mtavruli, Unicode 11), Cherokee (lowercase added in
    Unicode 8), Latin Extended Additional, Deseret, plus the known
    full-case-mapping expansions (İ, ẞ, ﬁ, ǅ) and final-sigma
    context. Each row packs a range slice into one doc with spacing
    so run-structure differences are visible in the count."""
    from time_series_loader_spark.operators.text import (
        _bpeish_counts_batch,
        token_count_bpeish,
    )

    ranges = [
        (0x00C0, 0x024F),   # Latin-1 Supplement .. Latin Extended-B
        (0x0370, 0x03FF),   # Greek and Coptic
        (0x0400, 0x052F),   # Cyrillic + Supplement
        (0x0530, 0x058F),   # Armenian
        (0x10A0, 0x10FF),   # Georgian (Asomtavruli)
        (0x1C90, 0x1CBF),   # Georgian Mtavruli (Unicode 11)
        (0x13A0, 0x13FF),   # Cherokee (lowercase since Unicode 8)
        (0xAB70, 0xABBF),   # Cherokee Supplement
        (0x1E00, 0x1EFF),   # Latin Extended Additional
        (0x2C60, 0x2C7F),   # Latin Extended-C
        (0xA720, 0xA7FF),   # Latin Extended-D
        (0x0531, 0x0556),   # Armenian uppercase block (again, spaced)
        (0x10400, 0x1044F),  # Deseret (astral-plane case pairs)
    ]
    docs, i = [], 0
    for lo, hi in ranges:
        chars = [chr(c) for c in range(lo, hi + 1)]
        # one packed doc (adjacent runs) and one space-separated doc
        # (every char its own run) per range — the two layouts disagree
        # if ANY codepoint's lowercase form differs between runtimes
        docs.append((i, "".join(chars))); i += 1
        docs.append((i, " ".join(chars))); i += 1
    specials = ["İstanbul", "STRAẞE", "ﬁne ﬂag", "ǅungla ǱǲǳǄ",
                "ΟΔΥΣΣΕΥΣ", "ΣΙΣΥΦΟΣ ςσΣ"]
    for s in specials:
        docs.append((i, s)); i += 1
    kern = {d: c for (d, t), c in zip(docs, _bpeish_counts_batch([t for _, t in docs]))}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    expr = {r["doc_id"]: r["e"] for r in
            df.select("doc_id", token_count_bpeish("text").alias("e")).collect()}
    mismatches = {d: (kern[d], expr[d]) for d in kern if kern[d] != expr[d]}
    assert not mismatches, (
        "JVM lower() vs CPython str.lower() count divergence "
        f"(JRE/CPython Unicode-version split?): {mismatches}"
    )
