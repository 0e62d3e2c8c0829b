"""Scale shape of surgical decontamination
(decontam.py::strip_contamination).

The claim (SCALING.md r12): positional windows are corpus-sized, but
non-hit windows die map-side against the broadcast benchmark, so the
position explode/distinct and the whole rebuild run on
CONTAMINATION-sized data. Two axes:

- **corpus axis**: corpus ×{1,10,100} with a FIXED absolute number of
  contaminated docs. Wall should scale like one corpus projection
  (window build + broadcast probe), with the rebuild share constant.
- **contamination axis**: fixed corpus, contaminated-doc fraction
  ×{1%, 10%, 50%}. Wall growth here isolates the contamination-sized
  stages (position explode, touched-doc posexplode + anti-join +
  groupBy rebuild).

Corpus synthesis (deterministic): base docs of 120 unique-namespace
tokens; a contaminated doc embeds the 12-token benchmark sentence
mid-document. The benchmark is the one sentence's 8-grams (5 grams) —
eval-suite-sized, always broadcast.

The r12 baseline run of this probe (pre-anchor-prefilter: 5.8 / 45 /
537 s on the corpus axis) exposed the window-string build as the
dominant term and forced `contaminated_positions`' anchor prefilter;
the probe now measures the anchored form (2.1 / 6.8 / 43.3 s — best
case: this rig's clean docs share no tokens with the benchmark). Both
sets of numbers are recorded in SCALING.md r12.

r13 adds ``--natural`` (VERDICT r12 directive #3): the corpus-axis rig
above is the BEST case for the anchor prefilter — clean docs share no
tokens with the benchmark, so anchors kill every clean window. Natural
text does not behave like that: benchmark grams start with stopwords
that saturate the corpus. The natural rig interleaves a 7-stopword
cycle into every 3rd body position (so the benchmark's anchor tokens
— 'the', 'is', … — hit ~10% of ALL positions) and measures, on the
same 200k-doc corpus: the literal-anchor form, the broadcast-joined
anchor form (suites past _ANCHOR_LITERAL_MAX), and a probe-local
replica of the r12 no-prefilter window build as the baseline. The
recorded win is therefore the honest one, not the disjoint-vocabulary
12.4×.

Usage: python tools/strip_probe.py             # runs both axes
       python tools/strip_probe.py --natural   # honest prefilter rig
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE_DOCS = 20_000
BENCH_SENT = "the secret eval answer is forty two exactly so there now"


def synth(spark, n_docs: int, n_contam: int):
    bench_mid = F.lit(" " + BENCH_SENT + " ")
    body_a = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.concat(F.lit("d"), F.col("id"), F.lit("w"), i),
        ),
    )
    body_b = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(61), F.lit(120)),
            lambda i: F.concat(F.lit("d"), F.col("id"), F.lit("w"), i),
        ),
    )
    # first n_contam ids get the benchmark sentence spliced mid-doc
    text = F.when(
        F.col("id") < n_contam, F.concat(body_a, bench_mid, body_b)
    ).otherwise(F.concat(body_a, F.lit(" "), body_b))
    return (
        spark.range(n_docs, numPartitions=32)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
    )


def run(spark, n_docs: int, n_contam: int) -> tuple[float, int]:
    from time_series_loader_spark.operators.decontam import (
        ngram_set,
        strip_contamination,
    )

    bench = ngram_set([BENCH_SENT], 8)
    docs = synth(spark, n_docs, n_contam).localCheckpoint(eager=True)
    out = strip_contamination(docs, "text", "doc_id", bench, n=8, margin=1)
    t0 = time.time()
    n = out.count()
    el = time.time() - t0
    docs.unpersist()
    assert n == n_docs, (n, n_docs)
    return el, n


STOPS = ["the", "is", "a", "of", "and", "to", "in"]


def synth_natural(spark, n_docs: int, n_contam: int):
    """120-token docs where every 3rd position cycles through STOPS —
    the benchmark's anchor tokens ('the', 'is', …) therefore appear all
    over CLEAN documents, the realistic-overlap regime."""
    stop_arr = F.array(*[F.lit(w) for w in STOPS])

    def word(i):
        return F.when(
            (i % 3) == 0,
            F.element_at(stop_arr, ((i % 21) / F.lit(3)).cast("int") + 1),
        ).otherwise(F.concat(F.lit("d"), F.col("id"), F.lit("w"), i))

    body_a = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), F.lit(60)), word)
    )
    body_b = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(61), F.lit(120)), word)
    )
    bench_mid = F.lit(" " + BENCH_SENT + " ")
    text = F.when(
        F.col("id") < n_contam, F.concat(body_a, bench_mid, body_b)
    ).otherwise(F.concat(body_a, F.lit(" "), body_b))
    return spark.range(n_docs, numPartitions=32).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def _positions_noprefilter(df, bench, n, margin):
    """Probe-local replica of the r12 no-prefilter window build (every
    position gets its n-token gram string) — the baseline the anchored
    forms are measured against."""
    from time_series_loader_spark.operators.decontam import _hit_positions
    from time_series_loader_spark.operators.text import tokens

    spark = df.sparkSession
    bng = spark.createDataFrame([(g,) for g in sorted(set(bench))], "ngram string")
    toked = df.select(F.col("doc_id"), tokens("text").alias("_t"))
    m = F.size("_t") - (n - 1)
    win = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.struct(
                (i - 1).cast("int").alias("start"),
                F.concat_ws(" ", F.slice(F.col("_t"), i, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,gram:string>>"))
    wins = toked.select(
        F.col("doc_id"), F.explode(win).alias("w"), (F.size("_t") - 1).alias("_last")
    ).select("doc_id", "w.start", "w.gram", "_last")
    hits = wins.join(F.broadcast(bng), wins["gram"] == bng["ngram"], "inner").select(
        "doc_id", "start", "_last"
    )
    return _hit_positions(hits, "doc_id", n, margin)


def natural_mode(spark):
    from time_series_loader_spark.operators.decontam import (
        contaminated_positions,
        ngram_set,
    )
    from time_series_loader_spark.operators.spans import rebuild_without_positions

    n_docs, n_contam = BASE_DOCS * 10, BASE_DOCS // 10
    bench = ngram_set([BENCH_SENT], 8)
    docs = synth_natural(spark, n_docs, n_contam).localCheckpoint(eager=True)
    bng = spark.createDataFrame([(g,) for g in bench], "ngram string")

    def strip_wall(pos_builder):
        out = rebuild_without_positions(docs, "text", "doc_id", pos_builder())
        t0 = time.time()
        n = out.count()
        assert n == n_docs, (n, n_docs)
        return time.time() - t0

    variants = {
        "literal-anchor": lambda: contaminated_positions(
            docs, "text", "doc_id", bench, n=8, margin=1
        ),
        "join-anchor": lambda: contaminated_positions(
            docs, "text", "doc_id", bng, n=8, margin=1
        ),
        "no-prefilter": lambda: _positions_noprefilter(docs, bench, 8, 1),
    }
    # anchored-position density, for the record
    from time_series_loader_spark.operators.text import tokens as _tokens

    anchors = sorted({g.split(" ", 1)[0] for g in bench})
    dens = docs.select(
        F.explode(_tokens("text")).alias("t")
    ).agg(
        (F.sum(F.col("t").isin(anchors).cast("long")) / F.count(F.lit(1))).alias("d")
    ).collect()[0]["d"]
    print(
        f"natural rig: {n_docs} docs, {n_contam} contaminated, "
        f"anchor density {dens:.1%} of positions"
    )
    for name, builder in variants.items():
        strip_wall(builder)  # warm-up
        el = min(strip_wall(builder) for _ in range(2))
        print(f"{name:>16}: {el:7.2f}s", flush=True)
    docs.unpersist()


def main():
    from time_series_loader_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if "--natural" in sys.argv:
        natural_mode(spark)
        return
    print(f"{'axis':>8} {'docs':>9} {'contam':>8} {'wall':>8}")
    # corpus axis: fixed 200 contaminated docs
    for f in (1, 10, 100):
        n = BASE_DOCS * f
        run(spark, n, 200)  # warm-up
        el = min(run(spark, n, 200)[0] for _ in range(2))
        print(f"{'corpus':>8} {n:>9} {200:>8} {el:>7.2f}s", flush=True)
    # contamination axis: fixed 200k docs
    n = BASE_DOCS * 10
    for frac, n_c in (("1%", n // 100), ("10%", n // 10), ("50%", n // 2)):
        run(spark, n, n_c)
        el = min(run(spark, n, n_c)[0] for _ in range(2))
        print(f"{'contam':>8} {n:>9} {n_c:>8} {el:>7.2f}s", flush=True)


if __name__ == "__main__":
    main()
