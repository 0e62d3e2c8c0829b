"""Scale shape of the distributed BPE trainer
(functions/bpe.py::train_bpe_merges).

The r13 trainer's claim (VERDICT r12 directive #2): the CORPUS term
appears exactly once (the initial word-frequency aggregation), and the
per-merge explode+aggregate work is TOUCHED-WORDS-sized — the
incremental pair-count maintenance recounts only words containing the
merged pair, never the whole vocabulary. This probe separates the
terms by timing ``n_merges=0`` (state build + checkpoint only) against
``n_merges=10`` — per-merge cost = (T10 − T0) / 10 — across three
axes:

- **vocab axis**: every token suffixed per copy id (the scale_probe
  disjoint-vocabulary recipe), so V copies give V× the vocabulary AND
  V× the corpus — but a merge like (e, r) touches its words in EVERY
  copy, so the touched set also grows V× and per-merge cost should
  grow ~linearly (the honest bound: this axis scales touched words,
  not just vocabulary).
- **shards axis** (r13): every copy's ALPHABET is shifted into a
  disjoint codepoint block (spaces preserved), so V copies give V× the
  vocabulary with IDENTICAL per-copy pair structure — every merge
  touches exactly ONE copy's words, i.e. touched stays CONSTANT while
  |vocab| grows V×. Per-merge cost tracking touched (≈flat, up to the
  columnar pairs-frame argmax) and not |vocab| is the directive's
  "done" shape; the r12 full-recount trainer was linear here by
  construction.
- **corpus axis**: plain row duplication (same 31-word vocabulary,
  C× the corpus). Per-merge cost should stay FLAT — only T0 grows.

``--touched`` instead runs ONE 48-merge training on the base corpus
with per-merge instrumentation (the trainer's ``stats`` hook) and
prints mean per-merge wall by touched-count quartile — within a single
corpus, cost should fall with the touched fraction.

``--zipf`` builds a NATURAL-shaped corpus (100k docs × 30 tokens,
~50k-word vocabulary with Zipf-ish rank frequencies via a
deterministic log-uniform inverse CDF, words spelled in letters) and
runs one instrumented 30-merge fit: per-merge touched counts span
orders of magnitude on such a vocabulary (early merges touch huge
slices, later ones thin tails), so wall-vs-touched on this rig is the
realistic-data version of the shards-axis claim.

Usage: python tools/bpe_train_probe.py [factors ...]   # default 1 10 100
       python tools/bpe_train_probe.py --touched
       python tools/bpe_train_probe.py --zipf
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
N_MERGES = 10


def synth(spark, factor: int, axis: str):
    from time_series_loader_spark.session import read_table

    docs = read_table(spark, SRC, "documents").select("text")
    if factor == 1:
        return docs
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    out = docs.crossJoin(copies)
    if axis == "vocab":
        # per-copy token suffix: "word" -> "word_<copy>" for every
        # token (disjoint per-copy vocabularies, the scale_probe recipe)
        out = out.select(
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1_"), F.col("copy").cast("string")),
            ).alias("text")
        )
    elif axis == "shards":
        # per-copy ALPHABET shift: every non-space char moves into the
        # copy's own 256-codepoint block, so pair structures are
        # identical but fully disjoint across copies — each merge
        # touches exactly one copy's words. Synthesis-only Arrow kernel
        # (Spark's char() wraps mod 256, so no builtin can mint the
        # shifted codepoints); the TRAINER under test stays pure-JVM.
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from pyspark.sql.types import StringType

        def _shift_fn(text, copy):
            def one(t, k):
                off = k * 256

                def ch(c):
                    # hop over the UTF-16 surrogate block (D800-DFFF):
                    # lone surrogates are not encodable code points
                    cp = ord(c) + off
                    return chr(cp + 0x800 if cp >= 0xD800 else cp)

                return "".join(c if c == " " else ch(c) for c in t)

            return pd.Series(
                [one(t, int(k)) for t, k in zip(text, copy)]
            )

        _shift = pandas_udf(_shift_fn, StringType())

        out = out.select(_shift("text", "copy").alias("text"))
    return out.select("text")


def time_train(spark, df, n_merges: int) -> float:
    from time_series_loader_spark.functions.bpe import train_bpe_merges

    t0 = time.time()
    train_bpe_merges(df, "text", n_merges=n_merges, min_count=2)
    return time.time() - t0


def touched_mode(spark, factor: int = 100):
    """One 48-merge instrumented run over the vocab-axis synth (suffixed
    copies give a vocabulary whose merges touch wildly different word
    counts): per-merge wall by touched-count quartile — within one
    corpus, cost must track the touched fraction."""
    from time_series_loader_spark.functions.bpe import train_bpe_merges

    docs = synth(spark, factor, "vocab").localCheckpoint(eager=True)
    stats: list[dict] = []
    train_bpe_merges(docs, "text", n_merges=48, min_count=2, stats=stats)
    ordered = sorted(stats, key=lambda s: s["n_touched"])
    q = max(1, len(ordered) // 4)
    print(f"{'quartile':>10} {'touched range':>18} {'mean wall':>10}")
    for qi in range(4):
        chunk = ordered[qi * q : (qi + 1) * q] if qi < 3 else ordered[3 * q :]
        if not chunk:
            continue
        mean = sum(s["wall_s"] for s in chunk) / len(chunk)
        print(
            f"{qi + 1:>10} {chunk[0]['n_touched']:>8}-{chunk[-1]['n_touched']:<8} "
            f"{mean:>9.3f}s"
        )
    top = ordered[-1]
    bot = ordered[0]
    print(
        f"touched {bot['n_touched']} -> {bot['wall_s']:.3f}s ; "
        f"touched {top['n_touched']} -> {top['wall_s']:.3f}s"
    )


def zipf_docs(spark, n_docs: int = 100_000, doc_len: int = 30,
              v_max: int = 50_000):
    """The Zipf-shaped corpus shared by the --zipf rig and the
    kill/resume probe (tools/bpe_resume_probe.py): deterministic
    log-uniform rank (≈ Zipf(1) inverse CDF), spelled in letters so
    character-pair structure is word-like."""
    u = (F.xxhash64(F.col("i"), F.col("j")).cast("double") / F.lit(2.0**63) + 1.0) / 2.0
    rank = F.floor(F.exp(u * F.log(F.lit(float(v_max))))).cast("long")
    word = F.translate(rank.cast("string"), "0123456789", "abcdefghij")
    return (
        spark.range(n_docs, numPartitions=32)
        .select(F.col("id").alias("i"), F.explode(F.sequence(F.lit(1), F.lit(doc_len))).alias("j"))
        .select("i", word.alias("w"))
        .groupBy("i")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def zipf_mode(spark, n_docs: int = 100_000, doc_len: int = 30,
              v_max: int = 50_000, n_merges: int = 30):
    """One instrumented fit over a Zipf-shaped vocabulary — the
    realistic-data wall-vs-touched record."""
    from time_series_loader_spark.functions.bpe import train_bpe_merges

    docs = zipf_docs(spark, n_docs, doc_len, v_max).localCheckpoint(eager=True)
    n_vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .agg(F.countDistinct("w")).collect()[0][0]
    )
    stats: list[dict] = []
    import time as _t

    t0 = _t.time()
    merges = train_bpe_merges(docs, "text", n_merges=n_merges, min_count=2, stats=stats)
    wall = _t.time() - t0
    widths = [s.get("batch_w", 1) for s in stats]
    n_iters = sum(1.0 / w for w in widths)
    print(f"zipf rig: {n_docs} docs, vocab {n_vocab}, {len(merges)} merges, {wall:.1f}s total")
    print(f"batched scheduling (r14): {n_iters:.0f} driver iterations for "
          f"{len(merges)} merges — mean batch width {len(merges)/max(n_iters,1):.2f}")
    print(f"{'rank':>5} {'pair':>12} {'touched':>9} {'touched%':>9} {'wall':>7} {'bw':>3}")
    for s in stats:
        print(f"{s['rank']:>5} {s['a']+'+'+s['b']:>12} {s['n_touched']:>9} "
              f"{100.0*s['n_touched']/n_vocab:>8.1f}% {s['wall_s']:>6.2f}s "
              f"{s.get('batch_w', 1):>3}")
    ordered = sorted(stats, key=lambda s: s["n_touched"])
    lo = ordered[: len(ordered) // 3]
    hi = ordered[-len(ordered) // 3 :]
    print(
        f"bottom-third touched (mean {sum(s['n_touched'] for s in lo)/len(lo):.0f} words): "
        f"{sum(s['wall_s'] for s in lo)/len(lo):.2f}s/merge ; "
        f"top-third touched (mean {sum(s['n_touched'] for s in hi)/len(hi):.0f} words): "
        f"{sum(s['wall_s'] for s in hi)/len(hi):.2f}s/merge"
    )
    docs.unpersist()


def main():
    from time_series_loader_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if "--touched" in sys.argv:
        touched_mode(spark)
        return
    if "--zipf" in sys.argv:
        zipf_mode(spark)
        return
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    print(f"{'axis':>7} {'V/C':>5} {'vocab':>9} {'T0 (state build)':>17} "
          f"{'T10':>8} {'per-merge':>10}")
    for axis in ("vocab", "shards", "corpus"):
        for f in factors:
            df = synth(spark, f, axis).localCheckpoint(eager=True)
            n_vocab = (
                df.select(F.explode(F.split("text", " ")).alias("w"))
                .where(F.col("w") != "")
                .agg(F.countDistinct("w"))
                .collect()[0][0]
            )
            time_train(spark, df, 0)  # warm-up
            t0 = min(time_train(spark, df, 0) for _ in range(2))
            t10 = min(time_train(spark, df, N_MERGES) for _ in range(2))
            print(
                f"{axis:>7} {f:>5} {n_vocab:>9} {t0:>16.2f}s {t10:>7.2f}s "
                f"{(t10 - t0) / N_MERGES:>9.3f}s",
                flush=True,
            )
            df.unpersist()


if __name__ == "__main__":
    main()
