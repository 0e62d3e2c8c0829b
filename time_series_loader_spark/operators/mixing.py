"""Domain-mixture planning with per-domain epochs (data mixing).

Public technique: the pre-training "data mixture" recipe — per-domain
sampling weights with repetition ("epochs") for small, high-value
domains — as published for The Pile (Gao et al. 2021, arXiv:2101.00027,
Table 1's epochs column), LLaMA (Touvron et al. 2023, arXiv:2302.13971,
Table 1 "Sampling prop. / Epochs"), and DoReMi's reweighted sampling
(Xie et al. 2023, arXiv:2305.10429). Given target weights w_d and a
total token budget B, each domain owes n_d = B·w_d/Σw tokens; a domain
holding T_d tokens contributes q_d = n_d div T_d full epochs (every doc
repeated q_d times) plus a PARTIAL epoch: the docs that come first in
deterministic md5 order, greedily while their cumulative token count
stays ≤ n_d mod T_d, get one extra copy.

Everything is exact integer arithmetic over integer token counts, and
the order is (md5(id||salt), id) — the same engine-reproducible no-
``rand()`` determinism as `operators/sampling.py` — so the emitted plan
(doc → n_copies) is bit-identical across engines, reruns, and partition
orders: certifiable against a SQL oracle with zero float channels.

Scale shape, two modes:

- ``mode="window"`` (oracle form): per-domain running token sum over
  one window shuffle keyed by domain. Exact, but with few domains each
  partition holds a whole domain — the classic low-cardinality window
  skew. Fine to ~10⁸ rows/domain; not the 100 TB tool.
- ``mode="hist"`` (scale form, SAME output bit-for-bit): the greedy cut
  only needs the md5-order PREFIX boundary, so resolve it hierarchically
  — a (domain × 65536)-row histogram of token sums per 16-bit md5
  prefix (one map-side-combined agg, tiny result), cumulate it on the
  bucket panel to find the boundary bucket and the residual budget, and
  rank ONLY the boundary bucket's rows (~1/65536 of the corpus) through
  a window. Every other row's verdict is a broadcast-joined bucket
  comparison. Equivalence holds because md5 strings order exactly like
  their 16-bit numeric prefix, then lexicographic tail: grouping by the
  prefix preserves the global greedy order. Property-tested equal to
  ``mode="window"``.

Both modes emit every input row (excluded/over-budget docs carry
``n_copies = 0``) so the plan is also the audit report: achieved tokens
per domain = Σ toks·n_copies, directly comparable to n_d.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .text import tokens

__all__ = ["mixture_plan"]


def _domain_budgets(
    weights: dict[str, int], budget_tokens: int
) -> dict[str, int]:
    """n_d = B·w_d div Σw — exact integer split of the budget (floor;
    the ≤ Σw−1 leftover tokens are deliberately unassigned rather than
    redistributed by a float ratio)."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    bad = {d: w for d, w in weights.items() if w < 0}
    if bad:
        raise ValueError(f"negative mixture weights: {bad}")
    sw = sum(weights.values())
    if sw == 0:
        raise ValueError("mixture weights sum to 0")
    return {d: (budget_tokens * w) // sw for d, w in weights.items()}


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    weights: dict[str, int],
    budget_tokens: int,
    text_col: str | None = "text",
    tok_col: str | None = None,
    salt: str = "",
    mode: str = "window",
) -> DataFrame:
    """Per-document repetition plan for a target domain mixture:
    (``id_col``, ``domain_col``, toks, n_copies).

    ``weights``: integer target weights per domain value (need not sum
    to anything in particular — only ratios matter). Domains absent
    from the map (or NULL) get ``n_copies = 0``. ``budget_tokens``:
    total token budget B. Token counts come from ``tok_col`` if given,
    else ``F.size(tokens(text_col))`` (the shared whitespace tokenizer
    — its ``['']``-for-empty quirk makes every doc count ≥ 1 token, so
    per-domain totals are always positive and the greedy cut always
    terminates).

    ``mode="window"`` is the exact oracle-certifiable form;
    ``mode="hist"`` computes the identical plan with the boundary-bucket
    trick (module doc) and is the 100 TB path.

    Caller-``tok_col`` edge semantics (identical in both modes, tested):
    NULL token counts coalesce to 0; zero-token docs inside a
    positive-token domain still ride the greedy prefix for free (they
    cost nothing); a domain whose TOTAL is 0 gets ``n_copies = 0``
    everywhere — it cannot absorb budget, and the unguarded math
    (``_nd div 0``) would be NULL.
    """
    if mode not in ("window", "hist"):
        raise ValueError(f"mode must be 'window' or 'hist', got {mode!r}")
    if tok_col is None and text_col is None:
        raise ValueError("one of text_col / tok_col is required")
    budgets = _domain_budgets(weights, budget_tokens)
    toks: Column = (
        F.col(tok_col) if tok_col else F.size(tokens(text_col)).cast("long")
    )
    nd_map = F.create_map(
        *[x for d, n in sorted(budgets.items()) for x in (F.lit(d), F.lit(n))]
    )
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    # NULL token counts (possible only via a caller tok_col) count as 0,
    # so domain totals are always defined; an ALL-zero domain (_t = 0 —
    # again only reachable via tok_col, the tokenizer path floors at 1)
    # would make `_nd div _t` NULL in both modes, so n_copies is guarded
    # to 0 there: a domain holding zero tokens can't absorb budget.
    base = df.select(
        F.col(id_col),
        F.col(domain_col),
        F.coalesce(toks, F.lit(0)).alias("toks"),
        h.alias("_h"),
    ).withColumn("_nd", F.coalesce(nd_map[F.col(domain_col)], F.lit(0)))

    if mode == "window":
        wall = Window.partitionBy(domain_col)
        wcum = wall.orderBy(F.col("_h").asc(), F.col(id_col).asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        planned = (
            base.withColumn("_t", F.sum("toks").over(wall))
            .withColumn("_cum", F.sum("toks").over(wcum))
            .withColumn("_q", F.expr("_nd div _t"))
            .withColumn("_rem", F.col("_nd") % F.col("_t"))
            .withColumn(
                "n_copies",
                F.when(
                    F.col("_t") > 0,
                    F.col("_q")
                    + F.when(F.col("_cum") <= F.col("_rem"), F.lit(1)).otherwise(
                        F.lit(0)
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long"),
            )
        )
        return planned.select(id_col, domain_col, "toks", "n_copies")

    # mode == "hist": hierarchical greedy cut. The histogram agg is the
    # only corpus-sized pass (map-side combined, 65536·|domains| result
    # rows); the boundary bucket alone pays a window.
    based = base.withColumn("_b", hash_bucket(F.col(id_col), salt))
    hist = based.groupBy(domain_col, "_b").agg(
        F.sum("toks").alias("_bt"), F.max("_nd").alias("_nd")
    )
    wdom = Window.partitionBy(domain_col)
    wpre = wdom.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # per bucket: domain total, tokens strictly before this bucket, and
    # the full-epoch split of the domain budget
    panel = (
        hist.withColumn("_t", F.sum("_bt").over(wdom))
        .withColumn("_before", F.sum("_bt").over(wpre) - F.col("_bt"))
        .withColumn(
            "_q",
            F.when(F.col("_t") > 0, F.expr("_nd div _t")).otherwise(F.lit(0)),
        )
        .withColumn(
            "_rem",
            F.when(F.col("_t") > 0, F.col("_nd") % F.col("_t")).otherwise(
                F.lit(0)
            ),
        )
        .select(
            domain_col,
            "_b",
            "_q",
            # UNCLAMPED residual partial-epoch budget entering this
            # bucket (may be negative). Routing must use it raw: a
            # clamped take=0 cannot distinguish "budget exhausted
            # strictly before this bucket" (no copies at all) from
            # "budget lands exactly on this bucket's doorstep"
            # (_avail = 0 — zero-token rows at the bucket's greedy
            # FRONT still ride free, as the window form grants them)
            (F.col("_rem") - F.col("_before")).alias("_avail"),
            F.col("_bt"),
            F.col("_t"),
        )
    )
    joined = based.join(
        F.broadcast(
            panel.select(domain_col, "_b", "_q", "_avail", "_bt", "_t")
        ),
        [domain_col, "_b"],
    )
    # _avail ≥ _bt → the whole bucket fits in the partial epoch (+1 for
    # every row, incl. _bt = 0 buckets sitting before the cut);
    # _avail < 0 → the cut fell strictly earlier (+0 for every row);
    # 0 ≤ _avail < _bt → only this bucket ranks its rows
    whole = joined.where(
        (F.col("_avail") >= F.col("_bt")) | (F.col("_avail") < 0)
    ).withColumn(
        "n_copies",
        F.when(
            F.col("_t") > 0,
            F.col("_q")
            + F.when(F.col("_avail") >= F.col("_bt"), 1).otherwise(0),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    wcut = Window.partitionBy(domain_col, "_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    boundary = (
        joined.where((F.col("_avail") >= 0) & (F.col("_avail") < F.col("_bt")))
        .withColumn("_cum", F.sum("toks").over(wcut))
        .withColumn(
            "n_copies",
            (
                F.col("_q")
                + F.when(F.col("_cum") <= F.col("_avail"), 1).otherwise(0)
            ).cast("long"),
        )
    )
    cols = [id_col, domain_col, "toks", "n_copies"]
    return whole.select(*cols).unionByName(boundary.select(*cols))
