"""Connected components over near-duplicate pair graphs.

Beyond-reference capability (BASELINE.json north star): every dedup
operator in this engine emits PAIRS (`ngram_jaccard_pairs`,
`minhash_lsh_pairs`, `simhash_near_dup_pairs`,
`embedding_near_dup_pairs`), but a corpus pipeline must keep ONE
representative per duplicate CLUSTER — and near-dup relations are not
transitive-closed at emission (A~B, B~C without the A~C pair is routine
at any LSH/threshold setting). Connected components closes them.

Spark-first shape: iterative min-label propagation. Each node starts
labeled with itself; each round every node takes the min of its own and
its neighbors' labels; fixpoint = components labeled by their minimum
node id. Per round: one join (labels onto symmetrized edges, both sides
hash-partitioned by node) + one groupBy min — map-side combinable,
skew-handled by AQE. Rounds needed = graph diameter, which for near-dup
graphs is small (clusters are clique-ish; chains longer than a few hops
mean the threshold is too loose). Convergence is detected with one
DECIMAL sum(label) aggregate per round — labels are monotonically
non-increasing, so an unchanged sum IS the fixpoint (no join-and-compare
pass needed).

At cluster scale, iterative lineage must be truncated or the plan tree
(and task serialization) grows per round: ``checkpoint_every`` calls
``localCheckpoint(eager=True)`` on the label frame every k rounds —
executor-local materialization, no HDFS round-trip, exactly the
“iteration boundary” Spark's own iterative algorithms (GraphX/ML) use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """(node, component) for every node incident to an edge; component =
    min node id reachable through the undirected pair graph.

    Deterministic (min over ids), engine-reproducible: a SQL engine's
    recursive closure over the same edges yields identical labels
    (differential-tested against DuckDB WITH RECURSIVE in
    tests/test_graph.py). Raises after ``max_iter`` non-converged rounds
    rather than returning partial labels.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))

    prev_sum = None
    for it in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("_nl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_nl").alias("_nbr"))
        )
        labels = labels.join(nbr, "u", "left").select(
            "u",
            F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias(
                "label"
            ),
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
        # monotone convergence probe: labels only ever decrease, so the
        # DECIMAL-exact sum is a fixpoint certificate (one narrow agg —
        # no second join to diff old vs new labels)
        cur = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur is None:  # empty edge set → no nodes, trivially converged
            return labels.select(
                F.col("u").alias("node"), F.col("label").alias("component")
            )
        if prev_sum is not None and cur == prev_sum:
            return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
        prev_sum = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "the pair graph has a path longer than max_iter (raise max_iter, "
        "or tighten the near-dup threshold that produced such chains)"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster roll-up of a near-dup pair set: one row per cluster with
    the representative (min id), member count, and sorted members array
    (members arrays are fine per-cluster: duplicate clusters are small by
    construction; a cluster with millions of members means the threshold
    was wrong, and the count column makes that auditable before any
    explode)."""
    comp = connected_components(pairs, src, dst, max_iter)
    return comp.groupBy(F.col("component").alias("representative")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sort_array(F.collect_list("node")).alias("members"),
    )
