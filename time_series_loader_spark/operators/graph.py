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
    min_rounds: int = 3,
    driver_max_edges: int | None = 100_000,
) -> DataFrame:
    """(node, component) for every node incident to an edge; component =
    min node id reachable through the undirected pair graph.

    Deterministic (min over ids), engine-reproducible: a SQL engine's
    recursive closure over the same edges yields identical labels
    (differential-tested against DuckDB WITH RECURSIVE in
    tests/test_graph.py). Raises after ``max_iter`` non-converged rounds
    rather than returning partial labels.

    ``min_rounds``: rounds composed LAZILY before the first convergence
    probe. Every probe is a driver action, and near-dup graphs have tiny
    diameter (clusters are clique-ish), so probing after every round
    spends more wall on job launch than on the joins — with the default,
    a diameter ≤ ``min_rounds`` graph costs exactly two probe actions
    (the fixpoint sum and its confirmation).

    ``driver_max_edges``: size dispatcher (same pattern as
    ``decontam.decontaminate``). A pair graph at or under this many
    edges is collected and union-found on the driver — identical labels,
    microseconds of CPU, ONE job — because iterating Spark jobs over a
    few hundred edges spends everything on job launch. Above it (or with
    ``None``), the distributed label-propagation path runs. 100k edges
    ≈ a few MB driver memory; pair sets at corpus scale exceed it and
    take the distributed path automatically.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # materialize the edge set ONCE (executor-local, sized by the pair
    # set — the algorithm's working set either way): every round and the
    # convergence probe are actions, and without this each would re-run
    # the full upstream plan that PRODUCED the pairs (an LSH pipeline,
    # a join...) — diameter × that cost. localCheckpoint, not cache():
    # lineage is truncated too, and nothing pins the session cache.
    # Lazy (r14): eager spent a dedicated job materializing before the
    # size probe below could run; lazy makes the probe's collect (or the
    # distributed path's first round) compute-and-store in one job —
    # same blocks, one fewer scheduling round on every CC call.
    sym = sym.localCheckpoint(eager=False)

    if driver_max_edges is not None:
        # ONE action decides AND fetches: collect limit N+1 (reading the
        # checkpointed partitions, not the upstream pair pipeline) — a
        # result within the limit IS the edge set; one row over means
        # "too big, go distributed" with only ~N rows of driver traffic.
        # A separate count() probe would cost a second job per call, and
        # this path runs inside every clustering/dedup gate query.
        rows = sym.limit(2 * driver_max_edges + 1).collect()
        if len(rows) <= 2 * driver_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in rows:
                u, v = r["u"], r["v"]
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by MIN id so the root IS the component label
                    if rv < ru:
                        ru, rv = rv, ru
                    parent[rv] = ru
            out = [(n, find(n)) for n in parent]
            spark = edges.sparkSession
            id_type = edges.schema[src].dataType.simpleString()
            return spark.createDataFrame(
                spark.sparkContext.parallelize(sorted(out), 1),
                f"node {id_type}, component {id_type}",
            )

    labels = sym.select("u").distinct().withColumn("label", F.col("u"))

    def one_round(lbl: DataFrame) -> DataFrame:
        nbr = (
            sym.join(
                lbl.select(F.col("u").alias("v"), F.col("label").alias("_nl")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("_nl").alias("_nbr"))
        )
        return lbl.join(nbr, "u", "left").select(
            "u",
            F.least(F.col("label"), F.coalesce(F.col("_nbr"), F.col("label"))).alias(
                "label"
            ),
        )

    prev_sum = None
    for it in range(max_iter):
        labels = one_round(labels)
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=True)
        if it + 1 < min_rounds:
            continue  # compose lazily; no probe action yet
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


def keep_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """The dedup ACTION: drop every near-dup cluster member except its
    representative (min id). Docs in no pair are untouched.

    Shape: components → non-representative ids → ``left_anti`` join. The
    drop list is duplicate-count-sized (≪ corpus); AQE broadcasts it when
    small, so the corpus side never reshuffles.
    """
    comp = connected_components(pairs, src, dst, max_iter)
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")


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
