"""Connected components / dedup clustering (operators/graph.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)

SF = "/root/testdata/sf0.001"


def _cc(spark, edge_list, **kw):
    edges = spark.createDataFrame(edge_list, "id_a LONG, id_b LONG")
    return {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iter=25, **kw).collect()
    }


def test_two_components_and_transitive_closure(spark):
    # A~B, B~C (no A~C pair — the non-transitive emission the operator
    # exists to close) plus a disjoint D~E
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    # both dispatcher forms: driver union-find and distributed propagation
    assert _cc(spark, [(1, 2), (2, 3), (10, 11)]) == want
    assert _cc(spark, [(1, 2), (2, 3), (10, 11)], driver_max_edges=None) == want


def test_long_chain_converges(spark):
    # a 12-hop path needs diameter-many rounds — exercises the loop and
    # the mid-loop localCheckpoint boundary (checkpoint_every=5 < rounds)
    n = 13
    got = _cc(spark, [(i, i + 1) for i in range(n - 1)], driver_max_edges=None)
    assert got == {i: 0 for i in range(n)}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a LONG, id_b LONG")
    assert connected_components(edges).count() == 0


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(9)], "id_a LONG, id_b LONG")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, driver_max_edges=None)


def test_dedup_clusters_rollup(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    rows = {r["representative"]: r for r in dedup_clusters(pairs).collect()}
    assert set(rows) == {1, 10}
    assert rows[1]["n_members"] == 3 and rows[1]["members"] == [1, 2, 3]
    assert rows[10]["n_members"] == 2 and rows[10]["members"] == [10, 11]


def test_components_match_duckdb_recursive_closure(spark):
    """Differential on a REAL pair graph: minhash-LSH pairs over sf0.001
    documents, components vs DuckDB's WITH RECURSIVE transitive closure
    (min reachable id per node) over the IDENTICAL edge set."""
    from time_series_loader_spark.operators.dedup import minhash_lsh_pairs
    from time_series_loader_spark.session import read_table

    docs = read_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", n=3, num_hashes=16, bands=4, threshold=0.5
    ).select("id_a", "id_b")
    edge_rows = [(r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert len(edge_rows) > 0  # the corpus must actually contain near-dups

    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    got_dist = {
        r["node"]: r["component"]
        for r in connected_components(pairs, driver_max_edges=None).collect()
    }
    assert got == got_dist  # dispatcher forms agree on the real graph

    con = duckdb.connect()
    con.execute("CREATE TABLE edges (u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edge_rows)
    want = dict(
        con.execute(
            """
            WITH RECURSIVE sym AS (
              SELECT u, v FROM edges UNION SELECT v, u FROM edges
            ),
            reach(node, r) AS (
              SELECT u, u FROM sym
              UNION
              SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.node
            )
            SELECT node, min(r) AS component FROM reach GROUP BY node
            """
        ).fetchall()
    )
    assert got == want


def test_keep_representatives_filters_corpus(spark):
    """Given pairs {1~2~3}, {10~11}: survivors = representatives (1, 10)
    plus every unpaired doc."""
    from time_series_loader_spark.operators.graph import keep_representatives

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 10, 11, 20)],
        "doc_id LONG, text STRING",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
    got = sorted(
        r["doc_id"] for r in keep_representatives(corpus, pairs, "doc_id").collect()
    )
    assert got == [1, 7, 10, 20]
