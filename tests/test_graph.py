"""Connected-components operator (dedup clustering) unit tests.

The catalog-level value check (``dedup_clusters`` vs the recursive-CTE
oracle) runs in test_catalog; these cover the operator on adversarial
graph shapes the LSH fixture data doesn't produce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_0526_spark.operators.graph import connected_components, with_cluster_sizes


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, schema="src long, dst long")
    comp = connected_components(edges)
    return {r["node"]: r["comp"] for r in comp.collect()}


def test_cc_chain_converges_to_min(spark):
    # a path graph is the worst case for naive propagation: the min
    # label must travel the full diameter — pointer jumping compresses
    # it in O(log n) rounds
    n = 33
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_cycle_and_cross_edges(spark):
    # cycle + a chord + a bridge into a star
    pairs = [(5, 6), (6, 7), (7, 5), (5, 7), (7, 8), (8, 9), (8, 10), (8, 11)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {5}
    assert set(got) == {5, 6, 7, 8, 9, 10, 11}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], schema="src long, dst long")
    assert connected_components(edges).count() == 0


def test_cluster_sizes(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], schema="src long, dst long")
    comp = connected_components(edges)
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in with_cluster_sizes(comp).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}
