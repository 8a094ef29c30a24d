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


# -- corpus-scale PageRank (pagerank_partitioned) -------------------------


def _pr(spark, nodes, edges, iters=5):
    nd = spark.createDataFrame([(n,) for n in nodes], schema="node long")
    ed = spark.createDataFrame(edges, schema="src long, dst long, w long")
    from gmall_flink_0526_spark.operators.graph import pagerank_partitioned

    got = pagerank_partitioned(nd, ed, iters=iters, num_partitions=4)
    return {r["node"]: r["pagerank"] for r in got.collect()}


def _pr_model(nodes, edges, iters=5, d=0.85, reset=0.15):
    """Driver-side reference model (plain floats, no decimal
    quantization — assertions use a tolerance above the
    DECIMAL(30,6)/N quantum)."""
    out_w: dict[int, float] = {}
    for s, _t, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        ds = sum(p for v, p in pr.items() if v not in out_w)
        nxt = {v: reset / n + d * ds / n for v in nodes}
        for s, t, w in edges:
            nxt[t] += d * pr[s] * (w / out_w[s])
        pr = nxt
    return pr


def test_pagerank_partitioned_matches_model_and_conserves_mass(spark):
    # a hub, a chain into it, a 2-cycle, and two dangling singletons —
    # dangling mass redistribution is load-bearing here
    nodes = list(range(8))
    edges = [(0, 1, 1), (1, 2, 1), (2, 0, 1), (3, 0, 2), (3, 2, 1), (4, 5, 1), (5, 4, 1)]
    got = _pr(spark, nodes, edges)
    want = _pr_model(nodes, edges)
    assert abs(sum(got.values()) - 1.0) < 1e-6, "rank mass must be conserved"
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-5, (v, got[v], want[v])


def test_pagerank_partitioned_all_dangling_is_uniform(spark):
    # zero edges: every step redistributes the whole mass uniformly —
    # ranks stay exactly 1/N (and nothing divides by zero)
    got = _pr(spark, [1, 2, 3, 4], [])
    for v, p in got.items():
        assert abs(p - 0.25) < 1e-9, (v, p)


def test_pagerank_ranks_guards_dangling(spark):
    # the type-sized helper must REFUSE a dangling graph rather than
    # silently leak rank mass (r11 ADVICE #2)
    import pytest

    from gmall_flink_0526_spark.plans.logs import pagerank_ranks

    nodes = spark.createDataFrame([(1,), (2,), (3,)], schema="node long")
    edges = spark.createDataFrame([(1, 2, 1)], schema="src long, dst long, w long")
    with pytest.raises(ValueError, match="without out-edges"):
        pagerank_ranks(nodes, edges)


def test_pagerank_partitioned_guards_unknown_endpoints(spark):
    # an edge endpoint missing from the node table would silently leak
    # rank mass through the update left join — must raise instead
    import pytest

    from gmall_flink_0526_spark.operators.graph import pagerank_partitioned

    nodes = spark.createDataFrame([(1,), (2,)], schema="node long")
    edges = spark.createDataFrame([(1, 3, 1)], schema="src long, dst long, w long")
    with pytest.raises(ValueError, match="edge endpoint"):
        pagerank_partitioned(nodes, edges, iters=1, num_partitions=2)


# -- weighted label propagation -------------------------------------------


def _lp(spark, weighted_pairs, node_ids, iters=3):
    from gmall_flink_0526_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(weighted_pairs, schema="a long, b long, w double")
    edges = pairs.selectExpr("a as src", "b as dst", "w").union(
        pairs.selectExpr("b as src", "a as dst", "w")
    )
    nodes = spark.createDataFrame([(i,) for i in node_ids], schema="node long")
    return {
        r["node"]: r["lab"]
        for r in label_propagation(nodes, edges, iters=iters).collect()
    }


def test_lp_weak_bridge_keeps_triangles_apart(spark):
    # two tight triangles (w=0.9) joined by one weak bridge (w=0.1):
    # connected_components would fuse them; LP must not — each side's
    # vote mass is dominated by its own triangle
    tri1 = [(0, 1, 0.9), (1, 2, 0.9), (0, 2, 0.9)]
    tri2 = [(10, 11, 0.9), (11, 12, 0.9), (10, 12, 0.9)]
    bridge = [(2, 10, 0.1)]
    got = _lp(spark, tri1 + tri2 + bridge, range(0, 13))
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11] == got[12]
    assert got[0] != got[10]


def test_lp_isolated_nodes_keep_own_label(spark):
    got = _lp(spark, [(1, 2, 0.5)], [1, 2, 7, 8])
    assert got[7] == 7 and got[8] == 8


def test_lp_tie_breaks_to_smallest_label(spark):
    # node 5 sees equal mass from labels 1 and 2 in round 1 -> takes 1
    got = _lp(spark, [(1, 5, 0.5), (2, 5, 0.5)], [1, 2, 5], iters=1)
    assert got[5] == 1


def test_lp_matches_python_model_on_star(spark):
    # deterministic synchronous-round model on a small weighted star
    pairs = [(0, 1, 0.3), (0, 2, 0.7), (1, 2, 0.2)]
    iters = 3
    got = _lp(spark, pairs, [0, 1, 2], iters=iters)

    import collections

    adj = collections.defaultdict(list)
    for a, b, w in pairs:
        adj[a].append((b, w))
        adj[b].append((a, w))
    lab = {n: n for n in [0, 1, 2]}
    for _ in range(iters):
        new = {}
        for v in lab:
            mass = collections.defaultdict(float)
            for u, w in adj[v]:
                mass[lab[u]] += w
            new[v] = (
                min(mass, key=lambda L: (-mass[L], L)) if mass else lab[v]
            )
        lab = new
    assert got == lab
