"""Graph operators for dedup clustering — connected components.

LSH / SimHash candidate generation (``operators/dedup.py``) produces
near-duplicate PAIRS; the production dedup step groups those pairs into
clusters (connected components of the pair graph) and keeps one
representative per cluster. The reference stops at pairwise detection —
this closes the loop the way large-scale training-data pipelines do.

The algorithm is iterative min-label propagation with pointer jumping
(the alternating-contraction idea behind large-star/small-star):

- propagate: every node takes the min component label among itself and
  its neighbors — one equi-join of the symmetrized edge list with the
  label table, plus a min-groupBy, both hash-partitioned on node id.
- jump: labels are path-compressed by joining the label table with
  itself (``comp := comp(comp)``), halving the remaining propagation
  depth — convergence in O(log diameter) rounds, not O(diameter).

Partition discipline: every frame in the loop is explicitly
hash-partitioned on its join key at one fixed partition count, so each
round is a handful of co-partitioned stages — never
``spark.sql.shuffle.partitions`` tiny-task fan-outs per iteration
(persisted frames don't get AQE coalescing, so an unpinned loop pays
hundreds of empty tasks per round). Each round's label table is
``localCheckpoint``-ed to truncate lineage — the label table feeds both
sides of the pointer jump, so without truncation the logical plan
doubles per round and *planning* OOMs the driver long before any data
does. (On a cluster with executor churn, swap in reliable
``checkpoint()`` against the checkpoint dir — same call site.) The
driver-side loop holds only a scalar convergence count, never data; at
cluster scale pass ``num_partitions`` sized to the edge volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import scoped_persist


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    num_partitions: int | None = None,
) -> DataFrame:
    """(node, comp) for every node appearing in ``edges``; ``comp`` is
    the minimum node id in the node's connected component (the
    canonical cluster representative).

    The returned frame is scoped-persisted (released when the next
    catalog query starts), hash-partitioned on ``node``.
    """
    spark = edges.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = scoped_persist(
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"))).repartition(n, "s")
    )
    labels = scoped_persist(
        sym.select(F.col("s").alias("node"))
        .repartition(n, "node")
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        # propagate: min label over self + neighbors. sym is hashed on
        # s and labels on node, so the join is exchange-free; the
        # explicit repartition pins the aggregate at n partitions.
        # localCheckpoint (not persist) because the label table feeds
        # BOTH sides of the pointer jump and the next round: without
        # lineage truncation the logical plan doubles per round and
        # planning itself OOMs the driver after a few iterations.
        nbr = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("comp")
        )
        new = (
            labels.select("node", "comp")
            .union(nbr)
            .repartition(n, "node")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        # pointer jump: comp := comp(comp). comp is itself a node id,
        # so the self-join always hits; both sides re-keyed to the
        # join key at n partitions (renames avoid self-join ambiguity).
        ptr = new.select(F.col("node").alias("p_node"), F.col("comp").alias("p_comp"))
        jumped = (
            new.repartition(n, "comp")
            .join(ptr.repartition(n, "p_node"), F.col("comp") == F.col("p_node"))
            .select("node", F.col("p_comp").alias("comp"))
            .repartition(n, "node")
            .localCheckpoint()
        )
        # co-partitioned on node with labels -> exchange-free compare
        changed = (
            jumped.alias("nw")
            .join(labels.alias("o"), "node")
            .filter(F.col("nw.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist(False)
        labels = jumped
        if changed == 0:
            break
    return labels


def with_cluster_sizes(comp: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Attach per-cluster member counts: (node, comp) ->
    (doc_id, cluster_id, cluster_size). One shuffle on the component
    key, pinned to the same bounded partition count as the loop."""
    n = num_partitions or comp.sparkSession.sparkContext.defaultParallelism
    keyed = comp.repartition(n, "comp")
    sizes = keyed.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return keyed.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "cluster_size",
    )
