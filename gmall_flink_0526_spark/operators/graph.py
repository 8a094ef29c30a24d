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
    # Convergence is tracked by sum(comp): every propagate/jump step can
    # only LOWER a node's label (min over a set containing the current
    # label; comp(c) <= c because every node's label includes itself),
    # so the sum is strictly decreasing while anything changes and
    # stable exactly at the fixed point — one cheap aggregate over the
    # just-checkpointed table per round, instead of a join-and-count.
    prev_sum = object()
    for _ in range(max_iter):
        # propagate: min label over self + neighbors. sym is hashed on
        # s and labels on node, so the join is exchange-free; the
        # explicit repartition pins the aggregate at n partitions.
        nbr = sym.join(labels, sym["s"] == labels["node"]).select(
            F.col("d").alias("node"), F.col("comp")
        )
        new = (
            labels.select("node", "comp")
            .union(nbr)
            .repartition(n, "node")
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp := comp(comp). comp is itself a node id,
        # so the self-join always hits; both sides re-keyed to the
        # join key at n partitions (renames avoid self-join ambiguity).
        # ONE localCheckpoint per round, after the jump: it truncates
        # lineage (the label table feeds both sides of the jump and the
        # next round — without truncation the logical plan doubles per
        # round and *planning* OOMs the driver), and the propagate
        # being inlined twice inside the jump plan is one reused
        # exchange, cheaper than a second checkpoint job.
        ptr = new.select(F.col("node").alias("p_node"), F.col("comp").alias("p_comp"))
        jumped = (
            new.repartition(n, "comp")
            .join(ptr.repartition(n, "p_node"), F.col("comp") == F.col("p_node"))
            .select("node", F.col("p_comp").alias("comp"))
            .repartition(n, "node")
            .localCheckpoint()
        )
        cur_sum = jumped.agg(F.sum("comp")).first()[0]
        labels.unpersist(False)
        labels = jumped
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
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
