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


def pagerank_partitioned(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    d: float = 0.85,
    reset: float = 0.15,
    num_partitions: int | None = None,
) -> DataFrame:
    """K-step PageRank at CORPUS vertex scale: (node) x (src, dst, w)
    -> (node, pagerank), with the dangling-mass redistribute term.

    This is the web-scale shape ``plans.logs.pagerank_ranks`` only
    documents: that helper runs on an entity-type-sized graph (25
    nodes) and broadcasts the rank table into every step; HERE the
    rank table is corpus-sized, so each iteration CO-PARTITIONS ranks
    with the normalized edge table on the source key and runs a
    shuffle join (``merge`` hint — broadcast is banned from the loop:
    at 100 TB the rank table is a thousand-partition frame, and the
    plan must not depend on it fitting in an executor). The edge table
    is normalized and hash-partitioned ONCE and persisted; per
    iteration the only corpus-sized movement is the rank shuffle the
    algorithm fundamentally requires (contribs re-key node -> dst).

    Unlike ``pagerank_ranks`` (which guards a no-dangling
    precondition), nodes WITHOUT out-edges are first-class here: their
    rank mass is redistributed uniformly each step — ``pr'(v) =
    reset/N + d * (sum_in(v) + ds/N)`` where ``ds`` is the exact
    decimal-accumulated dangling rank sum. On a similarity graph most
    documents are singletons, so ds carries most of the mass and
    dropping it (the naive port) would deflate every rank.

    Numerics: ranks are carried SCALED BY N (start at exactly 1.0, not
    1/N) so the DECIMAL(30,6) exact-accumulation quantum stays ~1e-6
    RELATIVE at any corpus size — at N=5e6 an unscaled rank of 2e-7
    would round to zero inside exact_sum. The caller's oracle divides
    by N once at the end, exactly as this returns ``pr / N``.

    Each iteration ``localCheckpoint``s the rank table: ds and the
    contribution join both read the previous ranks, so an untruncated
    lineage doubles per step (the connected_components lesson); on a
    cluster with executor churn swap in reliable ``checkpoint()``.
    The final iteration is left lazy so the returned plan exposes one
    full step for plan assertions (and the caller's one materialization
    computes it once).

    Reference parity: the reference has no graph operator at all —
    this extends its DWS aggregation layer the way production
    behavior-analytics pipelines rank entities; cf. the in-repo
    ``plans/logs.py`` behavior_pagerank for the type-sized twin.
    """
    spark = nodes.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    from ..functions.exact import exact_sum

    # deg decimal-accumulated: for integer weights this is the exact
    # value a plain SUM gives (so the unit-weight oracles are
    # unchanged); for FLOAT weights (the jaccard-weighted graph) a
    # plain double sum would be accumulation-order-dependent and no
    # external oracle could mirror it bit-for-bit — the operator is
    # weight-generic only because this sum is order-insensitive.
    deg = (
        edges.groupBy("src")
        .agg(exact_sum(F.col("w").cast("double")).alias("deg"))
        .withColumnRenamed("src", "_deg_src")
    )
    # deg is edge-derived (corpus-sized at scale): the normalization
    # join shuffles too — merge-hinted like every join in this operator
    nrm = scoped_persist(
        edges.hint("merge").join(deg, F.col("src") == F.col("_deg_src"))
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("deg").cast("double")).alias("p"),
        )
        .repartition(n_part, "src")
    )
    srcs = nrm.select(F.col("src").alias("node")).distinct()
    nd = scoped_persist(
        nodes.hint("merge")
        .join(srcs.withColumn("_has", F.lit(True)), "node", "left")
        .select("node", F.coalesce(F.col("_has"), F.lit(False)).alias("has_out"))
        .repartition(n_part, "node")
    )
    # PRECONDITION (guarded): every edge endpoint must appear in
    # ``nodes`` — a dst outside the node table would DROP its
    # contributions at the rank-update left join (mass leak, the
    # pagerank_ranks guard's sibling hazard), and a src outside it
    # would contribute rank that was never seeded. One anti-join count
    # over the endpoint set (bounded by the edge table, already
    # partitioned+persisted) — the same pass-shaped price the dangling
    # flag costs, paid once outside the loop.
    endpoints = (
        nrm.select(F.col("src").alias("node"))
        .union(nrm.select(F.col("dst").alias("node")))
        .distinct()
    )
    orphans = endpoints.hint("merge").join(nd.select("node"), "node", "left_anti")
    n_orphans = orphans.count()
    if n_orphans:
        names = [r["node"] for r in orphans.limit(5).collect()]
        raise ValueError(
            f"pagerank_partitioned: {n_orphans} edge endpoint(s) missing "
            f"from nodes (e.g. {names}) — their rank mass would silently "
            "leak; pass a node table covering every edge endpoint."
        )
    # one scalar memo: N (exact integer; as a double it is bit-identical
    # to the oracle's CAST(COUNT(*) AS DOUBLE) for any N < 2^53)
    nf = float(nd.count())
    ranks = nd.withColumn("pr", F.lit(1.0)).localCheckpoint()
    for it in range(iters):
        # dangling mass, decimal-accumulated (empty set -> 0.0, both
        # engines COALESCE identically)
        ds = ranks.filter(~F.col("has_out")).agg(
            F.coalesce(exact_sum(F.col("pr")), F.lit(0.0)).alias("ds")
        )
        contrib = (
            ranks.filter(F.col("has_out"))
            .hint("merge")
            .join(nrm, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(exact_sum(F.col("pr") * F.col("p")).alias("s"))
        )
        ranks = (
            ranks.select("node", "has_out")
            .crossJoin(F.broadcast(ds))
            .hint("merge")
            .join(contrib, "node", "left")
            .select(
                "node",
                "has_out",
                (
                    F.lit(reset)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("ds") / F.lit(nf)
                    )
                ).alias("pr"),
            )
            .repartition(n_part, "node")
        )
        if it < iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", (F.col("pr") / F.lit(nf)).alias("pagerank"))


def label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synchronous weighted label propagation: (node) x (src, dst, w)
    -> (node, lab) after ``iters`` fixed rounds.

    Community detection one rung finer than
    :func:`connected_components`: where CC merges everything touching,
    LP lets each node adopt the label with the LARGEST incident weight
    sum each round — so a weak bridge between two dense near-dup
    neighborhoods no longer fuses them. Every node starts as its own
    label; per round ``lab(v) := argmax_L sum(w(u,v) : lab(u)=L)``
    over in-neighbors, ties to the SMALLEST label, isolated nodes keep
    their label. Rounds are synchronous and the count is FIXED (the
    behavior_pagerank chaining argument): deterministic by
    construction, so an oracle can mirror the loop as K chained CTEs —
    asynchronous/converge-until-stable LP is order-dependent and
    unverifiable.

    Numerics: the per-label weight sum is DECIMAL-accumulated
    (``exact_sum``) so float weights (verified Jaccard) are
    order-insensitive; the argmax is a grouped ``max(struct(ws,
    -lab))`` — map-side combining, no per-node sort. PRECONDITION
    (enforced): ``node`` (hence ``lab``) must be a numeric type — the
    ``-lab`` negation that encodes "smallest label wins" is undefined
    on strings; non-numeric node ids raise rather than silently
    NULL-ing the tie-break.

    Partition discipline matches :func:`pagerank_partitioned`: edges
    (pre-symmetrized by the caller) are hash-partitioned once and
    persisted; each round shuffles the node-sized label table into a
    co-partitioned merge join (broadcast is banned from the loop — at
    100 TB the label table is a thousand-partition frame), and the
    label table is localCheckpoint-ed per round so lineage stays flat.
    """
    spark = nodes.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    from ..functions.exact import exact_sum

    # The smallest-label tie-break is max(struct(ws, -lab)), which only
    # means "smallest" for NUMERIC labels; with string node ids the
    # negation would cast to NULL under non-ANSI semantics and silently
    # break the tie rule. Fail loudly instead (same spirit as
    # pagerank_partitioned's endpoint check).
    node_dt = dict(nodes.dtypes)["node"]
    if node_dt not in ("tinyint", "smallint", "int", "bigint", "float",
                      "double") and not node_dt.startswith("decimal"):
        raise ValueError(
            f"label_propagation: node/label column must be numeric for "
            f"the smallest-label tie-break (got {node_dt}); hash string "
            "ids to BIGINT first (e.g. xxhash64)."
        )

    e = scoped_persist(
        edges.select("src", "dst", F.col("w").cast("double").alias("w")).repartition(
            n, "src"
        )
    )
    labels = (
        nodes.select("node")
        .withColumn("lab", F.col("node"))
        .repartition(n, "node")
        .localCheckpoint()
    )
    for i in range(iters):
        votes = (
            labels.hint("merge")
            .join(e, F.col("node") == F.col("src"))
            .groupBy("dst", "lab")
            .agg(exact_sum(F.col("w")).alias("ws"))
        )
        winners = (
            votes.groupBy("dst")
            .agg(F.max(F.struct(F.col("ws"), (-F.col("lab")).alias("nl"))).alias("m"))
            .select(F.col("dst").alias("w_node"), (-F.col("m.nl")).alias("w_lab"))
        )
        labels = (
            labels.hint("merge")
            .join(winners, F.col("node") == F.col("w_node"), "left")
            .select("node", F.coalesce(F.col("w_lab"), F.col("lab")).alias("lab"))
            .repartition(n, "node")
        )
        if i < iters - 1:
            labels = labels.localCheckpoint()
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
