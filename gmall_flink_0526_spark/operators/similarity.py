"""Similarity search over embedding columns (``array<float>``).

The dot/norm folds are ``zip_with`` + ``aggregate`` — sequential
left-to-right double accumulation, which both Spark and DuckDB
reproduce bit-for-bit (verified empirically), so cosine scores need no
rounding to hash-match the oracle.

Brute force is the correctness baseline; the scale path is IVF-style
bucketing: restrict candidates to the probe's coarse bucket (here the
``label`` column plays the trained centroid assignment), turning the
cross join into an equi-join that hash-partitions by bucket. On a real
corpus the bucket id would come from a k-means fit (a pandas-UDF
scoring pass); the join topology — the part that matters at 100 TB —
is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .partitioning import bounded_broadcast, spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance, same sequential-fold shape as :func:`dot`
    (bit-reproducible in DuckDB's list_sum fold)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# -- k-means (IVF coarse quantizer) -------------------------------------

KMEANS_DEC = "decimal(30,6)"  # functions.exact's portable accumulator


# Literal-fold assignment is codegen-friendly up to this many
# centroids; past it the single projection holding k sq-dist folds
# grows into an expression tree whole-stage codegen bails on (the
# corpus-scaled SemDeDup fit reaches k in the hundreds) and the
# broadcast-join argmin below takes over.
KM_LITERAL_MAX = 32


def _literal_sq_dists(vec_col: str, cvs: list[list[float]]):
    """The k-centroid squared-distance array as ONE parsed SQL
    expression instead of k x dim ``F.lit`` Column calls.

    Building the literal tree through the Column API costs a py4j
    round-trip PER LITERAL — measured 2.2 s of pure driver time per
    ``with_cluster`` call at k=27 x dim=64 (and the k-means fit builds
    one such plan per iteration). One ``F.expr`` hands the whole tree
    to the JVM parser in a single call (~40 ms). The parsed tree is
    node-for-node the old one: ``repr(float)`` round-trips exactly and
    Spark's ``...D`` double literal parses via Double.parseDouble, so
    every distance — and therefore every assignment and every oracle
    hash downstream — is bit-identical (test-pinned in
    tests/test_properties.py).
    """
    import math

    if any(not math.isfinite(x) for cv in cvs for x in cv):  # pragma: no cover
        # non-finite centroids can't repr-roundtrip through SQL text;
        # keep the Column-API build for that (never-seen) case
        return F.array(
            *[
                sq_dist(F.col(vec_col), F.array(*[F.lit(float(x)) for x in cv]))
                for cv in cvs
            ]
        )
    q = "`" + vec_col.replace("`", "``") + "`"
    folds = ",".join(
        "aggregate(zip_with({v}, array({lits}), (x, y) -> "
        "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), 0D, "
        "(acc, v) -> acc + v)".format(
            v=q, lits=",".join(f"{float(x)!r}D" for x in cv)
        )
        for cv in cvs
    )
    return F.expr(f"array({folds})")


def _literal_dots(vec_col: str, planes: list[list[float]]):
    """k dot-products against literal vectors as ONE parsed SQL
    expression — the :func:`_literal_sq_dists` build trick for
    :func:`dot` (same py4j-per-literal rationale, same exact
    ``repr(float)``/``...D`` round-trip, same fold order as the Column
    build so every double is bit-identical; test-pinned)."""
    import math

    if any(not math.isfinite(x) for h in planes for x in h):  # pragma: no cover
        return F.array(
            *[dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in h])) for h in planes]
        )
    q = "`" + vec_col.replace("`", "``") + "`"
    folds = ",".join(
        "aggregate(zip_with({v}, array({lits}), (x, y) -> "
        "CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)".format(
            v=q, lits=",".join(f"{float(x)!r}D" for x in h)
        )
        for h in planes
    )
    return F.expr(f"array({folds})")


def with_cluster(
    df: DataFrame,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    out: str = "c",
    id_col: str = "vec_id",
    literal_max: int | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared L2; ties →
    lowest cluster id). Two physically different, value-identical
    strategies:

    - k <= KM_LITERAL_MAX: centroids are literal arrays baked into one
      projection — the broadcast-free analogue of a map-side lookup,
      zero extra shuffles, ideal for the IVF regime where k is small.
    - k > KM_LITERAL_MAX: centroids become a broadcast k-row frame;
      score = one map-side fold per (row, centroid), argmin = min over
      a (dist, cluster, payload) struct grouped by ``id_col``. The
      grouped min PARTIAL-aggregates map-side, so the exchange carries
      one row per vector, not k — the shape that holds when k grows
      with the corpus (SemDeDup) while the small-k plan would sink
      into interpreted evaluation.

    Both paths fold squared distances elementwise in the same order,
    so the doubles — and therefore the assignment and every oracle
    comparison downstream — are identical.
    """
    # a pre-existing ``out`` column is REPLACED on both paths
    # (re-assignment after a refit), and the internal scratch names
    # must not collide with user columns on either
    if out in df.columns:
        df = df.drop(out)
    reserved = {"_kc", "_cv", "_kd", "_m"} & set(df.columns)
    if reserved:
        raise ValueError(f"with_cluster: reserved column names in input: {sorted(reserved)}")
    # ``literal_max`` overrides the strategy cutover per call site:
    # the k-means FIT passes 0 (its input is fit_limit-bounded, so the
    # broadcast path's extra exchange is bounded too, and it skips the
    # giant literal tree's per-iteration codegen — measured 7.9 -> 5.4 s
    # per fit at k=27 x dim=64, centroids bit-identical).
    if len(cents) <= (KM_LITERAL_MAX if literal_max is None else literal_max):
        dists = _literal_sq_dists(vec_col, [cv for _, cv in cents])
        cvals = F.expr(
            "array(" + ",".join(str(int(c)) for c, _ in cents) + ")"
        )
        staged = df.withColumn("_kd", dists)
        return staged.withColumn(
            out,
            F.element_at(
                cvals, F.array_position(F.col("_kd"), F.array_min(F.col("_kd"))).cast("int")
            ),
        ).drop("_kd")
    cdf = df.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in cents], "_kc int, _cv array<double>"
    )
    others = [n for n in df.columns if n != id_col]
    scored = df.crossJoin(F.broadcast(cdf)).withColumn(
        "_kd", sq_dist(F.col(vec_col), F.col("_cv"))
    )
    m = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                F.col("_kd").alias("_kd"),
                F.col("_kc").alias("_kc"),
                *[F.col(n).alias(n) for n in others],
            )
        ).alias("_m")
    )
    return m.select(
        *[
            F.col(id_col) if n == id_col else F.col(f"_m.{n}").alias(n)
            for n in df.columns
        ],
        F.col("_m._kc").alias(out),
    )


def probe_clusters(
    probes: DataFrame,
    cents: list[tuple[int, list[float]]],
    p: int,
    qid_col: str = "qid",
    vec_col: str = "qv",
    out: str = "qlabel",
) -> DataFrame:
    """Multi-probe IVF routing: expand each probe to its ``p`` nearest
    coarse centroids (squared L2, ties → lowest cluster id), one output
    row per (probe, probed cluster). Joining the result against the
    cluster-assigned corpus searches the union of the ``p`` buckets —
    the standard IVF nprobe recall/cost knob (nprobe=1 degenerates to
    the probe's own bucket; each extra probe buys back the neighbors
    that landed just across a Voronoi boundary for one more
    bucket-sized candidate set).

    Shape: the k-row centroid table rides a broadcast (config-sized by
    construction — the quantizer someone FIT, never corpus-scaled),
    distances fold map-side, and the per-probe top-p is a window
    PARTITIONED BY the probe id — k rows per partition, hash-spread
    across the cluster, never a global sort. Clusters are disjoint per
    corpus vector, so the downstream bucket join needs no dedup.
    """
    spark = probes.sparkSession
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in cents], "_kc int, _cv array<double>"
    )
    scored = probes.crossJoin(F.broadcast(cdf)).withColumn(
        "_kd", sq_dist(F.col(vec_col), F.col("_cv"))
    )
    w = W.partitionBy(qid_col).orderBy(F.col("_kd"), F.col("_kc"))
    return (
        scored.withColumn("_prn", F.row_number().over(w))
        .filter(F.col("_prn") <= p)
        .select(*probes.columns, F.col("_kc").alias(out))
    )


def keep_cluster_reps(
    df: DataFrame,
    cap: int,
    id_col: str = "vec_id",
    cluster_col: str = "c",
) -> DataFrame:
    """Corpus-side hot-cluster guard for incremental checks: keep every
    row of sub-``cap`` clusters, but collapse a hot cluster to its
    min-id representative row — so an incoming batch still pairs
    against ONE row of a hot stored cluster (batch x 1 forever)
    instead of batch x m. One grouped agg (cluster-count rows,
    broadcast back) + one filter; shared by the batch incremental
    query and the streaming app's store read.

    The stats table is ONE ROW PER DISTINCT CLUSTER — no cap bounds
    it, so the hint goes through
    :func:`~..partitioning.bounded_broadcast`: past the row guard the
    annotation join shuffles (warned) instead of blowing the broadcast
    hard cap on a store with pathologically many clusters. Streaming
    callers drain the guard's scoped persist per epoch (the emb
    incremental app's ``finally``)."""
    cst = df.groupBy(cluster_col).agg(
        F.count("*").alias("_cct"), F.min(id_col).alias("_rep")
    )
    return (
        df.join(bounded_broadcast(cst, what="cluster stats"), cluster_col)
        .filter((F.col("_cct") <= cap) | (F.col(id_col) == F.col("_rep")))
        .drop("_cct", "_rep")
    )


def kmeans_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 2,
    fit_limit: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means: seeds = the ``k`` lowest-id
    vectors, then ``iters`` assign/recompute rounds. Component means
    accumulate in decimal (functions/exact.py's portable-sum trick) so
    an oracle engine derives bit-identical centroids. Returns
    ``[(cluster_id, centroid), ...]``; clusters that go empty drop out
    (both engines recompute by GROUP BY, so the policy agrees).

    ``fit_limit``: train on the ``fit_limit`` lowest-id vectors only —
    the standard IVF recipe (fit the coarse quantizer on a sample,
    assign the full corpus once with the broadcast-sized centroids).
    Lowest-N is a deterministic, oracle-derivable sample (ORDER BY id
    LIMIT N — a top-N merge, never a global sort); at 100 TB a
    content-hash predicate samples the same way. ``None`` = full-scan
    fit.

    Driver round-trips: one seed collect + one k×dim collect per
    iteration — all config-sized.
    """
    src = emb if fit_limit is None else emb.orderBy(id_col).limit(fit_limit)
    # every iteration re-reads the (bounded) fit sample — persist it for
    # the life of the fit instead of re-running the scan + top-N per
    # iteration; released before returning (collected frames are free
    # to unpersist).
    src = src.persist()
    try:
        seeds = src.orderBy(id_col).limit(k).select(vec_col).collect()
        cents = [(i, [float(x) for x in r[0]]) for i, r in enumerate(seeds)]
        for _ in range(iters):
            assigned = with_cluster(src, vec_col, cents, id_col=id_col, literal_max=0)
            comp = assigned.select("c", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            rows = (
                comp.groupBy("c", "pos")
                .agg(
                    # float widens to double BEFORE the decimal cast: a
                    # direct float->decimal uses the float's shortest
                    # decimal repr on the JVM but the exact binary
                    # expansion in DuckDB (measured: 158/32k elements
                    # round differently) — via double both engines round
                    # the same value, so centroids are bit-identical
                    (
                        F.sum(F.col("v").cast("double").cast(KMEANS_DEC)).cast("double")
                        / F.count("*")
                    ).alias("m")
                )
                .collect()
            )
            by: dict[int, dict[int, float]] = {}
            for r in rows:
                by.setdefault(r["c"], {})[r["pos"]] = r["m"]
            cents = [(c, [d[p] for p in sorted(d)]) for c, d in sorted(by.items())]
        return cents
    finally:
        src.unpersist(False)


def topk_neighbors(
    probes: DataFrame,
    corpus: DataFrame,
    k: int,
    bucket: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors for each probe vector.

    ``probes``/``corpus`` need columns (qid|cid, qv|cv [, qlabel|clabel]).
    ``bucket=True`` = IVF mode: only candidates in the probe's bucket.
    The probe side is broadcast (it is small by construction); ranking
    is a per-probe window — one shuffle keyed by qid.
    """
    # broadcast keeps the join shuffle-free, but then the stage runs at
    # the corpus scan's split count — spread first so the per-candidate
    # cosine folds parallelize even off a single small file
    corpus = spread(corpus, "cid")
    if bucket:
        joined = corpus.join(F.broadcast(probes), F.col("clabel") == F.col("qlabel"))
    else:
        joined = corpus.crossJoin(F.broadcast(probes))
    scored = (
        joined.filter(F.col("cid") != F.col("qid"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "cos_sim", "rn")
    )


def topk_neighbors_vectorized(probes: DataFrame, corpus: DataFrame, k: int) -> DataFrame:
    """Vectorized ANN: the probe matrix rides a Spark broadcast variable
    into an Arrow-batched ``mapInPandas`` pass that scores each corpus
    batch against ALL probes with one numpy matmul, keeps the per-batch
    top-k per probe (argpartition), and only then shuffles — the global
    re-rank sees at most k × n_batches rows per probe instead of the
    whole corpus. Same contract as :func:`topk_neighbors`; the numpy
    float path trades bit-reproducibility of the score for throughput,
    so value checks should compare (qid, cid, rank), not cos_sim."""
    import numpy as np

    pr = probes.collect()  # broadcast-sized by contract, like the dim tables
    sc = probes.sparkSession.sparkContext
    b_probes = sc.broadcast(
        (np.array([r[0] for r in pr]), np.array([list(r[1]) for r in pr], dtype=np.float64))
    )

    def fn(batches):
        import pandas as pd

        qids, Q = b_probes.value
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["cid"].to_numpy()
            C = np.array([list(v) for v in pdf["cv"]], dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (n_candidates, n_probes)
            out_q, out_c, out_s = [], [], []
            for j in range(S.shape[1]):
                col = S[:, j].copy()
                col[cids == qids[j]] = -np.inf  # self-match excluded
                top = np.argpartition(-col, min(k, len(col) - 1))[: k]
                for i in top:
                    if np.isfinite(col[i]):
                        out_q.append(qids[j])
                        out_c.append(cids[i])
                        out_s.append(col[i])
            yield pd.DataFrame({"qid": out_q, "cid": out_c, "cos_sim": out_s})

    # spread: a small local corpus arrives as ONE scan split, which
    # pins the whole matmul pass to a single Python worker (measured
    # +0.6 s at sf0.1); on a well-split production scan spread() is a
    # no-op and each split's batch amortizes its own matmul
    scored = spread(corpus, "cid").mapInPandas(fn, "qid long, cid long, cos_sim double")
    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid", "cos_sim", "rn")
    )


def near_dup_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets
    (label = bucket): equi-join on the bucket key keeps the candidate
    set linear in bucket size instead of O(n^2) over the corpus."""
    a = spread(
        emb.select(
            F.col("vec_id").alias("ida"), F.col("embedding").alias("va"), F.col("label").alias("la")
        ),
        "ida",
    )
    b = emb.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"), F.col("label").alias("lb")
    )
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("ida") < F.col("idb")))
        .withColumn("cos_sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("ida", "idb", "cos_sim")
    )


def quantize_int8(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization — the storage/transfer
    prep step for ANN at corpus scale (an int8 code table is 4x
    smaller than float32 and what a 100 TB embedding store actually
    serves; IVF/PQ systems quantize exactly this way).

    scale = max|x| / 127; code = clamp(floor(x/scale + 0.5), ±127).
    The floor(+0.5) form is round-half-up-toward-+inf BY CONSTRUCTION
    on every engine — no dependence on a round() builtin's tie rule —
    so codes and reconstruction errors are bit-identical to any IEEE
    oracle. Map-only: zero shuffles, scales as a scan.

    Output: (id, scale, codes array<int>, max_abs_err) — max_abs_err
    is the per-vector worst-case reconstruction error |x - code*scale|.
    """
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    staged = emb.select(
        F.col(id_col), v, (absmax / F.lit(127.0)).alias("scale")
    )
    sc = F.col("scale")

    def code(x):
        return F.when(sc == 0.0, F.lit(0)).otherwise(
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127), F.floor(x.cast("double") / sc + F.lit(0.5)).cast("int")
                ),
            )
        )

    coded = staged.withColumn("codes", F.transform(v, code))
    err = F.array_max(
        F.zip_with(
            v, F.col("codes"), lambda x, c: F.abs(x.cast("double") - c * sc)
        )
    )
    return coded.select(
        F.col(id_col), "scale", "codes", err.alias("max_abs_err")
    )


# -- random-hyperplane LSH (SimHash for cosine space) --------------------

RHP_BITS = 16
RHP_BANDS = 2
RHP_ROWS = RHP_BITS // RHP_BANDS


def rhp_hyperplanes(n_bits: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (j, d) is
    md5-derived uniform in [-0.5, 0.5). No RNG state — any engine (or
    an oracle) re-derives the identical planes, so signatures are
    reproducible across reruns and engines, like every other hash in
    the dedup family."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"rhp:{j}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]
        for j in range(n_bits)
    ]


def rhp_band_sigs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_bits: int = RHP_BITS,
    bands: int = RHP_BANDS,
) -> DataFrame:
    """(vec_id, band, bsig): random-hyperplane signature, banded.

    Bit j = sign(v . h_j); bits pack into ``bands`` integer band keys.
    Two vectors collide in a band with probability (1 - theta/pi)^rows
    — high-cosine pairs collide somewhere with high probability, so the
    banded self-join replaces the all-pairs cosine scan the same way
    MinHash bands replace the all-pairs Jaccard scan. The dot folds are
    the bit-reproducible sequential aggregate (see module docstring);
    the sign test therefore lands identically on every engine.
    """
    rows = n_bits // bands
    planes = rhp_hyperplanes(n_bits, dim)
    dots = _literal_dots(vec_col, planes)
    # stage the 16 dot folds once; the band keys then read the array
    staged = emb.select(F.col(id_col).alias("vec_id"), dots.alias("_rd"))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    (F.col("_rd")[b * rows + r] >= 0).cast("int") * (1 << r)
                    for r in range(rows)
                ).alias("bsig"),
            )
            for b in range(bands)
        ]
    )
    return (
        staged.select("vec_id", F.explode(band_structs).alias("bb"))
        .select("vec_id", "bb.band", "bb.bsig")
    )


def rhp_candidate_pairs(sigs: DataFrame, max_bucket: int | None = None) -> DataFrame:
    """Candidate pairs from an (already persisted) RHP signature table:
    banded self-join on (band, bsig), id-ordered, distinct.

    ``max_bucket``: same quadratic-blowup guard as the MinHash/SimHash
    paths (operators.dedup.MAX_BUCKET) — a signature bucket shared by m
    vectors costs m*(m-1)/2 pairs, and with only 2^rows possible band
    values a dense embedding cluster (near-identical augmentations,
    templated content embedded alike) concentrates into a handful of
    buckets. Measured on a 10x clustered probe corpus: the uncapped
    self-join emitted 7.6M pairs from 20k vectors (SCALE.md). The cap
    IS representative-based (dedup.hot_bucket_split): a hot bucket
    contributes its m-1 (min-id rep, member) pairs instead of m*(m-1)/2,
    so a dense cluster still dedups against one representative at
    linear cost. The guard is opt-in here (None = uncapped) because
    near-dup and top-k consumers make that trade differently."""
    from .dedup import lsh_pairs_from_bands

    return lsh_pairs_from_bands(
        sigs,
        max_bucket,
        keys=("band", "bsig"),
        id_col="vec_id",
        out=("vec_a", "vec_b"),
    )


# -- product quantization (PQ) -------------------------------------------
#
# The 100 TB embedding-store ladder: float32 (4*dim bytes) -> int8
# (dim bytes, quantize_int8) -> PQ (m bytes: one small-codebook code
# per subvector). m=8 over dim=64 float32 is a 32x shrink (8x past
# int8); scoring is ADC — per probe, one (m x ks) lookup table of
# partial distances, each corpus vector scored by m table lookups,
# never a float-vector read.


def pq_fit(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    fit_limit: int | None = None,
) -> list[tuple[int, int, list[float]]]:
    """Deterministic PQ codebook fit: split each vector into ``m``
    equal subvectors and run :func:`kmeans_fit`'s exact Lloyd recipe
    INDEPENDENTLY per subspace — seeds = the ``ks`` lowest-id vectors'
    subvector slices, ``iters`` assign/recompute rounds, component
    means decimal-accumulated so an oracle engine re-derives every
    codebook bit-for-bit. All m subspaces train in the SAME passes
    (the subspace index is a column, not a loop): per iteration one
    broadcast-join assignment and one grouped decimal mean over
    (subspace, cluster, pos), then one m*ks*(dim/m) = ks*dim-value
    driver collect — config-sized, like the IVF fit's.

    Returns ``[(j, c, centroid), ...]`` sorted by (j, c); empty
    clusters drop out (GROUP BY recompute — both engines agree).
    """
    return pq_fit_multi(
        {"_": emb},
        dim,
        vec_col=vec_col,
        id_col=id_col,
        m=m,
        ks=ks,
        iters=iters,
        fit_limit=fit_limit,
    )["_"]


def pq_fit_multi(
    sources: dict[str, DataFrame],
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    ks: int = 16,
    iters: int = 2,
    fit_limit: int | None = None,
) -> dict[str, list[tuple[int, int, list[float]]]]:
    """:func:`pq_fit` over SEVERAL corpora in the SAME Lloyd passes
    (r13 VERDICT #6 — the flat-PQ and residual-PQ setup fits were two
    separate 2-iteration driver round-trip loops over the same-sized
    samples). The source tag becomes one more key column next to the
    subspace index, so per iteration there is still exactly ONE
    broadcast-join assignment, ONE grouped decimal mean and ONE
    config-sized collect — now covering every source at once.

    Bit-identity: sources never mix — the tag rides the codebook join,
    the per-(id, subspace) argmin group and the per-(cluster, pos)
    mean group — so each source's returned codebook is identical to
    what :func:`pq_fit` computes for it alone (the single-source path
    IS this function with one tag).
    """
    if dim % m:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m {m}")
    d_sub = dim // m
    spark = next(iter(sources.values())).sparkSession
    subs = []
    cents_by: dict[str, list[tuple[int, int, list[float]]]] = {}
    for tag, emb in sources.items():
        src = emb if fit_limit is None else emb.orderBy(id_col).limit(fit_limit)
        subs.append(
            pq_subvectors(src, d_sub, m, vec_col=vec_col, id_col=id_col).withColumn(
                "_fsrc", F.lit(tag)
            )
        )
        seeds = src.orderBy(id_col).limit(ks).select(vec_col).collect()
        cents_by[tag] = [
            (j, i, [float(x) for x in r[0][j * d_sub : (j + 1) * d_sub]])
            for j in range(m)
            for i, r in enumerate(seeds)
        ]
    sub = subs[0]
    for extra in subs[1:]:
        sub = sub.unionByName(extra)
    # every iteration re-derives the (bounded) subvector sample —
    # persist it for the life of the fit (the kmeans_fit persist)
    sub = sub.persist()
    try:
        return _pq_lloyd_iters(spark, sub, cents_by, iters, id_col)
    finally:
        # release even when an iteration raises (kmeans_fit's pattern);
        # a leaked persisted sample would pin memory for the process
        sub.unpersist(False)


def _pq_lloyd_iters(spark, sub, cents_by, iters, id_col):
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [
                (tag, int(j), int(c), [float(x) for x in cv])
                for tag, cents in cents_by.items()
                for j, c, cv in cents
            ],
            "_fsrc string, j int, _kc int, _cv array<double>",
        )
        scored = sub.join(F.broadcast(cdf), ["_fsrc", "j"]).withColumn(
            "_kd", sq_dist(F.col("sv"), F.col("_cv"))
        )
        assigned = (
            scored.groupBy("_fsrc", id_col, "j")
            .agg(F.min(F.struct(F.col("_kd"), F.col("_kc"), F.col("sv"))).alias("_m"))
            .select("_fsrc", "j", F.col("_m._kc").alias("c"), F.col("_m.sv").alias("sv"))
        )
        comp = assigned.select(
            "_fsrc", "j", "c", F.posexplode(F.col("sv")).alias("pos", "v")
        )
        rows = (
            comp.groupBy("_fsrc", "j", "c", "pos")
            .agg(
                # float -> double -> decimal, the kmeans_fit rounding
                # bridge (see that docstring's measured divergence)
                (
                    F.sum(F.col("v").cast("double").cast(KMEANS_DEC)).cast("double")
                    / F.count("*")
                ).alias("mv")
            )
            .collect()
        )
        by: dict[str, dict[tuple[int, int], dict[int, float]]] = {}
        for r in rows:
            by.setdefault(r["_fsrc"], {}).setdefault((r["j"], r["c"]), {})[
                r["pos"]
            ] = r["mv"]
        # rebuild from the PREVIOUS iteration's tags, not the collected
        # rows: a source whose subvector frame is empty produces no
        # rows, and dropping its tag here would make pq_fit (which
        # indexes ["_"]) raise KeyError instead of returning the
        # single-source path's [] for empty input
        cents_by = {
            tag: [
                (j, c, [d[p] for p in sorted(d)])
                for (j, c), d in sorted(by.get(tag, {}).items())
            ]
            for tag in cents_by
        }
    return cents_by


def pq_subvectors(
    emb: DataFrame,
    d_sub: int,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, j, sv): each vector split into its m subvector slices —
    one explode of m literal-sliced structs, map-only."""
    return emb.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col(vec_col), j * d_sub + 1, d_sub).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("_x"),
    ).select(id_col, "_x.j", "_x.sv")


def _pq_cents_df(spark, cents: list[tuple[int, int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(int(j), int(c), [float(x) for x in cv]) for j, c, cv in cents],
        "j int, _kc int, _cv array<double>",
    )


def pq_assign(
    sub: DataFrame, cents_df: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Nearest-codebook-entry assignment per (vector, subspace):
    broadcast the m*ks codebook, score with the shared sq_dist fold,
    argmin = grouped min over a (dist, c, sv) struct — ties to the
    lowest c, map-side partial-aggregated like with_cluster's
    large-k path. Output: (id, j, c, sv, sub_err) where sub_err is
    the winning squared subdistance (the reconstruction error's
    per-subspace term, free here)."""
    scored = sub.join(F.broadcast(cents_df), "j").withColumn(
        "_kd", sq_dist(F.col("sv"), F.col("_cv"))
    )
    agg = scored.groupBy(id_col, "j").agg(
        F.min(F.struct(F.col("_kd"), F.col("_kc"), F.col("sv"))).alias("_m")
    )
    return agg.select(
        id_col,
        "j",
        F.col("_m._kc").alias("c"),
        F.col("_m.sv").alias("sv"),
        F.col("_m._kd").alias("sub_err"),
    )


def pq_codes(
    emb: DataFrame,
    cents: list[tuple[int, int, list[float]]],
    dim: int,
    m: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The integer code table: (id, j, c, sub_err) — long form, one
    row per (vector, subspace), which is exactly the shape ADC joins
    on (pack to an array<int> at the sink if serving bytes). Map-only
    over the corpus + one broadcast codebook join; at 100 TB this is
    the one full-corpus pass PQ ever takes."""
    d_sub = dim // m
    sub = pq_subvectors(emb, d_sub, m, vec_col=vec_col, id_col=id_col)
    return pq_assign(sub, _pq_cents_df(emb.sparkSession, cents), id_col=id_col).drop(
        "sv"
    )


def ivfpq_residuals(
    assigned: DataFrame,
    coarse_cents: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, c0): each vector replaced by its RESIDUAL to its
    coarse IVF centroid — the FAISS IVF-PQ encoding substrate
    (quantizing residuals concentrates the PQ codebooks on the
    within-cell distribution, where the variance actually lives).
    ``assigned`` is the cluster-assigned corpus (``with_cluster``
    output); one broadcast join + one zip_with, map-only. The float ->
    double upcast and the per-component subtraction are both exact /
    correctly-rounded IEEE ops, so an oracle re-derives every residual
    bit-for-bit."""
    spark = assigned.sparkSession
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in coarse_cents],
        "c int, _ccv array<double>",
    )
    return (
        assigned.withColumn("c", F.col("c").cast("int"))
        .join(F.broadcast(cdf), "c")
        .select(
            id_col,
            F.zip_with(
                vec_col, "_ccv", lambda x, y: x.cast("double") - y
            ).alias("embedding"),
            F.col("c").alias("c0"),
        )
    )


def ivfpq_adc_topk(
    probes: DataFrame,
    codes: DataFrame,
    coarse_cents: list[tuple[int, list[float]]],
    pq_cents: list[tuple[int, int, list[float]]],
    dim: int,
    m: int,
    k: int,
    nprobe: int,
) -> DataFrame:
    """IVF-PQ ADC top-k — the FAISS IVFPQ serving path: route each
    probe to its ``nprobe`` nearest coarse cells, take the probe's
    residual to EACH probed centroid (||q - x_hat|| = ||r_q - r_x_hat||
    when both residuals share the cell's centroid), build the
    per-(probe, cell) m x ks lookup table over the RESIDUAL codebooks,
    and score only the code rows of the probed cells — candidate cost
    is nprobe bucket-sized code scans per probe, never the corpus, and
    the corpus floats are never read at query time.

    ``codes`` must carry ``c0`` (the owning coarse cell) next to the
    (vec_id, j, c) residual codes. Per-vector ADC sums are
    DECIMAL-accumulated like :func:`pq_adc_topk`'s, so the ranking is
    oracle-derivable. Returns (qid, cid, adc_dist, rn <= k)."""
    from ..functions.exact import exact_sum
    from pyspark.sql import Window as W

    spark = probes.sparkSession
    d_sub = dim // m
    pc = probe_clusters(probes, coarse_cents, nprobe, out="c0")
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in coarse_cents],
        "c0 int, _ccv array<double>",
    )
    qres = pc.join(F.broadcast(cdf), "c0").select(
        "qid",
        "c0",
        F.zip_with("qv", "_ccv", lambda x, y: x.cast("double") - y).alias("rv"),
    )
    sub = qres.select(
        "qid",
        "c0",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(F.col("rv"), j * d_sub + 1, d_sub).alias("sv"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("_x"),
    ).select("qid", "c0", "_x.j", "_x.sv")
    lut = sub.join(F.broadcast(_pq_cents_df(spark, pq_cents)), "j").select(
        "qid",
        "c0",
        "j",
        F.col("_kc").alias("c"),
        sq_dist(F.col("sv"), F.col("_cv")).alias("pd"),
    )
    scored = (
        codes.withColumnRenamed("vec_id", "cid")
        .withColumn("c0", F.col("c0").cast("int"))
        .join(F.broadcast(lut), ["c0", "j", "c"])
        .filter(F.col("cid") != F.col("qid"))
        .groupBy("qid", "cid")
        .agg(exact_sum(F.col("pd")).alias("adc_dist"))
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("cid").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def pq_adc_topk(
    probes: DataFrame,
    codes: DataFrame,
    cents: list[tuple[int, int, list[float]]],
    dim: int,
    m: int,
    k: int,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k: per probe, build
    the (m x ks) lookup table of partial squared distances from the
    FLOAT probe subvectors to every codebook entry, then score each
    corpus vector as the sum of its m looked-up cells — the probe
    never touches a corpus float. The per-vector sum of m doubles is
    DECIMAL-accumulated (exact_sum) so the ADC score — and therefore
    the ranking an oracle re-derives — is order-insensitive.

    ``probes`` = (qid, qv); returns (qid, cid, adc_dist, rn <= k),
    ranked ascending with id tie-break. Scale: the LUT is
    probes x m x ks rows (config-sized, broadcast); the corpus-side
    cost is one broadcast join on (j, c) over the code table + one
    (qid, cid)-keyed sum — linear in codes, never a float-vector scan.
    """
    from ..functions.exact import exact_sum
    from pyspark.sql import Window as W

    d_sub = dim // m
    qsub = pq_subvectors(probes, d_sub, m, vec_col="qv", id_col="qid")
    lut = (
        qsub.join(F.broadcast(_pq_cents_df(probes.sparkSession, cents)), "j")
        .select(
            "qid",
            "j",
            F.col("_kc").alias("c"),
            sq_dist(F.col("sv"), F.col("_cv")).alias("pd"),
        )
    )
    scored = (
        codes.withColumnRenamed("vec_id", "cid")
        .join(F.broadcast(lut), ["j", "c"])
        .filter(F.col("cid") != F.col("qid"))
        .groupBy("qid", "cid")
        .agg(exact_sum(F.col("pd")).alias("adc_dist"))
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_dist").asc(), F.col("cid").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
