"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators.cache import corpus_value
from ..session import load_tables
from .catalog import register, register_setup
from .dedup import NEW_MOD

N_PROBES = 8
TOP_K = 5

# DuckDB twin of operators.similarity.dot/norm/cosine: sequential
# double fold over the zipped lists — bit-identical to Spark's
# zip_with + aggregate (verified empirically).
SQL_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"{SQL_DOT.format(a=a, b=b)} / "
        f"sqrt({SQL_DOT.format(a=a, b=a)} * {SQL_DOT.format(a=b, b=b)})"
    )


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT qid, vec_id AS cid,
             {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings CROSS JOIN probes
      WHERE vec_id != qid
    ), ranked AS (
      SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="Brute-force cosine top-k: probes broadcast against the corpus, "
    "zip_with/aggregate dot products JVM-side, per-probe ranking "
    "window. The correctness baseline for ANN.",
    tags=("similarity", "ann"),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    return S.topk_neighbors(probes, corpus, TOP_K)


@register(
    "ann_topk_ivf",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qv, label AS qlabel
      FROM embeddings WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT qid, vec_id AS cid,
             {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings JOIN probes ON label = qlabel
      WHERE vec_id != qid
    ), ranked AS (
      SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="IVF-style ANN, join-topology demo: candidates restricted to "
    "the probe's coarse bucket (the fixture's label column stands in "
    "for the centroid assignment), turning the cross join into an "
    "equi-join hash-partitioned by bucket. The *fitted* variant with a "
    "real k-means quantizer (and useful recall) is ann_topk_ivf_kmeans.",
    tags=("similarity", "ann", "ivf"),
)
def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("label").alias("qlabel")
    )
    corpus = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), F.col("label").alias("clabel")
    )
    return S.topk_neighbors(probes, corpus, TOP_K, bucket=True)


@register(
    "embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS ida, b.vec_id AS idb,
           {_sql_cosine('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.45
    """,
    doc="Embedding-cosine near-duplicate pairs within coarse buckets: "
    "bucketed pairwise comparison (candidates linear in bucket size).",
    tags=("similarity", "dedup"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    return S.near_dup_pairs(t["embeddings"], threshold=0.45)


@register(
    "ann_topk_vectorized",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT qid, vec_id AS cid,
             {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings CROSS JOIN probes
      WHERE vec_id != qid
    ), ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="Vectorized ANN: one numpy matmul per Arrow batch against the "
    "broadcast probe matrix, per-batch top-k (argpartition) before the "
    "shuffle, global re-rank after — the Pandas-UDF fast path next to "
    "the JVM-fold baseline. Compared on (qid, cid, rank): the blocked "
    "float sum is not bit-identical to a sequential fold, the ranking "
    "is.",
    tags=("similarity", "ann", "pandas-udf"),
)
def ann_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    return S.topk_neighbors_vectorized(probes, corpus, TOP_K).select("qid", "cid", "rn")


# -- k-means IVF (fitted coarse quantizer) ------------------------------

KM_K = 8
KM_ITERS = 2
# IVF coarse-quantizer fit sample: the KM_FIT_N lowest vec_ids (the
# standard train-on-a-sample recipe, deterministic and oracle-
# derivable). 1024 covers the whole sf0.01 corpus (500 vecs) — the
# driver's correctness rows are bit-identical to the full fit — and
# halves the per-iteration fit scans at sf0.1 (2000 vecs), where the
# sampled fit holds recall@5 at exactly the 0.95 gate (full fit:
# 0.975; 512 drops to 0.875 — measured, deterministic).
KM_FIT_N = 1024
_DEC = "DECIMAL(30,6)"

# SemDeDup target mean cluster occupancy — defined up here because the
# adaptive-k oracle CTE below bakes it in; rationale with the rest of
# the SemDeDup constants further down.
SEMDEDUP_TARGET_CLUSTER = 64
# ...and the fit SAMPLE scales with k: a fixed KM_FIT_N sample would
# eventually hold fewer points than clusters once k = n/64 outgrows
# it, so the SemDeDup fit trains on the max(KM_FIT_N, 4k) lowest
# vec_ids — at least FIT_PER_CLUSTER points per seeded cluster, still
# a deterministic oracle-derivable top-N, still sample-sized relative
# to the corpus (4k = n/16 at the growth margin).
FIT_PER_CLUSTER = 4

# The fit is DETERMINISTIC (fixed seeds, decimal-exact means), so its
# k x dim float result is a pure function of the parquet dir + the
# fit parameters — memoized in the (session, corpus dir)-scoped value
# cache (operators/cache.corpus_value: same lifecycle + eviction as
# the corpus-persisted frames, so centroids can never outlive their
# session or survive a corpus switch). The IVF queries
# (ann_topk_ivf_kmeans, ann_recall_ivf) share one fixed-k fit and the
# SemDeDup family shares one corpus-scaled fit instead of re-running
# the 2-iteration driver loop each; the cached centroids are plain
# Python floats. Correctness is unchanged: cached == recomputed, and
# every query's oracle re-derives the same fit from scratch in SQL.


def kmeans_fit_cached(
    spark: SparkSession,
    sf_dir: str,
    emb: DataFrame,
    k: int = KM_K,
    fit_limit: int = KM_FIT_N,
    subset: str = "all",
):
    # ``subset`` names WHICH rows of sf_dir ``emb`` holds (the
    # incremental fit trains on the stored-corpus side only) — it must
    # be part of the key or a same-(k, fit_limit) fit on a different
    # row subset would serve stale centroids
    return corpus_value(
        spark,
        f"km_fit:{k}:{fit_limit}:{subset}",
        sf_dir,
        lambda: S.kmeans_fit(
            emb, "embedding", "vec_id", k=k, iters=KM_ITERS, fit_limit=fit_limit
        ),
    )


def ivf_assigned_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, label, c): the corpus under the FIXED-k IVF
    assignment — corpus-scoped (r9) like the SemDeDup family's
    adaptive-k twin: the assignment is a pure function of the corpus +
    the deterministic fit, and all four IVF retrieval queries
    (ann_topk_ivf_kmeans, ann_recall_ivf, ann_topk_ivf_nprobe,
    ann_recall_nprobe) consume the one frame instead of re-scanning
    and re-assigning per query."""
    from ..operators.cache import corpus_persist, scoped_persist

    def build():
        # query-scoped persist for the FIRST build only: the fit scans
        # the corpus once per iteration; later queries read the
        # materialized assignment's cached blocks instead
        emb = scoped_persist(load_tables(spark, sf_dir, "embeddings")["embeddings"])
        cents = kmeans_fit_cached(spark, sf_dir, emb)
        return S.with_cluster(emb, "embedding", cents)

    return corpus_persist(spark, "ivf_assigned", sf_dir, build)


def _sql_sqdist(a: str, b: str) -> str:
    return (
        "list_sum(list_transform(range(1, len({a}) + 1), "
        "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        "* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    ).format(a=a, b=b)


def _sql_assign(src: str, ctr: str, a_name: str) -> str:
    """One assignment round: nearest centroid by squared L2, ties to
    the lowest cluster id (mirrors operators.similarity.with_cluster)."""
    return f"""
    d_{a_name} AS (
      SELECT e.vec_id, e.embedding, s.c,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_sql_sqdist('e.embedding', 's.cv')}, s.c) AS rn
      FROM {src} e CROSS JOIN {ctr} s
    ),
    {a_name} AS (SELECT vec_id, embedding, c FROM d_{a_name} WHERE rn = 1)"""


def _sql_recompute(a_name: str, ctr_name: str) -> str:
    """Centroid update: element-wise decimal-exact mean (the
    functions/exact.py portable-sum trick), list rebuilt in position
    order — bit-identical to the Spark side's posexplode + decimal sum."""
    return f"""
    m_{ctr_name} AS (
      SELECT c, x.pos AS pos,
             CAST(SUM(CAST(CAST(x.v AS DOUBLE) AS {_DEC})) AS DOUBLE) / COUNT(*) AS m
      FROM (SELECT c,
                   unnest(list_transform(range(1, len(embedding) + 1),
                          i -> {{'pos': i, 'v': embedding[i]}})) AS x
            FROM {a_name})
      GROUP BY c, x.pos
    ),
    {ctr_name} AS (SELECT c, list(m ORDER BY pos) AS cv FROM m_{ctr_name} GROUP BY c)"""


_SQL_KMEANS_CTES = f"""
    fitsrc AS (
      SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {KM_FIT_N}
    ),
    seeds AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS c, embedding AS cv
      FROM (SELECT vec_id, embedding FROM fitsrc ORDER BY vec_id LIMIT {KM_K})
    ),
    {_sql_assign('fitsrc', 'seeds', 'a0')},
    {_sql_recompute('a0', 'ctr1')},
    {_sql_assign('fitsrc', 'ctr1', 'a1')},
    {_sql_recompute('a1', 'ctr2')},
    {_sql_assign('embeddings', 'ctr2', 'afinal')}
"""

# The SemDeDup family's fit: identical Lloyd recipe, but the seed
# count is DERIVED FROM THE DATA — k = max(KM_K, ceil(n / target)),
# computed in SQL from COUNT(*) so both engines scale k the same way
# on any corpus (plans/similarity._semdedup_k is the Spark twin).
# ``where`` restricts which rows train the fit (the incremental query
# fits on the stored-corpus side only); assignment always covers the
# full table.


def _sql_kmeans_ctes_subset(where: str) -> str:
    return f"""
    kparam AS (
      SELECT GREATEST({KM_K}, CAST(CEIL(COUNT(*) / {SEMDEDUP_TARGET_CLUSTER}.0) AS BIGINT)) AS k
      FROM embeddings WHERE {where}
    ),
    fitsrc AS (
      SELECT vec_id, embedding
      FROM (SELECT vec_id, embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS frn
            FROM embeddings WHERE {where}), kparam
      WHERE frn <= GREATEST({KM_FIT_N}, {FIT_PER_CLUSTER} * k)
    ),
    seeds AS (
      SELECT rn - 1 AS c, embedding AS cv
      FROM (SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM fitsrc), kparam
      WHERE rn <= k
    ),
    {_sql_assign('fitsrc', 'seeds', 'a0')},
    {_sql_recompute('a0', 'ctr1')},
    {_sql_assign('fitsrc', 'ctr1', 'a1')},
    {_sql_recompute('a1', 'ctr2')},
    {_sql_assign('embeddings', 'ctr2', 'afinal')}
"""


_SQL_KMEANS_CTES_SEM = _sql_kmeans_ctes_subset("TRUE")


@register(
    "ann_topk_ivf_kmeans",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    probes AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN probes ON a.c = qc
      WHERE a.vec_id != qid
    ), ranked AS (
      SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc=f"IVF ANN with a *fitted* coarse quantizer: deterministic "
    f"Lloyd's k-means (k={KM_K}, {KM_ITERS} iterations, seeds = lowest "
    f"vec_ids, decimal-exact centroid means) assigns every vector a "
    f"bucket; candidates are restricted to the probe's bucket via "
    f"equi-join. The fit is a driver loop of {KM_ITERS} config-sized "
    f"collects; at 100 TB it runs on a sample and the assignment "
    f"broadcast-joins the full corpus — the join topology is identical. "
    f"The oracle re-derives the identical fit (unrolled CTEs).",
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def ann_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the fit and the assignment are corpus-scoped — all four IVF
    # retrieval queries join against the one materialized frame
    assigned = ivf_assigned_cached(spark, sf_dir)
    probes = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("c").alias("qlabel")
    )
    corpus = assigned.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), F.col("c").alias("clabel")
    )
    return S.topk_neighbors(probes, corpus, TOP_K, bucket=True)


# IVF multi-probe width: how many nearest coarse buckets each query
# searches. 2 is the smallest value that exercises the knob (bucket
# union, cross-boundary recall); production tunes it per recall target.
NPROBE_P = 2

# The probe→cluster routing CTE both nprobe oracles share: each probe
# ranked against the FITTED centroids (ctr2), keep the top NPROBE_P —
# the SQL twin of operators.similarity.probe_clusters.
_SQL_NPROBE_PC = f"""
    nprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), prd AS (
      SELECT qid, qv, s.c,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY {_sql_sqdist('qv', 's.cv')}, s.c) AS prn
      FROM nprobes CROSS JOIN ctr2 s
    ), pc AS (SELECT qid, qv, c FROM prd WHERE prn <= {NPROBE_P})
"""


@register(
    "ann_topk_ivf_nprobe",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    {_SQL_NPROBE_PC},
    scored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN pc ON a.c = pc.c
      WHERE a.vec_id != qid
    ), ranked AS (
      SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc=f"Multi-probe IVF ANN — the recall/cost knob single-bucket IVF "
    f"lacks: each probe searches its {NPROBE_P} nearest coarse buckets "
    f"(probe_clusters: broadcast k-row centroid table, map-side "
    f"distance folds, per-probe-keyed top-p window), recovering the "
    f"neighbors that landed just across a Voronoi boundary at "
    f"{NPROBE_P}x the bucket-join candidate cost — still bucket-sized, "
    f"never corpus-sized. The oracle re-derives the identical fit and "
    f"routing in SQL.",
    tags=("similarity", "ann", "ivf", "kmeans"),
)
def ann_topk_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = ivf_assigned_cached(spark, sf_dir)
    # populated by the assignment build above, so this is a memo read
    cents = kmeans_fit_cached(spark, sf_dir, assigned)
    probes = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pc = S.probe_clusters(probes, cents, NPROBE_P)
    corpus = assigned.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), F.col("c").alias("clabel")
    )
    return S.topk_neighbors(pc, corpus, TOP_K, bucket=True)


@register(
    "ann_recall_nprobe",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    probes AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ), scored1 AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN probes ON a.c = qc
      WHERE a.vec_id != qid
    ), ranked1 AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored1
    ), ivf1 AS (SELECT qid, cid FROM ranked1 WHERE rn <= {TOP_K}),
    {_SQL_NPROBE_PC},
    scoredp AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN pc ON a.c = pc.c
      WHERE a.vec_id != qid
    ), rankedp AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scoredp
    ), ivfp AS (SELECT qid, cid FROM rankedp WHERE rn <= {TOP_K}),
    bprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), bscored AS (
      SELECT qid, vec_id AS cid,
             {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings CROSS JOIN bprobes
      WHERE vec_id != qid
    ), branked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM bscored
    ), brute AS (SELECT qid, cid FROM branked WHERE rn <= {TOP_K})
    SELECT b.qid,
           COUNT(i1.cid) AS hit_ct_1probe,
           COUNT(i1.cid) / {TOP_K}.0 AS recall_1probe,
           COUNT(ip.cid) AS hit_ct_nprobe,
           COUNT(ip.cid) / {TOP_K}.0 AS recall_nprobe
    FROM brute b
    LEFT JOIN ivf1 i1 ON b.qid = i1.qid AND b.cid = i1.cid
    LEFT JOIN ivfp ip ON b.qid = ip.qid AND b.cid = ip.cid
    GROUP BY b.qid
    """,
    doc=f"The nprobe calibration audit: per-probe recall@{TOP_K} of "
    f"single-bucket IVF and {NPROBE_P}-probe IVF side by side against "
    f"the exact brute-force ranking — the measurement that justifies "
    f"(or caps) each extra probed bucket's candidate cost. All three "
    f"top-k sets re-derived by the oracle; the brute side is the "
    f"documented cross-join baseline, the IVF sides bucket equi-joins.",
    tags=("similarity", "ann", "ivf", "audit"),
)
def ann_recall_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = ivf_assigned_cached(spark, sf_dir)
    cents = kmeans_fit_cached(spark, sf_dir, assigned)
    corpus = assigned.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), F.col("c").alias("clabel")
    )
    probes1 = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("c").alias("qlabel")
    )
    ivf1 = S.topk_neighbors(probes1, corpus, TOP_K, bucket=True).select("qid", "cid")
    probes = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pc = S.probe_clusters(probes, cents, NPROBE_P)
    ivfp = S.topk_neighbors(pc, corpus, TOP_K, bucket=True).select("qid", "cid")
    corpus_b = assigned.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    brute = S.topk_neighbors(probes, corpus_b, TOP_K).select("qid", "cid")
    # all three top-k sets descend from the same embeddings lineage —
    # rename the right-side keys before joining (see ann_recall_ivf)
    i1 = ivf1.select(F.col("qid").alias("q1"), F.col("cid").alias("c1"))
    ip = ivfp.select(F.col("qid").alias("qp"), F.col("cid").alias("cp"))
    return (
        brute.join(i1, (F.col("qid") == F.col("q1")) & (F.col("cid") == F.col("c1")), "left")
        .join(ip, (F.col("qid") == F.col("qp")) & (F.col("cid") == F.col("cp")), "left")
        .groupBy("qid")
        .agg(
            F.count("c1").alias("hit_ct_1probe"),
            (F.count("c1") / F.lit(float(TOP_K))).alias("recall_1probe"),
            F.count("cp").alias("hit_ct_nprobe"),
            (F.count("cp") / F.lit(float(TOP_K))).alias("recall_nprobe"),
        )
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
    WITH n AS (
      SELECT label, sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS vec_ct,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
           CAST(SUM(CAST(nrm AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_norm
    FROM n GROUP BY label
    """,
    doc="Embedding hygiene stats: L2 norm per vector (zip-free "
    "aggregate fold, JVM-side) reduced per coarse label — the "
    "norm-distribution check a pipeline runs before cosine ANN "
    "(un-normalized or zero vectors poison IVF training). Map-side "
    "fold + one partial-aggregated shuffle; the mean is "
    "decimal-accumulated so any engine reproduces the exact double.",
    tags=("similarity", "quality"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import exact_avg
    from ..operators.similarity import norm_sq

    t = load_tables(spark, sf_dir, "embeddings")
    n = t["embeddings"].select(
        "label", F.sqrt(norm_sq(F.col("embedding"))).alias("nrm")
    )
    return n.groupBy("label").agg(
        F.count("*").alias("vec_ct"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        exact_avg(F.col("nrm")).alias("avg_norm"),
    )


# -- random-hyperplane LSH ----------------------------------------------

RHP_DIM = 64  # fixture embedding dim; at scale read from the schema
RHP_COS_MIN = 0.2  # verify threshold, tuned to the near-random fixture


def _sql_hexval8(expr: str) -> str:
    nib = "(strpos('0123456789abcdef', substr({e}, {i}, 1)) - 1)"
    return " + ".join(f"{nib.format(e=expr, i=i + 1)} * {16 ** (7 - i)}" for i in range(8))


_SQL_RHP_MD5 = "md5('rhp:' || CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR))"

SQL_RHP_SIGS = f"""
    hp AS (
      SELECT j, list(CAST(({_sql_hexval8(_SQL_RHP_MD5)}) AS DOUBLE) / 4294967296.0 - 0.5
                     ORDER BY d) AS h
      FROM (SELECT unnest(range(0, {S.RHP_BITS})) AS j),
           (SELECT unnest(range(0, {RHP_DIM})) AS d)
      GROUP BY j
    ),
    bits AS (
      SELECT vec_id, j,
             CASE WHEN list_sum(list_transform(range(1, {RHP_DIM} + 1),
                    i -> CAST(embedding[i] AS DOUBLE) * h[i])) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM embeddings CROSS JOIN hp
    ),
    sigs AS (
      SELECT vec_id, CAST(j // {S.RHP_ROWS} AS INTEGER) AS band,
             CAST(SUM(bit * (1 << (j % {S.RHP_ROWS}))) AS INTEGER) AS bsig
      FROM bits GROUP BY vec_id, j // {S.RHP_ROWS}
    )
"""


@register(
    "rhp_signature",
    oracle=f"""
    WITH {SQL_RHP_SIGS}
    SELECT vec_id, band, bsig FROM sigs
    """,
    doc=f"Random-hyperplane (SimHash-for-cosine) signatures: bit j = "
    f"sign(v . h_j) over {S.RHP_BITS} md5-derived deterministic "
    f"hyperplanes, packed into {S.RHP_BANDS} banded integer keys. The "
    "dot folds are the bit-reproducible sequential aggregate, so the "
    "sign test — and therefore every signature — lands identically on "
    "any engine. Map-only scan; the signature table is what a 100 TB "
    "corpus materializes once and joins against forever.",
    tags=("similarity", "lsh"),
)
def rhp_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "embeddings")
    return S.rhp_band_sigs(t["embeddings"], dim=RHP_DIM)


@register(
    "rhp_near_dup",
    oracle=f"""
    WITH {SQL_RHP_SIGS},
    sstat AS (
      SELECT band, bsig, COUNT(*) AS bct, MIN(vec_id) AS rep
      FROM sigs GROUP BY band, bsig
    ),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM sigs a
      JOIN sstat ON a.band = sstat.band AND a.bsig = sstat.bsig
                AND sstat.bct <= {D.MAX_BUCKET}
      JOIN sigs b
        ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id
      UNION
      SELECT t.rep AS vec_a, sigs.vec_id AS vec_b
      FROM sigs JOIN sstat t ON sigs.band = t.band AND sigs.bsig = t.bsig
      WHERE t.bct > {D.MAX_BUCKET} AND sigs.vec_id > t.rep
    )
    SELECT vec_a, vec_b,
           {_sql_cosine('ea.embedding', 'eb.embedding')} AS cos_sim
    FROM cand JOIN embeddings ea ON vec_a = ea.vec_id
              JOIN embeddings eb ON vec_b = eb.vec_id
    WHERE {_sql_cosine('ea.embedding', 'eb.embedding')} >= {RHP_COS_MIN}
    """,
    doc="Embedding near-dup via random-hyperplane LSH — the "
    "label/centroid-free scale path: candidates are the banded "
    "signature self-join (collision probability rises steeply with "
    "cosine), verified by exact cosine. The all-pairs scan never "
    "materializes; candidate volume is sum(bucket^2) over signature "
    "buckets, the same bound as MinHash-LSH — and hot buckets past "
    "MAX_BUCKET collapse to their min-id representative's m-1 pairs "
    "before the self-join (a dense embedding cluster concentrates "
    "into a handful of the 2^rows possible band values; measured 7.6M "
    "pairs from 20k clustered vectors uncapped, SCALE.md), so a dense "
    "cluster still dedups against one representative at linear cost. "
    "Threshold tuned to the near-random fixture.",
    tags=("similarity", "lsh", "dedup"),
)
def rhp_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    sigs = scoped_persist(S.rhp_band_sigs(emb, dim=RHP_DIM))
    cand = S.rhp_candidate_pairs(sigs, max_bucket=D.MAX_BUCKET)
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_sim", S.cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos_sim") >= RHP_COS_MIN)
        .select("vec_a", "vec_b", "cos_sim")
    )


@register(
    "ann_topk_rhp",
    oracle=f"""
    WITH {SQL_RHP_SIGS},
    cand AS (
      SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id != b.vec_id
      WHERE a.vec_id < {N_PROBES}
    ),
    scored AS (
      SELECT qid, cid,
             {_sql_cosine('ea.embedding', 'eb.embedding')} AS cos_sim
      FROM cand JOIN embeddings ea ON qid = ea.vec_id
                JOIN embeddings eb ON cid = eb.vec_id
    ),
    ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, rn FROM ranked WHERE rn <= {TOP_K}
    """,
    doc="Top-k retrieval through random-hyperplane LSH buckets — the "
    "third ANN strategy next to brute force and IVF: candidates are "
    "corpus vectors sharing at least one band signature with the "
    "probe (an equi-join on (band, bsig), never a scan of the "
    "corpus), ranked by exact cosine. Per-probe recall depends on "
    "bucket collisions, the standard LSH trade; candidate volume is "
    "bounded by bucket occupancy exactly like rhp_near_dup.",
    tags=("similarity", "lsh", "ann"),
)
def ann_topk_rhp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    sigs = scoped_persist(S.rhp_band_sigs(emb, dim=RHP_DIM))
    a = sigs.filter(F.col("vec_id") < N_PROBES).alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("qid"), F.col("b.vec_id").alias("cid"))
        .distinct()
    )
    # probe embeddings are broadcast-sized by the same contract as the
    # other ANN queries; the corpus side stays a hash join on cid
    ea = F.broadcast(
        emb.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
    )
    eb = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    w = W.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    return (
        cand.join(ea, "qid")
        .join(eb, "cid")
        .withColumn("cos_sim", S.cosine(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "cid", "rn")
    )


@register(
    "embedding_coverage",
    oracle="""
    SELECT
      COUNT(*) FILTER (WHERE d.doc_id IS NOT NULL AND e.vec_id IS NOT NULL)
        AS matched,
      COUNT(*) FILTER (WHERE e.vec_id IS NULL) AS docs_without_embedding,
      COUNT(*) FILTER (WHERE d.doc_id IS NULL) AS embeddings_without_doc
    FROM documents d FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    doc="Cross-table integrity audit — the join-coverage report a "
    "pipeline runs before relying on doc<->embedding alignment "
    "(documents and embeddings are produced by different stages and "
    "drift): one full outer hash join on the id, three conditional "
    "counts, one exchange. At 100 TB both sides bucket by the id and "
    "the join is co-located.",
    tags=("similarity", "audit"),
)
def embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents", "embeddings")
    d = t["documents"].select("doc_id")
    e = t["embeddings"].select("vec_id")
    j = d.join(e, d["doc_id"] == e["vec_id"], "full_outer")
    return j.agg(
        F.count(
            F.when(F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1)
        ).alias("matched"),
        F.count(F.when(F.col("vec_id").isNull(), 1)).alias("docs_without_embedding"),
        F.count(F.when(F.col("doc_id").isNull(), 1)).alias("embeddings_without_doc"),
    )


_SQL_Q8_CODE = (
    "greatest(-127, least(127, floor(CAST({x} AS DOUBLE) / sc + 0.5)))"
)


@register(
    "embedding_quantize",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS sc
      FROM embeddings
    ), e AS (
      SELECT label, sc,
             CASE WHEN sc = 0 THEN CAST(0 AS BIGINT) ELSE
               CAST(list_sum(list_transform(embedding,
                    x -> CAST({_SQL_Q8_CODE.format(x='x')} AS BIGINT))) AS BIGINT)
             END AS code_sum,
             CASE WHEN sc = 0 THEN 0.0 ELSE
               list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE) - {_SQL_Q8_CODE.format(x='x')} * sc)))
             END AS max_abs_err
      FROM s
    )
    SELECT label,
           COUNT(*) AS vec_ct,
           {{avg_sc}} AS avg_scale,
           {{avg_err}} AS avg_err,
           MAX(max_abs_err) AS max_err,
           CAST(SUM(code_sum) AS BIGINT) AS code_sum
    FROM e GROUP BY label
    """.format(
        avg_sc="CAST(SUM(CAST(sc AS DECIMAL(30,6))) AS DOUBLE) / COUNT(sc)",
        avg_err="CAST(SUM(CAST(max_abs_err AS DECIMAL(30,6))) AS DOUBLE) / COUNT(max_abs_err)",
    ),
    doc="Symmetric int8 embedding quantization audit — the 4x-smaller "
    "code table a 100 TB embedding store actually serves (the IVF/PQ "
    "storage prep step): per-vector scale = max|x|/127, code = "
    "clamp(floor(x/scale + 0.5), ±127) — the floor form is round-half-"
    "up by construction on every engine, no round() tie-rule "
    "dependence — then per-label reconstruction-error stats (decimal-"
    "exact means) and an integer code checksum pinning every code "
    "cross-engine. Map-only scan + one label-keyed shuffle.",
    tags=("similarity", "quantization", "llm-prep"),
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import exact_avg

    t = load_tables(spark, sf_dir, "embeddings")
    emb = t["embeddings"]
    q = S.quantize_int8(emb, "embedding", "vec_id")
    joined = q.join(emb.select("vec_id", "label"), "vec_id")
    code_sum = F.aggregate(
        F.col("codes"), F.lit(0).cast("long"), lambda a, c: a + c
    )
    return (
        joined.withColumn("code_sum_v", code_sum)
        .groupBy("label")
        .agg(
            F.count("*").alias("vec_ct"),
            exact_avg(F.col("scale")).alias("avg_scale"),
            exact_avg(F.col("max_abs_err")).alias("avg_err"),
            F.max("max_abs_err").alias("max_err"),
            F.sum("code_sum_v").cast("long").alias("code_sum"),
        )
    )


@register(
    "ann_recall_int8",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
               AS sc
      FROM embeddings
    ), r AS (
      SELECT vec_id,
             CASE WHEN sc = 0 THEN list_transform(embedding, x -> 0.0)
                  ELSE list_transform(embedding,
                       x -> {_SQL_Q8_CODE.format(x='x')} * sc) END AS rv
      FROM s
    ), probes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), qscored AS (
      SELECT qid, r.vec_id AS cid, {_sql_cosine('qv', 'r.rv')} AS cos_sim
      FROM r CROSS JOIN probes WHERE r.vec_id != qid
    ), qranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM qscored
    ), qtop AS (SELECT qid, cid FROM qranked WHERE rn <= {TOP_K}),
    bscored AS (
      SELECT qid, vec_id AS cid, {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings CROSS JOIN probes
      WHERE vec_id != qid
    ), branked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM bscored
    ), brute AS (SELECT qid, cid FROM branked WHERE rn <= {TOP_K})
    SELECT b.qid,
           COUNT(i.cid) AS hit_ct,
           COUNT(i.cid) / {TOP_K}.0 AS recall
    FROM brute b LEFT JOIN qtop i ON b.qid = i.qid AND b.cid = i.cid
    GROUP BY b.qid
    """,
    doc="Quantized-retrieval quality audit — recall@k of cosine top-k "
    "over the int8-RECONSTRUCTED corpus (embedding_quantize's codes "
    "times scale; float probes, quantized corpus — exactly how a "
    "serving system searches an int8 store) against the exact "
    "brute-force ranking. Completes the quantization story: "
    "embedding_quantize pins the 4x storage codes, this pins what "
    "those codes cost in retrieval quality, both oracle-derived from "
    "the same floor-based rounding rule.",
    tags=("similarity", "ann", "quantization", "audit"),
)
def ann_recall_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    recon = S.quantize_int8(emb, "embedding", "vec_id").select(
        "vec_id",
        F.transform(F.col("codes"), lambda c: c.cast("double") * F.col("scale")).alias(
            "rv"
        ),
    )
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus_q = recon.select(F.col("vec_id").alias("cid"), F.col("rv").alias("cv"))
    qtop = S.topk_neighbors(probes, corpus_q, TOP_K).select("qid", "cid")
    corpus_b = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    brute = S.topk_neighbors(probes, corpus_b, TOP_K).select("qid", "cid")
    qtop_r = qtop.select(F.col("qid").alias("iqid"), F.col("cid").alias("icid"))
    return (
        brute.join(
            qtop_r,
            (F.col("qid") == F.col("iqid")) & (F.col("cid") == F.col("icid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("icid").alias("hit_ct"),
            (F.count("icid") / F.lit(float(TOP_K))).alias("recall"),
        )
    )


@register(
    "ann_recall_ivf",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    probes AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN probes ON a.c = qc
      WHERE a.vec_id != qid
    ), ranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    ), ivf AS (SELECT qid, cid FROM ranked WHERE rn <= {TOP_K}),
    bprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ), bscored AS (
      SELECT qid, vec_id AS cid,
             {_sql_cosine('qv', 'embedding')} AS cos_sim
      FROM embeddings CROSS JOIN bprobes
      WHERE vec_id != qid
    ), branked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM bscored
    ), brute AS (SELECT qid, cid FROM branked WHERE rn <= {TOP_K})
    SELECT b.qid,
           COUNT(i.cid) AS hit_ct,
           COUNT(i.cid) / {TOP_K}.0 AS recall
    FROM brute b LEFT JOIN ivf i ON b.qid = i.qid AND b.cid = i.cid
    GROUP BY b.qid
    """,
    doc="ANN quality audit — per-probe recall@k of the fitted k-means "
    "IVF against the exact brute-force ranking, both re-derived by the "
    "oracle (the SCALE.md recall claim as a driver-checked fact, not "
    "a one-off measurement). Spark side: one id-keyed join of the two "
    "top-k sets; the brute side is the documented broadcast baseline, "
    "the IVF side the bucket equi-join.",
    tags=("similarity", "ann", "ivf", "audit"),
)
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = ivf_assigned_cached(spark, sf_dir)
    probes_ivf = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"), F.col("c").alias("qlabel")
    )
    corpus_ivf = assigned.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"), F.col("c").alias("clabel")
    )
    ivf = S.topk_neighbors(probes_ivf, corpus_ivf, TOP_K, bucket=True).select("qid", "cid")
    probes_b = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    corpus_b = assigned.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    brute = S.topk_neighbors(probes_b, corpus_b, TOP_K).select("qid", "cid")
    # both top-k sets descend from the same embeddings lineage — rename
    # BOTH right-side keys before joining so resolution never relies on
    # dataset-id disambiguation across a derived self-join
    ivf_r = ivf.select(F.col("qid").alias("iqid"), F.col("cid").alias("icid"))
    return (
        brute.join(
            ivf_r,
            (F.col("qid") == F.col("iqid")) & (F.col("cid") == F.col("icid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("icid").alias("hit_ct"),
            (F.count("icid") / F.lit(float(TOP_K))).alias("recall"),
        )
    )


# -- SemDeDup: cluster-then-dedup curation over learned clusters --------
#
# Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
# through semantic deduplication"): k-means-cluster the embedding
# space, then look for semantic duplicates only WITHIN a cluster —
# the pairwise comparison is bucketed by a LEARNED partition instead
# of a ground-truth label (embedding_near_dup's bucketing) or a hash
# family (rhp_near_dup's). Both queries reuse the ann_topk_ivf_kmeans
# fit (same KM_K/KM_ITERS/KM_FIT_N recipe, so the oracle re-derives
# the identical centroids).

SEMDEDUP_T = 0.45
# Hot-cluster guard, same contract as operators/dedup.MAX_BUCKET: the
# within-cluster self-join is quadratic in cluster size (measured:
# 13.8 s -> 205 s / 20M pairs at the 10x probe before the cap).
# Clusters past the cap collapse to their min-id representative's m-1
# pairs — linear — on BOTH engines, so the cap is defined semantics.
# Since round 6 k GROWS with the corpus (below), so mean occupancy
# stays ~SEMDEDUP_TARGET_CLUSTER at any scale and the cap is the
# BACKSTOP for skewed clusters, not the primary defense.
SEMDEDUP_MAX_CLUSTER = 512

# The SemDeDup paper's regime: the cluster COUNT scales with the
# corpus so the cluster SIZE does not. k = max(KM_K, ceil(n / target))
# — at the driver's correctness scales (50 / 500 vectors) this floors
# to KM_K=8, bit-identical to the fixed-k fit; at sf0.1 it is 32 and
# at the 10x probe ~313, holding mean occupancy ~64 while a fixed k=8
# would balloon it 10x per scale-up. The fit still runs on the
# KM_FIT_N deterministic sample; only the seed count grows. The
# retrieval-tuned IVF queries keep their fixed KM_K — recall@k is
# calibrated against bucket fan-out there, occupancy here
# (embedding_cluster_stats audits both regimes). The constant itself
# (SEMDEDUP_TARGET_CLUSTER = 64) lives next to KM_FIT_N because the
# oracle CTE template bakes it in at module build.


def _semdedup_k(n: int) -> int:
    return max(KM_K, -(-n // SEMDEDUP_TARGET_CLUSTER))


# the corpus row count that sizes k is corpus metadata like the fit
# itself — memoized in the same (session, corpus dir) value scope so
# the SemDeDup-family queries don't each pay a full embeddings scan
# for the same scalar, and the entry evicts with its scope


def _fit_and_assign(spark: SparkSession, sf_dir: str, fit_filter=None, subset: str = "all"):
    """Adaptive-k fit + full-corpus assignment for the SemDeDup family.

    ``fit_filter`` restricts which rows TRAIN the fit (the incremental
    query fits on the stored-corpus side only — production fits the
    quantizer at bootstrap); k and the fit sample scale with the fit
    rows, assignment always covers the whole table. ``subset`` names
    the filter in the fit/count cache keys.

    The ASSIGNMENT is corpus-scoped (r9), like the MinHash signature
    tables: (vec_id, embedding, c) is a pure function of the corpus
    dir + the deterministic fit, and it is what a production SemDeDup
    pipeline materializes once and keeps — so the five family
    consumers stop re-assigning the same corpus per query. The
    underlying scan stays scoped-persisted only for the FIRST build's
    fit iterations; once the assignment frame is materialized by its
    first consumer, later queries read its cached blocks."""
    from ..operators.cache import corpus_persist, scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    fit_src = emb if fit_filter is None else emb.filter(fit_filter)
    k = _semdedup_k(corpus_value(spark, f"emb_n:{subset}", sf_dir, fit_src.count))
    cents = kmeans_fit_cached(
        spark, sf_dir, fit_src, k=k,
        fit_limit=max(KM_FIT_N, FIT_PER_CLUSTER * k), subset=subset,
    )
    assigned = corpus_persist(
        spark,
        f"semdedup_assigned:{subset}",
        sf_dir,
        lambda: S.with_cluster(emb, "embedding", cents),
    )
    return assigned, cents


def corpus_semdedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c, ida, idb, cos_sim): the corpus's SemDeDup verified-pairs
    surface — capped within-cluster candidates scored and filtered at
    ``SEMDEDUP_T``. Corpus-scoped like ``plans.dedup.corpus_components``:
    the candidate join + cosine verify (the family's heavy stage) runs
    once per corpus per process, and ``embedding_semdedup``,
    ``semdedup_threshold_sweep`` and ``semdedup_survivors`` all consume
    the one frame — exactly as three production jobs would share one
    materialized pair table. Safe for the sweep because every
    SWEEP_THRESHOLDS value is >= SEMDEDUP_T (asserted below): counts
    at any swept threshold only ever involve pairs this frame keeps."""
    from ..operators.cache import corpus_persist
    from ..operators.partitioning import spread

    def build():
        assigned, _ = _fit_and_assign(spark, sf_dir)
        ckeys = assigned.select(F.col("c").cast("int").alias("c"), "vec_id")
        pairs = D.lsh_pairs_from_bands(
            ckeys,
            max_bucket=SEMDEDUP_MAX_CLUSTER,
            keys=("c",),
            id_col="vec_id",
            out=("ida", "idb"),
        )
        nrm = F.sqrt(S.norm_sq(F.col("embedding")))
        a = assigned.select(
            F.col("vec_id").alias("ida"),
            F.col("embedding").alias("va"),
            nrm.alias("na"),
            F.col("c").cast("int").alias("c"),
        )
        b = assigned.select(
            F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"), nrm.alias("nb")
        )
        return (
            spread(pairs, "ida")
            .join(a, "ida")
            .join(b, "idb")
            .withColumn(
                "cos_sim", S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            )
            .filter(F.col("cos_sim") >= SEMDEDUP_T)
            .select("c", "ida", "idb", "cos_sim")
        )

    return corpus_persist(spark, "semdedup_verified", sf_dir, build)


@register(
    "embedding_cluster_stats",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES_SEM}
    SELECT CAST(a.c AS INTEGER) AS c,
           COUNT(*) AS n_vecs,
           CAST(SUM(CAST({_sql_sqdist('a.embedding', 't.cv')} AS DECIMAL(30,6)))
                AS DOUBLE) / COUNT(*) AS mean_sqdist
    FROM afinal a JOIN ctr2 t ON a.c = t.c
    GROUP BY a.c
    """,
    doc="Cluster-occupancy/inertia audit over the fitted k-means "
    "partition — the report SemDeDup-style curation reads before "
    "trusting its clusters: per cluster, member count and the "
    "decimal-exact mean squared distance to the centroid. A skewed "
    "occupancy or an inflated inertia says the fit (or k) is wrong "
    "before any dedup runs — same role lsh_bucket_audit plays for the "
    "hash families. One broadcast join against the k-row centroid "
    "table + one grouped agg.",
    tags=("similarity", "kmeans", "audit"),
)
def embedding_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, cents = _fit_and_assign(spark, sf_dir)
    cent_df = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in cents], "c int, cv array<double>"
    )
    return (
        assigned.withColumn("c", F.col("c").cast("int"))
        .join(F.broadcast(cent_df), "c")
        .withColumn("sqd", S.sq_dist(F.col("embedding"), F.col("cv")))
        .groupBy("c")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.sum(F.col("sqd").cast("decimal(30,6)")).cast("double") / F.count("*")).alias(
                "mean_sqdist"
            ),
        )
    )


@register(
    "embedding_semdedup",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES_SEM},
    cstat AS (
      SELECT c, COUNT(*) AS cct, MIN(vec_id) AS rep FROM afinal GROUP BY c
    ),
    cand AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM afinal a
      JOIN cstat ON a.c = cstat.c AND cstat.cct <= {SEMDEDUP_MAX_CLUSTER}
      JOIN afinal b ON a.c = b.c AND a.vec_id < b.vec_id
      UNION
      SELECT t.rep AS ida, f.vec_id AS idb
      FROM afinal f JOIN cstat t ON f.c = t.c
      WHERE t.cct > {SEMDEDUP_MAX_CLUSTER} AND f.vec_id > t.rep
    ),
    anorm AS (
      SELECT vec_id, c, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    )
    SELECT CAST(a.c AS INTEGER) AS c, cand.ida, cand.idb,
           {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
             AS cos_sim
    FROM cand JOIN anorm a ON cand.ida = a.vec_id
              JOIN anorm b ON cand.idb = b.vec_id
    WHERE {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
            >= {SEMDEDUP_T}
    """,
    doc=f"SemDeDup semantic near-duplicate pairs: cosine >= "
    f"{SEMDEDUP_T} evaluated only within a LEARNED k-means cluster — "
    "the label-free web-scale recipe (embedding_near_dup needs a "
    "ground-truth bucket column; this derives its buckets from the "
    "data). Candidates are an equi-join on the cluster id, capped by "
    f"the same hot-bucket guard as every LSH family (clusters past "
    f"{SEMDEDUP_MAX_CLUSTER} members collapse to min-id "
    "representative pairs, oracle-mirrored — probe-measured 205 s / "
    "20M pairs at 10x without it), so cost is sum(min(cluster, "
    "cap)²), never corpus²; at 100 TB k also grows with the corpus "
    "(the SemDeDup paper's regime, calibrated by "
    "embedding_cluster_stats) and the min-id side of each pair is "
    "the canonical survivor exactly as in the LSH families.",
    tags=("similarity", "kmeans", "dedup"),
)
def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the verified-pairs surface IS this query's output; the normalize-
    # once trick and the capped candidate join live in the shared
    # corpus-scoped build (corpus_semdedup_verified)
    return corpus_semdedup_verified(spark, sf_dir)


# The sweep's candidate thresholds — spans the paper's reported range
# around the shipped SEMDEDUP_T.
SWEEP_THRESHOLDS = (0.45, 0.55, 0.65, 0.75, 0.85)
# The sweep consumes the shared verified-pairs frame, which keeps only
# cos_sim >= SEMDEDUP_T — counts at a swept threshold BELOW that would
# silently miss pairs, so the reuse is only sound under this invariant:
assert min(SWEEP_THRESHOLDS) >= SEMDEDUP_T


@register(
    "semdedup_threshold_sweep",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES_SEM},
    cstat AS (
      SELECT c, COUNT(*) AS cct, MIN(vec_id) AS rep FROM afinal GROUP BY c
    ),
    cand AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM afinal a
      JOIN cstat ON a.c = cstat.c AND cstat.cct <= {SEMDEDUP_MAX_CLUSTER}
      JOIN afinal b ON a.c = b.c AND a.vec_id < b.vec_id
      UNION
      SELECT t.rep AS ida, f.vec_id AS idb
      FROM afinal f JOIN cstat t ON f.c = t.c
      WHERE t.cct > {SEMDEDUP_MAX_CLUSTER} AND f.vec_id > t.rep
    ),
    anorm AS (
      SELECT vec_id, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    ),
    scored AS (
      SELECT cand.ida, cand.idb,
             {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
               AS cos_sim
      FROM cand JOIN anorm a ON cand.ida = a.vec_id
                JOIN anorm b ON cand.idb = b.vec_id
    ),
    t AS (SELECT unnest([{", ".join(str(t) for t in SWEEP_THRESHOLDS)}]) AS thresh)
    SELECT thresh,
           CAST(COALESCE(SUM(CASE WHEN cos_sim >= thresh THEN 1 ELSE 0 END), 0)
             AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN cos_sim >= thresh THEN idb END) AS BIGINT)
             AS docs_pruned
    FROM t LEFT JOIN scored ON TRUE
    GROUP BY thresh
    """,
    doc="Threshold-sensitivity sweep for SemDeDup — the calibration "
    "run that picks SEMDEDUP_T before a corpus-wide dedup ships: for "
    f"each candidate threshold in {SWEEP_THRESHOLDS}, the surviving "
    "near-dup pair count and the number of documents the prune would "
    "remove (distinct non-min pair members). ONE pass over the capped "
    "within-cluster candidate set scores every pair, then a 5-way "
    "literal-array explode fans the thresholds out map-side — cost is "
    "the same single candidate join as embedding_semdedup, never "
    "5 passes, and the fit rides the memoized adaptive-k centroids. "
    "Every threshold reports a row ALWAYS — a corpus where no pair "
    "verifies yields 5 zero rows, not an empty result (both engines "
    "outer-join the literal threshold list for exactly this reason).",
    tags=("similarity", "kmeans", "dedup", "audit"),
)
def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every swept threshold is >= SEMDEDUP_T (asserted at the constant),
    # so the shared verified frame holds every pair any bucket counts
    scored = corpus_semdedup_verified(spark, sf_dir).select("idb", "cos_sim")
    hit = F.col("cos_sim") >= F.col("thresh")
    agg = (
        scored.select(
            "idb",
            "cos_sim",
            F.explode(F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])).alias("thresh"),
        )
        .groupBy("thresh")
        .agg(
            F.sum(hit.cast("bigint")).alias("n_pairs"),
            F.countDistinct(F.when(hit, F.col("idb"))).alias("docs_pruned"),
        )
    )
    # outer-join the literal threshold list: the sweep's row set must
    # not depend on whether anything verified (5 zero rows, never 0
    # rows, when candidates exist but no pair clears SEMDEDUP_T)
    th = spark.createDataFrame(
        [(float(t),) for t in SWEEP_THRESHOLDS], "thresh double"
    )
    return th.join(agg, "thresh", "left").select(
        "thresh",
        F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
        F.coalesce("docs_pruned", F.lit(0).cast("bigint")).alias("docs_pruned"),
    )


@register(
    "semdedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_SQL_KMEANS_CTES_SEM},
    cstat AS (
      SELECT c, COUNT(*) AS cct, MIN(vec_id) AS rep FROM afinal GROUP BY c
    ),
    cand AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb
      FROM afinal a
      JOIN cstat ON a.c = cstat.c AND cstat.cct <= {SEMDEDUP_MAX_CLUSTER}
      JOIN afinal b ON a.c = b.c AND a.vec_id < b.vec_id
      UNION
      SELECT t.rep AS ida, f.vec_id AS idb
      FROM afinal f JOIN cstat t ON f.c = t.c
      WHERE t.cct > {SEMDEDUP_MAX_CLUSTER} AND f.vec_id > t.rep
    ),
    anorm AS (
      SELECT vec_id, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    ),
    pairs AS (
      SELECT cand.ida, cand.idb
      FROM cand JOIN anorm a ON cand.ida = a.vec_id
                JOIN anorm b ON cand.idb = b.vec_id
      WHERE {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
              >= {SEMDEDUP_T}
    ),
    e AS (SELECT ida AS s, idb AS d FROM pairs
          UNION ALL SELECT idb, ida FROM pairs),
    reach(n, r) AS (
      SELECT s, s FROM e
      UNION
      SELECT e.d, reach.r FROM reach JOIN e ON e.s = reach.n
    ),
    comp AS (SELECT n AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY n)
    SELECT vec_id, TRUE AS was_clustered FROM comp WHERE vec_id = cluster_id
    UNION ALL
    SELECT emb.vec_id, FALSE AS was_clustered FROM embeddings emb
    WHERE emb.vec_id NOT IN (SELECT vec_id FROM comp)
    """,
    doc="The SemDeDup recipe's actual output — the pruned embedding "
    "corpus: every vector not in any semantic near-dup group, plus one "
    "canonical min-id representative per group. Same composition as "
    "dedup_survivors (pairs -> connected components -> one doc-keyed "
    "left join against the corpus), with the pair stage being "
    "embedding_semdedup's capped within-cluster join — so the whole "
    "chain stays bounded at 100 TB for the same reasons, and the "
    "min-id canonicalization matches every other dedup family.",
    tags=("similarity", "kmeans", "dedup", "graph"),
)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    verified = corpus_semdedup_verified(spark, sf_dir).select("ida", "idb")
    comp = connected_components(verified, "ida", "idb", num_partitions=8)
    vecs = load_tables(spark, sf_dir, "embeddings")["embeddings"].select("vec_id")
    return (
        vecs.join(comp, vecs["vec_id"] == comp["node"], "left")
        .filter(F.col("node").isNull() | (F.col("node") == F.col("comp")))
        .select("vec_id", F.col("node").isNotNull().alias("was_clustered"))
    )


# The oracle below interpolates plans.dedup.NEW_MOD so engine and
# oracle can never disagree on the new/corpus split.


@register(
    "embedding_incremental_near_dup",
    oracle=f"""
    WITH {_sql_kmeans_ctes_subset(f"vec_id % {NEW_MOD} != 0")},
    cstat AS (
      SELECT c, COUNT(*) AS cct, MIN(vec_id) AS rep
      FROM afinal WHERE vec_id % {NEW_MOD} != 0 GROUP BY c
    ),
    cand AS (
      SELECT n.vec_id AS ida, s.vec_id AS idb
      FROM afinal n
      JOIN afinal s ON n.c = s.c
      JOIN cstat ON s.c = cstat.c
      WHERE n.vec_id % {NEW_MOD} = 0 AND s.vec_id % {NEW_MOD} != 0
        AND (cstat.cct <= {SEMDEDUP_MAX_CLUSTER} OR s.vec_id = cstat.rep)
    ),
    anorm AS (
      SELECT vec_id, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    )
    SELECT cand.ida, cand.idb,
           {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
             AS cos_sim
    FROM cand JOIN anorm a ON cand.ida = a.vec_id
              JOIN anorm b ON cand.idb = b.vec_id
    WHERE {SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
            >= {SEMDEDUP_T}
    """,
    doc="Incremental SemDeDup — the embedding twin of "
    "dedup_incremental's continuous-ingest shape: an incoming vector "
    "batch (vec_id % 5 == 0 stands in for 'today's embeddings') is "
    "checked against the stored corpus by assigning BOTH sides with "
    "centroids fit on the STORED side only (production fits the "
    "quantizer at bootstrap and assigns forever; k and the fit sample "
    "scale with the stored corpus), then cosine-verifying only "
    "new-vs-corpus candidates within a shared cluster. The corpus "
    "side of a hot cluster collapses to its min-id representative — "
    "the same corpus-side cap as lsh_candidates_against — so cost is "
    "proportional to the batch and its cluster overlap, never "
    "corpus².",
    tags=("similarity", "kmeans", "dedup", "incremental"),
)
def embedding_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import spread
    from .dedup import NEW_MOD

    assigned, _ = _fit_and_assign(
        spark, sf_dir, fit_filter=F.col("vec_id") % NEW_MOD != 0, subset="corpus"
    )
    nrm = F.sqrt(S.norm_sq(F.col("embedding")))
    corp_k = S.keep_cluster_reps(
        assigned.filter(F.col("vec_id") % NEW_MOD != 0), SEMDEDUP_MAX_CLUSTER
    ).select("c", F.col("vec_id").alias("idb"), F.col("embedding").alias("vb"), nrm.alias("nb"))
    new_a = assigned.filter(F.col("vec_id") % NEW_MOD == 0).select(
        "c", F.col("vec_id").alias("ida"), F.col("embedding").alias("va"), nrm.alias("na")
    )
    return (
        spread(new_a, "ida")
        .join(corp_k, "c")
        .withColumn("cos_sim", S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos_sim") >= SEMDEDUP_T)
        .select("ida", "idb", "cos_sim")
    )


# -- named corpus-scoped setups (bench ledger lines; see catalog.SETUPS)


@register_setup("ivf_kmeans_assignment")
def _setup_ivf_kmeans_assignment(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the fixed-k IVF quantizer fit + full-corpus cluster
    assignment the four IVF retrieval queries share."""
    ivf_assigned_cached(spark, sf_dir).count()


@register_setup("semdedup_pairs")
def _setup_semdedup_pairs(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the SemDeDup surface: adaptive-k fit, corpus
    assignment, and the verified within-cluster pair table the
    embedding_semdedup/sweep/survivors family consumes."""
    corpus_semdedup_verified(spark, sf_dir).count()


# -- product quantization (PQ) -------------------------------------------

PQ_M = 8  # subvectors per embedding (dim 64 -> 8-dim subspaces)
PQ_KS = 16  # codebook entries per subspace: 8 codes/vector = 32x vs float32
PQ_DIM = 64  # fixture embedding dim; at scale read from the schema
_PQ_DSUB = PQ_DIM // PQ_M


def _sql_pq_assign(src: str, ctr: str, out: str) -> str:
    """One PQ assignment round: nearest codebook entry per (vector,
    subspace) by squared L2, ties to the lowest code — the subspaced
    twin of _sql_assign, carrying the winning squared subdistance
    (sd) the way operators.similarity.pq_assign carries sub_err."""
    return f"""
    d_{out} AS (
      SELECT p.vec_id, p.j, p.sv, s.c,
             {_sql_sqdist('p.sv', 's.cv')} AS sd,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id, p.j
                                ORDER BY {_sql_sqdist('p.sv', 's.cv')}, s.c) AS rn
      FROM {src} p JOIN {ctr} s ON p.j = s.j
    ),
    {out} AS (SELECT vec_id, j, sv, c, sd FROM d_{out} WHERE rn = 1)"""


def _sql_pq_recompute(a_name: str, ctr_name: str) -> str:
    """Per-(subspace, cluster) centroid update — element-wise decimal
    mean, list rebuilt in position order (the _sql_recompute recipe
    with the subspace key added)."""
    return f"""
    m_{ctr_name} AS (
      SELECT j, c, x.pos AS pos,
             CAST(SUM(CAST(CAST(x.v AS DOUBLE) AS {_DEC})) AS DOUBLE) / COUNT(*) AS mv
      FROM (SELECT j, c,
                   unnest(list_transform(range(1, len(sv) + 1),
                          i -> {{'pos': i, 'v': sv[i]}})) AS x
            FROM {a_name})
      GROUP BY j, c, x.pos
    ),
    {ctr_name} AS (SELECT j, c, list(mv ORDER BY pos) AS cv FROM m_{ctr_name} GROUP BY j, c)"""


def _sql_pq_ctes_from(src: str, p: str) -> str:
    """The full PQ chain (sample fit -> 2 Lloyd rounds per subspace ->
    corpus code assignment) over ``src`` (any (vec_id, embedding) CTE
    or table), CTE names prefixed by ``p`` so one query can quantize
    several sources — raw embeddings for the flat-PQ family, coarse
    IVF residuals for the IVF-PQ family."""
    return f"""
    {p}fit AS (SELECT vec_id, embedding FROM {src} ORDER BY vec_id LIMIT {KM_FIT_N}),
    {p}jj AS (SELECT unnest(range(0, {PQ_M})) AS j),
    {p}sub AS MATERIALIZED (
      SELECT vec_id, j,
             list_slice(embedding, j * {_PQ_DSUB} + 1, (j + 1) * {_PQ_DSUB}) AS sv
      FROM {p}fit, {p}jj
    ),
    {p}seeds AS (
      SELECT j, rn - 1 AS c, sv AS cv
      FROM (SELECT j, sv, ROW_NUMBER() OVER (PARTITION BY j ORDER BY vec_id) AS rn
            FROM {p}sub)
      WHERE rn <= {PQ_KS}
    ),
    {_sql_pq_assign(f'{p}sub', f'{p}seeds', f'{p}a0')},
    {_sql_pq_recompute(f'{p}a0', f'{p}ctr1')},
    {_sql_pq_assign(f'{p}sub', f'{p}ctr1', f'{p}a1')},
    {_sql_pq_recompute(f'{p}a1', f'{p}ctr2')},
    {p}all AS (
      SELECT vec_id, j,
             list_slice(embedding, j * {_PQ_DSUB} + 1, (j + 1) * {_PQ_DSUB}) AS sv
      FROM {src}, {p}jj
    ),
    {_sql_pq_assign(f'{p}all', f'{p}ctr2', f'{p}codes_raw')},
    {p}codes AS MATERIALIZED (SELECT vec_id, j, c, sd FROM {p}codes_raw)
"""


_SQL_PQ_CTES = _sql_pq_ctes_from("embeddings", "p")


def _l2_brute_topk(emb: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Exact squared-L2 brute-force top-k (qid, cid) — the ground
    truth every quantization recall audit measures against. ONE
    definition (self-review r13: three copies had grown in this file):
    broadcast-probe cross join over the spread corpus, ascending
    (l2, cid) window. The cartesian is the documented allowed baseline
    — linear in corpus at the fixed probe count."""
    from pyspark.sql import Window as W

    from ..operators.partitioning import spread

    corpus = spread(
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")),
        "cid",
    )
    scored = (
        corpus.crossJoin(F.broadcast(probes))
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("l2", S.sq_dist(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("qid").orderBy(F.col("l2").asc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "cid")
    )


def _recall_rows(brute: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """(qid, hit_ct, recall): the per-probe hit count of ``approx``
    (qid, cid) against the brute-force truth — the shared tail of the
    recall audits."""
    top_r = approx.select(F.col("qid").alias("iqid"), F.col("cid").alias("icid"))
    return (
        brute.join(
            top_r,
            (F.col("qid") == F.col("iqid")) & (F.col("cid") == F.col("icid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("icid").alias("hit_ct"),
            (F.count("icid") / F.lit(float(k))).alias("recall"),
        )
    )


def pq_fit_cached(spark: SparkSession, sf_dir: str, emb: DataFrame):
    return corpus_value(
        spark,
        f"pq_fit:{PQ_M}:{PQ_KS}:{KM_FIT_N}",
        sf_dir,
        lambda: S.pq_fit(
            emb, PQ_DIM, m=PQ_M, ks=PQ_KS, iters=KM_ITERS, fit_limit=KM_FIT_N
        ),
    )


def pq_codes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, j, c, sub_err): the corpus under the PQ code
    assignment — corpus-scoped like ivf_assigned_cached; both PQ
    queries consume the one frame."""
    from ..operators.cache import corpus_persist, scoped_persist

    def build():
        emb = scoped_persist(load_tables(spark, sf_dir, "embeddings")["embeddings"])
        cents = pq_fit_cached(spark, sf_dir, emb)
        return S.pq_codes(emb, cents, PQ_DIM, PQ_M)

    return corpus_persist(spark, "pq_codes", sf_dir, build)


_SQL_PQ_RECON = "CAST(SUM(CAST(sd AS DECIMAL(30,6))) AS DOUBLE)"
_SQL_PQ_AVG_ERR = "CAST(SUM(CAST(recon_sq_err AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)"


@register(
    "embedding_pq_audit",
    oracle=f"""
    WITH {_SQL_PQ_CTES},
    pv AS (
      SELECT vec_id, {_SQL_PQ_RECON} AS recon_sq_err,
             CAST(SUM(c) AS BIGINT) AS code_sum_v
      FROM pcodes GROUP BY vec_id
    )
    SELECT e.label,
           COUNT(*) AS vec_ct,
           CAST(SUM(code_sum_v) AS BIGINT) AS code_sum,
           {_SQL_PQ_AVG_ERR} AS avg_recon_err,
           MAX(recon_sq_err) AS max_recon_err
    FROM pv JOIN embeddings e USING (vec_id)
    GROUP BY e.label
    """,
    doc=f"Product-quantization storage audit — the next rung down the "
    f"embedding-store ladder after embedding_quantize's int8 (r12 "
    f"VERDICT #3): each vector becomes {PQ_M} codebook codes "
    f"({PQ_KS}-entry codebooks fit per subspace by the same "
    f"deterministic decimal-exact Lloyd recipe as the IVF fit, "
    f"trained for all subspaces in the same passes), a "
    f"{4 * PQ_DIM // PQ_M}x shrink vs float32 and 8x past int8. The "
    f"audit pins every code cross-engine (integer code checksum per "
    f"label) plus the quantization price actually paid: per-vector "
    f"squared reconstruction error (decimal-accumulated over the "
    f"m subspace terms, order-insensitive), averaged decimal-exact "
    f"per label. Scale: fit is sample-bounded, the corpus pass is "
    f"one broadcast-codebook join — map-shaped.",
    tags=("similarity", "quantization", "llm-prep", "sketch"),
)
def embedding_pq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import exact_avg, exact_sum

    t = load_tables(spark, sf_dir, "embeddings")
    codes = pq_codes_cached(spark, sf_dir)
    per_vec = codes.groupBy("vec_id").agg(
        exact_sum(F.col("sub_err")).alias("recon_sq_err"),
        F.sum("c").cast("long").alias("code_sum_v"),
    )
    return (
        per_vec.join(t["embeddings"].select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("vec_ct"),
            F.sum("code_sum_v").cast("long").alias("code_sum"),
            exact_avg(F.col("recon_sq_err")).alias("avg_recon_err"),
            F.max("recon_sq_err").alias("max_recon_err"),
        )
    )


@register(
    "ann_recall_pq",
    oracle=f"""
    WITH {_SQL_PQ_CTES},
    pqprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {N_PROBES}
    ),
    plut AS (
      SELECT qid, s.j, s.c,
             {_sql_sqdist("list_slice(qv, s.j * " + str(_PQ_DSUB) + " + 1, (s.j + 1) * " + str(_PQ_DSUB) + ")", 's.cv')} AS pd
      FROM pqprobes, pctr2 s
    ),
    pscored AS (
      SELECT l.qid, k.vec_id AS cid,
             CAST(SUM(CAST(l.pd AS {_DEC})) AS DOUBLE) AS adc_dist
      FROM pcodes k JOIN plut l ON k.j = l.j AND k.c = l.c
      WHERE k.vec_id != l.qid
      GROUP BY l.qid, k.vec_id
    ),
    pranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, cid) AS rn
      FROM pscored
    ),
    pqtop AS (SELECT qid, cid FROM pranked WHERE rn <= {TOP_K}),
    pbscored AS (
      SELECT qid, vec_id AS cid, {_sql_sqdist('qv', 'embedding')} AS l2
      FROM embeddings CROSS JOIN pqprobes
      WHERE vec_id != qid
    ),
    pbranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2, cid) AS rn
      FROM pbscored
    ),
    pbrute AS (SELECT qid, cid FROM pbranked WHERE rn <= {TOP_K})
    SELECT b.qid,
           COUNT(i.cid) AS hit_ct,
           COUNT(i.cid) / {TOP_K}.0 AS recall
    FROM pbrute b LEFT JOIN pqtop i ON b.qid = i.qid AND b.cid = i.cid
    GROUP BY b.qid
    """,
    doc="PQ retrieval-quality audit — recall@k of ADC top-k (float "
    "probe, code-table corpus: per probe an m x ks lookup table of "
    "partial squared distances, each corpus vector scored by m table "
    "lookups summed DECIMAL-exact so the ranking is oracle-derivable) "
    "against the exact squared-L2 brute-force ranking — L2 both "
    "sides, so the number isolates the quantization loss, not a "
    "metric mismatch. Completes the ladder: embedding_pq_audit pins "
    "the codes and their reconstruction price, this pins what those "
    "codes cost in retrieval. Scale: LUT is probes x m x ks "
    "(broadcast); corpus cost is one broadcast join over the code "
    "table + a (qid, cid) sum — the corpus floats are never read at "
    "query time.",
    tags=("similarity", "ann", "quantization", "audit"),
)
def ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    cents = pq_fit_cached(spark, sf_dir, emb)
    codes = pq_codes_cached(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pq_top = S.pq_adc_topk(probes, codes, cents, PQ_DIM, PQ_M, TOP_K).select(
        "qid", "cid"
    )
    # exact L2 brute force (metric-matched to ADC)
    return _recall_rows(_l2_brute_topk(emb, probes, TOP_K), pq_top, TOP_K)


def _seed_pq_fits_joint(spark: SparkSession, sf_dir: str) -> None:
    """Seed BOTH the flat-PQ and the residual-PQ codebook memos from
    ONE shared Lloyd pass (r13 VERDICT #6: the two separate
    ``S.pq_fit`` calls were re-running the same driver-round-trip loop
    twice per bench run). ``pq_fit_multi`` keys every stage by a
    source tag, so each returned codebook is bit-identical to its
    standalone fit — certified oracle values are untouched. No-op when
    both memos are already warm."""
    from ..operators.cache import corpus_value, has_corpus_value, scoped_persist

    flat_key = f"pq_fit:{PQ_M}:{PQ_KS}:{KM_FIT_N}"
    rsd_key = f"ivfpq_fit:{PQ_M}:{PQ_KS}:{KM_FIT_N}"
    if has_corpus_value(spark, flat_key, sf_dir) and has_corpus_value(
        spark, rsd_key, sf_dir
    ):
        return
    emb = scoped_persist(load_tables(spark, sf_dir, "embeddings")["embeddings"])
    fits = S.pq_fit_multi(
        {"flat": emb, "rsd": ivfpq_residuals_cached(spark, sf_dir)},
        PQ_DIM,
        m=PQ_M,
        ks=PQ_KS,
        iters=KM_ITERS,
        fit_limit=KM_FIT_N,
    )
    corpus_value(spark, flat_key, sf_dir, lambda: fits["flat"])
    corpus_value(spark, rsd_key, sf_dir, lambda: fits["rsd"])


@register_setup("pq_codebooks")
def _setup_pq_codebooks(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the PQ fit + full-corpus code table the two PQ
    queries share; the fit itself rides the joint Lloyd pass that
    also seeds the residual codebooks (ivfpq_codebooks then only
    pays its code table)."""
    _seed_pq_fits_joint(spark, sf_dir)
    pq_codes_cached(spark, sf_dir).count()


PQ_RERANK_POOL = 8 * TOP_K  # ADC shortlist size feeding the exact re-rank


@register(
    "ann_recall_pq_rerank",
    oracle=f"""
    WITH {_SQL_PQ_CTES},
    pqprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {N_PROBES}
    ),
    plut AS (
      SELECT qid, s.j, s.c,
             {_sql_sqdist("list_slice(qv, s.j * " + str(_PQ_DSUB) + " + 1, (s.j + 1) * " + str(_PQ_DSUB) + ")", 's.cv')} AS pd
      FROM pqprobes, pctr2 s
    ),
    pscored AS (
      SELECT l.qid, k.vec_id AS cid,
             CAST(SUM(CAST(l.pd AS {_DEC})) AS DOUBLE) AS adc_dist
      FROM pcodes k JOIN plut l ON k.j = l.j AND k.c = l.c
      WHERE k.vec_id != l.qid
      GROUP BY l.qid, k.vec_id
    ),
    pranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc_dist, cid) AS rn
      FROM pscored
    ),
    pshort AS (SELECT qid, cid FROM pranked WHERE rn <= {PQ_RERANK_POOL}),
    prr AS (
      SELECT p.qid, s.cid, {_sql_sqdist('p.qv', 'e.embedding')} AS l2
      FROM pshort s JOIN pqprobes p ON s.qid = p.qid
                    JOIN embeddings e ON s.cid = e.vec_id
    ),
    prrk AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2, cid) AS rn
      FROM prr
    ),
    ptop AS (SELECT qid, cid FROM prrk WHERE rn <= {TOP_K}),
    pbscored AS (
      SELECT qid, vec_id AS cid, {_sql_sqdist('qv', 'embedding')} AS l2
      FROM embeddings CROSS JOIN pqprobes
      WHERE vec_id != qid
    ),
    pbranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2, cid) AS rn
      FROM pbscored
    ),
    pbrute AS (SELECT qid, cid FROM pbranked WHERE rn <= {TOP_K})
    SELECT b.qid,
           COUNT(i.cid) AS hit_ct,
           COUNT(i.cid) / {TOP_K}.0 AS recall
    FROM pbrute b LEFT JOIN ptop i ON b.qid = i.qid AND b.cid = i.cid
    GROUP BY b.qid
    """,
    doc=f"The production PQ serving recipe, certified end to end: ADC "
    f"retrieves a {PQ_RERANK_POOL}-candidate shortlist from the code "
    f"table alone (corpus floats untouched), then ONLY those "
    f"{PQ_RERANK_POOL} vectors are read back for an exact squared-L2 "
    f"re-rank — the standard two-stage IVF/PQ pipeline, where the "
    f"float read cost is k-pool-bounded per probe instead of "
    f"corpus-bounded. Measured against the same brute-force truth as "
    f"ann_recall_pq: the delta between the two rows is exactly what "
    f"re-ranking buys back from hard quantization (measured at "
    f"sf0.01: raw ADC 0.30, re-ranked 0.53/0.78/0.88 at pools "
    f"20/40/80 — the pool is the knob, priced per probe). Oracle "
    f"re-derives codebooks, shortlist and re-rank bit-for-bit.",
    tags=("similarity", "ann", "quantization", "audit"),
)
def ann_recall_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    cents = pq_fit_cached(spark, sf_dir, emb)
    codes = pq_codes_cached(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    short = S.pq_adc_topk(probes, codes, cents, PQ_DIM, PQ_M, PQ_RERANK_POOL).select(
        "qid", "cid"
    )
    # exact re-rank over the shortlist only: pool-bounded float reads
    rr = (
        short.join(F.broadcast(probes), "qid")
        .join(
            emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")),
            "cid",
        )
        .withColumn("l2", S.sq_dist(F.col("qv"), F.col("cv")))
    )
    w = W.partitionBy("qid").orderBy(F.col("l2").asc(), F.col("cid").asc())
    top = (
        rr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "cid")
    )
    return _recall_rows(_l2_brute_topk(emb, probes, TOP_K), top, TOP_K)


# -- IVF-PQ: residual product quantization inside the coarse cells -------
#
# The FAISS IVFPQ composition, certified end to end: the fixed-k IVF
# fit partitions the corpus into cells, each vector is re-expressed as
# its RESIDUAL to its cell centroid, and the PQ codebooks are fit on
# (and the codes assigned over) those residuals — quantization spends
# its bits on the within-cell distribution where the variance lives.
# Query time = coarse routing (nprobe cells) + residual LUT + ADC over
# the probed cells' code rows only: per probe the cost is nprobe
# bucket-sized integer scans, never the corpus, and never a float read.

IVFPQ_NPROBE = NPROBE_P

_SQL_IVFPQ_RSD = f"""
    rsd AS MATERIALIZED (
      SELECT a.vec_id,
             list_transform(range(1, {PQ_DIM} + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) - t.cv[i]) AS embedding,
             a.c AS c0
      FROM afinal a JOIN ctr2 t ON a.c = t.c
    )"""

# coarse routing + per-(probe, cell) residual LUT + ADC scoring — the
# shared tail of both IVF-PQ oracles
_SQL_IVFPQ_SCORED = f"""
    qc AS (SELECT k.vec_id, k.j, k.c, r.c0 FROM qcodes k JOIN rsd r USING (vec_id)),
    iprobes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE vec_id < {N_PROBES}
    ),
    pcell AS (
      SELECT qid, c0, cv FROM (
        SELECT p.qid, s.c AS c0, s.cv,
               ROW_NUMBER() OVER (PARTITION BY p.qid
                                  ORDER BY {_sql_sqdist('p.qv', 's.cv')}, s.c) AS rn
        FROM iprobes p CROSS JOIN ctr2 s)
      WHERE rn <= {IVFPQ_NPROBE}
    ),
    qres AS (
      SELECT pc.qid, pc.c0,
             list_transform(range(1, {PQ_DIM} + 1),
                  i -> CAST(p.qv[i] AS DOUBLE) - pc.cv[i]) AS rv
      FROM pcell pc JOIN iprobes p ON pc.qid = p.qid
    ),
    qlut AS (
      SELECT r.qid, r.c0, s.j, s.c,
             {_sql_sqdist(f"list_slice(r.rv, s.j * {_PQ_DSUB} + 1, (s.j + 1) * {_PQ_DSUB})", 's.cv')} AS pd
      FROM qres r, qctr2 s
    ),
    scored AS (
      SELECT l.qid, k.vec_id AS cid,
             CAST(SUM(CAST(l.pd AS {_DEC})) AS DOUBLE) AS adc_dist
      FROM qc k JOIN qlut l ON k.c0 = l.c0 AND k.j = l.j AND k.c = l.c
      WHERE k.vec_id != l.qid
      GROUP BY 1, 2
    )"""


def ivfpq_residuals_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding=residual double[], c0): the corpus residuals
    to the fixed-k coarse fit — corpus-scoped; the fit, code and both
    query consumers share one frame."""
    from ..operators.cache import corpus_persist

    def build():
        assigned = ivf_assigned_cached(spark, sf_dir)
        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        cents = kmeans_fit_cached(spark, sf_dir, emb)
        return S.ivfpq_residuals(assigned, cents)

    return corpus_persist(spark, "ivfpq_residuals", sf_dir, build)


def ivfpq_fit_cached(spark: SparkSession, sf_dir: str):
    rsd = ivfpq_residuals_cached(spark, sf_dir)
    return corpus_value(
        spark,
        f"ivfpq_fit:{PQ_M}:{PQ_KS}:{KM_FIT_N}",
        sf_dir,
        lambda: S.pq_fit(
            rsd, PQ_DIM, m=PQ_M, ks=PQ_KS, iters=KM_ITERS, fit_limit=KM_FIT_N
        ),
    )


def ivfpq_codes_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, j, c, sub_err, c0): the corpus under the residual-PQ
    code assignment, each row carrying its owning coarse cell — the
    integer store IVF-PQ serves from."""
    from ..operators.cache import corpus_persist

    def build():
        rsd = ivfpq_residuals_cached(spark, sf_dir)
        cents = ivfpq_fit_cached(spark, sf_dir)
        return S.pq_codes(rsd, cents, PQ_DIM, PQ_M).join(
            rsd.select("vec_id", "c0"), "vec_id"
        )

    return corpus_persist(spark, "ivfpq_codes", sf_dir, build)


@register_setup("ivfpq_codebooks")
def _setup_ivfpq_codebooks(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the coarse fit, residual store, residual-PQ fit and
    cell-tagged code table the two IVF-PQ queries share."""
    ivfpq_codes_cached(spark, sf_dir).count()


@register(
    "ann_topk_ivfpq",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    {_SQL_IVFPQ_RSD},
    {_sql_pq_ctes_from('rsd', 'q')},
    {_SQL_IVFPQ_SCORED}
    SELECT qid, cid, adc_dist, CAST(rn AS INTEGER) AS rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY adc_dist, cid) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
    doc=f"IVF-PQ ADC retrieval — the FAISS IVFPQ serving path as one "
    f"plan: each probe routes to its {IVFPQ_NPROBE} nearest coarse "
    "cells, takes its residual to EACH probed centroid (||q - x_hat|| "
    "= ||r_q - r_x_hat|| within a shared cell), builds the m x ks "
    "residual lookup table, and ADC-scores ONLY the probed cells' "
    "code rows — per probe the candidate cost is nprobe bucket-sized "
    "integer scans; the corpus floats are never read at query time. "
    "The oracle re-derives the coarse fit, every residual, the "
    "residual codebooks, the routing and the decimal-exact ADC "
    "ranking bit-for-bit. Scale: fit sample-bounded, code table one "
    "map-shaped corpus pass, LUT probes x nprobe x m x ks (broadcast), "
    "scoring one broadcast join + (qid, cid) sum — linear in the "
    "probed cells' codes.",
    tags=("similarity", "ann", "kmeans", "quantization"),
)
def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    coarse = kmeans_fit_cached(spark, sf_dir, emb)
    pq_cents = ivfpq_fit_cached(spark, sf_dir)
    codes = ivfpq_codes_cached(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return S.ivfpq_adc_topk(
        probes, codes, coarse, pq_cents, PQ_DIM, PQ_M, TOP_K, IVFPQ_NPROBE
    )


@register(
    "ann_recall_ivfpq",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    {_SQL_IVFPQ_RSD},
    {_sql_pq_ctes_from('rsd', 'q')},
    {_SQL_IVFPQ_SCORED},
    itop AS (
      SELECT qid, cid
      FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
                                                ORDER BY adc_dist, cid) AS rn
            FROM scored)
      WHERE rn <= {TOP_K}
    ),
    bscored AS (
      SELECT qid, vec_id AS cid, {_sql_sqdist('qv', 'embedding')} AS l2
      FROM embeddings CROSS JOIN iprobes
      WHERE vec_id != qid
    ),
    brute AS (
      SELECT qid, cid
      FROM (SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
                                                ORDER BY l2, cid) AS rn
            FROM bscored)
      WHERE rn <= {TOP_K}
    )
    SELECT b.qid,
           COUNT(i.cid) AS hit_ct,
           COUNT(i.cid) / {TOP_K}.0 AS recall
    FROM brute b LEFT JOIN itop i ON b.qid = i.qid AND b.cid = i.cid
    GROUP BY b.qid
    """,
    doc="IVF-PQ retrieval-quality audit — recall@k of the full "
    "composed pipeline (coarse routing x residual quantization) "
    "against the exact squared-L2 brute-force ranking. Reading it "
    "next to ann_recall_nprobe (routing loss alone) and ann_recall_pq "
    "(quantization loss alone) decomposes exactly where the composed "
    "system loses candidates — the calibration read FAISS users do "
    "before picking nprobe and m. Oracle re-derives both rankings "
    "bit-for-bit; the brute baseline is the documented allowed "
    "cartesian, the IVF-PQ side never leaves bucket-sized joins.",
    tags=("similarity", "ann", "kmeans", "quantization", "audit"),
)
def ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "embeddings")
    emb = scoped_persist(t["embeddings"])
    coarse = kmeans_fit_cached(spark, sf_dir, emb)
    pq_cents = ivfpq_fit_cached(spark, sf_dir)
    codes = ivfpq_codes_cached(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    ivfpq_top = S.ivfpq_adc_topk(
        probes, codes, coarse, pq_cents, PQ_DIM, PQ_M, TOP_K, IVFPQ_NPROBE
    ).select("qid", "cid")
    return _recall_rows(_l2_brute_topk(emb, probes, TOP_K), ivfpq_top, TOP_K)


# -- reciprocal-rank fusion: the hybrid-retrieval serving pattern --------

RRF_K = 60  # the standard RRF dampening constant (Cormack et al.)


@register(
    "ann_rrf_fusion",
    oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    {_SQL_NPROBE_PC},
    iscored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN pc ON a.c = pc.c
      WHERE a.vec_id != qid
    ),
    iranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM iscored
    ),
    itop AS (SELECT qid, cid, rn FROM iranked WHERE rn <= {TOP_K}),
    {SQL_RHP_SIGS},
    rcand AS (
      SELECT DISTINCT a.vec_id AS qid, b.vec_id AS cid
      FROM sigs a JOIN sigs b
        ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id != b.vec_id
      WHERE a.vec_id < {N_PROBES}
    ),
    rscored AS (
      SELECT qid, cid,
             {_sql_cosine('ea.embedding', 'eb.embedding')} AS cos_sim
      FROM rcand JOIN embeddings ea ON qid = ea.vec_id
                 JOIN embeddings eb ON cid = eb.vec_id
    ),
    rranked AS (
      SELECT qid, cid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM rscored
    ),
    rtop AS (SELECT qid, cid, rn FROM rranked WHERE rn <= {TOP_K}),
    fused AS (
      SELECT COALESCE(i.qid, r.qid) AS qid,
             COALESCE(i.cid, r.cid) AS cid,
             COALESCE(1.0 / ({RRF_K} + i.rn), 0.0)
               + COALESCE(1.0 / ({RRF_K} + r.rn), 0.0) AS rrf_score
      FROM itop i FULL OUTER JOIN rtop r
        ON i.qid = r.qid AND i.cid = r.cid
    )
    SELECT qid, cid, rrf_score, CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY rrf_score DESC, cid) AS rk
          FROM fused)
    WHERE rk <= {TOP_K}
    """,
    doc=f"Reciprocal-rank fusion of two independent ANN rankings — the "
    f"hybrid-retrieval serving pattern (RRF, Cormack et al.: score = "
    f"sum over systems of 1/({RRF_K} + rank), rank-only so incomparable "
    "scores never need calibration). Fuses the multi-probe IVF ranking "
    "with the RHP-LSH ranking for the same probes: a candidate "
    "surfaced by either system scores on its ranks (absent rank "
    "contributes 0 via COALESCE), ties to the smaller id. Every term "
    "is one int division + one fixed-order add — bit-identical "
    "cross-engine, both input rankings already certified exact. "
    "Scale: both inputs are bucket-join rankings (never a corpus "
    "scan); the fusion itself is a full outer join of two "
    "k-per-probe frames + a per-probe window — probe-bounded, "
    "corpus-size-free. The same fusion fuses bm25_topk with a dense "
    "ranking when the query side is text (hybrid search); this "
    "instance certifies the operator on id-aligned rankings.",
    tags=("similarity", "ann", "search", "fusion"),
)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist

    assigned = ivf_assigned_cached(spark, sf_dir)
    cents = kmeans_fit_cached(spark, sf_dir, assigned)
    probes = assigned.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pc = S.probe_clusters(probes, cents, NPROBE_P)
    corpus = assigned.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.col("c").alias("clabel"),
    )
    itop = S.topk_neighbors(pc, corpus, TOP_K, bucket=True).select(
        "qid", "cid", F.col("rn").alias("rn_i")
    )
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    sigs = scoped_persist(S.rhp_band_sigs(emb, dim=RHP_DIM))
    a = sigs.filter(F.col("vec_id") < N_PROBES).alias("a")
    b = sigs.alias("b")
    rcand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("qid"), F.col("b.vec_id").alias("cid"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    eb = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    rscored = rcand.join(ea, "qid").join(eb, "cid").withColumn(
        "cos_sim", S.cosine(F.col("qv"), F.col("cv"))
    )
    wr = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    rtop = (
        rscored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= TOP_K)
        .select("qid", "cid", F.col("rn").alias("rn_r"))
    )
    fused = itop.join(rtop, ["qid", "cid"], "full_outer").select(
        "qid",
        "cid",
        (
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rn_i")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rn_r")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    wf = W.partitionBy("qid").orderBy(F.col("rrf_score").desc(), F.col("cid"))
    return (
        fused.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= TOP_K)
        .select("qid", "cid", "rrf_score", "rk")
    )


# -- Matryoshka truncation audit + contrastive hard-negative mining (r15) --

#: Truncated prefix widths audited against the full-width ranking —
#: nested prefixes, the Matryoshka (Kusupati et al.) serving knob:
#: retrieval at width d costs d/64 of the flops and bytes.
MRL_DIMS = (16, 32)


def _sql_mrl_topk(name: str, d: int) -> str:
    sliced_q = f"list_slice(qv, 1, {d})"
    sliced_c = f"list_slice(embedding, 1, {d})"
    return f"""{name} AS (
      SELECT qid, cid FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY {_sql_cosine(sliced_q, sliced_c)} DESC,
                                           vec_id) AS rn
        FROM embeddings CROSS JOIN probes
        WHERE vec_id != qid
      ) WHERE rn <= {TOP_K}
    )"""


@register(
    "ann_recall_matryoshka",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ),
    bf AS (
      SELECT qid, cid FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY {_sql_cosine('qv', 'embedding')} DESC,
                                           vec_id) AS rn
        FROM embeddings CROSS JOIN probes
        WHERE vec_id != qid
      ) WHERE rn <= {TOP_K}
    ),
    {", ".join(_sql_mrl_topk(f"m{d}", d) for d in MRL_DIMS)},
    tot AS (SELECT COUNT(*) AS bf_ct FROM bf)
    {" UNION ALL ".join(
        f'''SELECT {d} AS trunc_dim,
           (SELECT COUNT(*) FROM bf JOIN m{d} USING (qid, cid)) AS hit_sum,
           CAST((SELECT COUNT(*) FROM bf JOIN m{d} USING (qid, cid)) AS DOUBLE)
             / (SELECT bf_ct FROM tot) AS recall'''
        for d in MRL_DIMS
    )}
    """,
    doc=f"Matryoshka truncation audit (Kusupati et al.): retrieval "
    f"recall@{TOP_K} when embeddings are truncated to their first "
    f"{' / '.join(str(d) for d in MRL_DIMS)} dimensions, measured "
    "against the full-width brute ranking — the number that decides "
    "how much of the vector a serving tier can drop (width d costs "
    "d/64 of the flops, bytes and index size; MRL-trained embeddings "
    "hold recall at small d, generic ones — like this fixture's — "
    "pay, and THAT is what the audit surfaces before anyone ships a "
    "truncated index). hit_sum is an exact join count and recall one "
    "double division, so both engines agree to the bit. Scale: each "
    "rung is the probe-bounded brute shape (broadcast probes, one "
    "linear corpus pass at the truncated width) — the audit runs on a "
    "probe SAMPLE by construction, never corpus x corpus.",
    tags=("similarity", "ann", "audit", "quantize"),
)
def ann_recall_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    bf = scoped_persist(
        S.topk_neighbors(
            probes.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")),
            emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")),
            TOP_K,
        ).select("qid", "cid")
    )
    per_dim = []
    for d in MRL_DIMS:
        top_d = S.topk_neighbors(
            probes.select(
                F.col("vec_id").alias("qid"),
                F.slice(F.col("embedding"), 1, d).alias("qv"),
            ),
            emb.select(
                F.col("vec_id").alias("cid"),
                F.slice(F.col("embedding"), 1, d).alias("cv"),
            ),
            TOP_K,
        ).select("qid", "cid")
        per_dim.append(
            bf.join(top_d, ["qid", "cid"])
            .agg(F.count("*").alias("hit_sum"))
            .select(F.lit(d).alias("trunc_dim"), "hit_sum")
        )
    u = per_dim[0]
    for extra in per_dim[1:]:
        u = u.unionByName(extra)
    tot = bf.agg(F.count("*").alias("bf_ct"))
    return u.crossJoin(F.broadcast(tot)).select(
        "trunc_dim",
        "hit_sum",
        (F.col("hit_sum").cast("double") / F.col("bf_ct")).alias("recall"),
    )


#: Truncated-shortlist sizes for the MRL serving recipe: the re-rank
#: pool is the knob that buys recall back from truncation, priced per
#: probe (the PQ_RERANK_POOL pattern).
MRL_RERANK_POOLS = (2 * TOP_K, 4 * TOP_K, 8 * TOP_K)
_MRL_MAXPOOL = max(MRL_RERANK_POOLS)


def _sql_mrl_shortlist(name: str, d: int) -> str:
    sliced_q = f"list_slice(qv, 1, {d})"
    sliced_c = f"list_slice(embedding, 1, {d})"
    return f"""{name} AS (
      SELECT qid, cid, rn AS rn_s FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY {_sql_cosine(sliced_q, sliced_c)} DESC,
                                           vec_id) AS rn
        FROM embeddings CROSS JOIN probes
        WHERE vec_id != qid
      ) WHERE rn <= {_MRL_MAXPOOL}
    )"""


def _sql_mrl_rerank_tail() -> str:
    """Per-dim re-rank CTEs + per-(dim, pool) top-k CTEs + the final
    UNION ALL ladder — shared text builder so the oracle stays in
    lockstep with the MRL_DIMS x MRL_RERANK_POOLS grid."""
    parts = []
    for d in MRL_DIMS:
        parts.append(
            f"""rr{d} AS (
      SELECT s.qid, s.cid, s.rn_s,
             {_sql_cosine('p.qv', 'e.embedding')} AS cf
      FROM m{d}s s JOIN probes p ON s.qid = p.qid
                   JOIN embeddings e ON s.cid = e.vec_id
    )"""
        )
        for pool in MRL_RERANK_POOLS:
            parts.append(
                f"""t{d}_{pool} AS (
      SELECT qid, cid FROM (
        SELECT qid, cid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cf DESC, cid) AS rn
        FROM rr{d} WHERE rn_s <= {pool}
      ) WHERE rn <= {TOP_K}
    )"""
            )
    selects = " UNION ALL ".join(
        f"""SELECT {d} AS trunc_dim, {pool} AS pool,
           (SELECT COUNT(*) FROM bf JOIN t{d}_{pool} USING (qid, cid)) AS hit_sum,
           CAST((SELECT COUNT(*) FROM bf JOIN t{d}_{pool} USING (qid, cid)) AS DOUBLE)
             / (SELECT bf_ct FROM tot) AS recall"""
        for d in MRL_DIMS
        for pool in MRL_RERANK_POOLS
    )
    return ",\n    ".join(parts) + f"\n    {selects}"


@register(
    "ann_recall_matryoshka_rerank",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_PROBES}
    ),
    bf AS (
      SELECT qid, cid FROM (
        SELECT qid, vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY {_sql_cosine('qv', 'embedding')} DESC,
                                           vec_id) AS rn
        FROM embeddings CROSS JOIN probes
        WHERE vec_id != qid
      ) WHERE rn <= {TOP_K}
    ),
    tot AS (SELECT COUNT(*) AS bf_ct FROM bf),
    {", ".join(_sql_mrl_shortlist(f"m{d}s", d) for d in MRL_DIMS)},
    {_sql_mrl_rerank_tail()}
    """,
    doc=f"The MRL serving recipe completed (r15 VERDICT #4): "
    f"ann_recall_matryoshka measured truncation recall COLLAPSING on "
    f"this fixture (0.10 at d=16) — this rung answers whether the "
    f"standard two-stage recipe rescues it: retrieve a pool-sized "
    f"shortlist at the TRUNCATED width (d/64 of the flops and bytes — "
    f"where the index savings live), then exact-re-rank ONLY the "
    f"shortlist at full width (pool-bounded float reads per probe, "
    f"the ann_recall_pq_rerank pattern). One row per (trunc_dim, "
    f"pool) over pools {MRL_RERANK_POOLS}: the measured ladder that "
    f"decides whether MRL serving is viable here and at what pool "
    f"price — the re-rank can only recover hits the truncated metric "
    f"kept inside the pool, so the ladder converging to 1.0 (or not) "
    f"IS the serving decision. hit_sum is an exact join count, recall "
    f"one double division; shortlist, re-rank and brute truth all "
    f"re-derived by the oracle bit-for-bit. Scale: each shortlist is "
    f"the probe-bounded brute shape (broadcast probes, one linear "
    f"corpus pass at the truncated width), the re-rank touches "
    f"pool x probes full-width vectors only.",
    tags=("similarity", "ann", "quantize", "audit"),
)
def ann_recall_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    probes = emb.filter(F.col("vec_id") < N_PROBES)
    pq = probes.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv_full"))
    bf = scoped_persist(
        S.topk_neighbors(
            probes.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")),
            emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")),
            TOP_K,
        ).select("qid", "cid")
    )
    tot = bf.agg(F.count("*").alias("bf_ct"))
    per_rung = []
    for d in MRL_DIMS:
        short = S.topk_neighbors(
            probes.select(
                F.col("vec_id").alias("qid"),
                F.slice(F.col("embedding"), 1, d).alias("qv"),
            ),
            emb.select(
                F.col("vec_id").alias("cid"),
                F.slice(F.col("embedding"), 1, d).alias("cv"),
            ),
            _MRL_MAXPOOL,
        ).select("qid", "cid", F.col("rn").alias("rn_s"))
        # full-width exact re-rank over the shortlist only: pool-bounded
        # float reads, computed ONCE per dim and filtered per pool
        rr = scoped_persist(
            short.join(F.broadcast(pq), "qid")
            .join(
                emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")),
                "cid",
            )
            .withColumn("cf", S.cosine(F.col("qv_full"), F.col("cv")))
            .select("qid", "cid", "rn_s", "cf")
        )
        w = W.partitionBy("qid").orderBy(F.col("cf").desc(), F.col("cid"))
        for pool in MRL_RERANK_POOLS:
            top = (
                rr.filter(F.col("rn_s") <= pool)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= TOP_K)
                .select("qid", "cid")
            )
            per_rung.append(
                bf.join(top, ["qid", "cid"])
                .agg(F.count("*").alias("hit_sum"))
                .select(
                    F.lit(d).alias("trunc_dim"),
                    F.lit(pool).alias("pool"),
                    "hit_sum",
                )
            )
    u = per_rung[0]
    for extra in per_rung[1:]:
        u = u.unionByName(extra)
    return u.crossJoin(F.broadcast(tot)).select(
        "trunc_dim",
        "pool",
        "hit_sum",
        (F.col("hit_sum").cast("double") / F.col("bf_ct")).alias("recall"),
    )


#: The hard-negative band: similar enough to be informative for
#: contrastive training, below the near-duplicate bar (anything at or
#: past SEMDEDUP_T is a probable positive/duplicate, not a negative).
HARD_NEG_LO = 0.15
HN_K = TOP_K


def _register_hard_negative_mining():
    hi = SEMDEDUP_T

    @register(
        "hard_negative_mining",
        oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    probes AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ),
    scored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN probes ON a.c = qc
      WHERE a.vec_id != qid
    )
    SELECT qid, cid, cos_sim, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
      WHERE cos_sim >= {HARD_NEG_LO} AND cos_sim < {hi}
    ) WHERE rn <= {HN_K}
    """,
        doc=f"Contrastive hard-negative mining — the training-data op "
        "behind every embedding-model pipeline: for each anchor, the "
        f"top-{HN_K} same-coarse-cell vectors whose cosine falls in "
        f"[{HARD_NEG_LO}, {SEMDEDUP_T}) — similar enough to teach the "
        "margin, strictly below the SemDeDup bar so probable "
        "duplicates/positives never leak into the negative set (the "
        "standard ANN-mined-negatives recipe: mine hard, filter "
        "false negatives by threshold). Rides the corpus-scoped IVF "
        "assignment, so candidates are cluster-bounded — the "
        "ann_topk_ivf_kmeans join shape with a band filter, never a "
        "corpus cross join; at 100 TB the mining cost is exactly the "
        "IVF retrieval cost. Band edges are one comparison on the "
        "bit-identical cosine, so both engines mine the same set.",
        tags=("similarity", "ann", "llm-prep", "training-data"),
    )
    def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window as W

        from ..operators.partitioning import spread

        assigned = ivf_assigned_cached(spark, sf_dir)
        probes = assigned.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("c").alias("qlabel"),
        )
        corpus = assigned.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("c").alias("clabel"),
        )
        scored = (
            spread(corpus, "cid")
            .join(F.broadcast(probes), F.col("clabel") == F.col("qlabel"))
            .filter(F.col("cid") != F.col("qid"))
            .withColumn("cos_sim", S.cosine(F.col("qv"), F.col("cv")))
            .filter(
                (F.col("cos_sim") >= HARD_NEG_LO) & (F.col("cos_sim") < SEMDEDUP_T)
            )
        )
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= HN_K)
            .select("qid", "cid", "cos_sim", "rn")
        )


_register_hard_negative_mining()


def _register_hard_negative_nprobe():
    hi = SEMDEDUP_T
    band_sql = f"WHERE cos_sim >= {HARD_NEG_LO} AND cos_sim < {hi}"

    @register(
        "hard_negative_mining_nprobe",
        oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    {_SQL_NPROBE_PC},
    scoredp AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN pc ON a.c = pc.c
      WHERE a.vec_id != qid
    )
    SELECT qid, cid, cos_sim, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, cid) AS rn
      FROM scoredp {band_sql}
    ) WHERE rn <= {HN_K}
    """,
        doc=f"Hard-negative mining at nprobe={NPROBE_P} (r15 VERDICT "
        "#6): the 1-probe miner rides the anchor's own IVF cell, and "
        "decon_semantic_rungs proved 1-probe misses most same-cell-"
        "adjacent neighbors — anchors near a Voronoi boundary mine "
        "weaker negatives. This rung applies probe_clusters (the "
        f"ann_topk_ivf_nprobe knob) to the mining query: each anchor's "
        f"band-filtered candidates come from its {NPROBE_P} nearest "
        "coarse cells, recovering the across-the-boundary hard "
        f"negatives at {NPROBE_P}x the bucket-join candidate cost — "
        "still bucket-sized, never corpus-sized; mining cost remains "
        "exactly the multi-probe retrieval cost. The delta vs 1-probe "
        "is audited by hard_negative_rungs.",
        tags=("similarity", "ann", "llm-prep", "training-data"),
    )
    def hard_negative_mining_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window as W

        from ..operators.partitioning import spread

        assigned = ivf_assigned_cached(spark, sf_dir)
        cents = kmeans_fit_cached(spark, sf_dir, assigned)
        pc = S.probe_clusters(
            assigned.filter(F.col("vec_id") < N_PROBES).select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
            ),
            cents,
            NPROBE_P,
        )
        corpus = assigned.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("c").alias("clabel"),
        )
        scored = (
            spread(corpus, "cid")
            .join(F.broadcast(pc), F.col("clabel") == F.col("qlabel"))
            .filter(F.col("cid") != F.col("qid"))
            .withColumn("cos_sim", S.cosine(F.col("qv"), F.col("cv")))
            .filter(
                (F.col("cos_sim") >= HARD_NEG_LO) & (F.col("cos_sim") < SEMDEDUP_T)
            )
        )
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= HN_K)
            .select("qid", "cid", "cos_sim", "rn")
        )

    @register(
        "hard_negative_rungs",
        oracle=f"""
    WITH {_SQL_KMEANS_CTES},
    probes1 AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ),
    c1 AS (
      SELECT * FROM (
        SELECT qid, a.vec_id AS cid,
               {_sql_cosine('qv', 'a.embedding')} AS cos_sim
        FROM afinal a JOIN probes1 ON a.c = qc
        WHERE a.vec_id != qid
      ) {band_sql}
    ),
    {_SQL_NPROBE_PC},
    cp AS (
      SELECT * FROM (
        SELECT qid, a.vec_id AS cid,
               {_sql_cosine('qv', 'a.embedding')} AS cos_sim
        FROM afinal a JOIN pc ON a.c = pc.c
        WHERE a.vec_id != qid
      ) {band_sql}
    ),
    m1 AS (
      SELECT qid, cid FROM (
        SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY cos_sim DESC, cid) AS rn
        FROM c1
      ) WHERE rn <= {HN_K}
    ),
    mp AS (
      SELECT qid, cid FROM (
        SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY cos_sim DESC, cid) AS rn
        FROM cp
      ) WHERE rn <= {HN_K}
    )
    SELECT
      (SELECT COUNT(*) FROM c1) AS cand_1probe_ct,
      (SELECT COUNT(*) FROM cp) AS cand_nprobe_ct,
      (SELECT COUNT(*) FROM c1 WHERE NOT EXISTS
         (SELECT 1 FROM cp WHERE cp.qid = c1.qid AND cp.cid = c1.cid))
        AS extra_pair_ct,
      (SELECT COUNT(*) FROM m1) AS neg_1probe_ct,
      (SELECT COUNT(*) FROM mp) AS neg_nprobe_ct,
      (SELECT COUNT(*) FROM m1 JOIN mp USING (qid, cid)) AS shared_neg_ct,
      (SELECT COUNT(*) FROM m1 WHERE NOT EXISTS
         (SELECT 1 FROM mp WHERE mp.qid = m1.qid AND mp.cid = m1.cid))
        AS lost_neg_ct,
      (SELECT COUNT(*) FROM mp WHERE NOT EXISTS
         (SELECT 1 FROM m1 WHERE m1.qid = mp.qid AND m1.cid = mp.cid))
        AS gained_neg_ct
    """,
        doc="The mining-rung containment/delta audit (the "
        "decon_semantic_rungs pattern applied to hard negatives): "
        "PROVES on data that the 1-probe band-candidate set is "
        "contained in the nprobe set (extra_pair_ct = 0 — probe 1 IS "
        "the anchor's own cell, so widening probes only adds "
        "candidates; test-pinned) and prices the negative-set delta — "
        "how many mined negatives the rungs share, how many 1-probe "
        "negatives the wider candidate pool DISPLACES (lost = weaker "
        "negatives pushed out by across-the-boundary candidates that "
        "rank higher in the band) and how many it gains. This is the "
        "number that justifies the extra probed bucket per anchor: "
        "every displaced negative is a strictly-harder replacement. "
        "All counts exact joins; one row.",
        tags=("similarity", "ann", "llm-prep", "training-data", "audit"),
    )
    def hard_negative_rungs(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window as W

        from ..operators.cache import scoped_persist
        from ..operators.partitioning import spread

        assigned = ivf_assigned_cached(spark, sf_dir)
        cents = kmeans_fit_cached(spark, sf_dir, assigned)
        corpus = assigned.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("c").alias("clabel"),
        )
        probes1 = assigned.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("c").alias("qlabel"),
        )
        pc = S.probe_clusters(
            assigned.filter(F.col("vec_id") < N_PROBES).select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
            ),
            cents,
            NPROBE_P,
        )

        def band(side):
            return (
                spread(corpus, "cid")
                .join(F.broadcast(side), F.col("clabel") == F.col("qlabel"))
                .filter(F.col("cid") != F.col("qid"))
                .withColumn("cos_sim", S.cosine(F.col("qv"), F.col("cv")))
                .filter(
                    (F.col("cos_sim") >= HARD_NEG_LO)
                    & (F.col("cos_sim") < SEMDEDUP_T)
                )
                .select("qid", "cid", "cos_sim")
            )

        c1 = scoped_persist(band(probes1))
        cp = scoped_persist(band(pc))
        w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))

        def mined(cand):
            return (
                cand.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= HN_K)
                .select("qid", "cid")
            )

        m1 = scoped_persist(mined(c1))
        mp = scoped_persist(mined(cp))
        # all four sets descend from one assigned lineage — rename the
        # right side's keys before joining (the ann_recall_nprobe rule)
        r = lambda df: df.select(  # noqa: E731
            F.col("qid").alias("q2"), F.col("cid").alias("c2")
        )
        on = (F.col("qid") == F.col("q2")) & (F.col("cid") == F.col("c2"))
        counts = [
            c1.agg(F.count("*").alias("cand_1probe_ct")),
            cp.agg(F.count("*").alias("cand_nprobe_ct")),
            c1.join(r(cp), on, "left_anti").agg(F.count("*").alias("extra_pair_ct")),
            m1.agg(F.count("*").alias("neg_1probe_ct")),
            mp.agg(F.count("*").alias("neg_nprobe_ct")),
            m1.join(r(mp), on, "inner").agg(F.count("*").alias("shared_neg_ct")),
            m1.join(r(mp), on, "left_anti").agg(F.count("*").alias("lost_neg_ct")),
            mp.join(r(m1), on, "left_anti").agg(F.count("*").alias("gained_neg_ct")),
        ]
        out = counts[0]
        for extra in counts[1:]:
            out = out.crossJoin(F.broadcast(extra))
        return out


_register_hard_negative_nprobe()


# The full triplet-table oracle, a module constant because the stream
# twin (plans/replay.contrastive_triplets_stream) shares it VERBATIM —
# a green stream row certifies the incrementally mined scored store
# reconstructed the batch candidate set bit-for-bit.
SQL_CONTRASTIVE_TRIPLETS = f"""
    WITH {_SQL_KMEANS_CTES},
    probes1 AS (
      SELECT vec_id AS qid, embedding AS qv, c AS qc
      FROM afinal WHERE vec_id < {N_PROBES}
    ),
    scored AS (
      SELECT qid, a.vec_id AS cid,
             {_sql_cosine('qv', 'a.embedding')} AS cos_sim
      FROM afinal a JOIN probes1 ON a.c = qc
      WHERE a.vec_id != qid
    ),
    pos AS (
      SELECT qid, cid AS pos_id, cos_sim AS pos_cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cos_sim DESC, cid) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    negs AS (
      SELECT qid, cid AS neg_id, cos_sim AS neg_cos, rn AS neg_rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY cos_sim DESC, cid) AS rn
        FROM scored
        WHERE cos_sim >= {HARD_NEG_LO} AND cos_sim < {SEMDEDUP_T}
      ) WHERE rn <= {HN_K}
    )
    SELECT p.qid, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos, n.neg_rank
    FROM pos p JOIN negs n USING (qid)
    WHERE p.pos_id != n.neg_id
    """


def triplets_from_scored(scored: DataFrame) -> DataFrame:
    """The triplet-table tail over a (qid, cid, cos_sim) candidate
    frame — positive top-1 and in-band negative top-k windows plus the
    final join, shared by the batch query and the stream twin's merged
    read so the two build paths cannot drift. Callers persist
    ``scored`` (it is read twice)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
    pos = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            F.col("cid").alias("pos_id"),
            F.col("cos_sim").alias("pos_cos"),
        )
    )
    negs = (
        scored.filter((F.col("cos_sim") >= HARD_NEG_LO) & (F.col("cos_sim") < SEMDEDUP_T))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HN_K)
        .select(
            "qid",
            F.col("cid").alias("neg_id"),
            F.col("cos_sim").alias("neg_cos"),
            F.col("rn").alias("neg_rank"),
        )
    )
    return pos.join(negs, "qid").filter(F.col("pos_id") != F.col("neg_id"))


def _register_contrastive_triplets():
    @register(
        "contrastive_triplets",
        oracle=SQL_CONTRASTIVE_TRIPLETS,
        doc="The contrastive-training dataset itself, end to end: one "
        "row per (anchor, mined negative) carrying the anchor's "
        "PROBABLE POSITIVE — its top-1 same-cell neighbor by exact "
        "cosine (the standard self-supervised positive when no labels "
        f"exist) — and one of its top-{HN_K} in-band hard negatives "
        f"([{HARD_NEG_LO}, {SEMDEDUP_T}), the hard_negative_mining "
        "band). This is the table an embedding-model trainer actually "
        "consumes (InfoNCE triplets), composed from pieces the catalog "
        "already certifies: the IVF assignment bounds both searches to "
        "the anchor's cell, the SemDeDup bar keeps probable positives "
        "out of the negative set, and the positive/negative rankings "
        "share one scored frame — the dataset costs ONE bucket join. "
        "Anchors whose cell has no in-band negative (or no neighbor at "
        "all) ship no rows, the right semantics for a training table.",
        tags=("similarity", "ann", "llm-prep", "training-data"),
    )
    def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.cache import scoped_persist
        from ..operators.partitioning import spread

        assigned = ivf_assigned_cached(spark, sf_dir)
        corpus = assigned.select(
            F.col("vec_id").alias("cid"),
            F.col("embedding").alias("cv"),
            F.col("c").alias("clabel"),
        )
        probes1 = assigned.filter(F.col("vec_id") < N_PROBES).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            F.col("c").alias("qlabel"),
        )
        scored = scoped_persist(
            spread(corpus, "cid")
            .join(F.broadcast(probes1), F.col("clabel") == F.col("qlabel"))
            .filter(F.col("cid") != F.col("qid"))
            .withColumn("cos_sim", S.cosine(F.col("qv"), F.col("cv")))
            .select("qid", "cid", "cos_sim")
        )
        return triplets_from_scored(scored)


_register_contrastive_triplets()


# -- embedding-level decontamination (r13 VERDICT #4) ----------------------

from .llmprep import EVAL_MOD  # noqa: E402  (the mod-7 eval split, shared)

#: Cosine bar for "semantically the same content" — deliberately the
#: SemDeDup threshold: a train doc that SemDeDup would have collapsed
#: into an eval doc is exactly what paraphrased contamination looks
#: like at the embedding layer.
DECON_COS_T = SEMDEDUP_T


def corpus_decon_semantic_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, eid, cos_sim): train-vector x eval-vector same-cluster
    pairs at cosine >= DECON_COS_T — the shared surface of the two
    semantic-decontamination queries (flag + rate-by-source audit),
    corpus-persisted like ``corpus_semdedup_verified``.

    Shape (the decontaminate_fuzzy precedent lifted to the embedding
    layer): the quantizer is fit on the TRAIN side only (production
    fits at bootstrap; the eval benchmark must not steer the
    codebook), BOTH sides are assigned with it, and candidates are
    train-vs-eval pairs within a shared coarse cell — cost is
    sum_c(train_ct(c) x eval_ct(c)), bounded by the eval set's size,
    never corpus². The eval side rides a plain broadcast: it is
    benchmark-sized by CONTRACT (the bounded_broadcast docstring's
    documented exception). Unlike SemDeDup, the train side is NOT
    rep-capped — every train doc must be checked, and the per-cluster
    cost is already eval-bounded."""
    from ..operators.cache import corpus_persist
    from ..operators.partitioning import spread

    def build():
        assigned, _ = _fit_and_assign(
            spark,
            sf_dir,
            fit_filter=F.col("vec_id") % EVAL_MOD != 0,
            subset="decon_train",
        )
        nrm = F.sqrt(S.norm_sq(F.col("embedding")))
        ev = assigned.filter(F.col("vec_id") % EVAL_MOD == 0).select(
            "c",
            F.col("vec_id").alias("eid"),
            F.col("embedding").alias("ve"),
            nrm.alias("ne"),
        )
        tr = assigned.filter(F.col("vec_id") % EVAL_MOD != 0).select(
            "c", "vec_id", F.col("embedding").alias("vt"), nrm.alias("nt")
        )
        return (
            spread(tr, "vec_id")
            .join(F.broadcast(ev), "c")
            .withColumn(
                "cos_sim", S.dot(F.col("vt"), F.col("ve")) / (F.col("nt") * F.col("ne"))
            )
            .filter(F.col("cos_sim") >= DECON_COS_T)
            .select("vec_id", "eid", "cos_sim")
        )

    return corpus_persist(spark, "decon_semantic_hits", sf_dir, build)


_SQL_DECON_SEM_HITS = f"""
    {_sql_kmeans_ctes_subset(f"vec_id % {EVAL_MOD} != 0")},
    anorm AS (
      SELECT vec_id, c, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    ),
    hits AS (
      SELECT t.vec_id, e.vec_id AS eid,
             {SQL_DOT.format(a='t.embedding', b='e.embedding')} / (t.nrm * e.nrm)
               AS cos_sim
      FROM anorm t JOIN anorm e ON t.c = e.c
      WHERE t.vec_id % {EVAL_MOD} != 0 AND e.vec_id % {EVAL_MOD} = 0
        AND {SQL_DOT.format(a='t.embedding', b='e.embedding')} / (t.nrm * e.nrm)
              >= {DECON_COS_T}
    )"""


# The flag query's full oracle — shared VERBATIM by the streaming twin
# `decontaminate_semantic_stream` (the stream's bootstrap fit, per-row
# assignment and cosine are bit-identical to the batch screen, so one
# oracle certifies both build paths).
SQL_DECON_SEMANTIC = f"""
    WITH {_SQL_DECON_SEM_HITS}
    SELECT vec_id, COUNT(*) AS hit_ct, MAX(cos_sim) AS max_cos
    FROM hits GROUP BY vec_id
    """


@register(
    "decontaminate_semantic",
    oracle=SQL_DECON_SEMANTIC,
    doc=f"Embedding-level benchmark decontamination: flag training "
    f"vectors whose cosine to ANY eval vector (vec_id % {EVAL_MOD} == "
    f"0 plays the benchmark, the decontaminate convention) reaches "
    f"the SemDeDup bar within a shared coarse cell — the paraphrased "
    "contamination that shingle/Bloom decontamination cannot see "
    "(no token n-gram survives a rewrite; the embedding does). "
    "Quantizer fit on the train side only; candidates are "
    "train-vs-eval within-cluster pairs, eval side broadcast — cost "
    "is eval-bounded, never corpus². The oracle re-derives the "
    "adaptive-k fit, both assignments and every cosine bit-for-bit. "
    "Cross-cell contamination (train and eval landing in different "
    "coarse cells) is the documented recall trade every IVF-bucketed "
    "screen makes — ann_recall_ivf measures that class (at sf0.01 the "
    "screen surfaces 1 of the 4 brute-force eval-train pairs at this "
    "bar; production raises recall by multi-probing cells, the "
    "ann_topk_ivf_nprobe machinery).",
    tags=("similarity", "kmeans", "llm-prep", "decontamination"),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        corpus_decon_semantic_hits(spark, sf_dir)
        .groupBy("vec_id")
        .agg(F.count("*").alias("hit_ct"), F.max("cos_sim").alias("max_cos"))
    )


@register(
    "decontaminate_semantic_audit",
    oracle=f"""
    WITH {_SQL_DECON_SEM_HITS},
    flagged AS (SELECT DISTINCT vec_id FROM hits)
    SELECT d.source,
           COUNT(*) AS train_ct,
           COUNT(f.vec_id) AS flagged_ct,
           CAST(COUNT(f.vec_id) AS DOUBLE) / COUNT(*) AS flagged_rate
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    LEFT JOIN flagged f ON e.vec_id = f.vec_id
    WHERE e.vec_id % {EVAL_MOD} != 0
    GROUP BY d.source
    """,
    doc="Rate-by-source audit of the semantic decontamination screen "
    "(the quality_by_source pattern): per document source, how many "
    "train vectors exist and what fraction the embedding screen "
    "flags — the number a curator reads before dropping a source. "
    "Rides the corpus-persisted hits surface (the flag query's heavy "
    "stage runs once); doc_id = vec_id is the fixture's 1:1 "
    "embedding-document linkage, checked by embedding_doc_coverage. "
    "The rate is ONE double division of two exact counts.",
    tags=("similarity", "llm-prep", "decontamination", "audit"),
)
def decontaminate_semantic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents", "embeddings")
    flagged = corpus_decon_semantic_hits(spark, sf_dir).select("vec_id").distinct()
    train = (
        t["embeddings"]
        .filter(F.col("vec_id") % EVAL_MOD != 0)
        .select("vec_id")
        .join(t["documents"].select(F.col("doc_id").alias("vec_id"), "source"), "vec_id")
    )
    return (
        train.join(flagged.withColumn("_hit", F.lit(1)), "vec_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("train_ct"),
            F.count("_hit").alias("flagged_ct"),
            (F.count("_hit").cast("double") / F.count("*")).alias("flagged_rate"),
        )
    )


#: Cells each eval vector probes in the multi-probe screen — the
#: recall/cost knob (the nprobe precedent): 1-probe surfaces 1 of the
#: 4 brute-truth pairs at sf0.01, 2-probe buys back cross-boundary
#: contamination for one more eval-bounded candidate set per probe.
DECON_NPROBE = 2


def _sql_decon_nprobe_tail(name: str = "hits") -> str:
    """The multi-probe screen's CTE tail (eval-side probe ranking +
    within-probed-cell hit pairs), parameterized on the final CTE name
    so the standalone nprobe oracle and the rung audit share ONE text.
    Assumes ``ctr2`` (the fitted centroids) and ``anorm`` (train rows
    with norms) are already in scope."""
    return f"""eprd AS (
      SELECT e.vec_id AS eid, e.embedding AS ev, s.c,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {_sql_sqdist('e.embedding', 's.cv')}, s.c)
               AS prn
      FROM embeddings e CROSS JOIN ctr2 s
      WHERE e.vec_id % {EVAL_MOD} = 0
    ),
    epc AS (
      SELECT eid, ev, sqrt({SQL_DOT.format(a='ev', b='ev')}) AS enrm, c
      FROM eprd WHERE prn <= {DECON_NPROBE}
    ),
    {name} AS (
      SELECT t.vec_id, epc.eid,
             {SQL_DOT.format(a='t.embedding', b='epc.ev')} / (t.nrm * epc.enrm)
               AS cos_sim
      FROM anorm t JOIN epc ON t.c = epc.c
      WHERE t.vec_id % {EVAL_MOD} != 0
        AND {SQL_DOT.format(a='t.embedding', b='epc.ev')} / (t.nrm * epc.enrm)
              >= {DECON_COS_T}
    )"""


def _sql_decon_brute_hits(name: str = "hits") -> str:
    """The EXACT screen's CTE chain: every train vector scored against
    every eval vector, no quantizer, zero recall loss — the in-catalog
    truth the IVF rungs are audited against. Self-contained (reads
    only ``embeddings``)."""
    return f"""tn AS (
      SELECT vec_id, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM embeddings WHERE vec_id % {EVAL_MOD} != 0
    ),
    en AS (
      SELECT vec_id AS eid, embedding AS ev,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS enrm
      FROM embeddings WHERE vec_id % {EVAL_MOD} = 0
    ),
    {name} AS (
      SELECT t.vec_id, e.eid,
             {SQL_DOT.format(a='t.embedding', b='e.ev')} / (t.nrm * e.enrm)
               AS cos_sim
      FROM tn t CROSS JOIN en e
      WHERE {SQL_DOT.format(a='t.embedding', b='e.ev')} / (t.nrm * e.enrm)
              >= {DECON_COS_T}
    )"""


def corpus_decon_brute_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, eid, cos_sim): the EXACT semantic-decontamination hit
    pairs — every train vector scored against the broadcast eval
    matrix (the ann_topk_bruteforce shape), corpus-persisted because
    both the brute query and the rung/agreement audits read it.

    Scale: the eval side is benchmark-sized BY CONTRACT (the same
    broadcast exception the IVF screen documents), so this is ONE
    linear map-side pass over the train corpus — no shuffle, no
    quantizer, zero recall loss. That makes it the right default
    whenever eval x train_row cost is affordable, and the in-catalog
    truth the bucketed rungs' recall is measured against
    (decon_semantic_rungs) when it is not."""
    from ..operators.cache import corpus_persist
    from ..operators.partitioning import spread

    def build():
        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        nrm = F.sqrt(S.norm_sq(F.col("embedding")))
        ev = emb.filter(F.col("vec_id") % EVAL_MOD == 0).select(
            F.col("vec_id").alias("eid"),
            F.col("embedding").alias("ve"),
            nrm.alias("ne"),
        )
        tr = emb.filter(F.col("vec_id") % EVAL_MOD != 0).select(
            "vec_id", F.col("embedding").alias("vt"), nrm.alias("nt")
        )
        return (
            spread(tr, "vec_id")
            .crossJoin(F.broadcast(ev))
            .withColumn(
                "cos_sim", S.dot(F.col("vt"), F.col("ve")) / (F.col("nt") * F.col("ne"))
            )
            .filter(F.col("cos_sim") >= DECON_COS_T)
            .select("vec_id", "eid", "cos_sim")
        )

    return corpus_persist(spark, "decon_brute_hits", sf_dir, build)


def decon_nprobe_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, eid, cos_sim): the multi-probe screen's hit pairs —
    the nprobe query's pre-aggregation surface, shared with the rung
    audit so the two certify ONE candidate generation."""
    from ..operators.partitioning import spread

    assigned, cents = _fit_and_assign(
        spark,
        sf_dir,
        fit_filter=F.col("vec_id") % EVAL_MOD != 0,
        subset="decon_train",
    )
    nrm = F.sqrt(S.norm_sq(F.col("embedding")))
    ev = (
        assigned.filter(F.col("vec_id") % EVAL_MOD == 0)
        .select(F.col("vec_id").alias("eid"), F.col("embedding").alias("ve"))
    )
    epc = S.probe_clusters(ev, cents, DECON_NPROBE, qid_col="eid", vec_col="ve", out="c")
    epc = epc.withColumn("ne", F.sqrt(S.norm_sq(F.col("ve"))))
    tr = assigned.filter(F.col("vec_id") % EVAL_MOD != 0).select(
        "c", "vec_id", F.col("embedding").alias("vt"), nrm.alias("nt")
    )
    return (
        # eval side broadcast: benchmark-sized by contract x NPROBE rows
        spread(tr, "vec_id")
        .join(F.broadcast(epc), "c")
        .withColumn(
            "cos_sim", S.dot(F.col("vt"), F.col("ve")) / (F.col("nt") * F.col("ne"))
        )
        .filter(F.col("cos_sim") >= DECON_COS_T)
        .select("vec_id", "eid", "cos_sim")
    )


@register(
    "decontaminate_semantic_nprobe",
    oracle=f"""
    WITH {_sql_kmeans_ctes_subset(f"vec_id % {EVAL_MOD} != 0")},
    anorm AS (
      SELECT vec_id, c, embedding,
             sqrt({SQL_DOT.format(a='embedding', b='embedding')}) AS nrm
      FROM afinal
    ),
    {_sql_decon_nprobe_tail()}
    SELECT vec_id, COUNT(*) AS hit_ct, MAX(cos_sim) AS max_cos
    FROM hits GROUP BY vec_id
    """,
    doc=f"The multi-probe semantic-decontamination screen: each eval "
    f"vector probes its {DECON_NPROBE} nearest train-fit cells "
    "(probe_clusters — the ann_topk_ivf_nprobe knob applied to the "
    "screen), buying back the cross-Voronoi-boundary contamination "
    "the 1-probe screen misses for one more eval-bounded candidate "
    "set per probe. Same cosine bar, same output shape as "
    "decontaminate_semantic — read the two side by side as the "
    "recall ladder (1-probe: 1 of 4 brute pairs at sf0.01; 2-probe "
    "strictly dominates by construction). Cost is still "
    "sum_c(train_ct x eval_probe_ct), eval-bounded.",
    tags=("similarity", "kmeans", "llm-prep", "decontamination"),
)
def decontaminate_semantic_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        decon_nprobe_hits(spark, sf_dir)
        .groupBy("vec_id")
        .agg(F.count("*").alias("hit_ct"), F.max("cos_sim").alias("max_cos"))
    )


@register(
    "decontaminate_semantic_brute",
    oracle=f"""
    WITH {_sql_decon_brute_hits()}
    SELECT vec_id, COUNT(*) AS hit_ct, MAX(cos_sim) AS max_cos
    FROM hits GROUP BY vec_id
    """,
    doc="The EXACT semantic-decontamination rung (r14 VERDICT #1): "
    "every train vector scored against the BROADCAST eval matrix — "
    "the ann_topk_bruteforce shape pointed at the screen — so recall "
    "is 1.0 by construction: zero quantizer, zero cell-boundary "
    "loss. Same cosine bar and output shape as decontaminate_semantic "
    "/ _nprobe; the three are the family's recall ladder with this as "
    "its top. Scale: the eval side is benchmark-sized by contract and "
    "broadcast once, so cost is ONE map-side linear pass over the "
    "train corpus (train_ct x eval_ct multiply-adds, no shuffle) — "
    "affordable far past the point the IVF rungs become necessary, "
    "and the in-catalog truth their recall is audited against "
    "(decon_semantic_rungs).",
    tags=("similarity", "llm-prep", "decontamination"),
)
def decontaminate_semantic_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        corpus_decon_brute_hits(spark, sf_dir)
        .groupBy("vec_id")
        .agg(F.count("*").alias("hit_ct"), F.max("cos_sim").alias("max_cos"))
    )


@register(
    "decon_semantic_rungs",
    oracle=f"""
    WITH {_SQL_DECON_SEM_HITS},
    {_sql_decon_nprobe_tail('hitsn')},
    {_sql_decon_brute_hits('hitsb')},
    p1 AS (SELECT DISTINCT vec_id, eid FROM hits),
    p2 AS (SELECT DISTINCT vec_id, eid FROM hitsn),
    pb AS (SELECT DISTINCT vec_id, eid FROM hitsb),
    tagged AS (
      SELECT 'probe1' AS rung, vec_id, eid FROM p1
      UNION ALL SELECT 'probe2' AS rung, vec_id, eid FROM p2
      UNION ALL SELECT 'brute' AS rung, vec_id, eid FROM pb
    ),
    base AS (
      SELECT rung, COUNT(*) AS pair_ct, COUNT(DISTINCT vec_id) AS flagged_ct
      FROM tagged GROUP BY rung
    ),
    inter AS (
      SELECT rung, COUNT(*) AS inter_ct
      FROM tagged t JOIN pb ON t.vec_id = pb.vec_id AND t.eid = pb.eid
      GROUP BY rung
    ),
    tot AS (SELECT COUNT(*) AS brute_ct FROM pb)
    SELECT b.rung, b.pair_ct, b.flagged_ct,
           brute_ct - COALESCE(inter_ct, 0) AS missed_pair_ct,
           b.pair_ct - COALESCE(inter_ct, 0) AS extra_pair_ct
    FROM base b LEFT JOIN inter i ON b.rung = i.rung CROSS JOIN tot
    """,
    doc="Recall audit of the semantic-decontamination ladder against "
    "IN-CATALOG truth (r14 VERDICT #1): for each rung — the 1-probe "
    "production screen, the 2-probe screen, and the exact broadcast-"
    "eval screen — the hit-pair count, the flagged-doc count, how "
    "many of the exact rung's pairs it MISSED (the IVF cell-boundary "
    "recall loss, measured not asserted: probe1 >= probe2 >= brute=0) "
    "and how many pairs it found that the exact rung did not "
    "(extra_pair_ct, 0 for every rung by the containment theorem — a "
    "nonzero value would falsify the ladder, so the audit PROVES "
    "probe1 ⊆ probe2 ⊆ brute instead of assuming it; test-pinned). "
    "All three hit frames are the certified queries' own persisted "
    "surfaces; the audit adds one tagged union, one pair-keyed join "
    "against the (eval-bounded) brute pairs and one broadcast 1-row "
    "scalar — nothing pairwise beyond what the rungs already did.",
    tags=("similarity", "llm-prep", "decontamination", "audit"),
)
def decon_semantic_rungs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import scoped_persist

    p1 = scoped_persist(
        corpus_decon_semantic_hits(spark, sf_dir).select("vec_id", "eid").distinct()
    )
    p2 = scoped_persist(
        decon_nprobe_hits(spark, sf_dir).select("vec_id", "eid").distinct()
    )
    pb = scoped_persist(
        corpus_decon_brute_hits(spark, sf_dir).select("vec_id", "eid").distinct()
    )
    tagged = (
        p1.withColumn("rung", F.lit("probe1"))
        .unionByName(p2.withColumn("rung", F.lit("probe2")))
        .unionByName(pb.withColumn("rung", F.lit("brute")))
    )
    base = tagged.groupBy("rung").agg(
        F.count("*").alias("pair_ct"),
        F.count_distinct("vec_id").alias("flagged_ct"),
    )
    inter = (
        tagged.join(pb, ["vec_id", "eid"])
        .groupBy("rung")
        .agg(F.count("*").alias("inter_ct"))
    )
    tot = pb.agg(F.count("*").alias("brute_ct"))
    return (
        base.join(inter, "rung", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "rung",
            "pair_ct",
            "flagged_ct",
            (F.col("brute_ct") - F.coalesce(F.col("inter_ct"), F.lit(0))).alias(
                "missed_pair_ct"
            ),
            (F.col("pair_ct") - F.coalesce(F.col("inter_ct"), F.lit(0))).alias(
                "extra_pair_ct"
            ),
        )
    )


def _register_decon_method_agreement():
    from .dedup import SQL_LSH_BANDS, SQL_SHINGLES3
    from .llmprep import DECON_FUZZY_T, DECON_NGRAM, sql_fuzzy_chain
    from .text import SQL_TOKS

    @register(
        "decon_method_agreement",
        oracle=f"""
    WITH {_SQL_DECON_SEM_HITS},
    {SQL_SHINGLES3.strip().strip(',')},
    {SQL_LSH_BANDS.strip().strip(',')},
    {sql_fuzzy_chain(EVAL_MOD).strip()},
    sh4 AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= {DECON_NGRAM}
                  THEN list_transform(range(1, len(t) - {DECON_NGRAM - 2}),
                       i -> array_to_string(list_slice(t, i, i + {DECON_NGRAM - 1}), ' '))
                  ELSE [] END) AS s4
      FROM toks
    ),
    train_g AS (
      SELECT doc_id, md5(unnest(s4)) AS gh FROM sh4 WHERE doc_id % {EVAL_MOD} != 0
    ),
    eval_g AS (
      SELECT DISTINCT md5(unnest(s4)) AS gh FROM sh4 WHERE doc_id % {EVAL_MOD} = 0
    ),
    {_sql_decon_brute_hits('hitsb')},
    fx AS (SELECT DISTINCT doc_id FROM train_g JOIN eval_g USING (gh)),
    ff AS (SELECT DISTINCT doc_a AS doc_id FROM ver WHERE jaccard >= {DECON_FUZZY_T}),
    fs AS (SELECT DISTINCT vec_id AS doc_id FROM hits),
    fb AS (SELECT DISTINCT vec_id AS doc_id FROM hitsb),
    allf AS (
      SELECT doc_id FROM fx UNION SELECT doc_id FROM ff
      UNION SELECT doc_id FROM fs UNION SELECT doc_id FROM fb
    )
    SELECT (fx.doc_id IS NOT NULL) AS exact_hit,
           (ff.doc_id IS NOT NULL) AS fuzzy_hit,
           (fs.doc_id IS NOT NULL) AS semantic_hit,
           (fb.doc_id IS NOT NULL) AS semantic_exact_hit,
           COUNT(*) AS n_docs
    FROM allf a
    LEFT JOIN fx ON a.doc_id = fx.doc_id
    LEFT JOIN ff ON a.doc_id = ff.doc_id
    LEFT JOIN fs ON a.doc_id = fs.doc_id
    LEFT JOIN fb ON a.doc_id = fb.doc_id
    GROUP BY 1, 2, 3, 4
    """,
        doc="Cross-method DECONTAMINATION audit (dedup_method_agreement's "
        f"shape for the decon family): the exact {DECON_NGRAM}-gram "
        "screen, the fuzzy whole-document-Jaccard screen and the "
        "embedding-level semantic screen, ALL run on the family's "
        f"shared eval split (doc_id % {EVAL_MOD}), each flagged train "
        "doc counted under its (exact, fuzzy, semantic, "
        "semantic_exact) hit combination — the report that tells an "
        "eval owner which contamination classes each screen catches "
        "alone (verbatim copies -> exact; light edits -> fuzzy; "
        "paraphrases -> semantic only). The fourth column is the r15 "
        "exact broadcast-eval embedding screen "
        "(decontaminate_semantic_brute): read semantic_hit against "
        "semantic_exact_hit to see the IVF screen's recall loss INSIDE "
        "the cross-method report (semantic_hit implies "
        "semantic_exact_hit by containment, never the reverse). "
        "The Bloom screen is deliberately absent: it "
        "is the exact screen behind a prefilter, so its flag set is "
        "identical by construction. fuzzy rides the parameterized "
        "sql_fuzzy_chain (the certified mod-11 query's exact text at "
        "mod 7); each screen stays its own bounded join shape — the "
        "comparison adds three doc-keyed left joins over the flagged "
        "union, nothing pairwise.",
        tags=("llm-prep", "decontamination", "audit"),
    )
    def decon_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.cache import scoped_persist
        from .llmprep import fuzzy_contaminated

        docs = load_tables(spark, sf_dir, "documents")["documents"]
        # each flag frame feeds BOTH the union and its own left join —
        # persist them or the three screens each execute twice more
        # (measured: 124 s -> ~40 s cold in a vanilla session)
        from .llmprep import corpus_decon_grams

        ex = scoped_persist(
            D.contaminated_docs(
                docs, F.col("doc_id") % EVAL_MOD == 0, ngram=DECON_NGRAM,
                grams=corpus_decon_grams(spark, sf_dir),
            ).select("doc_id")
        )
        ff = scoped_persist(fuzzy_contaminated(spark, sf_dir, EVAL_MOD).select("doc_id"))
        fs = scoped_persist(
            corpus_decon_semantic_hits(spark, sf_dir)
            .select(F.col("vec_id").alias("doc_id"))
            .distinct()
        )
        fb = scoped_persist(
            corpus_decon_brute_hits(spark, sf_dir)
            .select(F.col("vec_id").alias("doc_id"))
            .distinct()
        )
        allf = ex.union(ff).union(fs).union(fb).distinct()
        j = (
            allf.join(ex.withColumn("_x", F.lit(1)), "doc_id", "left")
            .join(ff.withColumn("_f", F.lit(1)), "doc_id", "left")
            .join(fs.withColumn("_s", F.lit(1)), "doc_id", "left")
            .join(fb.withColumn("_b", F.lit(1)), "doc_id", "left")
        )
        return j.groupBy(
            F.col("_x").isNotNull().alias("exact_hit"),
            F.col("_f").isNotNull().alias("fuzzy_hit"),
            F.col("_s").isNotNull().alias("semantic_hit"),
            F.col("_b").isNotNull().alias("semantic_exact_hit"),
        ).agg(F.count("*").alias("n_docs"))


_register_decon_method_agreement()

# Deferred corpus-build registration: those oracles embed this
# module's semantic-screen SQL, and this module imports llmprep
# mid-file — so the hook runs here, when both modules are complete.
from .llmprep import _register_corpus_queries  # noqa: E402

_register_corpus_queries()
