"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import similarity as S
from ..session import load_tables
from .catalog import register

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
    doc="IVF-style ANN: candidates restricted to the probe's coarse "
    "bucket (label plays the centroid assignment), turning the cross "
    "join into an equi-join hash-partitioned by bucket — the scale "
    "path: cost per probe is bucket size, not corpus size.",
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
