"""Multimodal queries: binary media columns with typed metadata,
decode / feature / resize / frame-sample passes over them.

The media table is synthesized deterministically from ``documents``
(payload = utf-8 text bytes; kind/meta arithmetic in doc_id/n_chars),
so every derived value — including what the Arrow-batched
``mapInPandas`` stubs emit — is reproducible in the DuckDB oracle:
md5(text) in DuckDB hashes the same utf-8 bytes hashlib.md5 sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as M
from ..session import load_tables
from .catalog import register

# DuckDB twins of media_from_documents' derivations
SQL_KIND = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
SQL_NBYTES = "octet_length(encode(text))"
SQL_NFRAMES = f"CASE WHEN {SQL_KIND} = 'video' THEN 1 + n_chars % 24 ELSE 1 END"


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.media_from_documents(load_tables(spark, sf_dir, "documents")["documents"])


@register(
    "media_catalog",
    oracle=f"""
    SELECT {SQL_KIND} AS kind,
           COUNT(*) AS media_ct,
           CAST(SUM({SQL_NBYTES}) AS BIGINT) AS total_bytes,
           CAST(SUM(n_chars * 10) AS BIGINT) AS total_duration_ms
    FROM documents
    GROUP BY 1
    """,
    doc="Media catalog stats: opaque binary payload + typed meta struct, "
    "aggregated per modality. Verifies the binary column schema and the "
    "meta derivations end-to-end.",
    tags=("multimodal",),
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _media(spark, sf_dir)
        .groupBy("kind")
        .agg(
            F.count("*").alias("media_ct"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.sum("meta.duration_ms").alias("total_duration_ms"),
        )
    )


@register(
    "media_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           {SQL_KIND} AS kind,
           {SQL_NBYTES} AS n_bytes,
           md5(text) AS checksum,
           CASE WHEN {SQL_KIND} = 'image' THEN 16 + n_chars % 64 END AS width,
           CASE WHEN {SQL_KIND} = 'image' THEN 16 + doc_id % 48 END AS height
    FROM documents
    """,
    doc="Decode pass over binary payloads: Arrow-batched mapInPandas "
    "(operators/multimodal.decode_media). The byte-interpretation step "
    "is a deterministic md5 stub (real codecs slot into "
    "_decode_payload); the oracle reproduces it, so the Python batch "
    "plumbing itself is value-checked.",
    tags=("multimodal", "pandas-udf"),
)
def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.decode_media(_media(spark, sf_dir))


@register(
    "media_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id AS media_id,
             {SQL_NBYTES} AS nb,
             1 + n_chars % 24 AS n_frames
      FROM documents WHERE doc_id % 3 = 2
    ), f AS (
      SELECT media_id, nb, n_frames,
             greatest(1, nb // n_frames) AS flen,
             unnest(range(0, n_frames)) AS frame_idx
      FROM v
    )
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(CASE WHEN frame_idx * flen < nb
                     THEN least(flen, nb - frame_idx * flen) ELSE 0 END AS INT) AS frame_len
    FROM f
    """,
    doc="1->N frame fan-out for video payloads inside the Arrow batch "
    "iterator (operators/multimodal.sample_frames) — the mapInPandas "
    "equivalent of the reference's 1->N display explode "
    "(RT/app/dwd/BaseLogApp.java:120-140) for rows too wide to explode.",
    tags=("multimodal", "pandas-udf"),
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(_media(spark, sf_dir)).select("media_id", "frame_idx", "frame_len")


@register(
    "media_resize_audit",
    oracle=f"""
    SELECT doc_id AS media_id,
           {SQL_KIND} AS kind,
           CASE WHEN {SQL_KIND} = 'image' THEN 4096 ELSE {SQL_NBYTES} END AS payload_len,
           CASE WHEN {SQL_KIND} = 'image' THEN 64 END AS width,
           CASE WHEN {SQL_KIND} = 'image' THEN 64 END AS height
    FROM documents
    """,
    doc="Resize pass audit: images rewritten to the 64x64 byte budget "
    "with meta restamped, other modalities pass through untouched "
    "(operators/multimodal.resize_images).",
    tags=("multimodal", "pandas-udf"),
)
def media_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    resized = M.resize_images(_media(spark, sf_dir), 64, 64)
    return resized.select(
        "media_id",
        "kind",
        F.length("payload").alias("payload_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@register(
    "media_features_head",
    oracle="""
    WITH h AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             substr(md5(text), 1, 4) AS hx
      FROM documents
    )
    SELECT media_id, kind,
           ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) / 65536.0 AS f0
    FROM h
    """,
    doc="Feature-extraction pass (payload -> array<float>, Arrow-batched "
    "pandas; operators/multimodal.extract_features): first embedding "
    "component value-checked against the oracle (md5-derived fractions "
    "are exact in float32, so the cast to double is bit-stable). The "
    "full array feeds the similarity operators unchanged.",
    tags=("multimodal", "pandas-udf", "similarity"),
)
def media_features_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = M.extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", "kind", F.element_at("features", 1).cast("double").alias("f0")
    )


# -- media -> similarity composition ------------------------------------

def _sql_feat(i: int) -> str:
    """DuckDB twin of _payload_features component i: digest bytes
    2i..2i+1 as a 16-bit fraction (hex chars 4i+1..4i+4 of md5-hex)."""
    pos = 4 * i + 1
    nib = "(strpos('0123456789abcdef', substr(md5(text), {p}, 1)) - 1)"
    return (
        "("
        + " + ".join(f"{nib.format(p=pos + j)} * {16 ** (3 - j)}" for j in range(4))
        + ") / 65536.0"
    )


def _media_ann_oracle() -> str:
    from ..operators.multimodal import FEATURE_DIM
    from .similarity import N_PROBES, TOP_K, _sql_cosine

    fv = "[" + ", ".join(_sql_feat(i) for i in range(FEATURE_DIM)) + "]"
    return f"""
    WITH feats AS (
      SELECT doc_id AS media_id, {SQL_KIND} AS kind, {fv} AS fv
      FROM documents
    ),
    probes AS (
      SELECT media_id AS qid, kind AS qk, fv AS qv
      FROM feats WHERE media_id < {N_PROBES}
    ),
    scored AS (
      SELECT qid, media_id AS cid,
             {_sql_cosine('qv', 'fv')} AS cos_sim
      FROM feats JOIN probes ON kind = qk AND media_id != qid
    ),
    ranked AS (
      SELECT qid, cid, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rn
      FROM scored
    )
    SELECT qid, cid, cos_sim, rn FROM ranked WHERE rn <= {TOP_K}
    """


@register(
    "media_ann_topk",
    oracle=_media_ann_oracle(),
    doc="Media similarity search — the cross-family composition a "
    "multimodal training pipeline runs: Arrow-batched feature "
    "extraction over binary payloads (operators/multimodal."
    "extract_features) feeds the SAME array<float> contract the "
    "similarity operators use, bucketed by modality (`kind` as the "
    "coarse IVF label: an equi-join, no cross join) and ranked by "
    "exact cosine. The md5-derived stub features are 16-bit fractions, "
    "exact in float32, so the oracle reproduces every cosine "
    "bit-for-bit.",
    tags=("multimodal", "similarity", "ann", "pandas-udf"),
)
def media_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity as S
    from ..operators.cache import scoped_persist
    from .similarity import N_PROBES, TOP_K

    feats = scoped_persist(M.extract_features(_media(spark, sf_dir)))
    probes = feats.filter(F.col("media_id") < N_PROBES).select(
        F.col("media_id").alias("qid"),
        F.col("kind").alias("qlabel"),
        F.col("features").alias("qv"),
    )
    corpus = feats.select(
        F.col("media_id").alias("cid"),
        F.col("kind").alias("clabel"),
        F.col("features").alias("cv"),
    )
    return S.topk_neighbors(probes, corpus, TOP_K, bucket=True)
