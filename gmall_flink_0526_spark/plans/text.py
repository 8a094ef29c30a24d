"""Text-analysis queries over the ``documents`` table (A4/U1 plus the
training-data-pipeline text operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import textops
from ..session import load_tables
from .catalog import register

# DuckDB-side tokenizer, kept textually in lockstep with
# textops.tokenize (lower -> split on \s+ -> drop empties).
SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"
SQL_STOPS = "('" + "','".join(textops.EN_STOPWORDS) + "')"


@register(
    "keyword_stats",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({SQL_TOKS}) AS keyword FROM documents
    )
    SELECT keyword, source, COUNT(*) AS ct
    FROM toks
    GROUP BY keyword, source
    """,
    doc="A4 + U1 — KeywordStats: tokenize (the Spark analogue of the IK "
    "segmentation UDTF, RT/utils/KeywordUtil.java:13-35) -> explode -> "
    "count per keyword x source (RT/bean/KeywordStats.java:13-20).",
    tags=("text", "agg"),
)
def keyword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return (
        t["documents"]
        .select("source", F.explode(textops.tokenize(F.col("text"))).alias("keyword"))
        .groupBy("keyword", "source")
        .agg(F.count("*").alias("ct"))
    )


# -- CJK keyword stats (U1's Chinese-segmentation contract) -------------
#
# The driver fixtures are ASCII, so a deterministic CJK phrase is mixed
# into every document (same CASE on both sides) — the bigram path is
# value-checked, not just present.
_CJK_PHRASES = ("中文分词测试", "大数据平台", "你好世界hello")
_SQL_CJK_INJECT = (
    f"CASE WHEN doc_id % 3 = 0 THEN '{_CJK_PHRASES[0]}' "
    f"WHEN doc_id % 3 = 1 THEN '{_CJK_PHRASES[1]}' "
    f"ELSE '{_CJK_PHRASES[2]}' END"
)
# DuckDB twin of textops.tokenize_cjk, kept textually in lockstep:
# lower -> extract CJK/latin runs -> CJK runs to char bigrams.
_SQL_CJK_TOKS = f"""
  runs AS (
    SELECT source,
           unnest(regexp_extract_all(lower(text || ' ' || {_SQL_CJK_INJECT}),
                                     '({textops.CJK_CLASS}+|[a-z0-9]+)')) AS r
    FROM documents
  ),
  toks AS (
    SELECT source,
           unnest(CASE WHEN regexp_matches(r, '^{textops.CJK_CLASS}')
                  THEN list_transform(range(1, greatest(length(r), 2)),
                                      i -> substr(r, i, 2))
                  ELSE [r] END) AS keyword
    FROM runs
  )
"""


@register(
    "keyword_stats_cjk",
    oracle=f"""
    WITH {_SQL_CJK_TOKS}
    SELECT keyword, source, COUNT(*) AS ct
    FROM toks
    GROUP BY keyword, source
    """,
    doc="U1 (CJK) — keyword stats through the CJK-capable tokenizer: "
    "the dictionary-free analogue of the reference's IK Chinese "
    "segmentation (RT/utils/KeywordUtil.java:13-35): latin/digit runs "
    "whole, CJK runs as overlapping character bigrams; then explode + "
    "count per keyword x source like keyword_stats.",
    tags=("text", "agg", "cjk"),
)
def keyword_stats_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    inject = (
        F.when(F.col("doc_id") % 3 == 0, _CJK_PHRASES[0])
        .when(F.col("doc_id") % 3 == 1, _CJK_PHRASES[1])
        .otherwise(_CJK_PHRASES[2])
    )
    txt = F.concat(F.col("text"), F.lit(" "), inject)
    return (
        t["documents"]
        .select("source", F.explode(textops.tokenize_cjk(txt)).alias("keyword"))
        .groupBy("keyword", "source")
        .agg(F.count("*").alias("ct"))
    )


@register(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           len({SQL_TOKS}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '{textops.BPE_RE}')) AS re_tokens,
           length(text) AS n_chars
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex tokens + "
    "char length, per document. All codegen'd expressions.",
    tags=("text",),
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        F.size(textops.tokenize(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(textops.BPE_RE), 0)).alias("re_tokens"),
        F.length("text").alias("n_chars"),
    )


@register(
    "lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> x IN {SQL_STOPS})) AS DOUBLE) / len(toks) AS stop_ratio,
           CASE WHEN CAST(len(list_filter(toks, x -> x IN {SQL_STOPS})) AS DOUBLE) / len(toks) >= 0.05
                THEN 'en' ELSE 'unk' END AS pred_lang
    FROM t
    """,
    doc="Language-ID heuristic: stopword-hit ratio per document "
    "(n-gram/stopword heuristic; a model-based version would swap in a "
    "pandas UDF with the same signature).",
    tags=("text",),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(t["documents"])  # tokenize once per row
    toks = F.col("toks")
    return staged.select(
        "doc_id",
        textops.stop_ratio(toks).alias("stop_ratio"),
        textops.lang_id(toks).alias("pred_lang"),
    )


@register(
    "quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n,
             CAST(len(list_filter(toks, x -> x IN {SQL_STOPS})) AS DOUBLE) / len(toks) AS stop_score,
             CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_len
      FROM t
    )
    SELECT doc_id,
           least(n / 200.0, 1.0) * 0.4
           + stop_score * 0.3
           + (1.0 - least(abs(mean_len - 5.0) / 10.0, 1.0)) * 0.3 AS quality
    FROM c
    """,
    doc="Quality scoring: length / stopword-ratio / token-shape "
    "components combined in a fixed arithmetic order (deterministic "
    "doubles, no rounding needed).",
    tags=("text",),
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(t["documents"])  # tokenize once per row
    return staged.select(
        "doc_id", textops.quality_score(F.col("toks"), F.col("text")).alias("quality")
    )


@register(
    "doc_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 5
                  THEN list_transform(range(1, len(toks) - 3),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])
                  ELSE [] END AS s
      FROM t
    )
    SELECT doc_id,
           list_aggregate(list_transform(s, x -> substr(md5(x), 1, 16)), 'min') AS fingerprint
    FROM sh
    """,
    doc="Document fingerprinting: winnowing-style minimum hash over "
    "rolling 5-token windows (md5-hex min is lexicographic and "
    "portable across engines).",
    tags=("text", "hash"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(spread(t["documents"], "doc_id"))  # tokenize once per row
    return staged.select(
        "doc_id", textops.rolling_fingerprint(F.col("toks")).alias("fingerprint")
    )
