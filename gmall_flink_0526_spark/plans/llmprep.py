"""Training-data preparation queries — the dataset-engineering surface
a 100 TB LLM pipeline runs on top of the text/dedup operators:

- content-addressed train/val/test split (dup-safe by construction),
- fixed-window context chunking with stride,
- benchmark decontamination (n-gram overlap vs an eval set),
- SimHash near-dup *pairs* (banded candidate join + Hamming verify).

Every query is a pure DataFrame plan over ``documents`` with a DuckDB
oracle that re-derives the identical result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D, textops
from ..operators.partitioning import spread
from ..session import load_tables
from .catalog import register
from .text import SQL_TOKS

# hex nibble -> int, the DuckDB twin of Spark's conv(hex, 16, 10)
def _sql_hex4(expr: str) -> str:
    """First 4 hex chars of an md5 hex string as an integer."""
    nib = "(strpos('0123456789abcdef', substr({e}, {i}, 1)) - 1)"
    return " + ".join(
        f"{nib.format(e=expr, i=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )


TRAIN_PCT, VAL_PCT = 90, 5


@register(
    "dataset_split",
    oracle=f"""
    WITH b AS (
      SELECT CAST(({_sql_hex4('md5(text)')}) % {textops.SPLIT_BUCKETS} AS INTEGER) AS bucket,
             len({SQL_TOKS}) AS n_toks
      FROM documents
    )
    SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS doc_ct,
           CAST(SUM(n_toks) AS BIGINT) AS tok_sum
    FROM b
    GROUP BY 1
    """,
    doc="Deterministic train/val/test split: bucket = md5(text) mod "
    "100, hashed on CONTENT so byte-identical duplicates land in the "
    "same split (no train/val leakage through dups). One map-side "
    "expression + one groupBy — scales trivially; the split column "
    "would be the partition key of the output layout.",
    tags=("llm-prep", "split"),
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(t["documents"])
    return (
        staged.select(
            textops.split_name(textops.split_bucket(F.col("text")), TRAIN_PCT, VAL_PCT).alias(
                "split"
            ),
            F.size("toks").alias("n_toks"),
        )
        .groupBy("split")
        .agg(F.count("*").alias("doc_ct"), F.sum("n_toks").cast("long").alias("tok_sum"))
    )


CHUNK_TOKENS, CHUNK_STRIDE = 128, 96


@register(
    "doc_chunking",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    expanded AS (
      SELECT doc_id, t, unnest(range(1, greatest(len(t), 1) + 1, {CHUNK_STRIDE})) AS s
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           len(list_slice(t, s, s + {CHUNK_TOKENS - 1})) AS n_tokens,
           md5(array_to_string(list_slice(t, s, s + {CHUNK_TOKENS - 1}), ' ')) AS chunk_digest
    FROM expanded
    """,
    doc=f"Context-window chunking: {CHUNK_TOKENS}-token windows every "
    f"{CHUNK_STRIDE} tokens (overlap {CHUNK_TOKENS - CHUNK_STRIDE}) — "
    "the LLM pre-training prep step. Tokens staged once per row, "
    "window fan-out via sequence+transform+explode, all inside "
    "whole-stage codegen; row fan-out is bounded by doc length / "
    "stride.",
    tags=("llm-prep", "chunking"),
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return textops.chunk_docs(
        spread(t["documents"], "doc_id"),
        chunk_tokens=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
    )


DECON_NGRAM = 5
EVAL_MOD = 97


@register(
    "decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= {DECON_NGRAM}
                  THEN list_transform(range(1, len(t) - {DECON_NGRAM - 2}),
                       i -> array_to_string(list_slice(t, i, i + {DECON_NGRAM - 1}), ' '))
                  ELSE [] END) AS s
      FROM toks
    ),
    train_g AS (
      SELECT doc_id, md5(unnest(s)) AS gh FROM sh WHERE doc_id % {EVAL_MOD} != 0
    ),
    eval_g AS (
      SELECT DISTINCT md5(unnest(s)) AS gh FROM sh WHERE doc_id % {EVAL_MOD} = 0
    )
    SELECT doc_id, COUNT(*) AS hit_ct
    FROM train_g JOIN eval_g USING (gh)
    GROUP BY doc_id
    """,
    doc=f"Benchmark decontamination: flag training docs sharing any "
    f"{DECON_NGRAM}-token shingle with the eval set (here doc_id % "
    f"{EVAL_MOD} == 0 plays the benchmark). Both sides reduce to "
    "(id, shingle-md5) and meet in ONE equi-join on the hash — "
    "bucketed like LSH candidates, never doc-vs-doc; the eval side is "
    "distinct'd and broadcast-sized in practice.",
    tags=("llm-prep", "dedup", "decontamination"),
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return D.contaminated_docs(
        t["documents"], F.col("doc_id") % EVAL_MOD == 0, ngram=DECON_NGRAM
    )


PAIR_BITS = 32  # 16-bit fingerprints collide too much for pairing


def _sql_hex_val(expr: str, nhex: int) -> str:
    """First ``nhex`` hex chars of an md5 string as a BIGINT (the
    DuckDB twin of Spark's conv(substr(md5, 1, nhex), 16, 10))."""
    nib = "(strpos('0123456789abcdef', substr({e}, {i}, 1)) - 1)"
    return " + ".join(
        f"{nib.format(e=expr, i=i + 1)} * {16 ** (nhex - 1 - i)}" for i in range(nhex)
    )


@register(
    "simhash_near_dup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents
    ), h AS (
      SELECT doc_id,
             {_sql_hex_val('md5(tok)', PAIR_BITS // 4)} AS hv
      FROM toks
    ), votes AS (
      SELECT doc_id, j,
             SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT unnest(range(0, {PAIR_BITS})) AS j) jj
      GROUP BY doc_id, j
    ), fp AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, simhash, b, (simhash >> (b * {PAIR_BITS // 4})) & {(1 << (PAIR_BITS // 4)) - 1} AS bv
      FROM fp, (SELECT unnest(range(0, 4)) AS b) bb
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
                      a.simhash AS sa, c.simhash AS sb
      FROM banded a JOIN banded c
        ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand
    WHERE bit_count(xor(sa, sb)) <= 3
    """,
    doc=f"SimHash near-dup PAIRS (the detection half simhash_fingerprint "
    f"leaves open): {PAIR_BITS}-bit fingerprints split into 4 8-bit "
    "bands; pigeonhole guarantees pairs within Hamming 3 share a band, "
    "so candidates = equi-join on (band, value) — the multi-index "
    "SimHash recipe, never all-pairs — then popcount(xor) verifies "
    "exactly.",
    tags=("llm-prep", "dedup", "simhash"),
)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    fp = D.simhash(t["documents"], "doc_id", "text", bits=PAIR_BITS)
    return D.simhash_near_dup_pairs(fp, bits=PAIR_BITS, max_hamming=3, bands=4)
