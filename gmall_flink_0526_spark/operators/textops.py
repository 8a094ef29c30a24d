"""Text-analysis operators for large-scale training-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions``
expressions (split / transform / aggregate / md5) — no Python UDFs in
the hot path — so the operators stay inside whole-stage codegen and
scale linearly with partitions. The tokenizer is the engine's
registered ``tokenize`` function, the Spark analogue of the
reference's IK segmentation UDTF (RT/utils/KeywordUtil.java:13-35).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Whitespace tokenizer — deterministic and portable to the oracle's
# string_split_regex. Lowercase first so dedup/fingerprints are
# case-insensitive.
TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punct token pattern (portable RE2/Java subset).
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokenize(text: Column) -> Column:
    """U1 — text -> array<string> of lowercase whitespace tokens.

    NOTE: when the token array is consumed more than once (or inside a
    higher-order-function lambda), materialize it first with
    :func:`with_tokens` — Catalyst inlines expression trees into lambda
    bodies, and a lambda re-evaluates its captured expressions PER
    ELEMENT, turning an inlined tokenize into O(tokens x elements)
    regex splits per row.
    """
    toks = F.split(F.lower(text), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != "")


CJK_LO, CJK_HI = "一", "鿿"  # CJK Unified Ideographs block
CJK_CLASS = f"[{CJK_LO}-{CJK_HI}]"
# a maximal run of either CJK ideographs or latin/digit word chars;
# everything else (punctuation, space) separates runs
CJK_RUN_RE = f"({CJK_CLASS}+|[a-z0-9]+)"


def cjk_bigrams(run: Column) -> Column:
    """Character bigrams over one CJK run (a 1-char run stays a 1-char
    token). ``run`` must be a lambda variable / plain attribute, not an
    expression tree (see the lambda-inlining note on :func:`tokenize`)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(run) - 1, F.lit(1)))
    return F.transform(idx, lambda i: run.substr(i, F.lit(2)))


def tokenize_cjk(text: Column) -> Column:
    """U1, CJK-capable — text -> array<string> tokens.

    The reference tokenizes with IK *Chinese* segmentation
    (RT/utils/KeywordUtil.java:13-35); a whitespace split returns whole
    CJK sentences as single tokens. Dictionary segmentation isn't
    portable to a SQL oracle, so this uses the standard dictionary-free
    fallback — the same one IK's letter/CJK segmenters reduce to
    without a dictionary: latin/digit runs are whole lowercase tokens,
    CJK runs emit overlapping character bigrams. 100% JVM expressions
    (regexp_extract_all + transform), no Python in the hot path.
    """
    runs = F.regexp_extract_all(F.lower(text), F.lit(CJK_RUN_RE), 1)
    return F.flatten(
        F.transform(
            runs,
            lambda r: F.when(r.rlike(f"^{CJK_CLASS}"), cjk_bigrams(r)).otherwise(F.array(r)),
        )
    )


def with_tokens(df, text_col: str = "text", out: str = "toks"):
    """Stage the token array as a real column (projection barrier):
    downstream expressions reference a cheap attribute, so codegen
    evaluates the regex split exactly once per row."""
    return df.withColumn(out, tokenize(F.col(text_col)))


def shingles(tokens: Column, n: int = 3) -> Column:
    """n-gram shingles (space-joined token windows), used by minhash /
    jaccard / fingerprinting. Empty when the doc has fewer than n
    tokens (guarded: Spark's sequence(1,0) would count *down*)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j) for j in range(n)])  # noqa: E731
    return F.when(F.size(tokens) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def stopword_count(tokens: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))


def lang_id(tokens: Column, threshold: float = 0.05) -> Column:
    """Language-ID heuristic: stopword-hit ratio over the token stream.
    (A real model would be a pandas UDF; the heuristic is the operator
    contract and is what the oracle reproduces.)"""
    ratio = stop_ratio(tokens)
    return F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def stop_ratio(tokens: Column) -> Column:
    return stopword_count(tokens).cast("double") / F.size(tokens)


def mean_token_len(tokens: Column) -> Column:
    total = F.aggregate(tokens, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(tokens)


def quality_score(tokens: Column, text: Column) -> Column:
    """Quality scoring: length, stopword and token-shape components,
    combined with a fixed arithmetic order so any engine reproduces the
    exact double."""
    n = F.size(tokens).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_score = stop_ratio(tokens)
    shape_score = F.lit(1.0) - F.least(
        F.abs(mean_token_len(tokens) - F.lit(5.0)) / F.lit(10.0), F.lit(1.0)
    )
    return length_score * F.lit(0.4) + stop_score * F.lit(0.3) + shape_score * F.lit(0.3)


def rolling_fingerprint(tokens: Column, n: int = 5, prefix_len: int = 16) -> Column:
    """Document fingerprint: minimum md5 over rolling n-token windows
    (winnowing-style min-hash of the rolling shingle set). Hex-string
    min is lexicographic in every engine."""
    return F.array_min(
        F.transform(shingles(tokens, n), lambda s: F.substring(F.md5(s), 1, prefix_len))
    )


# -- training-data prep: split & chunking -------------------------------

SPLIT_BUCKETS = 100


def split_bucket(text: Column) -> Column:
    """Content-addressed split bucket in [0, 100): first 4 hex chars of
    md5(text) as an int, mod 100. Hashing the *content* (not the id)
    sends byte-identical duplicates to the same split — the standard
    guard against train/val leakage through dups. Pure JVM expression;
    md5-hex is portable to any oracle engine.
    """
    return (F.conv(F.substring(F.md5(text), 1, 4), 16, 10).cast("long") % SPLIT_BUCKETS).cast(
        "int"
    )


def split_name(bucket: Column, train_pct: int = 90, val_pct: int = 5) -> Column:
    return (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )


def chunk_docs(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 96,
):
    """Context-window chunking: fixed ``chunk_tokens``-token windows
    every ``stride`` tokens (overlap = chunk_tokens - stride), the
    standard LLM pre-training prep step. Output: (doc_id, chunk_idx,
    n_tokens, chunk_digest=md5 of the space-joined window).

    Tokens are staged once per row; the window fan-out is
    sequence+transform+explode — all JVM expressions, parallel in the
    scan's partitioning (spread upstream if the scan is narrow).
    """
    staged = df.select(F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride))
    chunks = staged.select(
        "doc_id",
        "toks",
        F.explode(
            F.transform(
                starts,
                lambda s: F.struct(
                    ((s - 1) / stride).cast("int").alias("chunk_idx"),
                    F.slice(F.col("toks"), s, chunk_tokens).alias("w"),
                ),
            )
        ).alias("c"),
    ).filter(F.size("toks") > 0)
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.w").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("c.w"))).alias("chunk_digest"),
    )
