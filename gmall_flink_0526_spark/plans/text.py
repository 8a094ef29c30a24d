"""Text-analysis queries over the ``documents`` table (A4/U1 plus the
training-data-pipeline text operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import textops
from ..session import load_tables
from .catalog import register, register_setup

# DuckDB-side tokenizer, kept textually in lockstep with
# textops.tokenize (lower -> split on \s+ -> drop empties).
SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t != '')"
SQL_STOPS = "('" + "','".join(textops.EN_STOPWORDS) + "')"


def sql_hex_val(expr: str, nhex: int) -> str:
    """First ``nhex`` hex chars of a hex string expression as a BIGINT
    (the DuckDB twin of Spark's conv(substr(h, 1, nhex), 16, 10)) —
    the cross-engine bridge every md5-arithmetic oracle uses."""
    nib = "(strpos('0123456789abcdef', substr({e}, {i}, 1)) - 1)"
    return " + ".join(
        f"{nib.format(e=expr, i=i + 1)} * {16 ** (nhex - 1 - i)}" for i in range(nhex)
    )


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


TFIDF_TOP_K = 5


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
      GROUP BY doc_id, tok
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
    scored AS (
      SELECT doc_id, tok, tf, df,
             CAST(tf AS DOUBLE) * n_docs / df AS score
      FROM tf JOIN dfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, CAST(rk AS INTEGER) AS rk, tok, tf, df, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, tok) AS rk
          FROM scored)
    WHERE rk <= {TFIDF_TOP_K}
    """,
    doc=f"TF-IDF keyword extraction: top-{TFIDF_TOP_K} terms per doc by "
    "term frequency x inverse document frequency. The idf factor is the "
    "raw ratio n_docs/df rather than its log: every arithmetic step "
    "(int-exact multiply, one IEEE-correctly-rounded divide) is then "
    "bit-reproducible across engines — same reason sums go through "
    "decimal — and per-document ranking within a tf level is identical "
    "to the log form (both monotone in df). Shape: one explode + two "
    "grouped aggs (map-side partial), a vocab-keyed join for df, and a "
    "doc-keyed window top-k; the n_docs scalar rides a broadcast, never "
    "a collect.",
    tags=("text", "llm-prep", "agg"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    tf = scoped_persist(
        textops.with_tokens(spread(t["documents"], "doc_id"))
        .select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf").cast("double") * F.col("n_docs") / F.col("df"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TFIDF_TOP_K)
        .select("doc_id", "rk", "tok", "tf", "df", "score")
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


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents)
    SELECT lang,
           CASE WHEN CAST(len(list_filter(toks, x -> x IN {SQL_STOPS})) AS DOUBLE)
                     / len(toks) >= 0.05
                THEN 'en' ELSE 'unk' END AS pred_lang,
           COUNT(*) AS n_docs
    FROM t
    GROUP BY 1, 2
    """,
    doc="Language-ID quality audit — the heuristic's confusion matrix "
    "against the corpus's ground-truth `lang` column: one grouped "
    "count over (truth, prediction). The report that decides whether "
    "the stopword threshold holds before the gate ships; same "
    "cross-method-audit family as ann_recall_ivf and "
    "dedup_method_agreement.",
    tags=("text", "audit"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(t["documents"])
    return (
        staged.select("lang", textops.lang_id(F.col("toks")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


# Vocabulary-audit width: how many head tokens the coverage report
# keeps. 100 is report-sized; production sets it to the tokenizer
# budget under evaluation.
VOCAB_TOP = 100


@register(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (SELECT unnest({SQL_TOKS}) AS token FROM documents),
    tf AS (SELECT token, COUNT(*) AS ct FROM toks GROUP BY token),
    tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS total_tokens FROM tf),
    ranked AS (
      SELECT token, ct, ROW_NUMBER() OVER (ORDER BY ct DESC, token) AS rn
      FROM tf
    ), top AS (SELECT token, ct, rn FROM ranked WHERE rn <= {VOCAB_TOP})
    SELECT rn, token, ct,
           CAST(SUM(ct) OVER (ORDER BY rn) AS BIGINT) AS cum_ct,
           CAST(SUM(ct) OVER (ORDER BY rn) AS DOUBLE) / total_tokens
             AS cum_coverage
    FROM top CROSS JOIN tot
    """,
    doc=f"Vocabulary / Zipf coverage audit — the tokenizer-design "
    f"report: the {VOCAB_TOP} most frequent corpus tokens with their "
    f"cumulative share of ALL token occurrences (how much of the "
    f"corpus a head vocabulary of size N explains). One explode + one "
    f"partial-aggregated count shuffle; the global head is "
    f"TakeOrderedAndProject (per-partition top-N, then merge — never "
    f"a single-partition sort of the vocabulary), and the rank + "
    f"cumulative windows run over the <= {VOCAB_TOP} post-limit rows "
    f"only. Counts are exact integers, coverage a single double "
    f"division — bit-identical on any engine.",
    tags=("text", "audit", "llm-prep"),
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.cache import scoped_persist

    t = load_tables(spark, sf_dir, "documents")
    tf = scoped_persist(
        t["documents"]
        .select(F.explode(textops.tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("ct"))
    )
    tot = tf.agg(F.sum("ct").cast("long").alias("total_tokens"))
    # orderBy + limit plans TakeOrderedAndProject: each partition keeps
    # its own top-N and the driver merges — the distributed head, not a
    # global sort. The windows below only ever see these <= N rows.
    top = tf.orderBy(F.col("ct").desc(), "token").limit(VOCAB_TOP)
    w_rn = W.orderBy(F.col("ct").desc(), "token")
    w_cum = W.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rn", F.row_number().over(w_rn))
        .withColumn("cum_ct", F.sum("ct").over(w_cum).cast("long"))
        .select(
            "rn",
            "token",
            "ct",
            "cum_ct",
            (F.col("cum_ct").cast("double") / F.col("total_tokens")).alias("cum_coverage"),
        )
    )


# -- BPE merge candidates -------------------------------------------------

BPE_TOP = 50


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS pair
      FROM toks WHERE len(t) >= 2
    ),
    pf AS (SELECT pair, COUNT(*) AS ct FROM pairs GROUP BY pair),
    ranked AS (
      SELECT pair, ct, ROW_NUMBER() OVER (ORDER BY ct DESC, pair) AS rn
      FROM pf
    )
    SELECT rn, pair, ct FROM ranked WHERE rn <= {BPE_TOP}
    """,
    doc=f"BPE merge-candidate induction — ONE round of the byte-pair-"
    f"encoding tokenizer-training loop at corpus scale: count every "
    f"ADJACENT token pair and rank the top {BPE_TOP} merge candidates "
    "(highest-count pair = the next merge a BPE trainer would add; "
    "re-run after applying merges for the full loop — each round is "
    "this same query over the re-tokenized corpus). Shape: tokens "
    "staged once per row (projection barrier, so the lambda never "
    "re-tokenizes per element), adjacent pairs via "
    "sequence+transform+explode inside whole-stage codegen (fan-out "
    "exactly tokens-1 per doc, linear), ONE map-side-combinable count "
    "shuffle on the pair, head via TakeOrderedAndProject "
    "(per-partition top-N + driver merge, never a vocabulary²-wide "
    "sort); the rank window sees only the post-limit rows.",
    tags=("text", "llm-prep", "tokenizer"),
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    top = _pair_counts(spark, sf_dir).orderBy(F.col("ct").desc(), "pair").limit(BPE_TOP)
    return top.select(
        F.row_number().over(W.orderBy(F.col("ct").desc(), "pair")).alias("rn"),
        "pair",
        "ct",
    )


_SQL_PAIRS = (
    "unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))"
)


def apply_merge(toks, ma: str, mb: str, sep: str = " "):
    """One greedy left-to-right BPE merge pass over a token array: every
    adjacent (ma, mb) collapses to the ``sep``-joined merged symbol, and
    a just-merged symbol never re-matches as the left side of the same
    pair ('a a a' under merge (a,a) -> ['a a', 'a'], the BPE trainer's
    rule). ``sep`` defaults to the word-level loop's space joiner;
    the char-level trainer (:func:`bpe_train_loop`) passes ``""`` so
    't'+'h' merges to the subword 'th'. An ``aggregate`` fold inside
    whole-stage codegen — the accumulator is the rewritten prefix, cost
    linear per token; DuckDB mirrors it with ``list_reduce`` over the
    identical CASE, so both engines rewrite every document
    identically."""
    merged = F.lit(f"{ma}{sep}{mb}")
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(ma))
            & (t == F.lit(mb)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(t))),
    )


BPE_TOP2 = 10


@register(
    "bpe_apply_merge",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    p1 AS (
      SELECT {_SQL_PAIRS} AS pair FROM toks WHERE len(t) >= 2
    ),
    top1 AS (
      SELECT string_split(pair, ' ')[1] AS ma, string_split(pair, ' ')[2] AS mb
      FROM (SELECT pair, COUNT(*) AS ct FROM p1 GROUP BY pair
            ORDER BY ct DESC, pair LIMIT 1)
    ),
    m AS (
      SELECT list_reduce(
        list_prepend(CAST([] AS VARCHAR[]), list_transform(t, x -> [x])),
        (acc, nxt) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = ma
                           AND nxt[1] = mb
                      THEN list_concat(list_slice(acc, 1, len(acc) - 1),
                                       [ma || ' ' || mb])
                      ELSE list_concat(acc, nxt) END) AS t
      FROM toks CROSS JOIN top1
    ),
    p2 AS (
      SELECT {_SQL_PAIRS} AS pair FROM m WHERE len(t) >= 2
    ),
    pf AS (SELECT pair, COUNT(*) AS ct FROM p2 GROUP BY pair),
    ranked AS (
      SELECT pair, ct, ROW_NUMBER() OVER (ORDER BY ct DESC, pair) AS rn
      FROM pf
    )
    SELECT rn, pair, ct FROM ranked WHERE rn <= {BPE_TOP2}
    """,
    doc=f"ROUND TWO of the BPE loop — `bpe_merge_candidates` learns the "
    "top merge, this query APPLIES it corpus-wide and re-counts: every "
    "adjacent occurrence of the learned pair collapses to the merged "
    "symbol via a greedy left-to-right `aggregate` fold (linear per "
    "token, whole-stage codegen — never a Python UDF or a "
    "per-position self-join), then the adjacent-pair count reruns "
    f"over the rewritten corpus for the next {BPE_TOP2} merge "
    "candidates — pairs CONTAINING the merged symbol prove the loop "
    "actually composes. The learned pair is a memoized 1-row "
    "corpus scalar (the centroid-table class); the oracle re-learns "
    "it in a CTE and mirrors the fold with DuckDB's list_reduce over "
    "the identical CASE, so both engines rewrite every document — "
    "including the 'a a a' overlap rule — token-for-token.",
    tags=("text", "llm-prep", "tokenizer"),
)
def bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    ma, mb = _bpe_top_pair(spark, sf_dir).split(" ")
    staged = textops.with_tokens(spread(t["documents"], "doc_id"))
    rewritten = staged.select(apply_merge(F.col("toks"), ma, mb).alias("toks"))
    pairs = rewritten.filter(F.size("toks") >= 2).select(
        F.explode(_pair_expr()).alias("pair")
    )
    pf = pairs.groupBy("pair").agg(F.count("*").alias("ct"))
    top = pf.orderBy(F.col("ct").desc(), "pair").limit(BPE_TOP2)
    return top.select(
        F.row_number().over(W.orderBy(F.col("ct").desc(), "pair")).alias("rn"),
        "pair",
        "ct",
    )


def _pair_expr():
    """Adjacent-pair array from the staged ``toks`` column — shared by
    both BPE queries so the learn and apply rounds count pairs
    identically."""
    return F.expr(
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )


def _bpe_top_pair(spark: SparkSession, sf_dir: str) -> str:
    """The corpus's top word-level adjacent pair — ONE 1-row collect,
    memoized per corpus (the bounded-scalar class); derivation
    identical to the apply oracle's top1 CTE and bpe_merge_candidates'
    rank rule (ct DESC, pair ASC). The single definition both
    bpe_apply_merge and the bpe_memos bench setup call — two copies
    under one memo key would let the first writer silently shadow a
    changed derivation."""
    from ..operators.cache import corpus_value

    return corpus_value(
        spark, "bpe_top_pair", sf_dir,
        lambda: _pair_counts(spark, sf_dir)
        .orderBy(F.col("ct").desc(), "pair")
        .limit(1)
        .collect()[0]["pair"],
    )


def _pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair, ct) over the raw corpus — the learn side, shared by
    `bpe_merge_candidates` and `bpe_apply_merge`'s top-1 memo."""
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    staged = textops.with_tokens(spread(t["documents"], "doc_id"))
    return (
        staged.filter(F.size("toks") >= 2)
        .select(F.explode(_pair_expr()).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("ct"))
    )


# -- BPE trainer loop (char-level, word-frequency vocab) ----------------

BPE_LOOP_ROUNDS = 8


def _sql_bpe_loop() -> str:
    """The N-round char-level BPE trainer as chained DuckDB CTEs — each
    round learns the max-weight adjacent symbol pair over the
    word-frequency vocab and rewrites the vocab with ``list_reduce``
    before the next round learns, exactly mirroring the Spark loop's
    fold (same greedy left-to-right overlap rule, same ct DESC /
    'ma|mb' ASC tie-break)."""
    ctes = f"""vocab AS (
      SELECT t AS word, COUNT(*) AS freq
      FROM (SELECT unnest({SQL_TOKS}) AS t FROM documents) GROUP BY t
    ),
    v0 AS (SELECT word, freq, string_split(word, '') AS s FROM vocab)"""
    prev = "v0"
    for r in range(1, BPE_LOOP_ROUNDS + 1):
        ctes += f""",
    p{r} AS (
      SELECT unnest(list_transform(range(1, len(s)), i -> [s[i], s[i + 1]])) AS pr,
             freq
      FROM {prev} WHERE len(s) >= 2
    ),
    top{r} AS (
      SELECT pr[1] AS ma, pr[2] AS mb, CAST(SUM(freq) AS BIGINT) AS ct
      FROM p{r} GROUP BY 1, 2
      ORDER BY ct DESC, pr[1] || '|' || pr[2] LIMIT 1
    ),
    v{r} AS (
      SELECT word, freq, list_reduce(
        list_prepend(CAST([] AS VARCHAR[]), list_transform(s, x -> [x])),
        (acc, nxt) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = ma
                           AND nxt[1] = mb
                      THEN list_concat(list_slice(acc, 1, len(acc) - 1),
                                       [ma || mb])
                      ELSE list_concat(acc, nxt) END) AS s
      FROM {prev} CROSS JOIN top{r}
    )"""
        prev = f"v{r}"
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, ma || '|' || mb AS pair, ct FROM top{r}"
        for r in range(1, BPE_LOOP_ROUNDS + 1)
    )
    return f"WITH {ctes} SELECT round, pair, ct FROM ({sel}) ORDER BY round"


@register(
    "bpe_train_loop",
    oracle=_sql_bpe_loop(),
    doc=f"The FULL BPE trainer loop — {BPE_LOOP_ROUNDS} sequential "
    "char-level merges over a word-frequency vocab, the textbook "
    "subword-nmt/HF-tokenizers algorithm (vs the word-level single "
    "rounds of `bpe_merge_candidates`/`bpe_apply_merge`): round r "
    "learns the max-total-frequency adjacent symbol pair, collapses it "
    "vocab-wide with the shared greedy `aggregate` fold (joiner '', so "
    "'t'+'h' -> 'th'), and round r+1 learns over the REWRITE — later "
    "rounds learn pairs containing earlier merged symbols (round 6 "
    "learns 'm|er' on the test corpus), proving the loop composes. "
    "The 100 TB shape is the trainer's classic optimization: the "
    "corpus is scanned ONCE into the (word, freq) vocab (map-side "
    "combinable count; vocab size = distinct words, heavy-tailed and "
    "tiny relative to the corpus), and every iterative round runs "
    "over the vocab alone — per-round cost is vocab-sized, never a "
    "corpus rescan. Each round's learned pair is a 1-row bounded "
    "collect (the centroid-table class), memoized per corpus as ONE "
    "merge list; deep runs (production trains 30k merges) cut the "
    "fold-chain lineage with one localCheckpoint every "
    "BPE_CKPT_EVERY=16 rounds (the connected_components per-round "
    "precedent; exercised by the deep-loop test) — at N="
    f"{BPE_LOOP_ROUNDS} the chain stays in one plan. Oracle: "
    "the identical loop as chained DuckDB list_reduce CTEs.",
    tags=("text", "llm-prep", "tokenizer", "iterative"),
)
def bpe_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import corpus_value

    vocab = _bpe_vocab(spark, sf_dir)
    merges = corpus_value(
        spark, "bpe_loop_merges", sf_dir, lambda: _train_bpe_loop(vocab)
    )
    # the learned merge table is a driver-side model artifact
    # (centroids-class): N rows, emitted directly
    return spark.createDataFrame(
        [(r, f"{ma}|{mb}", int(ct)) for r, ma, mb, ct in merges],
        "round int, pair string, ct long",
    )


def _bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq): the corpus word-frequency vocab — the ONE corpus
    scan the whole BPE train/encode family rides (corpus-persisted)."""
    from ..operators.cache import corpus_persist

    def _vocab() -> DataFrame:
        t = load_tables(spark, sf_dir, "documents")
        return (
            textops.with_tokens(t["documents"])
            .select(F.explode("toks").alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("freq"))
        )

    return corpus_persist(spark, "bpe_vocab", sf_dir, _vocab)


# lineage-cut cadence for deep trainer runs: each round nests one more
# aggregate fold into the plan, and past a few dozen rounds analysis
# cost (and eventually the 64KB codegen method limit) dominates — cut
# with ONE localCheckpoint every K rounds, the connected_components
# per-round precedent (operators/graph.py). At the catalog's N=8 the
# cut never fires; the deep-loop test drives it explicitly.
BPE_CKPT_EVERY = 16


def _train_bpe_loop(
    vocab: DataFrame, rounds: int = BPE_LOOP_ROUNDS
) -> list[tuple[int, str, str, int]]:
    """The iterative trainer: N rounds of learn-top-pair + vocab-wide
    merge fold over ``vocab``. Shared by bpe_train_loop (emits the
    merge table) and bpe_encode_corpus (applies it)."""
    syms = vocab.select("word", "freq", F.split("word", "").alias("s"))
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pairs = (
            syms.filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), i -> "
                        "struct(element_at(s, i) AS ma,"
                        " element_at(s, i + 1) AS mb))"
                    )
                ).alias("pr"),
                "freq",
            )
            .groupBy(F.col("pr.ma").alias("ma"), F.col("pr.mb").alias("mb"))
            .agg(F.sum("freq").alias("ct"))
        )
        # 1-row bounded collect per round — BPE training is
        # inherently a driver-paced iteration (the merge list IS
        # the model); same tie rule as the oracle's top{r} CTE
        top = pairs.orderBy(
            F.col("ct").desc(), F.concat("ma", F.lit("|"), "mb")
        ).limit(1).collect()[0]
        merges.append((r, top["ma"], top["mb"], top["ct"]))
        syms = syms.withColumn(
            "s", apply_merge(F.col("s"), top["ma"], top["mb"], sep="")
        )
        if r % BPE_CKPT_EVERY == 0 and r < rounds:
            # vocab-sized materialization; supersedes the previous cut
            syms = syms.localCheckpoint()
    return merges


def _sql_bpe_encode() -> str:
    """Corpus token frequencies under the learned BPE merges — reuses
    the trainer's chained CTEs verbatim (``_sql_bpe_loop``'s vocab and
    rewrite chain) and reads the FINAL rewrite: per symbol, the corpus
    frequency is the word-frequency-weighted occurrence count."""
    loop = _sql_bpe_loop()
    # keep the CTE chain, swap the trainer's final SELECT for the
    # encode rollup over the last rewrite v{N}
    ctes = loop[: loop.rindex("SELECT round")]
    return f"""{ctes}
    SELECT sym AS symbol, CAST(SUM(freq) AS BIGINT) AS token_ct
    FROM (SELECT unnest(s) AS sym, freq FROM v{BPE_LOOP_ROUNDS})
    GROUP BY sym
    """


@register(
    "bpe_encode_corpus",
    oracle=_sql_bpe_encode(),
    doc="The ENCODE step over bpe_train_loop's learned model — corpus "
    "token frequencies under the full merge list, the compression "
    "report a tokenizer team reads after training (which subwords "
    "carry the token mass; total = post-BPE corpus token count). The "
    "100 TB shape is the production tokenizer's word-cache trick: "
    "the corpus is represented by its (word, freq) vocab (one scan, "
    "the memoized corpus table), the merge list applies to the VOCAB "
    "(vocab-sized fold chain, never a corpus rescan), and per-symbol "
    "corpus mass is the freq-weighted occurrence rollup — so "
    "encoding cost scales with distinct words, not tokens. Oracle "
    "reuses the trainer's chained list_reduce CTEs verbatim and "
    "rolls up the final rewrite.",
    tags=("text", "llm-prep", "tokenizer"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cache import corpus_value

    vocab = _bpe_vocab(spark, sf_dir)
    # the learned model: memoized by bpe_train_loop (or trained now)
    merges = corpus_value(
        spark, "bpe_loop_merges", sf_dir, lambda: _train_bpe_loop(vocab)
    )
    syms = vocab.select("freq", F.split("word", "").alias("s"))
    for _, ma, mb, _ in merges:
        syms = syms.withColumn("s", apply_merge(F.col("s"), ma, mb, sep=""))
    return (
        syms.select(F.explode("s").alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").alias("token_ct"))
    )


# -- count-min heavy hitters --------------------------------------------

CMS_TOP = 20


def _sql_cms_audit() -> str:
    """The CMS heavy-hitter audit as DuckDB SQL — shared verbatim by
    `heavy_hitters_cms` (one-shot grid) and the streaming replay
    `heavy_hitters_stream` (per-epoch grids summed): the sketch is
    additive, so both engines' grids — and both build paths — are the
    same grid."""
    from ..operators.aggregates import CMS_DEPTH, CMS_WIDTH

    rows = ", ".join(str(i) for i in range(CMS_DEPTH))
    bucket = (
        "("
        + sql_hex_val("substr(md5(CAST({i} AS VARCHAR) || '#' || {tok}), 1, 8)", 8)
        + f") % {CMS_WIDTH}"
    )
    return f"""
        WITH tok AS (SELECT unnest({SQL_TOKS}) AS tok FROM documents),
        cnt AS (SELECT tok, COUNT(*) AS exact_ct FROM tok GROUP BY tok),
        topk AS (
          SELECT tok, exact_ct FROM cnt
          ORDER BY exact_ct DESC, tok LIMIT {CMS_TOP}
        ),
        probes AS (SELECT tok, unnest([{rows}]) AS i FROM tok),
        counters AS (
          SELECT i, {bucket.format(i="i", tok="tok")} AS b, COUNT(*) AS ct
          FROM probes GROUP BY 1, 2
        ),
        kp AS (SELECT tok, exact_ct, unnest([{rows}]) AS i FROM topk),
        est AS (
          -- LEFT + COALESCE 0: a probed cell absent from the counters
          -- grid is a ZERO counter, exactly cms_estimate's left-join
          -- + coalesce semantics — so the twin stays faithful even
          -- for keys that never occurred in the sketched stream
          -- (top-k probes always populate their own cells, but the
          -- SQL must share the operator's contract, not rely on it)
          SELECT k.tok, k.exact_ct, min(COALESCE(c.ct, 0)) AS cms_est
          FROM kp k
          LEFT JOIN counters c
            ON c.i = k.i
           AND c.b = {bucket.format(i="k.i", tok="k.tok")}
          GROUP BY 1, 2
        )
        SELECT tok, exact_ct, cms_est, cms_est - exact_ct AS over_ct FROM est
        """


def _register_heavy_hitters_cms():
    from ..operators.aggregates import CMS_DEPTH, CMS_WIDTH

    @register(
        "heavy_hitters_cms",
        oracle=_sql_cms_audit(),
        doc=f"Count-min-sketch heavy-hitter audit: a {CMS_DEPTH}x"
        f"{CMS_WIDTH} counter grid (fixed memory at ANY corpus size, "
        "built by one map-side-combinable grouped count, mergeable "
        "across shards by addition) point-estimates the exact top-"
        f"{CMS_TOP} tokens; over_ct = cms_est - exact_ct is the "
        "collision error actually paid, never negative — the "
        "calibration read before trusting the sketch as the 100 TB "
        "swap for a corpus-wide exact count table. Seeded-md5-slice "
        "hashing makes the grid bit-identical cross-engine, so the "
        "oracle re-derives estimates INCLUDING collision error; the "
        "exact top-k plans as TakeOrderedAndProject (per-partition "
        "head + driver merge, no global sort) and the probe join "
        "broadcasts the <=3072-row grid.",
        tags=("text", "sketch", "agg"),
    )
    def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.aggregates import cms_counters, cms_estimate
        from ..operators.cache import scoped_persist

        t = load_tables(spark, sf_dir, "documents")
        toks = scoped_persist(
            t["documents"].select(
                F.explode(textops.tokenize(F.col("text"))).alias("tok")
            )
        )
        counters = cms_counters(toks, "tok")
        topk = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("exact_ct"))
            .orderBy(F.col("exact_ct").desc(), "tok")
            .limit(CMS_TOP)
        )
        return cms_estimate(topk, counters, "tok").select(
            "tok",
            "exact_ct",
            "cms_est",
            (F.col("cms_est") - F.col("exact_ct")).alias("over_ct"),
        )


_register_heavy_hitters_cms()


# -- named corpus-scoped setups (bench ledger lines; see catalog.SETUPS)


@register_setup("bpe_memos")
def _setup_bpe_memos(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the BPE corpus memos: the word-frequency vocab, the
    word-level top-pair scalar (bpe_apply_merge's memo) and the full
    char-level merge list (bpe_train_loop's model)."""
    _bpe_top_pair(spark, sf_dir)
    # the loop's own accessors memoize vocab + merges
    bpe_train_loop(spark, sf_dir).count()


# -- BM25 sparse retrieval ------------------------------------------------
#
# The sparse complement of the dense ANN family: per-query top-k over
# the corpus by BM25 scoring through the inverted index (a token-keyed
# equi-join — the decontamination shape, never query x corpus). The
# idf factor is the RAW ratio n_docs/df (the tfidf precedent): every
# arithmetic step is then either exact-integer or a fixed-order IEEE
# double op, so both engines produce identical scores and rankings —
# a raw-ratio BM25 variant weights rare terms more steeply than the
# log form (documented, not hidden); swap in log-idf on a stack whose
# engines share one libm. k1/b are the standard 1.2/0.75.

BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERIES = 4  # the first N docs play the query set
BM25_TOP = 10


def _sql_bm25() -> str:
    from ..functions.exact import sql_sum

    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, len(t) AS dl FROM toks WHERE len(t) > 0),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    q AS (
      -- tf is grouped by (doc_id, tok): rows are already unique
      SELECT doc_id AS qid, tok
      FROM tf WHERE doc_id < {BM25_N_QUERIES}
    ),
    terms AS (
      SELECT q.qid, tf.doc_id,
             (n_docs / df) * ((CAST(tf AS DOUBLE) * {1.0 + BM25_K1})
               / (CAST(tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B}
                    * (CAST(dl AS DOUBLE) / avgdl)))) AS term
      FROM q
      JOIN tf ON q.tok = tf.tok AND tf.doc_id != q.qid
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dfreq ON q.tok = dfreq.tok
      CROSS JOIN stats
    ),
    scored AS (
      SELECT qid, doc_id, {sql_sum('term')} AS score
      FROM terms GROUP BY qid, doc_id
    )
    SELECT qid, doc_id, score, CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY score DESC, doc_id) AS rk
          FROM scored)
    WHERE rk <= {BM25_TOP}
    """


@register(
    "bm25_topk",
    oracle=_sql_bm25(),
    doc=f"BM25 sparse retrieval: the first {BM25_N_QUERIES} documents "
    f"play the query set, and each retrieves its top-{BM25_TOP} corpus "
    "documents by BM25 over the shared-token inverted index — the "
    "sparse complement of the ann_topk family (hybrid retrieval runs "
    "both and fuses). Scoring joins query tokens to the tf table on "
    "the TOKEN key (the decontamination shape — candidates are "
    "token-overlap-bounded, never query x corpus), per-(query, doc) "
    "scores are DECIMAL-accumulated over fixed-order IEEE terms with "
    "raw-ratio idf (tfidf's bit-reproducibility precedent, steeper on "
    "rare terms than log-idf — documented variant), and the top-k is "
    "a per-query window over the scored candidates. Scale: tf/df are "
    "map-side-combined grouped counts; the scalar stats ride one "
    "broadcast row; cost is sum over query tokens of posting-list "
    "length — the classic inverted-index bound.",
    tags=("text", "llm-prep", "search"),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions.exact import exact_sum
    from ..operators.cache import scoped_persist
    from ..operators.partitioning import spread

    t = load_tables(spark, sf_dir, "documents")
    staged = scoped_persist(
        textops.with_tokens(spread(t["documents"], "doc_id")).select("doc_id", "toks")
    )
    tf = scoped_persist(
        staged.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dl = staged.filter(F.size("toks") > 0).select(
        "doc_id", F.size("toks").cast("long").alias("dl")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    # tf is grouped by (doc_id, tok): the query-term rows are unique
    q = tf.filter(F.col("doc_id") < BM25_N_QUERIES).select(
        F.col("doc_id").alias("qid"), "tok"
    )
    tfv = F.col("tf").cast("double")
    term = (F.col("n_docs") / F.col("df")) * (
        (tfv * F.lit(1.0 + BM25_K1))
        / (
            tfv
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    terms = (
        q.join(tf, (q["tok"] == tf["tok"]) & (tf["doc_id"] != q["qid"]))
        .drop(q["tok"])
        .join(dl, "doc_id")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .select("qid", "doc_id", term.alias("term"))
    )
    scored = terms.groupBy("qid", "doc_id").agg(exact_sum(F.col("term")).alias("score"))
    w = W.partitionBy("qid").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BM25_TOP)
        .select("qid", "doc_id", "score", "rk")
    )
