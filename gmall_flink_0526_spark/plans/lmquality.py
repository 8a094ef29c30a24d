"""Model-based corpus quality filtering — the CCNet-style n-gram LM
perplexity gate (Wenzek et al., 2020), in bit-reproducible rational
form (see ``operators/lm.py`` for the arithmetic contract).

Three queries complete the family: the fitted model head (the audit a
pipeline persists next to the model), per-document scores, and the
median-thresholded keep/drop gate a curation run actually executes.
Every intermediate is exact-integer (counts, scaled surprisals); the
only floating op is one correctly-rounded division per document, so
the DuckDB oracles re-derive scores — and the gate decision — to the
bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..operators import lm, textops
from ..operators.cache import corpus_persist, scoped_persist
from ..operators.partitioning import spread
from ..session import load_tables
from .catalog import register, register_setup
from .text import SQL_TOKS

LM_TOP = 20

# The model CTEs, kept textually in lockstep with operators/lm.py:
# grams = every bigram occurrence (1-based DuckDB list arithmetic),
# model = add-one-smoothed counts + the scaled integer surprisal.
_SQL_LM_CTES = f"""
    toks AS (SELECT doc_id, {SQL_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, g, split_part(g, ' ', 1) AS w1
      FROM (SELECT doc_id,
                   unnest(CASE WHEN len(t) >= 2
                        THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
                        ELSE [] END) AS g
            FROM toks)
    ),
    vocab AS (SELECT COUNT(DISTINCT tok) AS v
              FROM (SELECT unnest(t) AS tok FROM toks)),
    c2t AS (SELECT w1, g, COUNT(*) AS c2 FROM grams GROUP BY w1, g),
    c1t AS (SELECT w1, COUNT(*) AS c1 FROM grams GROUP BY w1),
    model AS (
      SELECT g, c2t.w1 AS w1, c2, c1,
             ((c1 + v) * {lm.LM_SCALE}) // (c2 + 1) AS s
      FROM c2t JOIN c1t USING (w1) CROSS JOIN vocab
    )"""

_SQL_LM_SCORES = f"""
    scores AS (
      SELECT doc_id, COUNT(*) AS n_grams,
             CAST(SUM(s) AS DOUBLE)
               / CAST(COUNT(*) * {lm.LM_SCALE} AS DOUBLE) AS lm_score
      FROM grams JOIN (SELECT g, s FROM model) m USING (g)
      GROUP BY doc_id
    )"""


def _staged_grams(spark: SparkSession, sf_dir: str):
    t = load_tables(spark, sf_dir, "documents")
    staged = scoped_persist(
        textops.with_tokens(spread(t["documents"], "doc_id")).select("doc_id", "toks")
    )
    grams = scoped_persist(lm.doc_bigrams(staged))
    return t, staged, grams


def lm_model_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(g, w1, c2, c1, v, s): the corpus-fit bigram model — a pure
    function of the corpus, corpus-persisted so the three family
    queries share ONE fit instead of re-counting exploded bigrams each
    (self-review r13; the ivfpq_codebooks precedent). The build's
    staged/gram frames are query-scoped; the persisted model frame is
    distinct-bigram-sized."""

    def build():
        _t, staged, grams = _staged_grams(spark, sf_dir)
        return lm.bigram_model(grams, lm.vocab_size(staged))

    return corpus_persist(spark, "lm_model", sf_dir, build)


@register_setup("lm_model")
def _setup_lm_model(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the corpus-fit bigram model the LM family shares."""
    lm_model_cached(spark, sf_dir).count()


@register(
    "ngram_lm_train",
    oracle=f"""
    WITH {_SQL_LM_CTES}
    SELECT CAST(rk AS INTEGER) AS rk, w1, split_part(g, ' ', 2) AS w2,
           c2, c1, s
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY c2 DESC, g) AS rk FROM model)
    WHERE rk <= {LM_TOP}
    """,
    doc=f"Bigram-LM fit, head audit: the {LM_TOP} most frequent bigrams "
    "with their raw counts and add-one-smoothed scaled surprisal — the "
    "model card a pipeline persists next to the fitted model. The fit "
    "itself is two grouped counts over exploded bigrams (map-side "
    "combined, distinct-bigram-bounded — corpus-SUBLINEAR under Zipf) "
    "meeting in one prefix-keyed hash join; the vocabulary scalar rides "
    "a broadcast. The head is a distributed top-k "
    "(TakeOrderedAndProject), never a global sort.",
    tags=("llm-prep", "quality", "lm"),
)
def ngram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = lm_model_cached(spark, sf_dir)
    head = model.orderBy(F.desc("c2"), "g").limit(LM_TOP)
    w = W.orderBy(F.desc("c2"), "g")
    return head.withColumn("rk", F.row_number().over(w)).select(
        "rk",
        "w1",
        F.substring_index("g", " ", -1).alias("w2"),
        "c2",
        "c1",
        "s",
    )


@register(
    "ngram_lm_perplexity",
    oracle=f"""
    WITH {_SQL_LM_CTES}, {_SQL_LM_SCORES}
    SELECT doc_id, n_grams, lm_score FROM scores
    """,
    doc="Per-document LM score: mean scaled inverse bigram probability "
    "under the corpus-fit model — monotone with perplexity for the "
    "filtering decision while staying exact-integer until one final "
    "correctly-rounded division (module docstring: the tfidf raw-ratio "
    "trick applied to CCNet's gate). Docs with <2 tokens have no "
    "bigrams and are out of scope on both engines. Scoring is ONE hash "
    "join on the bigram key (the decontamination shape — never "
    "doc-vs-doc) + one grouped sum; at 100 TB the model side is "
    "distinct-bigram-sized and bucketable on g.",
    tags=("llm-prep", "quality", "lm"),
)
def ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _staged, grams = _staged_grams(spark, sf_dir)
    return lm.doc_lm_scores(grams, lm_model_cached(spark, sf_dir))


# The full gate as one oracle string — shared VERBATIM by the batch
# query and the streaming twin `perplexity_gate_stream` (the model's
# count merge is additive-exact, so the streamed model and therefore
# the gate decision are bit-identical to the batch fit).
SQL_PERPLEXITY_FILTER = f"""
    WITH {_SQL_LM_CTES}, {_SQL_LM_SCORES},
    thr AS (SELECT quantile_disc(lm_score, 0.5) AS thr FROM scores)
    SELECT d.source,
           CAST(SUM(CASE WHEN lm_score <= thr THEN 1 ELSE 0 END) AS BIGINT) AS kept_ct,
           CAST(SUM(CASE WHEN lm_score <= thr THEN 0 ELSE 1 END) AS BIGINT) AS dropped_ct,
           CAST(SUM(CASE WHEN lm_score <= thr THEN n_grams ELSE 0 END) AS BIGINT) AS kept_gram_sum
    FROM scores JOIN documents d USING (doc_id)
    CROSS JOIN thr
    GROUP BY d.source
    """


def gate_output(docs: DataFrame, scores: DataFrame) -> DataFrame:
    """The executed gate from a per-doc score frame: median threshold
    (percentile_disc — picks an actual element, cross-engine exact),
    keep/drop counts and kept-gram mass per source. Shared by the
    batch query and the streaming twin."""
    thr = scores.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lm_score)").alias("thr")
    )
    kept = F.col("lm_score") <= F.col("thr")
    return (
        scores.join(docs.select("doc_id", "source"), "doc_id")
        .crossJoin(F.broadcast(thr))
        .groupBy("source")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_ct"),
            F.sum(F.when(kept, 0).otherwise(1)).cast("long").alias("dropped_ct"),
            F.sum(F.when(kept, F.col("n_grams")).otherwise(0))
            .cast("long")
            .alias("kept_gram_sum"),
        )
    )


@register(
    "perplexity_filter",
    oracle=SQL_PERPLEXITY_FILTER,
    doc="The executed gate: keep the low-surprisal half of the corpus "
    "(CCNet keeps the low-perplexity head), reported per source. The "
    "threshold is percentile_disc(0.5) over the per-doc scores — a "
    "discrete percentile picks an ACTUAL element, so Spark and DuckDB "
    "agree bit-for-bit where an interpolating median would not "
    "(value_percentiles' precedent); at 100 TB the same query swaps in "
    "approx_percentile exactly as product_stats_approx swaps HLL for "
    "collect_set. One doc-count-sized grouped aggregate for the "
    "threshold, one broadcast of the scalar, one grouped gate pass.",
    tags=("llm-prep", "quality", "lm", "agg"),
)
def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, _staged, grams = _staged_grams(spark, sf_dir)
    scores = lm.doc_lm_scores(grams, lm_model_cached(spark, sf_dir))
    return gate_output(t["documents"], scores)
