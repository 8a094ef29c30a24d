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
from .text import SQL_TOKS, sql_hex_val

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


# -- DSIR-style importance resampling (r14) --------------------------------
#
# Data Selection via Importance Resampling (Xie et al., 2023): weight
# each raw-corpus document by how much more probable it is under a
# TARGET-domain n-gram LM than under the raw-corpus LM, then keep the
# most target-like mass. In the paper the weight is a sum of hashed
# n-gram log-ratios; here both models are the engine's add-one bigram
# LM in scaled-integer surprisal form, so the log-ratio sum becomes an
# EXACT integer sum of surprisal differences (s_raw - s_target per
# bigram occurrence) and one correctly-rounded double division — the
# same rational-arithmetic contract as the perplexity gate, so the
# oracle re-derives every weight and the selection decision to the bit.

#: The target domain: English documents (the fixture's lang column
#: plays the "formal text" domain the paper selects toward).
DSIR_TARGET_LANG = "en"

_SQL_DSIR = f"""
    {_SQL_LM_CTES},
    tdocs AS (SELECT doc_id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
    tgrams AS (SELECT doc_id, g, w1 FROM grams JOIN tdocs USING (doc_id)),
    tvocab AS (SELECT COUNT(DISTINCT tok) AS vt
               FROM (SELECT unnest(t) AS tok FROM toks JOIN tdocs USING (doc_id))),
    tc2 AS (SELECT g, COUNT(*) AS tc2 FROM tgrams GROUP BY g),
    tc1 AS (SELECT w1, COUNT(*) AS tc1 FROM tgrams GROUP BY w1),
    dsir AS (
      SELECT grams.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(m.s - (((COALESCE(tc1.tc1, 0) + vt) * {lm.LM_SCALE})
                             // (COALESCE(tc2.tc2, 0) + 1))) AS DOUBLE)
               / CAST(COUNT(*) * {lm.LM_SCALE} AS DOUBLE) AS dsir_score
      FROM grams
      JOIN (SELECT g, s FROM model) m USING (g)
      LEFT JOIN tc2 USING (g)
      LEFT JOIN tc1 ON grams.w1 = tc1.w1
      CROSS JOIN tvocab
      GROUP BY grams.doc_id
    )"""


def dsir_scores_from(
    grams: DataFrame,
    raw_model: DataFrame,
    tc2: DataFrame,
    tc1: DataFrame,
    tv: DataFrame,
) -> DataFrame:
    """The DSIR scoring tail from its five ingredient frames — ONE
    definition shared by the batch query (frames counted in-plan) and
    the streaming twin (frames derived from the two epoch-store
    models), so the weight formula cannot drift between build paths.
    ``tc2``=(g, tc2), ``tc1``=(w1, tc1), ``tv``=1-row (v)."""
    scored = (
        grams.join(raw_model.select("g", F.col("s").alias("s_raw")), "g")
        .join(tc2, "g", "left")
        .join(tc1, "w1", "left")
        .crossJoin(F.broadcast(tv))
        .withColumn("c1", F.coalesce(F.col("tc1"), F.lit(0)))
        .withColumn("c2", F.coalesce(F.col("tc2"), F.lit(0)))
        # the raw model's exact surprisal expression, overflow
        # guard included, re-pointed at the target counts
        .withColumn("s_t", F.expr(lm.SURPRISAL_GUARDED_EXPR))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        (
            F.sum(F.col("s_raw") - F.col("s_t")).cast("double")
            / (F.count("*") * F.lit(lm.LM_SCALE)).cast("double")
        ).alias("dsir_score"),
    )


def dsir_audit_output(docs: DataFrame, scores: DataFrame) -> DataFrame:
    """The executed DSIR selection per language — shared by the batch
    audit and the streaming twin (gate_output's pattern)."""
    thr = scores.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dsir_score)").alias("thr")
    )
    kept = F.col("dsir_score") >= F.col("thr")
    return (
        scores.join(docs.select("doc_id", "lang"), "doc_id")
        .crossJoin(F.broadcast(thr))
        .groupBy("lang")
        .agg(
            F.count("*").alias("total_ct"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("kept_ct"),
            (
                F.sum(F.when(kept, 1).otherwise(0)).cast("double") / F.count("*")
            ).alias("keep_rate"),
        )
    )


def dsir_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, dsir_score): the per-document importance
    weight — mean scaled surprisal difference raw-model minus
    target-model (positive = more probable under the target domain).
    Corpus-persisted: the flag query and the selection audit share one
    computation. The target model is two grouped counts over the
    TARGET slice's bigrams; bigrams/prefixes unseen in the target get
    the same add-one floor (count 0) via LEFT joins, so every document
    is scorable — the raw-model join is inner because the raw model
    saw every corpus bigram by construction. Scale: both models are
    distinct-bigram-bounded; scoring is the decontamination join shape
    (bigram-keyed, never doc-vs-doc)."""

    def build():
        t, staged, grams = _staged_grams(spark, sf_dir)
        model = lm_model_cached(spark, sf_dir)
        tids = t["documents"].filter(F.col("lang") == DSIR_TARGET_LANG).select("doc_id")
        tgrams = grams.join(tids, "doc_id")
        tc2 = tgrams.groupBy("g").agg(F.count("*").alias("tc2"))
        tc1 = tgrams.groupBy("w1").agg(F.count("*").alias("tc1"))
        tv = (
            staged.join(tids, "doc_id")
            .select(F.explode("toks").alias("tok"))
            .agg(F.count_distinct("tok").alias("v"))
        )
        return dsir_scores_from(grams, model, tc2, tc1, tv)

    return corpus_persist(spark, "dsir_scores", sf_dir, build)


@register(
    "dsir_importance",
    oracle=f"""
    WITH {_SQL_DSIR}
    SELECT doc_id, n_grams, dsir_score FROM dsir
    """,
    doc="DSIR importance weights (Xie et al., 2023): per raw-corpus "
    f"document, the mean scaled surprisal difference between the "
    f"corpus-fit bigram LM and a TARGET-domain LM (lang = "
    f"'{DSIR_TARGET_LANG}' plays the target) — the paper's hashed "
    "n-gram log-ratio sum in the engine's exact-rational form, so "
    "both engines derive every weight bit-for-bit. Positive = more "
    "target-like. Target-unseen bigrams take the add-one floor via "
    "LEFT joins (count 0), so the weight is defined for every "
    "document with >= 2 tokens. Scale: the target model is "
    "distinct-bigram-bounded over the target SLICE; scoring re-uses "
    "the corpus model join plus two left joins on the same key — "
    "nothing doc-vs-doc.",
    tags=("llm-prep", "quality", "lm", "sampling"),
)
def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_scores_cached(spark, sf_dir)


# The full selection audit as one oracle string — shared VERBATIM by
# the batch audit and the streaming twin `dsir_gate_stream` (both LM
# count merges are additive-exact, so the streamed models and hence
# the weights and the gate decision are bit-identical to the batch fit).
SQL_DSIR_SELECT_AUDIT = f"""
    WITH {_SQL_DSIR},
    thr AS (SELECT quantile_disc(dsir_score, 0.5) AS thr FROM dsir)
    SELECT d.lang,
           COUNT(*) AS total_ct,
           CAST(SUM(CASE WHEN dsir_score >= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_ct,
           CAST(SUM(CASE WHEN dsir_score >= thr THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS keep_rate
    FROM dsir JOIN documents d USING (doc_id)
    CROSS JOIN thr
    GROUP BY d.lang
    """


@register(
    "dsir_select_audit",
    oracle=SQL_DSIR_SELECT_AUDIT,
    doc="The executed DSIR selection, audited by language: keep the "
    "most-target-like half (threshold = percentile_disc(0.5) over the "
    "importance weights — an actual element, cross-engine exact; at "
    "100 TB swap in approx_percentile, the perplexity_filter "
    "precedent) and report per-language keep rates — the sanity check "
    "the paper's method implies: the target language must be kept at "
    "a higher rate than the rest, measured, not assumed. One "
    "doc-count-sized aggregate for the threshold, one broadcast "
    "scalar, one grouped gate pass.",
    tags=("llm-prep", "quality", "lm", "sampling", "audit"),
)
def dsir_select_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return dsir_audit_output(t["documents"], dsir_scores_cached(spark, sf_dir))


# -- hashed-feature DSIR (r14 VERDICT #5) -----------------------------------
#
# The paper's actual estimator hashes n-grams into a FIXED-WIDTH bucket
# grid and fits bag-of-hashed-ngrams models over the buckets — model
# memory becomes corpus-size-FREE (the CMS precedent: collisions are
# the accepted price of a bounded sketch) instead of
# distinct-bigram-bounded, the right shape at 100 TB with open
# vocabulary. Hashing is the engine's md5-slice arithmetic
# (heavy_hitters_cms), so the grid is bit-reproducible cross-engine;
# both bucket models take the same add-one smoothing with the bucket
# count as the support size, so every weight stays exact-rational.

#: Fixed bucket-grid width (defined in operators/lm.py next to the
#: shared bucket-routing expression; re-exported here for the oracle
#: f-strings). The paper uses 10k hashed buckets; 1024 keeps
#: collisions VISIBLE at fixture scale so the agreement audit
#: measures a real approximation, not a vacuous one.
DSIR_HASH_B = lm.DSIR_HASH_B

_SQL_DSIR_HASHED = f"""
    hg AS (
      SELECT doc_id,
             CAST(({sql_hex_val('md5(g)', 8)}) % {DSIR_HASH_B} AS BIGINT) AS b
      FROM grams
    ),
    rc AS (SELECT b, COUNT(*) AS c2 FROM hg GROUP BY b),
    rtot AS (SELECT COUNT(*) AS c1 FROM hg),
    rs AS (
      SELECT b, ((c1 + {DSIR_HASH_B}) * {lm.LM_SCALE}) // (c2 + 1) AS s_raw
      FROM rc CROSS JOIN rtot
    ),
    thg AS (SELECT hg.doc_id, b FROM hg JOIN tdocs USING (doc_id)),
    tcb AS (SELECT b, COUNT(*) AS tc2 FROM thg GROUP BY b),
    ttot AS (SELECT COUNT(*) AS tc1 FROM thg),
    hd AS (
      SELECT hg.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(rs.s_raw
                      - (((ttot.tc1 + {DSIR_HASH_B}) * {lm.LM_SCALE})
                         // (COALESCE(tcb.tc2, 0) + 1))) AS DOUBLE)
               / CAST(COUNT(*) * {lm.LM_SCALE} AS DOUBLE) AS dsir_score
      FROM hg JOIN rs USING (b)
      LEFT JOIN tcb USING (b)
      CROSS JOIN ttot
      GROUP BY hg.doc_id
    )"""


def _dsir_hash_bucket(col) -> "F.Column":
    """md5-slice bucket id in [0, DSIR_HASH_B) — ONE definition shared
    with the epoch-store grid app (operators/lm.hash_bucket), so the
    batch fit and the streaming twin route grams identically."""
    return lm.hash_bucket(col, DSIR_HASH_B)


def dsir_hashed_scores_from_grid(
    spark: SparkSession, hg: DataFrame, grid: DataFrame
) -> DataFrame:
    """(doc_id, n_grams, dsir_score) from a ``(b, ct, tct)`` bucket
    grid — ONE shared scoring definition for the batch fit and the
    streaming twin (`dsir_hashed_stream`), so the formula cannot drift
    between build paths. Both surprisals are computed per BUCKET on
    the <= DSIR_HASH_B-row grid (the scaled-integer expression is a
    pure function of (c1, c2, v), so per-bucket evaluation is
    bit-identical to per-occurrence evaluation), then ONE broadcast
    join carries (s_raw, s_t) map-side into the per-doc integer sum —
    zero model-side shuffle at any corpus size. ``hg`` is the
    per-gram-occurrence (doc_id, b) frame; ``grid`` must cover every
    bucket ``hg`` produces (both builders derive it from the same
    occurrences, so it does)."""
    rtot = grid.agg(F.sum("ct").alias("rc1"))
    # coalesce the target total: a target-empty corpus leaves SUM null
    # where the batch path's COUNT(*) yields 0 — match it
    ttot = grid.agg(F.coalesce(F.sum("tct"), F.lit(0)).alias("ttc1"))
    gs = (
        grid.crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .withColumn("c1", F.col("rc1"))
        .withColumn("c2", F.col("ct"))
        .withColumn("v", F.lit(DSIR_HASH_B))
        .withColumn("s_raw", F.expr(lm.SURPRISAL_GUARDED_EXPR))
        .withColumn("c1", F.col("ttc1"))
        .withColumn("c2", F.col("tct"))
        .withColumn("s_t", F.expr(lm.SURPRISAL_GUARDED_EXPR))
        .select("b", "s_raw", "s_t")
    )
    return (
        hg.join(F.broadcast(gs), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            (
                F.sum(F.col("s_raw") - F.col("s_t")).cast("double")
                / (F.count("*") * F.lit(lm.LM_SCALE)).cast("double")
            ).alias("dsir_score"),
        )
    )


def dsir_hashed_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, dsir_score): the hashed-feature DSIR weight —
    the exact query's surprisal-difference form with both models
    re-fit over the md5 bucket grid (support size = DSIR_HASH_B, so
    the add-one floor smooths over buckets, not vocabulary).
    Corpus-persisted like the exact weights: the flag query and the
    agreement audit share one computation. Scale: the whole (b, ct,
    tct) grid is <= DSIR_HASH_B rows and rides broadcasts — scoring is
    one map-side join + one per-doc partial-agged sum, zero model-side
    shuffle at any corpus size (the exact variant's model is
    distinct-bigram-bounded and must hash-join); the overflow guard
    still bounds the total gram count at LM_C1_LIMIT, failing loudly
    past it. The scoring tail is ONE shared definition with the
    streaming twin (:func:`dsir_hashed_scores_from_grid`)."""

    def build():
        t, _staged, grams = _staged_grams(spark, sf_dir)
        hg = grams.select("doc_id", _dsir_hash_bucket(F.col("g")).alias("b"))
        tids = t["documents"].filter(F.col("lang") == DSIR_TARGET_LANG).select("doc_id")
        thg = hg.join(tids, "doc_id")
        grid = (
            hg.groupBy("b")
            .agg(F.count("*").alias("ct"))
            .join(thg.groupBy("b").agg(F.count("*").alias("tct")), "b", "left")
            .withColumn("tct", F.coalesce(F.col("tct"), F.lit(0)))
        )
        return dsir_hashed_scores_from_grid(spark, hg, grid)

    return corpus_persist(spark, "dsir_hashed_scores", sf_dir, build)


#: dsir_hashed's full oracle — a named constant so the streaming twin
#: (`dsir_hashed_stream`) shares it VERBATIM, the perplexity_gate_stream
#: pattern.
SQL_DSIR_HASHED_Q = f"""
    WITH {_SQL_LM_CTES},
    tdocs AS (SELECT doc_id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
    {_SQL_DSIR_HASHED}
    SELECT doc_id, n_grams, dsir_score FROM hd
    """


@register(
    "dsir_hashed",
    oracle=SQL_DSIR_HASHED_Q,
    doc=f"DSIR in the paper's HASHED-feature form: every bigram "
    f"occurrence is hashed into a fixed {DSIR_HASH_B}-bucket grid "
    "(md5-slice arithmetic, bit-reproducible cross-engine) and both "
    "the raw and target models are bag-of-buckets with add-one "
    "smoothing over the grid — same exact-rational surprisal-"
    "difference weight as dsir_importance, but model memory is "
    "corpus-size-FREE (<= the grid width, the CMS precedent) instead "
    "of distinct-bigram-bounded: the right estimator at 100 TB with "
    "open vocabulary, at the price of hash collisions the agreement "
    "audit measures (dsir_hashed_agreement). Scoring joins the "
    "broadcast bucket models map-side — zero model shuffle at any "
    "corpus size.",
    tags=("llm-prep", "quality", "lm", "sampling", "sketch"),
)
def dsir_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dsir_hashed_scores_cached(spark, sf_dir)


@register(
    "dsir_hashed_agreement",
    oracle=f"""
    WITH {_SQL_DSIR},
    {_SQL_DSIR_HASHED},
    re AS (SELECT doc_id, dsir_score,
                  ROW_NUMBER() OVER (ORDER BY dsir_score, doc_id) AS r
           FROM dsir),
    rh AS (SELECT doc_id, dsir_score,
                  ROW_NUMBER() OVER (ORDER BY dsir_score, doc_id) AS r
           FROM hd),
    j AS (
      SELECT re.doc_id, re.r AS rex, rh.r AS rhash,
             re.dsir_score AS se, rh.dsir_score AS sh
      FROM re JOIN rh USING (doc_id)
    ),
    the AS (SELECT quantile_disc(dsir_score, 0.5) AS te FROM dsir),
    thh AS (SELECT quantile_disc(dsir_score, 0.5) AS th FROM hd)
    SELECT COUNT(*) AS n_docs,
           CAST(SUM((rex - rhash) * (rex - rhash)) AS BIGINT) AS sum_d2,
           1 - CAST(6 * SUM((rex - rhash) * (rex - rhash)) AS DOUBLE)
             / CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS DOUBLE)
               AS spearman_rho,
           CAST(SUM(CASE WHEN se >= te THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_exact_ct,
           CAST(SUM(CASE WHEN sh >= th THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_hashed_ct,
           CAST(SUM(CASE WHEN se >= te AND sh >= th THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_both_ct
    FROM j CROSS JOIN the CROSS JOIN thh
    """,
    doc="Agreement audit between the exact and the hashed DSIR "
    "estimators on the same corpus: Spearman rank correlation of the "
    "two weight vectors (ranks are row_number with doc_id tie-break — "
    "deterministic cross-engine; sum_d2 is an exact BIGINT, rho one "
    "double division, valid while n^3 < 2^63) plus the decision-level "
    "overlap — how many docs each estimator's own median gate keeps "
    "and how many BOTH keep. This is the number that justifies "
    "deploying the corpus-size-free estimator: the collision price "
    "measured on in-catalog truth, the decon_semantic_rungs pattern "
    "applied to DSIR. Cost: both score frames are already "
    "corpus-persisted; the audit adds two RANGE-PARTITIONED rank "
    "passes (global_row_number — parallel per-partition row_number + "
    "cumulative offsets, never the single-partition global window), "
    "one doc-keyed join and two percentile scalars.",
    tags=("llm-prep", "quality", "lm", "sampling", "audit"),
)
def dsir_hashed_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import global_row_number

    ex = dsir_scores_cached(spark, sf_dir)
    hs = dsir_hashed_scores_cached(spark, sf_dir)
    # ranks via range-partitioned row_number + offsets — the ranked
    # frame is corpus-sized, so a global (unpartitioned) window would
    # serialize the whole corpus onto one task; ranks are deterministic
    # (doc_id tie-break), so this is bit-identical to the oracle's
    # global ROW_NUMBER
    re_ = global_row_number(
        ex.select("doc_id", "dsir_score"), ["dsir_score", "doc_id"], "rex"
    )
    rh = global_row_number(
        hs.select("doc_id", "dsir_score"), ["dsir_score", "doc_id"], "rhash"
    )
    j = re_.select("doc_id", F.col("dsir_score").alias("se"), "rex").join(
        rh.select("doc_id", F.col("dsir_score").alias("sh"), "rhash"), "doc_id"
    )
    the = ex.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dsir_score)").alias("te")
    )
    thh = hs.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dsir_score)").alias("th")
    )
    d2 = (F.col("rex") - F.col("rhash")) * (F.col("rex") - F.col("rhash"))
    n = F.count("*")
    return (
        j.crossJoin(F.broadcast(the))
        .crossJoin(F.broadcast(thh))
        .agg(
            n.alias("n_docs"),
            F.sum(d2).alias("sum_d2"),
            (
                F.lit(1)
                - (F.lit(6) * F.sum(d2)).cast("double")
                / (n * (n * n - F.lit(1))).cast("double")
            ).alias("spearman_rho"),
            F.sum(F.when(F.col("se") >= F.col("te"), 1).otherwise(0))
            .cast("long")
            .alias("kept_exact_ct"),
            F.sum(F.when(F.col("sh") >= F.col("th"), 1).otherwise(0))
            .cast("long")
            .alias("kept_hashed_ct"),
            F.sum(
                F.when(
                    (F.col("se") >= F.col("te")) & (F.col("sh") >= F.col("th")), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("kept_both_ct"),
        )
    )


@register(
    "dsir_hashed_select_audit",
    oracle=f"""
    WITH {_SQL_LM_CTES},
    tdocs AS (SELECT doc_id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
    {_SQL_DSIR_HASHED},
    thr AS (SELECT quantile_disc(dsir_score, 0.5) AS thr FROM hd)
    SELECT d.lang,
           COUNT(*) AS total_ct,
           CAST(SUM(CASE WHEN dsir_score >= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_ct,
           CAST(SUM(CASE WHEN dsir_score >= thr THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS keep_rate
    FROM hd JOIN documents d USING (doc_id)
    CROSS JOIN thr
    GROUP BY d.lang
    """,
    doc="The executed HASHED-DSIR selection, audited by language — the "
    "row that completes the corpus-size-free family (estimator -> "
    "agreement -> DECISION): keep the most-target-like half by the "
    "hashed weights' own median gate and report per-language keep "
    "rates next to dsir_select_audit's exact-model rates. The "
    "agreement audit prices rank correlation (rho 0.852) and gate "
    "overlap doc-by-doc; THIS row shows whether the hash collisions "
    "change the per-LANGUAGE selection a pipeline actually ships — "
    "the target language must still dominate the kept set. Shares "
    "dsir_audit_output with the exact audit (one gate definition) and "
    "the corpus-persisted hashed scores (zero extra model cost).",
    tags=("llm-prep", "quality", "lm", "sampling", "audit", "sketch"),
)
def dsir_hashed_select_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "documents")
    return dsir_audit_output(t["documents"], dsir_hashed_scores_cached(spark, sf_dir))




# -- model-based quality classifier: the batch perceptron (r16) -----------
#
# The CCNet / FineWeb-Edu distillation shape: train a cheap linear
# model to imitate a teacher quality selection on a bounded sample,
# run it corpus-wide, and MEASURE how much of the teacher's decision
# it reproduces (operators/classifier.py holds the arithmetic
# contract: integer centered features, synchronous unit-step updates,
# sample-bounded fit — the whole loop exact in both engines).

from ..operators import classifier as PC  # noqa: E402
from ..operators.cache import corpus_value  # noqa: E402
from .text import SQL_STOPS  # noqa: E402

# The teacher expression over a token list column t — textually the
# certified quality_score oracle (plans/text.py) / corpus_build gate
# string (plans/llmprep._corpus_gates_sql).
_PT_QUALITY = (
    "least(CAST(len(t) AS DOUBLE) / 200.0, 1.0) * 0.4"
    " + (CAST(len(list_filter(t, x -> x IN " + SQL_STOPS + ")) AS DOUBLE) / len(t)) * 0.3"
    " + (1.0 - least(abs(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)"
    " / len(t) - 5.0) / 10.0, 1.0)) * 0.3"
)


def _sql_ptron_raw(name: str, src: str, extra: str = "") -> str:
    """Raw-feature CTE: (doc_id[, extra], q, x1r..x3r) — the SQL twin
    of operators/classifier.ptron_raw_features; `//` mirrors Spark's
    `div` on the same non-negative operands, and the casts pin BIGINT
    against DuckDB's HUGEINT promotion of list_sum."""
    s = PC.PTRON_SCALE
    return f"""
    {name} AS (
      SELECT doc_id{extra},
             {_PT_QUALITY} AS q,
             CAST(least(len(t) * {s // 200}, {s}) AS BIGINT) AS x1r,
             CAST((len(list_filter(t, x -> x IN {SQL_STOPS})) * {s}) // len(t)
                  AS BIGINT) AS x2r,
             CAST({s} - least(abs((list_sum(list_transform(t, x -> length(x))) * {s})
                                  // len(t) - {5 * s}) // 10, {s}) AS BIGINT) AS x3r
      FROM (SELECT doc_id{extra}, {SQL_TOKS} AS t FROM {src})
      WHERE len(t) > 0
    )"""


def _sql_ptron_centered(name: str, raw: str, extra: str = "") -> str:
    """Centered-feature CTE over a raw CTE + the pstat model-card row:
    y = the top-half teacher gate, x_j = ns * x_jr - s_j (exact
    integers — the centering that restores the perceptron's margin)."""
    s = PC.PTRON_SCALE
    return f"""
    {name} AS (
      SELECT doc_id{extra},
             CASE WHEN q >= thr THEN 1 ELSE -1 END AS y,
             CAST({s} AS BIGINT) AS x0,
             ns * x1r - s1 AS x1,
             ns * x2r - s2 AS x2,
             ns * x3r - s3 AS x3
      FROM {raw} CROSS JOIN pstat
    )"""


def _sql_ptron_chain() -> str:
    """The unrolled training loop: w{it} carries the cumulative weight
    vector AFTER iteration it plus the misclassified count (under the
    PREVIOUS iterate) that drove the update. w1's predecessor is the
    zero vector, whose margin misclassifies every row."""
    parts = [
        "w1 AS (SELECT "
        + ", ".join(f"COALESCE(SUM(y * x{j}), 0) AS wa{j}" for j in range(4))
        + ", COUNT(*) AS mct FROM pfeat)"
    ]
    for it in range(2, PC.PTRON_ITERS + 1):
        prev = f"w{it - 1}"
        marg = (
            f"y * ({prev}.wa0 * x0 + {prev}.wa1 * x1"
            f" + {prev}.wa2 * x2 + {prev}.wa3 * x3)"
        )
        cols = ", ".join(
            f"{prev}.wa{j} + COALESCE(SUM(CASE WHEN {marg} <= 0"
            f" THEN y * x{j} END), 0) AS wa{j}"
            for j in range(4)
        )
        parts.append(
            f"w{it} AS (SELECT {cols},"
            f" COUNT(CASE WHEN {marg} <= 0 THEN 1 END) AS mct"
            f" FROM pfeat CROSS JOIN {prev}"
            f" GROUP BY {prev}.wa0, {prev}.wa1, {prev}.wa2, {prev}.wa3)"
        )
    return ",\n    ".join(parts)


_SQL_PTRON_TRAIN = f"""
    pdoc AS (SELECT doc_id, text FROM documents
             ORDER BY doc_id LIMIT {PC.PTRON_FIT_N}),
    {_sql_ptron_raw('praw', 'pdoc')},
    pstat AS (SELECT COUNT(*) AS ns, SUM(x1r) AS s1, SUM(x2r) AS s2,
                     SUM(x3r) AS s3, quantile_disc(q, 0.5) AS thr
              FROM praw),
    {_sql_ptron_centered('pfeat', 'praw')},
    {_sql_ptron_chain()}
"""

_WFINAL = f"w{PC.PTRON_ITERS}"

_SQL_PTRON_SCORE_ALL = f"""
    {_sql_ptron_raw('allraw', 'documents', ', lang')},
    {_sql_ptron_centered('allfeat', 'allraw', ', lang')}
"""


def ptron_fit_cached(spark: SparkSession, sf_dir: str) -> tuple[dict, list[tuple]]:
    """(stats, iterate ladder) — the full model card, a pure function
    of the corpus + the fixed (PTRON_FIT_N, PTRON_ITERS) recipe,
    memoized per (session, corpus) like the k-means fit; the cached
    value is a handful of plain Python ints/floats."""

    def build():
        docs = load_tables(spark, sf_dir, "documents")["documents"]
        sample = docs.orderBy("doc_id").limit(PC.PTRON_FIT_N).select("doc_id", "text")
        raw = scoped_persist(PC.ptron_raw_features(sample))
        stats = PC.ptron_stats(raw)
        rows = PC.perceptron_fit(PC.ptron_centered(raw, stats))
        return stats, rows

    return corpus_value(
        spark, f"ptron_fit:{PC.PTRON_FIT_N}:{PC.PTRON_ITERS}", sf_dir, build
    )


@register(
    "quality_perceptron_train",
    oracle=f"""
    WITH {_SQL_PTRON_TRAIN}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({it} AS INT) AS it, CAST(wa0 AS BIGINT) AS wa,"
          f" CAST(wa1 AS BIGINT) AS wb, CAST(wa2 AS BIGINT) AS wc,"
          f" CAST(wa3 AS BIGINT) AS wd, CAST(mct AS BIGINT) AS miscls_ct"
          f" FROM w{it}"
          for it in range(1, PC.PTRON_ITERS + 1)
      )}
    )
    """,
    doc="Model-based quality classification TRAINED IN THE ENGINE — "
    "the CCNet/FineWeb distillation recipe's student model: a batch "
    f"perceptron (synchronous unit-step updates, {PC.PTRON_ITERS} "
    "fixed iterations) over integer length/stopword/shape features, "
    "with the certified quality score's TOP-HALF selection as the "
    "teacher (threshold = percentile_disc(0.5) over the fit sample — "
    "the perplexity_filter/DSIR gate discipline, which also balances "
    "the training classes by construction). Features are CENTERED "
    "with exact integer sample stats (x' = ns*x - sum; the uncentered "
    "fit measurably collapses — see operators/classifier.py), and the "
    f"fit runs on the {PC.PTRON_FIT_N} lowest doc_ids (the KM_FIT_N "
    "deterministic-sample discipline) so training cost is "
    "CORPUS-SIZE-FREE: each iteration is one filter + one 5-integer "
    "aggregation over the sample, collected as one bounded row (the "
    "k-means-seed class). Every update is an order-insensitive BIGINT "
    "sum, so the DuckDB oracle re-derives the full iterate ladder — "
    "weights AND per-iteration misclassified counts — bit-for-bit as "
    "chained CTEs. The output is the model card a pipeline persists: "
    "one row per iteration, the weight vector after it, and the size "
    "of the misclassified set that drove the update.",
    tags=("llm-prep", "quality", "classifier", "model"),
)
def quality_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    _stats, rows = ptron_fit_cached(spark, sf_dir)
    return spark.createDataFrame(
        rows, "it int, wa long, wb long, wc long, wd long, miscls_ct long"
    )


# The executed-gate oracle, a module constant because the stream twin
# (plans/replay.quality_perceptron_stream) shares it VERBATIM — a
# green stream row certifies the bootstrap fit, the model card and
# every per-epoch grid sum bit-for-bit against the batch gate.
SQL_PTRON_FILTER = f"""
    WITH {_SQL_PTRON_TRAIN},
    {_SQL_PTRON_SCORE_ALL}
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_ct,
           CAST(SUM(CASE WHEN wa0 * x0 + wa1 * x1 + wa2 * x2 + wa3 * x3 >= 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_ct,
           CAST(SUM(CASE WHEN wa0 * x0 + wa1 * x1 + wa2 * x2 + wa3 * x3 >= 0
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate
    FROM allfeat CROSS JOIN {_WFINAL}
    GROUP BY lang
    """


@register(
    "quality_perceptron_filter",
    oracle=SQL_PTRON_FILTER,
    doc="The learned model EXECUTED corpus-wide — per-language keep "
    "rates under the perceptron gate (margin >= 0), the "
    "dsir_select_audit reporting shape. Scale: the centering stats "
    "and weights enter the plan as LITERALS (the fit's bounded "
    "collects), so scoring is map-side expression work plus one "
    "map-side-combinable grouped count — zero joins, zero extra "
    "shuffles, at any corpus size. Read next to "
    "quality_perceptron_agreement: this is what the student model "
    "ships per language; that is how often it matches the teacher "
    "doc-by-doc.",
    tags=("llm-prep", "quality", "classifier", "model", "audit"),
)
def quality_perceptron_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats, rows = ptron_fit_cached(spark, sf_dir)
    w = PC.final_weights(rows)
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    raw = PC.ptron_raw_features(spread(docs, "doc_id"), extra=("lang",))
    feats = PC.ptron_centered(raw, stats, extra=("lang",))
    xs = [F.col(f"x{j}") for j in range(4)]
    kept = (PC.margin_expr(w, xs) >= 0).cast("long")
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_ct"),
        F.sum(kept).alias("kept_ct"),
        (F.sum(kept).cast("double") / F.count(F.lit(1))).alias("keep_rate"),
    )


@register(
    "quality_perceptron_agreement",
    oracle=f"""
    WITH {_SQL_PTRON_TRAIN},
    {_SQL_PTRON_SCORE_ALL}
    SELECT y = 1 AS teacher_pass,
           wa0 * x0 + wa1 * x1 + wa2 * x2 + wa3 * x3 >= 0 AS model_pass,
           CAST(COUNT(*) AS BIGINT) AS ct
    FROM allfeat CROSS JOIN {_WFINAL}
    GROUP BY 1, 2
    """,
    doc="The distillation gap MEASURED, not assumed — the corpus-wide "
    "confusion matrix between the teacher selection (quality_score >= "
    "the fit sample's percentile_disc(0.5)) and the learned "
    "perceptron: one row per (teacher_pass, model_pass) cell. The "
    "off-diagonal cells are the docs where the student's "
    "integer-feature boundary disagrees with the teacher's "
    "double-precision one — the number an eval owner reads before "
    "swapping the cheap model into the shipping gate (measured at the "
    "defaults: ~97% agreement with every confusion cell populated). "
    "Same map-side scoring shape as the filter query (literal stats "
    "and weights, one grouped count).",
    tags=("llm-prep", "quality", "classifier", "model", "audit"),
)
def quality_perceptron_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats, rows = ptron_fit_cached(spark, sf_dir)
    w = PC.final_weights(rows)
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    raw = PC.ptron_raw_features(spread(docs, "doc_id"))
    feats = PC.ptron_centered(raw, stats)
    xs = [F.col(f"x{j}") for j in range(4)]
    return (
        feats.select(
            (F.col("y") == 1).alias("teacher_pass"),
            (PC.margin_expr(w, xs) >= 0).alias("model_pass"),
        )
        .groupBy("teacher_pass", "model_pass")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
