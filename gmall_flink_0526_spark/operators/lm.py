"""Bigram language-model scoring — model-based quality filtering.

The CCNet recipe (Wenzek et al., 2020) scores every candidate document
with an n-gram language model and keeps the low-perplexity head; it is
the canonical *model-based* quality gate a pre-training pipeline runs
after the rule-based signals (``quality_score``, ``repetition_ratio``).
This module is that gate in bit-reproducible form:

- the MODEL is add-one-smoothed bigram counts over the corpus itself:
  ``P(w2|w1) = (c2 + 1) / (c1 + V)`` with ``c2`` the bigram count,
  ``c1`` the prefix count (so the conditional sums to 1) and ``V``
  the corpus vocabulary size;
- the per-bigram SURPRISAL is kept rational instead of logarithmic:
  ``s = floor(LM_SCALE * (c1 + V) / (c2 + 1))`` — exact integer
  arithmetic, so both engines produce the same value bit-for-bit
  (``ln()`` differs in the last ulp across libm builds; the raw-ratio
  trick is the same one ``tfidf_top_terms`` documents, and the scaled
  integer makes the per-doc SUM order-insensitive with no decimal
  bridge needed);
- the per-document score is the MEAN scaled inverse probability,
  ``sum(s) / (n_grams * LM_SCALE)`` — one correctly-rounded double
  division of two exact integers. Higher = more surprising under the
  corpus model = more junk-like; monotone in the same direction as
  perplexity for the filtering decision, while staying
  oracle-derivable.

Scale shape (the 100 TB contract): the model is one grouped count over
exploded bigrams (map-side combined; distinct-bigram-bounded, which is
corpus-SUBLINEAR under Zipf), scoring is one hash join on the bigram
key — the decontamination join shape, never doc-vs-doc — and the
vocabulary scalar rides a broadcast, never a collect. The BIGINT
surprisal sum is exact to 2^63; past that the same expressions run on
DECIMAL(38,0) unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import textops

#: Fixed-point scale of the integer surprisal values. 10^6 keeps the
#: per-gram value exact in a BIGINT while ``c1 + v`` (c1 is the GLOBAL
#: corpus-wide prefix count, not a per-partition figure) stays under
#: ~9.2e12. At 100 TB the top Zipf prefixes can approach that bound,
#: and non-ANSI BIGINT arithmetic would wrap SILENTLY — so the model
#: fit enforces the bound with a raise_error guard
#: (:data:`SURPRISAL_GUARDED_EXPR`); past it, rerun the same
#: expressions with c1/c2/v cast to DECIMAL(38,0) (the formula is
#: unchanged, only the carrier type widens).
LM_SCALE = 1_000_000

#: Largest global prefix count the BIGINT carrier tolerates before
#: (c1 + v) * LM_SCALE overflows 2^63-1.
LM_C1_LIMIT = (2**63 - 1) // LM_SCALE

#: The scaled integer surprisal over (c1, c2, v) columns — ONE
#: definition shared by the batch fit and the epoch-store merged model
#: (streaming/pipelines.merged_lm_model), so the formula cannot drift
#: between the two build paths.
SURPRISAL_EXPR = f"((c1 + v) * {LM_SCALE}) div (c2 + 1)"

#: The same surprisal with the overflow bound ENFORCED: if the global
#: prefix count ever nears the BIGINT carrier limit the fit fails
#: loudly instead of wrapping. Values are bit-identical to
#: :data:`SURPRISAL_EXPR` everywhere in range, so oracles keep using
#: the raw formula.
SURPRISAL_GUARDED_EXPR = (
    f"CASE WHEN c1 + v > {LM_C1_LIMIT} THEN "
    f"CAST(raise_error('bigram_model: global prefix count c1 + v "
    f"exceeds {LM_C1_LIMIT}; BIGINT surprisal would overflow — refit "
    f"with DECIMAL(38,0) carriers') AS BIGINT) "
    f"ELSE {SURPRISAL_EXPR} END"
)


#: Width of the hashed-feature DSIR bucket grid (Xie et al.'s hashed
#: n-gram form): fixed at provisioning time like the Bloom width /
#: CMS grid, which is exactly what makes the model corpus-size-FREE
#: and the per-epoch streaming grids additive-mergeable.
DSIR_HASH_B = 1024


def hash_bucket(col: F.Column, buckets: int) -> F.Column:
    """md5-slice bucket id in [0, buckets) — heavy_hitters_cms's
    8-hex-char arithmetic, bit-reproducible cross-engine. ONE
    definition shared by the batch hashed-DSIR fit and the epoch-store
    grid app (streaming/pipelines.dsir_grid_app), so the routing
    cannot drift between the two build paths."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets


def doc_bigrams(staged: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, g, w1): one row per bigram OCCURRENCE (not distinct — the
    LM is count-based), ``g`` the space-joined bigram, ``w1`` its
    prefix token. ``staged`` must carry a ``toks`` array column
    (:func:`textops.with_tokens`); docs with fewer than 2 tokens emit
    nothing (``shingles`` guards the window). Map-only explode —
    tokens are whitespace-split so the prefix is recoverable from the
    joined gram exactly."""
    return staged.select(
        F.col(id_col),
        F.explode(textops.shingles(F.col("toks"), 2)).alias("g"),
    ).withColumn("w1", F.substring_index(F.col("g"), " ", 1))


def vocab_size(staged: DataFrame) -> DataFrame:
    """One-row (v) frame: corpus vocabulary size — COUNT(DISTINCT
    token) over every token occurrence. Returned as a frame (not a
    collect) so it rides a broadcast join into the model."""
    return (
        staged.select(F.explode(F.col("toks")).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )


def bigram_model(grams: DataFrame, vocab: DataFrame) -> DataFrame:
    """The fitted model: (g, w1, c2, c1, v, s) — one row per DISTINCT
    bigram, where ``s`` is the scaled integer surprisal of that bigram
    under add-one smoothing (see module docstring). Two grouped counts
    over the gram frame (both map-side combined) meeting in a hash
    join on the prefix; the vocab scalar is broadcast."""
    c2 = grams.groupBy("w1", "g").agg(F.count("*").alias("c2"))
    c1 = grams.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("s", F.expr(SURPRISAL_GUARDED_EXPR))
    )


def doc_lm_scores(grams: DataFrame, model: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, n_grams, lm_score): mean scaled inverse probability per
    document. One hash join on the bigram key (model side is
    distinct-bigram-sized) + one grouped sum; the final division is a
    single IEEE-correctly-rounded double op over exact integers, so
    the score is bit-identical across engines."""
    return (
        grams.join(model.select("g", "s"), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("s").alias("_s_sum"))
        .select(
            id_col,
            "n_grams",
            (
                F.col("_s_sum").cast("double")
                / (F.col("n_grams") * F.lit(LM_SCALE)).cast("double")
            ).alias("lm_score"),
        )
    )
