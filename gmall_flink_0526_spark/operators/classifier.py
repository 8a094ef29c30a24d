"""Linear quality classifier — model-based filtering, trained in-engine.

The production recipe this implements is the CCNet / fastText-classifier
lineage (Wenzek et al., 2020; FineWeb-Edu's distilled quality filter):
take a TEACHER quality signal, train a cheap linear model to imitate
its selection on a bounded sample, then run the learned model
corpus-wide and AUDIT how much of the teacher's decision it reproduces.
Here the teacher decision is the engine's certified ``quality_score``
keep-the-top-half gate (threshold = ``percentile_disc(0.5)`` over the
fit sample — the ``perplexity_filter`` / DSIR median-gate discipline,
which also makes the training classes balanced by construction), and
the student is a batch perceptron over integer features — which makes
the distillation gap itself a measurable, oracle-certified number
instead of an act of faith.

Two numerics decisions carry the whole module:

- **Everything integer.** Features are ``floor(r * PTRON_SCALE)`` via
  integer division (the tfidf/DSIR raw-ratio discipline), the learning
  rate is 1, and the update is the SYNCHRONOUS batch rule
  ``w += sum(y * x)`` over the rows misclassified by the previous
  iterate — a plain BIGINT aggregation, order-insensitive, so the
  whole training loop is exact in both engines and the DuckDB oracle
  re-derives every iterate as a chained CTE. (The classic online
  perceptron is sequential by construction; the batch variant is the
  distributable form — gradient descent on perceptron loss with unit
  step — and is stated as such.)
- **Centered features.** The raw signals carry large constant offsets
  (the shape score lives in [870, 1000] for nearly every document), so
  the informative variation is a sliver of the feature norm and a
  few-iteration perceptron cannot find the boundary (measured: the
  uncentered fit collapses to all-negative at 4 AND 12 iterations).
  Centering restores the margin and stays exact: ``x' = n_s * x - S``
  with ``n_s`` the sample row count and ``S`` the sample feature sums
  — integers from ONE bounded aggregation, part of the model card,
  applied corpus-wide as literals. Measured effect at the defaults:
  corpus agreement with the teacher goes from 49% (uncentered
  collapse) to ~97% at both sf0.001 and sf0.01.

Scale shape (the 100 TB contract): the fit runs on the PTRON_FIT_N
lowest doc_ids (the KM_FIT_N deterministic-sample discipline), so
training cost is sample-bounded and CORPUS-SIZE-FREE — each iteration
is one filter + one 5-integer aggregation over <= PTRON_FIT_N rows,
collected as ONE bounded row (the k-means-seed precedent); the
centering stats and threshold are one more bounded row. Scoring is
map-side only: stats and weights enter the corpus-wide plan as
literals, so the filter/agreement queries add zero joins and zero
extra shuffles. Magnitude bounds at the defaults: centered features
|x'| <= n_s * PTRON_SCALE ~ 2.6e5, weights |w| <= iters * n_s * |x'|
~ 2.7e11... in practice ~1e7 (updates cancel), margins < 1e13 — all
far inside BIGINT at ANY corpus size precisely because the sample,
not the corpus, bounds them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import textops

#: Fixed-point scale of the integer features: a ratio r in [0, 1] is
#: carried as floor(r * PTRON_SCALE).
PTRON_SCALE = 1000

#: Deterministic fit sample: the PTRON_FIT_N lowest doc_ids (the
#: KM_FIT_N recipe). 256 rows x 4 features is plenty for a linear
#: separator over signals the teacher itself combines near-linearly,
#: and keeps the sample-vs-corpus distinction visible even at sf0.001.
PTRON_FIT_N = 256

#: Fixed synchronous-update count. Fixed (like KM_ITERS / the BPE
#: round count) so the oracle unrolls the loop as chained CTEs.
PTRON_ITERS = 4

#: Feature names in weight-vector order: intercept, capped length
#: score, stopword ratio, token-shape score — the integer-scaled
#: versions of exactly the components ``textops.quality_score``
#: combines (centered, except the intercept).
PTRON_FEATURES = ("intercept", "len", "stop", "shape")


def ptron_raw_features(docs: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra, q, x1r, x2r, x3r) over a documents frame.

    Raw (uncentered) BIGINT features — the integer-scaled twins of
    ``quality_score``'s components, all via SQL ``div`` (floor for
    these non-negative operands — identical to DuckDB ``//``):

    - x1r (len)   = least(tok_ct * 5, 1000)   # floor(1000*min(n/200,1))
    - x2r (stop)  = (stop_ct * 1000) div tok_ct
    - x3r (shape) = 1000 - least(abs(ml - 5000) div 10, 1000),
      ml = (sum(length(tok)) * 1000) div tok_ct

    ``q`` is the certified double quality score on the SAME row (the
    teacher signal). Empty-token docs are excluded (mirrored in every
    oracle).
    """
    toks = textops.tokenize(F.col("text"))
    staged = (
        docs.select("doc_id", *extra, "text", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            *extra,
            F.size("toks").cast("long").alias("n_"),
            textops.stopword_count(F.col("toks")).cast("long").alias("stop_"),
            F.aggregate(
                F.col("toks"), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).alias("tot_"),
            textops.quality_score(F.col("toks"), F.col("text")).alias("q"),
        )
    )
    s = PTRON_SCALE
    return staged.select(
        "doc_id",
        *extra,
        "q",
        F.least(F.col("n_") * F.lit(s // 200), F.lit(s).cast("long")).alias("x1r"),
        F.expr(f"(stop_ * {s}) div n_").alias("x2r"),
        (
            F.lit(s).cast("long")
            - F.least(F.expr(f"abs((tot_ * {s}) div n_ - {5 * s}) div 10"), F.lit(s).cast("long"))
        ).alias("x3r"),
    )


def ptron_stats(raw: DataFrame) -> dict:
    """The model card's centering/threshold row from the fit sample:
    ``{ns, s1, s2, s3, thr}`` — row count, per-feature sums and the
    percentile_disc(0.5) teacher threshold (an ACTUAL element of the
    score set, so both engines pick the identical double). ONE bounded
    collect (a 5-value row)."""
    row = raw.agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("x1r").alias("s1"),
        F.sum("x2r").alias("s2"),
        F.sum("x3r").alias("s3"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)").alias("thr"),
    ).collect()[0]
    return {
        "ns": int(row["ns"]),
        "s1": int(row["s1"]),
        "s2": int(row["s2"]),
        "s3": int(row["s3"]),
        "thr": float(row["thr"]),
    }


def ptron_centered(raw: DataFrame, stats: dict, extra: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *extra, y, x0..x3): label + centered features, the
    stats entering as literals (map-side at any corpus size).

    y = +1 iff q >= thr (the top-half teacher gate); x0 is the
    uncentered intercept (PTRON_SCALE); x_j = ns * x_jr - s_j.
    """
    ns = F.lit(stats["ns"]).cast("long")
    return raw.select(
        "doc_id",
        *extra,
        F.when(F.col("q") >= F.lit(stats["thr"]), F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        F.lit(PTRON_SCALE).cast("long").alias("x0"),
        (ns * F.col("x1r") - F.lit(stats["s1"]).cast("long")).alias("x1"),
        (ns * F.col("x2r") - F.lit(stats["s2"]).cast("long")).alias("x2"),
        (ns * F.col("x3r") - F.lit(stats["s3"]).cast("long")).alias("x3"),
    )


def margin_expr(w: list[int], xs: list[Column]) -> Column:
    """w . x with the weights as literals — map-side, fixed order."""
    m = F.lit(0).cast("long")
    for wj, xj in zip(w, xs):
        m = m + F.lit(int(wj)).cast("long") * xj
    return m


def perceptron_fit(feats: DataFrame, iters: int = PTRON_ITERS) -> list[tuple]:
    """Batch-perceptron training loop over a (y, x0..x3) frame.

    Returns ``[(it, wa, wb, wc, wd, miscls_ct), ...]`` — the weight
    vector AFTER each synchronous update and the size of the
    misclassified set that drove it (under the PREVIOUS iterate, so
    it=1 counts the whole sample: every row is misclassified by w=0).

    Each iteration runs ONE aggregation over the sample-bounded frame
    and collects ONE row (bounded by contract: ``iters`` is fixed and
    the row is five integers — the k-means / BPE-top-merge class).
    """
    feats = feats.persist()
    try:
        w = [0, 0, 0, 0]
        out = []
        for it in range(1, iters + 1):
            xs = [F.col(f"x{j}") for j in range(4)]
            mis = feats.filter(F.col("y") * margin_expr(w, xs) <= 0)
            row = mis.agg(
                *[
                    F.coalesce(F.sum(F.col("y") * F.col(f"x{j}")), F.lit(0).cast("long")).alias(
                        f"d{j}"
                    )
                    for j in range(4)
                ],
                F.count(F.lit(1)).alias("mct"),
            ).collect()[0]
            w = [w[j] + int(row[f"d{j}"]) for j in range(4)]
            out.append((it, w[0], w[1], w[2], w[3], int(row["mct"])))
        return out
    finally:
        feats.unpersist()


def final_weights(fit_rows: list[tuple]) -> list[int]:
    return list(fit_rows[-1][1:5])
