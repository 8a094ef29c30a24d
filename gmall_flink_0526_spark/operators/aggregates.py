"""Windowed / grouped aggregation operators (SURVEY §2.8, A1-A4).

The DWS layer of the reference exists only as output beans
(RT/bean/VisitorStats.java, ProductStats.java, ProvinceStats.java,
KeywordStats.java); these operators implement the aggregations those
schemas specify, as single-shuffle grouped aggregates with map-side
partial aggregation (Spark does the partial/final split automatically
inside whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.exact import exact_sum


def tumbling_window(ts: Column, size: str = "1 hour") -> Column:
    """Event-time tumbling window start, serialized like the reference's
    ``stt`` string (RT/bean/VisitorStats.java:12-13)."""
    return F.date_format(F.date_trunc("hour" if size == "1 hour" else "minute", ts), "yyyy-MM-dd HH:mm:ss")


def visitor_stats(df: DataFrame, ts: str, dims: list[str], value: str) -> DataFrame:
    """A1 — tumbling-window visitor stats: pv count, exact uv, value sum
    per window x dimension tuple (VisitorStats.java:11-36)."""
    return (
        df.groupBy(tumbling_window(F.col(ts)).alias("stt"), *dims)
        .agg(
            F.count("*").alias("pv_ct"),
            F.countDistinct("user_id").alias("uv_ct"),
            exact_sum(F.col(value)).alias("value_sum"),
        )
    )


def distinct_count_exact(key: Column) -> Column:
    """A2's Set<order_id> accumulator (ProductStats.java:74-84) — the
    exact form. ``size(collect_set(...))`` keeps the set internal to the
    aggregation and never materializes it to the sink, which is what
    the @TransientSink annotation encodes."""
    return F.size(F.collect_set(key))


def distinct_count_approx(key: Column, rsd: float = 0.01) -> Column:
    """The scale path for distinct counts: HyperLogLog++. At 100 TB an
    exact per-group set is a memory hazard; approx_count_distinct is
    mergeable map-side."""
    return F.approx_count_distinct(key, rsd)


# -- Count-min sketch ---------------------------------------------------
#
# The frequency twin of HyperLogLog above: where a 100 TB exact
# per-token count table is itself a large dataset, a count-min sketch
# is a DEPTH x WIDTH grid of counters — fixed memory at any corpus
# size, built by one map-side-combinable grouped count, mergeable
# across shards/epochs by plain addition, never under-estimating
# (estimate = min over rows of the probed counter >= true count).
# Hashing is the minhash family's seeded-md5-slice arithmetic, so the
# grid is bit-identical in Spark, DuckDB and Python and an oracle can
# re-derive estimates INCLUDING collision error.
CMS_DEPTH = 3
# Width is sized to the CORRECTNESS corpus (31-token synthetic
# vocabulary): 32 buckets leaves the collision-error column
# (over_ct) non-trivially exercised at every test SF — a few top-k
# tokens measurably over-estimate — which is the whole point of the
# audit. Production sizes width from the audit itself (wider grid =
# smaller error, same mergeable shape; the grid stays
# depth x width regardless of corpus size).
CMS_WIDTH = 32


def cms_bucket(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row ``row``'s counter bucket for ``key``: first 8 hex chars of
    md5("{row}#" + key) as an integer, mod the sketch width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}#"), key)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def _cms_probes(df: DataFrame, key: str, depth: int, width: int) -> DataFrame:
    """One (i, b) probe row per input row per sketch row — the
    fan-out is the constant ``depth``, collapsed immediately by the
    caller's grouped count."""
    return df.select(
        *df.columns,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cms_bucket(F.col(key), i, width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_p"),
    ).select(*df.columns, F.col("_p.i").alias("i"), F.col("_p.b").alias("b"))


def cms_counters(
    items: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Build the sketch: (i, b, ct) counter grid over a key stream —
    at most depth*width rows out of ONE grouped count whose partial
    aggregation runs map-side, so a trillion-token stream exchanges
    only per-partition partial grids."""
    return (
        _cms_probes(items.select(key), key, depth, width)
        .groupBy("i", "b")
        .agg(F.count("*").alias("ct"))
    )


# -- Equi-width histogram quantile sketch --------------------------------
#
# The QUANTILE member of the mergeable-sketch family (CMS = frequency,
# Bloom = membership): a fixed BINS-cell count grid per group over a
# provisioned value domain. Fixed memory at any stream size, built by
# one map-side-combinable grouped count, mergeable across shards and
# epochs by plain addition (exactly like CMS), and every derivation —
# bin index, rank threshold, midpoint estimate — is plain IEEE double
# arithmetic identical in Spark and DuckDB, so an oracle re-derives
# estimates INCLUDING the binning error. Production swaps in t-digest
# for tighter tails; the histogram is the shape that stays
# bit-reproducible cross-engine, which is what the AUDIT needs.
HIST_BINS = 256
# audited quantiles: label -> probability (labels keep the output
# column engine-type-stable; a bare 0.9 literal is DECIMAL in DuckDB)
HIST_QS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def hist_bin(
    value: Column, vmin: Column, vmax: Column, bins: int = HIST_BINS
) -> Column:
    """Equi-width bin index in [0, bins): floor((v - vmin) / w) clamped
    into the edge bins on BOTH sides (v == vmax lands in bins-1; an
    out-of-domain value under a provisioned stream domain clamps to 0
    or bins-1, the standard streaming-histogram contract); a
    degenerate domain (vmin == vmax) collapses to bin 0. An UNBINNABLE
    row — NULL value, or NULL bounds from a group absent from the
    provisioned domain — lands in the SENTINEL bin -1, so it stays
    visible in the grid (the quantile reader skips it) instead of
    silently inflating the top bin (NULL least/greatest skip nulls in
    both engines) or vanishing. Pure double arithmetic otherwise, same
    expression tree as the SQL twin."""
    w = (vmax - vmin) / bins
    # clamp in LONG first, cast to int only after: floor() yields a
    # long (saturating on double overflow), so a far out-of-domain
    # value — ratio beyond 2^31 bin widths under a provisioned stream
    # domain — clamps to the correct edge instead of int-wrapping to
    # the wrong one in non-ANSI Spark (r10 advice)
    return (
        F.when(value.isNull() | vmin.isNull() | vmax.isNull(), F.lit(-1))
        .when(
            w > 0,
            F.greatest(
                F.least(F.floor((value - vmin) / w), F.lit(bins - 1).cast("long")),
                F.lit(0).cast("long"),
            ).cast("int"),
        )
        .otherwise(0)
    )


def hist_counters(
    df: DataFrame,
    group: str,
    value_col: str,
    bounds: DataFrame,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Build the sketch: (group, b, ct) grid — at most groups*bins rows
    out of ONE grouped count with map-side partial aggregation.
    ``bounds`` is the provisioned (group, vmin, vmax) domain table —
    config-sized (one row per group), broadcast; a stream provisions
    it once up front (the Bloom-width contract) so per-epoch grids
    stay mergeable. The join is LEFT: rows of a group the domain does
    not cover (a new group appeared mid-stream) count into that
    group's SENTINEL bin -1 — observable in the grid as the signal to
    re-provision, never silently dropped; :func:`hist_quantiles`
    excludes the sentinel from estimates and n."""
    j = df.join(F.broadcast(bounds), group, "left")
    return j.groupBy(
        group,
        hist_bin(F.col(value_col), F.col("vmin"), F.col("vmax"), bins).alias("b"),
    ).agg(F.count("*").alias("ct"))


def hist_quantiles(
    counters: DataFrame,
    bounds: DataFrame,
    group: str = "event_type",
    qs: tuple = HIST_QS,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile point-estimates from the sketch: per group, the first
    bin whose running count reaches ceil(p * n), estimated at the bin
    midpoint. Everything after the grid is sub-kilobyte: the cumulative
    window and the per-quantile conditional mins run over <= groups*bins
    rows, and n is the grid's own column sum (no second pass over the
    data). Output: (group, q, n, hist_q) — one row per group per
    audited quantile."""
    from pyspark.sql import Window as W

    w_cum = W.partitionBy(group).orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    # sentinel bin -1 (NULL values / unprovisioned groups) is grid
    # observability, not data: excluded from n and from every estimate
    cum = counters.filter(F.col("b") >= 0).withColumn(
        "cum", F.sum("ct").over(w_cum)
    ).withColumn("n", F.sum("ct").over(W.partitionBy(group)))
    hits = cum.groupBy(group).agg(
        F.max("n").alias("n"),
        *[
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(p) * F.col("n")), F.col("b"))
            ).alias(f"_b_{q}")
            for q, p in qs
        ],
    )
    width = (F.col("vmax") - F.col("vmin")) / bins
    return (
        hits.join(F.broadcast(bounds), group)
        .select(
            group,
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(q).alias("q"),
                            (F.col("vmin") + (F.col(f"_b_{q}") + 0.5) * width).alias(
                                "hist_q"
                            ),
                        )
                        for q, _ in qs
                    ]
                )
            ).alias("_e"),
        )
        .select(group, F.col("_e.q").alias("q"), "n", F.col("_e.hist_q").alias("hist_q"))
    )


# -- HyperLogLog register sketch ------------------------------------------
#
# The CARDINALITY member of the mergeable-sketch family (CMS =
# frequency, Bloom = membership, histogram = quantile): m registers
# per group, register j holding the MAX leading-zero rank (rho) of the
# hashes routed to it. Fixed memory at any stream size, built by ONE
# grouped max with map-side partial aggregation, mergeable across
# shards/epochs by plain MAX (idempotent — a replayed batch cannot
# corrupt it, even without the overwrite crash rule). Spark's own
# approx_count_distinct is HLL++ and is what production calls inline
# (distinct_count_approx above); THIS sketch is the explicit-register
# form whose every step — bucket, rho, harmonic sum, estimate — is
# exact string/integer arithmetic plus ONE final IEEE division, so a
# DuckDB oracle re-derives the estimate bit-for-bit INCLUDING the
# sketch error, which is what an AUDIT needs (HLL++ register layouts
# are engine-private and not cross-engine reproducible — the
# product_stats_approx lesson).
#
# m = 32 keeps the relative error ~1.04/sqrt(32) ~ 18% — deliberately
# coarse so the audit's err_pct column is non-trivially exercised at
# every test SF (the CMS_WIDTH=32 rationale). alpha_32 = 0.697 is the
# original HLL paper's constant for m = 32. The estimator is the RAW
# HLL formula only: the audited domain guarantees n > 2.5*m (the
# small-range linear-counting branch needs ln(), whose last-bit
# rounding is engine-specific — the chi2-over-KL precedent — so it
# stays out of the certified surface; production re-enables it, or
# uses approx_count_distinct, when small groups matter). The 32-bit
# hash's large-range correction is likewise irrelevant below ~10^8
# distinct; at 100 TB production widens the slice to 16 hex chars.
HLL_M = 32
_HLL_ALPHA = 0.697
# alpha * m^2 * 2^33 precomputed in Python and embedded as the SAME
# repr literal in both engines: the estimate is this single constant
# divided by the exact-integer harmonic sum S (see hll_estimate).
HLL_ALPHA_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 33)


def hll_rho(hex8: Column) -> Column:
    """rho of an 8-hex-char (32-bit) hash slice: leading zero BITS + 1,
    computed purely from the hex STRING — strip leading '0' chars, then
    the first surviving nibble's own leading zeros from a 4-way CASE —
    so both engines derive identical integers with no float/libm step
    anywhere. An all-zero slice is rho = 33 (the 32-bit convention)."""
    stripped = F.regexp_replace(hex8, "^0+", "")
    d = F.substring(stripped, 1, 1)
    extra = (
        F.when(d.isin(*"89abcdef"), 0)
        .when(d.isin("4", "5", "6", "7"), 1)
        .when(d.isin("2", "3"), 2)
        .otherwise(3)  # d == '1'
    )
    return F.when(stripped == "", 33).otherwise(
        (F.lit(8) - F.length(stripped)) * 4 + extra + 1
    )


def hll_registers(df: DataFrame, group: str, key: str, m: int = HLL_M) -> DataFrame:
    """Build the sketch: (group, j, r) register grid — at most
    groups*m rows out of ONE grouped max whose partial aggregation
    runs map-side, so a trillion-row stream exchanges only
    per-partition partial grids. Bucket j and rho come from disjoint
    slices of one md5 (the minhash family's seeded-slice arithmetic);
    NULL keys hash to NULL and are dropped here, mirrored by the
    oracle's IS NOT NULL."""
    h = F.md5(F.col(key).cast("string"))
    return (
        df.filter(F.col(key).isNotNull())
        .select(
            group,
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m).alias("j"),
            hll_rho(F.substring(h, 9, 8)).alias("r"),
        )
        .groupBy(group, "j")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(regs: DataFrame, group: str, m: int = HLL_M) -> DataFrame:
    """Raw-HLL point estimate from a register grid: alpha*m^2 /
    sum_j 2^-M_j. The harmonic sum is kept EXACT by integer scaling —
    each present register contributes 2^(33-r) and each untouched
    register (M_j = 0) contributes 2^33, summed as BIGINT (max m*2^33
    < 2^39, no overflow) — so the whole estimate is one precomputed
    double constant divided by one exactly-represented integer:
    bit-identical in any IEEE engine, no float accumulation order to
    disagree on. Output: (group, zeros, hll_est); post-grid work runs
    over <= groups*m rows."""
    per = regs.groupBy(group).agg(
        (F.lit(m) - F.count("*")).cast("long").alias("zeros"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 33 - r)")).alias("_s_hit"),
    )
    s = F.col("_s_hit") + F.col("zeros") * F.lit(1 << 33).cast("long")
    return per.select(
        group,
        "zeros",
        (F.lit(HLL_ALPHA_NUM) / s.cast("double")).alias("hll_est"),
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate every row of ``keys``: probe the sketch at the
    key's depth buckets and take the min counter — the CMS estimate,
    >= the true count by construction. A probed cell absent from the
    grid is a zero counter (the grid only materializes touched cells),
    so the join is LEFT + coalesce-0: a key the sketched stream never
    saw estimates 0 (or its honest collision floor), it does not
    vanish from the output or inflate to the min of its surviving
    cells. The counter grid is bounded by the contractual constant
    depth*width (96 rows here), so it is broadcast raw and the probe
    join never shuffles ``keys``."""
    probed = _cms_probes(keys, key, depth, width).join(
        F.broadcast(counters), ["i", "b"], "left"
    )
    return probed.groupBy(*keys.columns).agg(
        F.min(F.coalesce("ct", F.lit(0).cast("bigint"))).alias("cms_est")
    )
