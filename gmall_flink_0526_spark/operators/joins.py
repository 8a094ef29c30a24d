"""Join operators (SURVEY §2.6).

J1/J2 interval joins and the J3 dimension-enrichment chain, expressed
so Catalyst picks the physical strategy: the interval join is an
equi-join on the key (sort-merge / shuffled-hash at scale) with the
time-range predicate applied as a post-join filter pushed into the
join condition; dim enrichment is a chain of broadcast hash joins —
the Spark replacement for the reference's per-record async Phoenix
lookups + Redis cache (RT/app/func/AsyncDimFunction.java,
RT/utils/DimUtil.java): broadcasting the dim once per stage strictly
beats caching per-record RPCs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: Column,
    right_ts: Column,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """J1/J2 — event-time interval join.

    ``right_ts`` must fall within ``[left_ts - lower, left_ts + upper]``
    (Flink ``intervalJoin .between(-lower, +upper)``,
    RT/app/dwm/OrderWideApp.java:80-89 with [-5s, +5s] and
    RT/app/dwm/PaymentWideApp.java:76-85 with [-15min, +5s]).

    The equi-key stays in ``on`` so the planner still hash-partitions
    both sides by key — the range predicate never degrades the join to
    a nested loop. In streaming, both inputs additionally carry
    ``withWatermark`` so state is bounded (see streaming/pipelines.py).
    """
    cond = (
        on
        & (right_ts >= left_ts - F.expr(f"INTERVAL {lower}"))
        & (right_ts <= left_ts + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)


def dim_enrich(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column, list[Column]]],
    how: str = "left",
) -> DataFrame:
    """J3 — enrich a fact stream with a chain of small dimension tables.

    ``dims`` is ``[(dim_df, join_cond, projected_cols), ...]``; each dim
    is explicitly broadcast. Replaces reference J3 (async point lookups
    with Redis look-aside cache + 4-20 thread pool) and J4 (cache
    invalidation): a broadcast re-read per batch makes both obsolete.
    """
    out = fact
    for dim_df, cond, cols in dims:
        out = out.join(F.broadcast(dim_df.select(*cols)), cond, how)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    how: str = "inner",
    validate: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row picks up the LATEST right row
    with ``right.ts_col <= left.ts_col`` per key — the time-series join
    (trade⋈quote, event⋈latest-dim-version) Spark has no native
    operator for. DuckDB spells it ``ASOF JOIN``; this is the
    distributed composition with identical inclusive-backward
    semantics.

    Contract: ``right`` holds exactly ``on + [ts_col] + value columns``
    whose names do not collide with ``left``'s, and at most one row
    per (key, ts) — pre-aggregate ties (``groupBy(key, ts).agg(max)``
    is the standard recipe); the operator cannot pick between two
    simultaneous right rows deterministically. NULL right values ARE
    allowed: the whole right payload rides one non-null marker STRUCT
    through the fill, so a matched row's own NULL comes through as
    NULL instead of leaking the previous row's value.

    Shape — the part that matters at 100 TB: a sorted-union
    last-value fill, NOT a join. Both sides union (right rows sort
    before left rows at equal ts, making the match inclusive), one
    hash exchange on the key, one per-key sort by (ts, side), and a
    running ``last(payload, ignorenulls)`` window whose frame never
    looks forward — state per key is one carried payload struct, and
    no key ever fans out left x right the way a range-predicate join
    would. ``how='left'`` keeps unmatched left rows (NULL values);
    ``'inner'`` drops them.

    ``validate=True`` additionally PROVES the at-most-one-row-per
    (key, ts) precondition with a distributed duplicate probe (one
    grouped count over ``right`` + a ``limit(1)`` action) and raises
    ``ValueError`` naming an offending key if it fails. Opt-in because
    it costs a pass over the right side — turn it on in tests and
    small-SF pipeline runs, leave the hot path free of the extra scan.
    """
    from pyspark.sql import types as T

    val_cols = [c for c in right.columns if c not in [*on, ts_col]]
    clash = set(val_cols) & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: right value columns collide with left: {sorted(clash)}")
    if validate:
        dup = (
            right.groupBy(*on, ts_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0].asDict()
            raise ValueError(
                "asof_join: right side violates the at-most-one-row-per-"
                f"(key, ts) contract, e.g. {r} — pre-aggregate ties "
                "(groupBy(key, ts).agg(max)) before the join"
            )
    # the right payload travels as ONE struct: its outer nullity is the
    # match marker, so member NULLs never confuse the ignore-nulls fill
    payload_t = T.StructType(
        [T.StructField("_asof_m", T.IntegerType(), False)]
        + [T.StructField(c, right.schema[c].dataType) for c in val_cols]
    )
    l_side = left.select(
        *left.columns,
        F.lit(None).cast(payload_t).alias("_asof_v"),
        F.lit(1).alias("_asof_side"),
    )
    r_side = right.select(
        *on,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in [*on, ts_col]],
        F.struct(F.lit(1).alias("_asof_m"), *[F.col(c) for c in val_cols])
        .cast(payload_t)
        .alias("_asof_v"),
        F.lit(0).alias("_asof_side"),
    ).select(*l_side.columns)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("_asof_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l_side.unionByName(r_side).select(
        *[c for c in left.columns],
        F.last("_asof_v", ignorenulls=True).over(w).alias("_asof_v"),
        "_asof_side",
    )
    out = filled.filter(F.col("_asof_side") == 1).drop("_asof_side")
    if how == "inner":
        out = out.filter(F.col("_asof_v").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: unsupported how={how!r}")
    return out.select(
        *left.columns, *[F.col("_asof_v").getField(c).alias(c) for c in val_cols]
    )
