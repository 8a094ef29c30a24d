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

from pyspark.sql import Column, DataFrame, functions as F


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
