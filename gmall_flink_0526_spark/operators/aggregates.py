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
