"""Filter / stateful-dedup operators (SURVEY §2.4) — batch twins.

The exact streaming-state versions live in ``streaming/stateful.py``;
these are the batch-equivalent semantics the DuckDB oracle checks, and
what a backfill over historical data would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def filter_deletes(df: DataFrame, type_col: str = "type") -> DataFrame:
    """F1 — drop CDC delete records (RT/app/dwd/BaseDbApp.java:45-50).
    A plain predicate: Catalyst pushes it below the fan-out."""
    return df.filter(F.col(type_col) != "delete")


def first_visit_per_day(
    df: DataFrame, key: str, ts: str, tiebreak: str | None = None
) -> DataFrame:
    """F2 (batch twin) — daily unique-visitor dedup: keep each key's
    first record per calendar day.

    Reference keeps ValueState<lastVisitDate> per mid with a 1-day TTL
    (RT/app/dwm/UniqueVisitApp.java:41-84). Batch semantics =
    ``row_number() over (partition by key, day order by ts) = 1``.
    The window shuffles once on (key, day) — at scale the partition
    count follows ``spark.sql.shuffle.partitions`` and AQE splits
    skewed mids.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    return (
        df.withColumn("dt", F.to_date(F.col(ts)))
        .withColumn("_rn", F.row_number().over(W.partitionBy(key, "dt").orderBy(*order)))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str | None = None,
    gap_minutes: int = 10,
) -> DataFrame:
    """Gap-based sessionization (batch twin of both the U2 bounce
    operator and Spark's native ``session_window`` streaming agg): adds
    a per-key ``session_id`` (1-based running count of session entries)
    via lag + running sum — one key-partitioned window sort, the
    gaps-and-islands shape that scales with the key shuffle.

    The gap test runs at microsecond precision — casting timestamps to
    long would truncate to whole seconds and misclassify boundary gaps.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(key).orderBy(*order)
    lag_ts = F.lag(ts).over(w)
    gap_us = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
        lag_ts.cast("timestamp")
    )
    is_entry = F.when(
        lag_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("_is_entry", is_entry).withColumn(
        "session_id",
        F.sum("_is_entry").over(w.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("_is_entry")


def fix_is_new(df: DataFrame, key: str, ts: str, flag: str = "is_new") -> DataFrame:
    """F3 (batch twin) — new-user flag correction: a record may claim
    ``is_new = 1`` only if it belongs to the key's first-ever day.

    Reference: keyed ValueState holding first-seen date
    (RT/app/dwd/BaseLogApp.java:58-95). Batch semantics: compare with
    ``min(ts) over (partition by key)``.
    """
    w = W.partitionBy(key)
    first_day = F.to_date(F.min(F.col(ts)).over(w))
    corrected = F.when(
        (F.col(flag) == "1") & (F.to_date(F.col(ts)) != first_day), F.lit("0")
    ).otherwise(F.col(flag))
    return df.withColumn(flag, corrected)
