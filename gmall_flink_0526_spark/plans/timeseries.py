"""Hypertable-style time-series rollups over ``events``: hourly
downsampling onto a DENSE bucket grid (gap-fill), with
last-observation-carried-forward and linear interpolation — the
timescaledb ``time_bucket_gapfill + locf/interpolate`` surface,
expressed as pure DataFrame plans.

Shape contract (the 100 TB story): the rollup is one grouped aggregate
(map-side combined) whose output is bucket-grid-sized — corpus rows
never pass the group boundary; the grid is entity-count x bucket-count
(generated, not scanned); the fills are per-entity ordered windows, so
they parallelize across entities and never sort the corpus globally.
The only scalar is the 1-row global bucket bounds, which rides a
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.exact import exact_sum, sql_sum
from ..session import load_tables
from .catalog import register

# Dense grid CTEs shared by both gap-fill oracles: hourly rollup,
# global bucket bounds, per-type dense grid, grid-left-join.
_SQL_GRID_CTES = f"""
    roll AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS ct, {sql_sum('value')} AS value_sum
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT MIN(date_trunc('hour', ts)) AS hmin,
             MAX(date_trunc('hour', ts)) AS hmax
      FROM events
    ),
    grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h
                  FROM bounds) g
    ),
    dense AS (
      SELECT grid.event_type, grid.h, roll.ct, roll.value_sum
      FROM grid LEFT JOIN roll
        ON grid.event_type = roll.event_type AND grid.h = roll.h
    )"""


def dense_from_rollup(roll: DataFrame) -> DataFrame:
    """Dense (event_type, h, ct, value_sum) grid from a rollup frame —
    bounds and the entity list derive from the rollup itself (its h
    values cover exactly the raw rows' hours), so the batch query and
    the epoch-store streaming twin share this tail verbatim."""
    bounds = roll.agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
    grid = (
        roll.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("hmin"), F.col("hmax"), F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    return grid.join(roll, ["event_type", "h"], "left")


def locf_output(dense: DataFrame) -> DataFrame:
    """The locf gap-fill projection over a dense grid (shared by the
    batch query and the streaming twin)."""
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return dense.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.col("ct").isNull().alias("filled"),
        F.last("value_sum", ignorenulls=True).over(w).alias("locf_value"),
    )


def interp_output(dense: DataFrame) -> DataFrame:
    """The linear-interpolation gap-fill projection over a dense grid
    (shared by the query and its unit tests, like locf_output). Value
    fences AND epoch anchors both key off ``value_sum IS NOT NULL``:
    a present bucket whose event values are all NULL is a gap for
    interpolation purposes, so the anchors can never desynchronize
    from the values they pair with."""
    back = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    present_e = F.when(F.col("value_sum").isNotNull(), F.unix_timestamp("h"))
    fenced = dense.select(
        "event_type",
        "h",
        "ct",
        "value_sum",
        F.last("value_sum", ignorenulls=True).over(back).alias("prev_v"),
        F.first("value_sum", ignorenulls=True).over(fwd).alias("next_v"),
        F.last(present_e, ignorenulls=True).over(back).alias("prev_e"),
        F.first(present_e, ignorenulls=True).over(fwd).alias("next_e"),
    )
    frac = (F.unix_timestamp("h") - F.col("prev_e")).cast("double") / (
        F.col("next_e") - F.col("prev_e")
    ).cast("double")
    return fenced.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        F.when(F.col("ct").isNotNull(), F.col("value_sum"))
        .when(F.col("prev_e").isNull() | F.col("next_e").isNull(), F.lit(None))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
        .alias("interp_value"),
    )


def _dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, h, ct, value_sum) on the dense hourly grid; ct and
    value_sum NULL on gap buckets."""
    t = load_tables(spark, sf_dir, "events")
    ev = t["events"]
    roll = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("ct"), exact_sum(F.col("value")).alias("value_sum"))
    return dense_from_rollup(roll)


# The full locf gap-fill as one oracle string — shared VERBATIM by the
# batch query and the streaming twin `events_gapfill_stream` (the
# per-epoch rollup grids merge additively: counts as integers, value
# sums as exact decimals, so the streamed dense grid is bit-identical).
SQL_GAPFILL_LOCF = f"""
    WITH {_SQL_GRID_CTES}
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS stt,
           event_type,
           COALESCE(ct, 0) AS ct,
           (ct IS NULL) AS filled,
           last_value(value_sum IGNORE NULLS)
             OVER (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM dense
    """


@register(
    "events_gapfill_locf",
    oracle=SQL_GAPFILL_LOCF,
    doc="Gap-filled hourly rollup with last-observation-carried-forward "
    "— time_bucket_gapfill + locf(sum(value)), the hypertable "
    "downsampling query a monitoring/feature pipeline serves. Gaps are "
    "REAL rows (ct=0, filled=true) on the dense entity x hour grid "
    "generated from the broadcast 1-row bounds; the carried value is "
    "an IGNORE NULLS running last over the per-entity ordered window "
    "(leading gaps stay NULL — nothing to carry). The rollup itself is "
    "decimal-exact, so the carried doubles are bit-identical "
    "cross-engine.",
    tags=("events", "timeseries", "window"),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return locf_output(_dense_grid(spark, sf_dir))


@register(
    "events_gapfill_interp",
    oracle=f"""
    WITH {_SQL_GRID_CTES},
    fenced AS (
      SELECT *,
             last_value(value_sum IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             first_value(value_sum IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
             last_value(CASE WHEN value_sum IS NOT NULL
                             THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_e,
             first_value(CASE WHEN value_sum IS NOT NULL
                              THEN CAST(epoch(h) AS BIGINT) END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_e
      FROM dense
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS stt,
           event_type,
           COALESCE(ct, 0) AS ct,
           CASE
             WHEN ct IS NOT NULL THEN value_sum
             WHEN prev_e IS NULL OR next_e IS NULL THEN NULL
             ELSE prev_v + (next_v - prev_v)
                  * (CAST(CAST(epoch(h) AS BIGINT) - prev_e AS DOUBLE)
                     / CAST(next_e - prev_e AS DOUBLE))
           END AS interp_value
    FROM fenced
    """,
    doc="Gap-filled hourly rollup with LINEAR interpolation — "
    "time_bucket_gapfill + interpolate(sum(value)). Each gap bucket "
    "takes prev + (next - prev) * frac between its surrounding "
    "observations (two IGNORE NULLS fence windows per entity — one "
    "running last, one running first); BOTH the value fences and the "
    "epoch anchors key off value_sum IS NOT NULL, so a present bucket "
    "whose event values are all NULL is a gap for interpolation "
    "purposes — anchors and values can never desynchronize (self-"
    "review r13). frac is a single division of exact epoch-second "
    "integers and the blend is a fixed-order 3-op double expression, "
    "so both engines produce identical bits. Leading/trailing gaps "
    "(no fence on one side) stay NULL, matching timescaledb. Same "
    "dense-grid scale shape as the locf twin.",
    tags=("events", "timeseries", "window"),
)
def events_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return interp_output(_dense_grid(spark, sf_dir))


@register(
    "events_ohlc_hourly",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
      WHERE ts IS NOT NULL
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS stt,
           event_type,
           COUNT(*) AS ct,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           {sql_sum('value')} AS value_sum
    FROM ranked
    GROUP BY h, event_type
    """,
    doc="OHLC hourly downsample — the candlestick rollup every "
    "time-series store serves (timescale candlestick_agg / kdb xbar): "
    "per (entity, hour) the first/last/extreme values with a "
    "decimal-exact volume sum. First/last are (ts, event_id)-ordered — "
    "event ids are unique, so the pick is deterministic and "
    "oracle-derivable (Spark takes min/max over a (ts, event_id, "
    "value) struct — one grouped agg, map-side combined, NO window "
    "pass; the oracle's rank form selects the same rows). "
    "PRECONDITION (enforced): ts must be non-null — a null ts would "
    "sort nulls-first in Spark's struct ordering but nulls-last in "
    "the oracle's ORDER BY, so BOTH sides filter ts IS NOT NULL and "
    "the documented precondition is now a plan invariant rather than "
    "a trap. Scale: one shuffle on the (entity, hour) key; output is "
    "grid-sized.",
    tags=("events", "timeseries", "agg"),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "events")
    ev = (
        t["events"]
        .filter(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "ts",
            "event_id",
            "value",
        )
    )
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return ev.groupBy("h", "event_type").agg(
        F.count("*").alias("ct"),
        first_s.getField("value").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        last_s.getField("value").alias("close_v"),
        exact_sum(F.col("value")).alias("value_sum"),
    ).select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("stt"),
        "event_type",
        "ct",
        "open_v",
        "high_v",
        "low_v",
        "close_v",
        "value_sum",
    )
