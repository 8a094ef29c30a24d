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
    # hours 1 and 2 interpolate at 1/3 and 2/3 (through the SAME
    # interp_output the registered query runs)
    from gmall_flink_0526_spark.plans.timeseries import interp_output

    roll = _roll(spark, [("a", 0, 1, 1.0), ("a", 3, 1, 4.0)])
    got = {
        int(r["stt"][11:13]): r["interp_value"]
        for r in interp_output(dense_from_rollup(roll)).collect()
    }
    assert got[0] == 1.0 and got[3] == 4.0
    assert abs(got[1] - 2.0) < 1e-12 and abs(got[2] - 3.0) < 1e-12


def test_interp_anchor_skips_null_valued_present_bucket(spark):
    # the r13 self-review desync case: h1 is PRESENT (ct=3) but its
    # value_sum is NULL — the epoch anchor must NOT advance to h1
    # while the value fence stays at h0. With both fences keyed on
    # value_sum, the h2 gap interpolates between h0 (v=10) and h3
    # (v=40) at frac 2/3 -> 30; the desynchronized form would have
    # yielded 25 (anchor at h1, value from h0).
    from gmall_flink_0526_spark.plans.timeseries import interp_output

    roll = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0), 1, 10.0),
            ("a", dt.datetime(2024, 1, 1, 1), 3, None),
            ("a", dt.datetime(2024, 1, 1, 3), 1, 40.0),
        ],
        "event_type string, h timestamp, ct long, value_sum double",
    )
    got = {
        int(r["stt"][11:13]): (r["ct"], r["interp_value"])
        for r in interp_output(dense_from_rollup(roll)).collect()
    }
    assert got[0] == (1, 10.0)
    assert got[1] == (3, None)  # present-but-null stays null, not blended
    assert abs(got[2][1] - 30.0) < 1e-12  # anchored at h0, not h1
    assert got[3] == (1, 40.0)
