"""P8 — UTC+8 wall-time string round-trips (DateTimeUtil parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_flink_0526_spark.functions import timeutil


def test_epoch_zero_renders_at_utc8(spark):
    row = spark.range(1).select(
        timeutil.to_ymdhms(F.timestamp_millis(F.lit(0))).alias("s")
    ).first()
    assert row["s"] == "1970-01-01 08:00:00"  # UTC+8, like DateTimeUtil.toYMDhms


def test_roundtrip_seconds_exact(spark):
    df = spark.sql(
        "SELECT timestamp_seconds(CAST(id * 123457 AS LONG)) AS ts FROM range(200)"
    )
    bad = (
        df.withColumn("s", timeutil.to_ymdhms(F.col("ts")))
        .withColumn("back", timeutil.to_ts(F.col("s")))
        .filter(F.col("back") != F.col("ts"))
        .count()
    )
    assert bad == 0


def test_epoch_ms(spark):
    row = spark.range(1).select(
        timeutil.to_epoch_ms(F.lit("1970-01-01 08:00:00")).alias("ms")
    ).first()
    assert row["ms"] == 0
