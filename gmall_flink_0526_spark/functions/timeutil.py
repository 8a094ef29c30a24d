"""P8 — timestamp <-> string conversions at the reference's fixed zone.

The reference renders and parses ``yyyy-MM-dd HH:mm:ss`` strings at
UTC+8 (``RT/utils/DateTimeUtil.java:11-21`` pins ``ZoneOffset.of("+8")``
via a thread-safe DateTimeFormatter — the comment there warns that
SimpleDateFormat isn't thread-safe; Spark expressions are inherently so).

The engine's session timezone stays UTC (session.py) so oracles compare
bit-for-bit; these helpers are explicit about the business zone instead
of leaning on session state.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ZONE = "Asia/Shanghai"
FMT = "yyyy-MM-dd HH:mm:ss"


def to_ymdhms(ts: Column, zone: str = ZONE) -> Column:
    """epoch/timestamp -> 'yyyy-MM-dd HH:mm:ss' string rendered at the
    business zone (DateTimeUtil.toYMDhms)."""
    return F.date_format(F.from_utc_timestamp(ts, zone), FMT)


def to_ts(s: Column, zone: str = ZONE) -> Column:
    """'yyyy-MM-dd HH:mm:ss' string (wall time at the business zone) ->
    timestamp (DateTimeUtil.toTs)."""
    return F.to_utc_timestamp(F.to_timestamp(s, FMT), zone)


def to_epoch_ms(s: Column, zone: str = ZONE) -> Column:
    """String wall time -> epoch millis, the reference's Long ts form."""
    return F.unix_millis(to_ts(s, zone))
